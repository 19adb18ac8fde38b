"""Device (JAX) HT cleanup-pass encoder: byte-exact vs the native coder.

The device coder (ops/ht_jax.py) is the TPU-native reformulation of the
FBCOT cleanup pass; every segment must match native/src/ht.cpp bit for
bit, and a full encode with GROK_TPU_T1=device must be byte-identical to
the native-backend codestream.
"""

import os

import numpy as np
import pytest

from grokimagecompression_tpu.native import t1_native
from grokimagecompression_tpu.ops import ht_jax


def _rand_block(rng, h, w, dens, mb, hi):
    mag = rng.integers(0, hi, (h, w)).astype(np.uint32)
    mag = np.where(rng.random((h, w)) < 1 - dens, 0, mag).astype(np.uint32)
    mag = np.minimum(mag, (1 << mb) - 1)
    neg = rng.integers(0, 2, (h, w)).astype(np.uint8)
    return mag, neg, mb


def test_blocks_byte_exact_vs_native():
    rng = np.random.default_rng(11)
    cases = []
    for (h, w) in [(64, 64), (32, 32), (16, 16), (64, 63), (63, 64),
                   (1, 1), (1, 64), (64, 1), (3, 5), (7, 9)]:
        for dens, mb, hi in [(0.5, 10, 512), (0.02, 10, 512),
                             (1.0, 10, 512), (0.3, 30, 1 << 30),
                             (0.0, 10, 512), (0.9, 4, 15)]:
            cases.append(_rand_block(rng, h, w, dens, mb, hi))
    want = t1_native.ht_encode_cblk_batch(cases)
    got = ht_jax.ht_encode_blocks(cases)
    for i, (wv, gv) in enumerate(zip(want, got)):
        assert wv == gv, f"case {i} shape {cases[i][0].shape}"


def test_band_gather_irreversible():
    rng = np.random.default_rng(5)
    band = (rng.normal(0, 40, (96, 96))).astype(np.float32)
    descs = [(0, 0, 0, 64, 64), (0, 64, 0, 32, 64), (0, 0, 64, 96, 32)]
    kmaxs = [12, 12, 12]
    want = t1_native.ht_encode_cblk_batch_bands(
        [band], np.asarray(descs, np.int64),
        np.asarray(kmaxs, np.int64), stepsizes=[0.75])
    got = ht_jax.ht_encode_cblk_batch_bands(
        [band], np.asarray(descs, np.int64), kmaxs, stepsizes=[0.75])
    assert list(want) == list(got)


def test_full_encode_device_t1_byte_identical():
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams

    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, (200, 300)).astype(np.int32)
    img = Image(xsiz=300, ysiz=200, components=[
        Component(data=data, prec=8, signed=False, dx=1, dy=1)])
    params = EncoderParams(numresolutions=4, cblk_style=0x40)
    host = encoder.encode(img, params, device=False)
    os.environ["GROK_TPU_T1"] = "device"
    try:
        dev = encoder.encode(img, params, device=False)
    finally:
        del os.environ["GROK_TPU_T1"]
    assert host == dev
    out = decoder.decode(dev)
    np.testing.assert_array_equal(out.components[0].data, data)


def test_full_encode_device_t1_irreversible():
    from grokimagecompression_tpu.codestream import encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams, Transform

    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, (128, 128)).astype(np.int32)
    img = Image(xsiz=128, ysiz=128, components=[
        Component(data=data, prec=8, signed=False, dx=1, dy=1)])
    params = EncoderParams(numresolutions=4, cblk_style=0x40,
                           transform=Transform.DWT_97)
    host = encoder.encode(img, params, device=False)
    os.environ["GROK_TPU_T1"] = "device"
    try:
        dev = encoder.encode(img, params, device=False)
    finally:
        del os.environ["GROK_TPU_T1"]
    assert host == dev
