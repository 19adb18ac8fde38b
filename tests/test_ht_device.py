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


# ---------------------------------------------------------------------------
# Device HT DECODER (ops/ht_dec_jax.py): bit-exact vs the native decoder
# ---------------------------------------------------------------------------


def test_decode_blocks_bit_exact_vs_native():
    from grokimagecompression_tpu.ops import ht_dec_jax
    rng = np.random.default_rng(21)
    cases = []
    for (h, w) in [(64, 64), (32, 32), (16, 16), (64, 63), (1, 1),
                   (1, 64), (64, 1), (3, 5), (62, 62), (5, 7)]:
        for dens, mb, hi in [(0.5, 10, 512), (0.02, 10, 512),
                             (1.0, 10, 512), (0.3, 14, 1 << 13),
                             (0.9, 4, 15)]:
            cases.append(_rand_block(rng, h, w, dens, mb, hi))
    # MEL-pad-heavy and stuffing-heavy extremes
    z = np.zeros((64, 64), np.uint32)
    cases.append((z, z.astype(np.uint8), 8))
    sp = z.copy()
    sp[63, 63] = 5
    cases.append((sp, z.astype(np.uint8), 8))
    cases.append((np.full((64, 64), 255, np.uint32),
                  (rng.random((64, 64)) < 0.5).astype(np.uint8), 10))
    segs = t1_native.ht_encode_cblk_batch(cases)
    blocks = []
    for (mag, neg, mb), seg in zip(cases, segs):
        numbps = int(mag.max()).bit_length()
        blocks.append((seg, mag.shape[1], mag.shape[0], mb - numbps))
    from grokimagecompression_tpu.ops import ht_dec_jax
    dev = ht_dec_jax.ht_decode_blocks(blocks)
    for i, (seg, w, h, miss) in enumerate(blocks):
        nm, nn = t1_native.ht_decode_cblk(seg, w, h, miss)
        dm, dn = dev[i]
        sig = nm > 0
        assert np.array_equal(nm, dm), \
            f"case {i} ({w}x{h}) magnitude mismatch"
        assert np.array_equal(nn[sig], dn[sig]), f"case {i} signs"


def test_decode_end_to_end_device_t1(monkeypatch):
    """Full decode with GROK_TPU_T1=device: pixel-identical to the
    native decode for lossless HT and lossy 9/7 HT."""
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import (EncoderParams,
                                                      Transform)
    rng = np.random.default_rng(31)
    d = rng.integers(0, 256, (160, 224)).astype(np.int32)
    img = Image(xsiz=224, ysiz=160, components=[
        Component(data=d, prec=8, signed=False, dx=1, dy=1)])
    for params in (EncoderParams(numresolutions=4, cblk_style=0x40),
                   EncoderParams(numresolutions=4, cblk_style=0x40,
                                 transform=Transform.DWT_97)):
        cs = encoder.encode(img, params, device=False)
        host = decoder.decode(cs)
        monkeypatch.setenv("GROK_TPU_T1", "device")
        dev = decoder.decode(cs)
        monkeypatch.delenv("GROK_TPU_T1")
        np.testing.assert_array_equal(dev.components[0].data,
                                      host.components[0].data)


def test_decode_prepass_vectorized_matches_scalar():
    """The batched numpy stream expanders must reproduce the per-lane
    scalar reference expanders bit for bit (incl. stuffing overlaps,
    the MEL last-byte nibble rule, and the VLC initial-nibble carry)."""
    from grokimagecompression_tpu.ops import ht_dec_jax as hd
    rng = np.random.default_rng(41)
    cases = []
    for i in range(8):
        mag = (rng.random((32, 32)) < rng.uniform(0.05, 0.95)) * \
            rng.integers(1, 1 << rng.integers(2, 10), (32, 32))
        cases.append((mag.astype(np.uint32),
                      (rng.random((32, 32)) < 0.5).astype(np.uint8), 10))
    cases.append((np.full((32, 32), 255, np.uint32),
                  np.ones((32, 32), np.uint8), 10))
    segs = [bytes(s) for s in t1_native.ht_encode_cblk_batch(cases)]
    lcups = [len(s) for s in segs]
    scups = [(s[-1] << 4) + (s[-2] & 0xF) for s in segs]
    wm = (8 * (max(scups) + 7)) // 32 + 4
    wm_ms = (8 * (max(lc - sc for lc, sc in zip(lcups, scups)) + 8)) \
        // 32 + 4
    mel_v = hd._prepass_mel(segs, lcups, scups, wm)
    vlc_v = hd._prepass_vlc(segs, lcups, scups, wm)
    ms_v = hd._prepass_ms(segs, lcups, scups, wm_ms)
    mel_s = hd._pack_msb([hd._mel_bits(s, sc, wm * 32)
                          for s, sc in zip(segs, scups)], wm)
    vlc_s = hd._pack_lsb([hd._vlc_bits(s, lc, sc, wm * 32)
                          for s, lc, sc in zip(segs, lcups, scups)], wm)
    ms_s = hd._pack_lsb([hd._ms_bits(s, lc, sc, wm_ms * 32)
                         for s, lc, sc in zip(segs, lcups, scups)], wm_ms)
    np.testing.assert_array_equal(mel_v, mel_s)
    np.testing.assert_array_equal(vlc_v, vlc_s)
    np.testing.assert_array_equal(ms_v, ms_s)


def test_decode_prepass_native_matches_numpy():
    """The C++ prepass (grok_ht_dec_prepass) must reproduce the numpy
    stream expanders bit for bit across content extremes, including the
    bucketed-pad regions the device fetches clamp into."""
    from grokimagecompression_tpu.ops import ht_dec_jax as hd
    rng = np.random.default_rng(43)
    cases = []
    for i in range(10):
        mag = (rng.random((64, 64)) < rng.uniform(0.02, 0.98)) * \
            rng.integers(1, 1 << rng.integers(2, 12), (64, 64))
        cases.append((mag.astype(np.uint32),
                      (rng.random((64, 64)) < 0.5).astype(np.uint8), 12))
    z = np.zeros((64, 64), np.uint32)
    cases.append((z, z.astype(np.uint8), 8))          # all-MEL stream
    cases.append((np.full((64, 64), 255, np.uint32),  # stuffing-heavy
                  np.ones((64, 64), np.uint8), 10))
    segs = [bytes(s) for s in t1_native.ht_encode_cblk_batch(cases)]
    lcups = [len(s) for s in segs]
    scups = [(s[-1] << 4) + (s[-2] & 0xF) for s in segs]
    wm_mel = hd.bucket_words((8 * (max(scups) + 7)) // 32 + 4)
    wm_vlc = wm_mel
    wm_ms = hd.bucket_words(
        (8 * (max(lc - sc for lc, sc in zip(lcups, scups)) + 8)) // 32 + 4)
    mel_n, vlc_n, ms_n = t1_native.ht_dec_prepass(
        segs, lcups, scups, wm_mel, wm_vlc, wm_ms)
    np.testing.assert_array_equal(
        mel_n, hd._prepass_mel(segs, lcups, scups, wm_mel))
    np.testing.assert_array_equal(
        vlc_n, hd._prepass_vlc(segs, lcups, scups, wm_vlc))
    np.testing.assert_array_equal(
        ms_n, hd._prepass_ms(segs, lcups, scups, wm_ms))
