"""Device (JAX) DWT and pipeline vs the numpy bit-exact oracle."""

import numpy as np
import pytest

from grokimagecompression_tpu.core.geometry import Rect
from grokimagecompression_tpu.core.image import Image, Component
from grokimagecompression_tpu.core.params import EncoderParams, Transform
from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.models import pipeline
from grokimagecompression_tpu.ops import dwt_jax, dwt_np

RNG = np.random.default_rng(7)

RECTS = [
    Rect(0, 0, 64, 64),
    Rect(0, 0, 37, 53),
    Rect(3, 5, 70, 61),     # odd origin parity
    Rect(1, 1, 2, 2),       # tiny
    Rect(5, 2, 6, 40),      # 1-wide
]


@pytest.mark.parametrize("rect", RECTS)
@pytest.mark.parametrize("numres", [1, 2, 3, 6])
def test_fwd53_matches_numpy(rect, numres):
    a = RNG.integers(-(1 << 10), 1 << 10, size=(rect.h, rect.w),
                     dtype=np.int32)
    ref = dwt_np.fwd_dwt_2d(a, rect, numres, reversible=True)
    dev = dwt_jax.fwd_dwt_2d(np.asarray(a), rect, numres, reversible=True)
    assert set(ref.keys()) == set(dev.keys())
    for k in ref:
        np.testing.assert_array_equal(ref[k], np.asarray(dev[k]), err_msg=str(k))


@pytest.mark.parametrize("rect", RECTS)
@pytest.mark.parametrize("numres", [2, 5])
def test_inv53_roundtrip(rect, numres):
    a = RNG.integers(-(1 << 12), 1 << 12, size=(rect.h, rect.w),
                     dtype=np.int32)
    bands = dwt_jax.fwd_dwt_2d(np.asarray(a), rect, numres, reversible=True)
    rec = dwt_jax.inv_dwt_2d(bands, rect, numres, reversible=True)
    np.testing.assert_array_equal(a, np.asarray(rec))


@pytest.mark.parametrize("rect", RECTS)
def test_97_matches_numpy(rect):
    numres = 3
    a = RNG.integers(-128, 128, size=(rect.h, rect.w)).astype(np.float32)
    ref = dwt_np.fwd_dwt_2d(a, rect, numres, reversible=False)
    dev = dwt_jax.fwd_dwt_2d(np.asarray(a), rect, numres, reversible=False)
    for k in ref:
        np.testing.assert_allclose(ref[k], np.asarray(dev[k]), rtol=1e-5,
                                   atol=1e-3, err_msg=str(k))
    rec = dwt_jax.inv_dwt_2d(dev, rect, numres, reversible=False)
    np.testing.assert_allclose(a, np.asarray(rec), atol=1e-2)


def test_batched_dwt():
    rect = Rect(0, 0, 32, 48)
    a = RNG.integers(-1000, 1000, size=(4, rect.h, rect.w), dtype=np.int32)
    dev = dwt_jax.fwd_dwt_2d(np.asarray(a), rect, 3, reversible=True)
    for i in range(4):
        ref = dwt_np.fwd_dwt_2d(a[i], rect, 3, reversible=True)
        for k in ref:
            np.testing.assert_array_equal(ref[k], np.asarray(dev[k][i]))


def _make_image(w, h, ncomps, prec=8, seed=0):
    rng = np.random.default_rng(seed)
    comps = [
        Component(data=rng.integers(0, 1 << prec, size=(h, w),
                                    dtype=np.int32),
                  prec=prec, signed=False, dx=1, dy=1)
        for _ in range(ncomps)
    ]
    return Image(xsiz=w, ysiz=h, components=comps)


def test_device_encode_matches_host_lossless():
    img = _make_image(96, 80, 3, seed=3)
    params = EncoderParams(numresolutions=4)
    host = encoder.encode(img, params, device=False)
    dev = encoder.encode(img, params, device=True)
    assert host == dev
    out = decoder.decode(dev)
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data,
                                      img.components[c].data)


def test_device_encode_lossy_roundtrip():
    img = _make_image(64, 64, 1, seed=5)
    params = EncoderParams(numresolutions=3, transform=Transform.DWT_97)
    dev = encoder.encode(img, params, device=True)
    out = decoder.decode(dev)
    err = (out.components[0].data.astype(np.float64)
           - img.components[0].data)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert rmse < 2.0


def test_device_inv_pipeline_roundtrip():
    """Forward on device + inverse on device reproduces input (lossless)."""
    img = _make_image(70, 42, 3, seed=9)
    from grokimagecompression_tpu.codestream.encoder import build_cod, build_siz
    params = EncoderParams(numresolutions=4)
    siz = build_siz(img, params)
    cod = build_cod(img, params)
    tile = Rect(0, 0, 70, 42)
    cfg = pipeline.config_for_tile(siz, cod, tile)
    comps = [c.data for c in img.components]
    bands = pipeline.device_fwd_bands(comps, cfg)
    rec = pipeline.device_inv_comps(bands, cfg)
    for c in range(3):
        np.testing.assert_array_equal(rec[c], comps[c])
