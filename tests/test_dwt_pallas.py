"""Pallas fused 5/3 DWT kernel vs the numpy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from grokimagecompression_tpu.core.geometry import Rect
from grokimagecompression_tpu.ops import dwt_np, dwt_pallas

INTERPRET = True

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("shape", [(64, 64), (48, 80), (37, 53), (130, 66)])
@pytest.mark.parametrize("numres", [2, 3])
def test_fused_fwd_matches_numpy(shape, numres):
    h, w = shape
    rect = Rect(0, 0, w, h)
    if not dwt_pallas.supports(rect, numres):
        pytest.skip("geometry outside kernel scope")
    x = RNG.integers(-(1 << 12), 1 << 12, size=(2, h, w), dtype=np.int32)
    bands = dwt_pallas.fwd_dwt_2d(x, rect, numres, interpret=True)
    for i in range(2):
        ref = dwt_np.fwd_dwt_2d(x[i], rect, numres, reversible=True)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(bands[k])[i], ref[k],
                                          err_msg=f"{k} shape={shape}")


def test_multilevel_roundtrip():
    h, w = 96, 128
    numres = 4
    rect = Rect(0, 0, w, h)
    assert dwt_pallas.supports(rect, numres)
    x = RNG.integers(-(1 << 10), 1 << 10, size=(2, h, w), dtype=np.int32)
    bands = dwt_pallas.fwd_dwt_2d(x, rect, numres, interpret=True)
    for i in range(2):
        ref = dwt_np.fwd_dwt_2d(x[i], rect, numres, reversible=True)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(bands[k])[i], ref[k],
                                          err_msg=str(k))
    back = dwt_pallas.inv_dwt_2d(bands, rect, numres, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_deep_levels():
    h = w = 64
    numres = 6
    rect = Rect(0, 0, w, h)
    assert dwt_pallas.supports(rect, numres)
    x = RNG.integers(-(1 << 8), 1 << 8, size=(1, h, w), dtype=np.int32)
    bands = dwt_pallas.fwd_dwt_2d(x, rect, numres, interpret=True)
    ref = dwt_np.fwd_dwt_2d(x[0], rect, numres, reversible=True)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(bands[k])[0], ref[k],
                                      err_msg=str(k))


def test_supports():
    assert dwt_pallas.supports(Rect(0, 0, 64, 64), 5)
    assert dwt_pallas.supports(Rect(1, 0, 64, 64), 2)       # odd origin ok
    assert not dwt_pallas.supports(Rect(0, 0, 8, 8), 5)     # too deep
    # striped path is in scope for any size
    assert dwt_pallas.supports(Rect(0, 0, 4096, 4096), 6)


@pytest.mark.parametrize("origin", [(1, 0), (0, 3), (5, 7), (2, 6)])
@pytest.mark.parametrize("numres", [2, 3])
def test_odd_origin_matches_numpy(origin, numres):
    """Canvas-coordinate parity handling: tiles at odd/unaligned origins
    are bit-exact with the oracle (interior tiles of offset grids)."""
    x0, y0 = origin
    h, w = 45, 62
    rect = Rect(x0, y0, x0 + w, y0 + h)
    assert dwt_pallas.supports(rect, numres)
    x = RNG.integers(-(1 << 12), 1 << 12, size=(1, h, w), dtype=np.int32)
    bands = dwt_pallas.fwd_dwt_2d(x, rect, numres, interpret=True)
    ref = dwt_np.fwd_dwt_2d(x[0], rect, numres, reversible=True)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(bands[k])[0], ref[k],
                                      err_msg=f"{k} origin={origin}")
    back = dwt_pallas.inv_dwt_2d(bands, rect, numres, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_striped_matches_whole(monkeypatch):
    """The halo-striped grid is bit-exact with the whole-tile kernel
    (forced by shrinking the VMEM budget so a small tile stripes)."""
    h, w = 160, 220
    numres = 4
    rect = Rect(0, 0, w, h)
    x = RNG.integers(-(1 << 12), 1 << 12, size=(1, h, w), dtype=np.int32)
    ref = dwt_np.fwd_dwt_2d(x[0], rect, numres, reversible=True)
    monkeypatch.setattr(dwt_pallas, "WHOLE_TILE_MAX_BYTES", 1024)
    monkeypatch.setattr(dwt_pallas, "STRIP_BH", 64)
    monkeypatch.setattr(dwt_pallas, "STRIP_BW", 128)
    bands = dwt_pallas.fwd_dwt_2d(x, rect, numres, interpret=True)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(bands[k])[0], ref[k],
                                      err_msg=str(k))
    back = dwt_pallas.inv_dwt_2d(bands, rect, numres, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_striped_97_matches_whole(monkeypatch):
    """9/7 striped: identical to the whole-tile kernel (same float op
    order per sample — halo junk never reaches an interior write)."""
    h, w = 144, 200
    numres = 3
    rect = Rect(0, 0, w, h)
    a = RNG.integers(-500, 500, (1, h, w)).astype(np.float32)
    whole = dwt_pallas.fwd_dwt_2d(a, rect, numres, interpret=True,
                                  reversible=False)
    monkeypatch.setattr(dwt_pallas, "WHOLE_TILE_MAX_BYTES", 1024)
    monkeypatch.setattr(dwt_pallas, "STRIP_BH", 64)
    monkeypatch.setattr(dwt_pallas, "STRIP_BW", 128)
    striped = dwt_pallas.fwd_dwt_2d(a, rect, numres, interpret=True,
                                    reversible=False)
    for k in whole:
        np.testing.assert_array_equal(np.asarray(striped[k]),
                                      np.asarray(whole[k]), err_msg=str(k))


@pytest.mark.parametrize("shape,nres", [((64, 64), 4), ((128, 96), 5)])
def test_pallas_97_vs_oracle(shape, nres):
    """Fused 9/7 kernel matches the numpy oracle within float tolerance
    (9/7 is float; op-order/FMA differences are expected — conformance
    is PSNR-based, SURVEY §7 hard part d)."""
    h, w = shape
    rng = np.random.default_rng(h + w)
    a = rng.integers(-500, 500, (2, h, w)).astype(np.float32)
    tc = Rect(0, 0, w, h)
    bands = dwt_pallas.fwd_dwt_2d(jnp.asarray(a), tc, nres,
                                  interpret=INTERPRET, reversible=False)
    ref = dwt_np.fwd_dwt_2d(a[0].copy(), tc, nres, reversible=False)
    for k in ref:
        np.testing.assert_allclose(np.asarray(bands[k][0]), ref[k],
                                   atol=1e-2)
    rec = dwt_pallas.inv_dwt_2d(bands, tc, nres, interpret=INTERPRET,
                                reversible=False)
    np.testing.assert_allclose(np.asarray(rec[0]), a[0], atol=0.1)
    np.testing.assert_allclose(np.asarray(rec[1]), a[1], atol=0.1)
