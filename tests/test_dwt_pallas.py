"""Pallas fused 5/3 DWT kernel vs the numpy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from grokimagecompression_tpu.core.geometry import Rect
from grokimagecompression_tpu.ops import dwt_np, dwt_pallas

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
    assert not dwt_pallas.supports(Rect(1, 0, 64, 64), 2)   # odd origin
    assert not dwt_pallas.supports(Rect(0, 0, 8, 8), 5)     # too deep
