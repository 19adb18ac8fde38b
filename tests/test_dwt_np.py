import numpy as np
import pytest

from grokimagecompression_tpu.core.geometry import Rect, band_rect, resolution_rect
from grokimagecompression_tpu.ops import dwt_np


@pytest.mark.parametrize("n,u0", [(8, 0), (8, 1), (7, 0), (7, 1), (2, 0), (2, 1),
                                  (1, 0), (1, 1), (3, 5), (64, 0), (65, 3)])
def test_53_line_roundtrip(n, u0):
    rng = np.random.default_rng(42 + n + u0)
    x = rng.integers(-(2 ** 15), 2 ** 15, size=(5, n)).astype(np.int32)
    lo, hi = dwt_np.fwd53_line(x, u0)
    # Sub-band sizes must match the canvas parity split.
    n_even = len([i for i in range(u0, u0 + n) if i % 2 == 0])
    assert lo.shape[-1] == n_even and hi.shape[-1] == n - n_even
    back = dwt_np.inv53_line(lo, hi, u0)
    np.testing.assert_array_equal(back, x)


def test_53_line_known_values():
    # Constant signal: highs must be exactly zero, lows must equal input.
    x = np.full((1, 16), 100, dtype=np.int32)
    lo, hi = dwt_np.fwd53_line(x, 0)
    np.testing.assert_array_equal(hi, 0)
    np.testing.assert_array_equal(lo, 100)

    # Ramp: high coefficients are zero except at the mirrored boundary.
    x = np.arange(16, dtype=np.int32)[None, :]
    lo, hi = dwt_np.fwd53_line(x, 0)
    np.testing.assert_array_equal(hi[0, :-1], 0)


@pytest.mark.parametrize("n,u0", [(8, 0), (8, 1), (7, 0), (1, 1), (2, 1), (33, 2)])
def test_97_line_roundtrip(n, u0):
    rng = np.random.default_rng(7 + n + u0)
    x = rng.normal(0, 1000, size=(4, n)).astype(np.float32)
    lo, hi = dwt_np.fwd97_line(x, u0)
    back = dwt_np.inv97_line(lo, hi, u0)
    np.testing.assert_allclose(back, x, atol=0.05)


def test_97_dc_gain():
    """Spec scaling: constant input => low band = input (DC gain 1 after 1/K)."""
    x = np.full((1, 64), 1000.0, dtype=np.float32)
    lo, hi = dwt_np.fwd97_line(x, 0)
    np.testing.assert_allclose(hi, 0, atol=1e-2)
    np.testing.assert_allclose(lo, 1000.0, rtol=1e-5)


@pytest.mark.parametrize("w,h,x0,y0,numres", [
    (512, 512, 0, 0, 6),
    (67, 41, 0, 0, 3),
    (67, 41, 3, 5, 3),
    (1, 1, 0, 0, 2),
    (5, 1, 1, 1, 2),
    (16, 16, 0, 0, 1),   # no decomposition
])
def test_53_2d_roundtrip(w, h, x0, y0, numres):
    tc = Rect(x0, y0, x0 + w, y0 + h)
    rng = np.random.default_rng(w * h)
    a = rng.integers(-(2 ** 12), 2 ** 12, size=(h, w)).astype(np.int32)
    bands = dwt_np.fwd_dwt_2d(a, tc, numres, reversible=True)
    # Band shapes must match geometry.
    nl = numres - 1
    for r in range(1, numres):
        for orient in (1, 2, 3):
            br = band_rect(tc, numres, r, orient)
            assert bands[(r, orient)].shape == (br.h, br.w)
    assert bands[(0, 0)].shape == (resolution_rect(tc, numres, 0).h,
                                   resolution_rect(tc, numres, 0).w)
    back = dwt_np.inv_dwt_2d(bands, tc, numres, reversible=True)
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize("w,h,numres", [(128, 96, 4), (37, 53, 3)])
def test_97_2d_roundtrip(w, h, numres):
    tc = Rect(0, 0, w, h)
    rng = np.random.default_rng(1)
    a = rng.normal(0, 500, size=(h, w)).astype(np.float32)
    bands = dwt_np.fwd_dwt_2d(a, tc, numres, reversible=False)
    back = dwt_np.inv_dwt_2d(bands, tc, numres, reversible=False)
    np.testing.assert_allclose(back, a, atol=0.5)


def test_53_2d_partial_reconstruction():
    """Reconstructing to a lower max_res equals the LL of that resolution."""
    tc = Rect(0, 0, 64, 64)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, size=(64, 64)).astype(np.int32)
    bands = dwt_np.fwd_dwt_2d(a, tc, 4, reversible=True)
    partial = dwt_np.inv_dwt_2d(bands, tc, 4, reversible=True, max_res=0)
    np.testing.assert_array_equal(partial, bands[(0, 0)])
