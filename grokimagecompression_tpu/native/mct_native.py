"""Fused native DC shift + reversible MCT (src/mct.cpp).

Bit-exact with ops.mct_np (pure int32 arithmetic); used by the tile
encode/decode hot path when the component planes are contiguous int32 of
identical shape.  The irreversible (ICT) path intentionally stays in
numpy — its float op order is pinned by the golden corpus.
"""

from __future__ import annotations

import numpy as np

from .t1_native import _lib, default_threads


def _ok(arrs) -> bool:
    a0 = arrs[0]
    return all(a.dtype == np.int32 and a.flags.c_contiguous
               and a.shape == a0.shape for a in arrs)


def rct_dc_fwd(r, g, b, shifts):
    """DC shift + forward RCT in one pass; returns (y, u, v) int32.
    `shifts`: per-component DC offsets (0 for signed comps)."""
    if not _ok((r, g, b)):
        return None
    n = r.size
    y = np.empty_like(r)
    u = np.empty_like(r)
    v = np.empty_like(r)
    _lib.grok_rct_fwd(r.ctypes.data, g.ctypes.data, b.ctypes.data,
                      y.ctypes.data, u.ctypes.data, v.ctypes.data,
                      n, int(shifts[0]), int(shifts[1]), int(shifts[2]),
                      default_threads())
    return y, u, v


def rct_dc_inv(y, u, v, shifts, los, his):
    """Inverse RCT + DC unshift + clamp in one pass; returns (r, g, b)."""
    if not _ok((y, u, v)):
        return None
    n = y.size
    r = np.empty_like(y)
    g = np.empty_like(y)
    b = np.empty_like(y)
    sh = np.asarray(shifts, np.int32)
    lo = np.asarray(los, np.int32)
    hi = np.asarray(his, np.int32)
    _lib.grok_rct_inv(y.ctypes.data, u.ctypes.data, v.ctypes.data,
                      r.ctypes.data, g.ctypes.data, b.ctypes.data, n,
                      sh.ctypes.data, lo.ctypes.data, hi.ctypes.data,
                      default_threads())
    return r, g, b


def dc_shift_fwd(a, prec, signed):
    """Fused copy + DC level shift (a - 2^(prec-1)); int32 in/out."""
    if signed:
        shift = 0
    else:
        shift = 1 << (prec - 1)
    if not (a.dtype == np.int32 and a.flags.c_contiguous):
        return None
    out = np.empty_like(a)
    _lib.grok_dc_unshift(a.ctypes.data, out.ctypes.data, a.size,
                         -shift, -(1 << 31), (1 << 31) - 1,
                         default_threads())
    return out


def dc_unshift(a, shift, lo, hi):
    """Fused DC unshift + clamp; returns int32 array or None."""
    if not (a.dtype == np.int32 and a.flags.c_contiguous):
        return None
    out = np.empty_like(a)
    _lib.grok_dc_unshift(a.ctypes.data, out.ctypes.data, a.size,
                         int(shift), int(lo), int(hi), default_threads())
    return out
