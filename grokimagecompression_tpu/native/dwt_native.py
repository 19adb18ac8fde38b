"""ctypes binding for the native host DWT (src/dwt.cpp), matching
ops/dwt_np.py band keying: {(r, orient): array}."""

from __future__ import annotations

from typing import Dict, Tuple

import ctypes
import numpy as np

from .t1_native import _lib
from ..core.geometry import Rect, ceil_div

for name in ("grok_dwt53_fwd", "grok_dwt53_inv", "grok_dwt97_fwd",
             "grok_dwt97_inv"):
    fn = getattr(_lib, name)
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64,
    ]

for name in ("grok_dwt_win53_axis", "grok_dwt_win97_axis"):
    fn = getattr(_lib, name)
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p,
    ]


def win_inv53_axis(lo: np.ndarray, lo_k0: int, hi: np.ndarray, hi_k0: int,
                   u0: int, n: int, c0: int, c1: int) -> np.ndarray:
    """Windowed 5/3 inverse along axis 1 (native core of
    ops/dwt_window._inv53_axis; caller handles the n==1 and empty
    cases)."""
    rows = lo.shape[0] if lo.shape[0] else hi.shape[0]
    out = np.empty((rows, c1 - c0), np.int32)
    lo = np.ascontiguousarray(lo, np.int32)
    hi = np.ascontiguousarray(hi, np.int32)
    _lib.grok_dwt_win53_axis(
        lo.ctypes.data, lo.shape[1], lo_k0,
        hi.ctypes.data, hi.shape[1], hi_k0,
        rows, u0, n, c0, c1, out.ctypes.data)
    return out


def win_inv97_axis(lo: np.ndarray, lo_k0: int, hi: np.ndarray, hi_k0: int,
                   u0: int, n: int, c0: int, c1: int) -> np.ndarray:
    rows = lo.shape[0] if lo.shape[0] else hi.shape[0]
    out = np.empty((rows, c1 - c0), np.float32)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    _lib.grok_dwt_win97_axis(
        lo.ctypes.data, lo.shape[1], lo_k0,
        hi.ctypes.data, hi.shape[1], hi_k0,
        rows, u0, n, c0, c1, out.ctypes.data)
    return out


def _level_geom(rect: Rect, levels: int):
    """Per-level (cw, ch, ne_x, no_x, ne_y, no_y) and the final LL dims."""
    cw, ch, x0, y0 = rect.w, rect.h, rect.x0, rect.y0
    out = []
    for _ in range(levels):
        fe_x = x0 if x0 % 2 == 0 else x0 + 1
        fo_x = x0 if x0 % 2 == 1 else x0 + 1
        ne_x = max(0, (x0 + cw - fe_x + 1) // 2) if cw else 0
        no_x = max(0, (x0 + cw - fo_x + 1) // 2) if cw else 0
        fe_y = y0 if y0 % 2 == 0 else y0 + 1
        fo_y = y0 if y0 % 2 == 1 else y0 + 1
        ne_y = max(0, (y0 + ch - fe_y + 1) // 2) if ch else 0
        no_y = max(0, (y0 + ch - fo_y + 1) // 2) if ch else 0
        out.append((cw, ch, ne_x, no_x, ne_y, no_y))
        cw, ch = ne_x, ne_y
        x0, y0 = ceil_div(x0, 2), ceil_div(y0, 2)
    return out, (cw, ch)


def fwd_dwt_2d(a: np.ndarray, rect: Rect, numresolutions: int,
               reversible: bool = True) -> Dict[Tuple[int, int], np.ndarray]:
    levels = numresolutions - 1
    if rect.w <= 0 or rect.h <= 0:
        # Degenerate tile-component (possible with subsampled comps or
        # hostile SIZ): numpy semantics, no native call.
        from ..ops import dwt_np
        return dwt_np.fwd_dwt_2d(a, rect, numresolutions,
                                 reversible=reversible)
    dtype = np.int32 if reversible else np.float32
    a = np.ascontiguousarray(a, dtype=dtype)
    geom, (llw, llh) = _level_geom(rect, levels)
    offs = np.zeros(max(1, levels * 3), dtype=np.int64)
    total = 0
    shapes = []
    for lev, (cw, ch, ne_x, no_x, ne_y, no_y) in enumerate(geom):
        for bi, (bh, bw) in enumerate([(ne_y, no_x), (no_y, ne_x),
                                       (no_y, no_x)]):
            offs[lev * 3 + bi] = total
            shapes.append((bh, bw))
            total += bh * bw
    ll_off = total
    total += llw * llh
    # fully overwritten by the native call (bands + LL tile the buffer)
    flat = np.empty(max(1, total), dtype=dtype)
    fn = _lib.grok_dwt53_fwd if reversible else _lib.grok_dwt97_fwd
    fn(a.ctypes.data, rect.w, rect.h, rect.x0, rect.y0, levels,
       flat.ctypes.data, offs.ctypes.data, ll_off)
    bands: Dict[Tuple[int, int], np.ndarray] = {}
    for lev in range(levels):
        r = levels - lev
        for bi, orient in enumerate((1, 2, 3)):
            bh, bw = shapes[lev * 3 + bi]
            o = int(offs[lev * 3 + bi])
            bands[(r, orient)] = flat[o:o + bh * bw].reshape(bh, bw)
    bands[(0, 0)] = flat[ll_off:ll_off + llw * llh].reshape(llh, llw)
    return bands


def inv_dwt_2d(bands: Dict[Tuple[int, int], np.ndarray], rect: Rect,
               numresolutions: int, reversible: bool = True,
               max_res=None) -> np.ndarray:
    levels = numresolutions - 1
    if rect.w <= 0 or rect.h <= 0:
        from ..ops import dwt_np
        return dwt_np.inv_dwt_2d(bands, rect, numresolutions,
                                 reversible=reversible, max_res=max_res)
    if max_res is not None and max_res < levels:
        # Partial reconstruction falls back to the numpy reference.
        from ..ops import dwt_np
        return dwt_np.inv_dwt_2d(bands, rect, numresolutions,
                                 reversible=reversible, max_res=max_res)
    dtype = np.int32 if reversible else np.float32
    geom, (llw, llh) = _level_geom(rect, levels)
    offs = np.zeros(max(1, levels * 3), dtype=np.int64)
    total = 0
    for lev, (cw, ch, ne_x, no_x, ne_y, no_y) in enumerate(geom):
        for bi, (bh, bw) in enumerate([(ne_y, no_x), (no_y, ne_x),
                                       (no_y, no_x)]):
            offs[lev * 3 + bi] = total
            total += bh * bw
    ll_off = total
    total += llw * llh
    flat = np.empty(max(1, total), dtype=dtype)
    for lev in range(levels):
        r = levels - lev
        for bi, orient in enumerate((1, 2, 3)):
            arr = np.ascontiguousarray(bands[(r, orient)], dtype=dtype)
            o = int(offs[lev * 3 + bi])
            flat[o:o + arr.size] = arr.ravel()
    ll = np.ascontiguousarray(bands[(0, 0)], dtype=dtype)
    flat[ll_off:ll_off + ll.size] = ll.ravel()
    out = np.empty((rect.h, rect.w), dtype=dtype)
    fn = _lib.grok_dwt53_inv if reversible else _lib.grok_dwt97_inv
    fn(out.ctypes.data, rect.w, rect.h, rect.x0, rect.y0, levels,
       flat.ctypes.data, offs.ctypes.data, ll_off)
    return out


def alloc_inv_bands(rect: Rect, numresolutions: int, reversible: bool):
    """Pre-allocate the packed inverse-DWT input buffer and return band
    VIEWS into it keyed {(r, orient): array}. A T1 decode that scatters
    into these views fills the packed buffer in place, so
    inv_dwt_2d_packed needs no copy pass. Returns
    (flat, views, offs, ll_off) or None for degenerate rects."""
    levels = numresolutions - 1
    if rect.w <= 0 or rect.h <= 0 or levels < 0:
        return None
    dtype = np.int32 if reversible else np.float32
    geom, (llw, llh) = _level_geom(rect, levels)
    offs = np.zeros(max(1, levels * 3), dtype=np.int64)
    total = 0
    shapes = []
    for lev, (cw, ch, ne_x, no_x, ne_y, no_y) in enumerate(geom):
        for bi, (bh, bw) in enumerate([(ne_y, no_x), (no_y, ne_x),
                                       (no_y, no_x)]):
            offs[lev * 3 + bi] = total
            shapes.append((bh, bw))
            total += bh * bw
    ll_off = total
    total += llw * llh
    flat = np.zeros(max(1, total), dtype=dtype)
    views = {}
    for lev in range(levels):
        r = levels - lev
        for bi, orient in enumerate((1, 2, 3)):
            bh, bw = shapes[lev * 3 + bi]
            o = int(offs[lev * 3 + bi])
            views[(r, orient)] = flat[o:o + bh * bw].reshape(bh, bw)
    views[(0, 0)] = flat[ll_off:ll_off + llw * llh].reshape(llh, llw)
    return flat, views, offs, ll_off


def inv_dwt_2d_packed(flat: np.ndarray, offs: np.ndarray, ll_off: int,
                      rect: Rect, numresolutions: int,
                      reversible: bool = True) -> np.ndarray:
    """Full inverse DWT over an alloc_inv_bands buffer (no band copies)."""
    levels = numresolutions - 1
    dtype = np.int32 if reversible else np.float32
    out = np.empty((rect.h, rect.w), dtype=dtype)
    fn = _lib.grok_dwt53_inv if reversible else _lib.grok_dwt97_inv
    fn(out.ctypes.data, rect.w, rect.h, rect.x0, rect.y0, levels,
       flat.ctypes.data, offs.ctypes.data, ll_off)
    return out
