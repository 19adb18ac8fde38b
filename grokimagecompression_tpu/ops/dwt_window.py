"""Windowed (partial) multi-level inverse DWT: reconstruct only a
window of the tile-component, reading band coefficients on demand —
O(window) work and memory instead of O(tile).

This is the TPU-native analog of the reference's partial decode
(reference: src/lib/jp2/transform/dwt.cpp decode_partial_tile,
get_band_coordinates:1131, segment_grow:1172), re-derived as vectorized
reflect-gather lifting on cropped packed arrays rather than a
translation of its sample-by-sample template code.

The per-element arithmetic (and float operation order for 9/7) is
identical to the full-frame kernels, so a windowed decode is bit-exact
with the crop of a full decode.

`fetch(r, orient, x0, y0, x1, y1)` supplies band-local coefficient
rectangles (zero-padded beyond the band); ``(0, 0)`` is the LL band.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

from ..core.geometry import Rect, ceil_div


def _native():
    """Native axis kernels (native/src/dwt.cpp grok_dwt_win53_axis /
    grok_dwt_win97_axis) — bit/float-exact with the numpy fallbacks
    below; GROK_TPU_DWT=python forces numpy."""
    global _NAT, _NAT_CHECKED
    if _NAT_CHECKED:
        return _NAT
    _NAT_CHECKED = True
    import os
    if os.environ.get("GROK_TPU_DWT", "") == "python":
        _NAT = None
        return None
    try:
        from ..native import dwt_native as _NAT_mod
        _NAT = _NAT_mod
    except Exception:
        _NAT = None
    return _NAT


_NAT = None
_NAT_CHECKED = False

K = 1.230174104914001
ALPHA = np.float32(-1.586134342059924)
BETA = np.float32(-0.052980118572961)
GAMMA = np.float32(0.882911075530934)
DELTA = np.float32(0.443506852043971)
K_F = np.float32(K)
TWO_OVER_K = np.float32(2.0 / K)

PAD53 = 2   # packed-index margin per level (5/3 lifting reach)
PAD97 = 4   # 9/7: four lifting passes, one packed neighbor each


def _parity(u0: int, n: int):
    fe = u0 + 1 if (u0 & 1) else u0
    fo = u0 if (u0 & 1) else u0 + 1
    ne = (u0 + n - fe + 1) // 2 if n > 0 else 0
    no = (u0 + n - fo + 1) // 2 if n > 0 else 0
    return fe, fo, ne, no


def _reflect(i: np.ndarray, u0: int, u1: int) -> np.ndarray:
    n = u1 - u0
    if n == 1:
        return np.full_like(i, u0)
    period = 2 * (n - 1)
    j = np.mod(i - u0, period)
    j = np.where(j >= n, period - j, j)
    return u0 + j


def _ranges(u0: int, n: int, c0: int, c1: int, pad: int):
    """Packed even/odd index ranges needed to produce canvas [c0, c1),
    grown by `pad` packed entries per side (clipped)."""
    fe, fo, ne, no = _parity(u0, n)
    g0, g1 = max(u0, c0 - 1), min(u0 + n, c1 + 1)
    e0 = max(0, (g0 - fe + 1) // 2)
    e1 = min(ne, (g1 - 1 - fe) // 2 + 1) if g1 > g0 else e0
    o0 = max(0, (g0 - fo + 1) // 2)
    o1 = min(no, (g1 - 1 - fo) // 2 + 1) if g1 > g0 else o0
    e0, e1 = max(0, e0 - pad), min(ne, e1 + pad)
    o0, o1 = max(0, o0 - pad), min(no, o1 + pad)
    if e1 < e0:
        e1 = e0
    if o1 < o0:
        o1 = o0
    return e0, e1, o0, o1


def _take(a: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Column gather with clipping (out-of-crop neighbors only occur in
    the sacrificial margin, whose values are never used)."""
    if a.shape[1] == 0:
        return np.zeros((a.shape[0], len(idx)), dtype=a.dtype)
    return a[:, np.clip(idx, 0, a.shape[1] - 1)]


def _inv53_axis(lo: np.ndarray, lo_k0: int, hi: np.ndarray, hi_k0: int,
                u0: int, n: int, c0: int, c1: int) -> np.ndarray:
    """5/3 inverse along axis 1. lo/hi are packed crops starting at
    lo_k0/hi_k0; returns canvas columns [c0, c1) (clipped to the
    segment) for every row."""
    c0 = max(c0, u0)
    c1 = min(c1, u0 + n)
    rows = lo.shape[0] if lo.shape[0] else hi.shape[0]
    if c1 <= c0:
        return np.zeros((rows, 0), dtype=lo.dtype if lo.size else hi.dtype)
    if n == 1:
        v = (hi[:, :1] >> 1) if (u0 & 1) else lo[:, :1]
        return np.repeat(v, c1 - c0, axis=1)
    nat = _native()
    if nat is not None and lo.shape[1] and hi.shape[1]:
        return nat.win_inv53_axis(lo, lo_k0, hi, hi_k0, u0, n, c0, c1)
    fe, fo, ne, no = _parity(u0, n)
    u1 = u0 + n
    # evens covering [c0-1, c1+1)
    ge0, ge1 = max(u0, c0 - 1), min(u1, c1 + 1)
    e0 = max(0, (ge0 - fe + 1) // 2)
    e1 = min(ne, (ge1 - 1 - fe) // 2 + 1)
    ks = np.arange(e0, e1)
    pos = fe + 2 * ks
    l = (_reflect(pos - 1, u0, u1) - fo) >> 1
    r = (_reflect(pos + 1, u0, u1) - fo) >> 1
    xe = _take(lo, ks - lo_k0) - ((_take(hi, l - hi_k0)
                                   + _take(hi, r - hi_k0) + 2) >> 2)
    # odds in [c0, c1)
    o0 = max(0, (c0 - fo + 1) // 2)
    o1 = min(no, (c1 - 1 - fo) // 2 + 1)
    ko = np.arange(o0, o1)
    pos_o = fo + 2 * ko
    le = (_reflect(pos_o - 1, u0, u1) - fe) >> 1
    re = (_reflect(pos_o + 1, u0, u1) - fe) >> 1
    od = _take(hi, ko - hi_k0) + ((_take(xe, le - e0)
                                   + _take(xe, re - e0)) >> 1)
    out = np.empty((xe.shape[0], c1 - c0), dtype=xe.dtype)
    ev_pos = pos[(pos >= c0) & (pos < c1)]
    out[:, ev_pos - c0] = xe[:, (ev_pos - fe) // 2 - e0]
    if len(ko):
        out[:, pos_o - c0] = od
    return out


def _inv97_axis(lo: np.ndarray, lo_k0: int, hi: np.ndarray, hi_k0: int,
                u0: int, n: int, c0: int, c1: int) -> np.ndarray:
    """9/7 inverse along axis 1 (float32), same contract as
    _inv53_axis. The four lifting passes run over the full crops; only
    entries far enough from the crop edge are valid, guaranteed by the
    caller's PAD97 fetch margin."""
    c0 = max(c0, u0)
    c1 = min(c1, u0 + n)
    rows = lo.shape[0] if lo.shape[0] else hi.shape[0]
    if c1 <= c0:
        return np.zeros((rows, 0), dtype=np.float32)
    if n == 1:
        v = hi[:, :1] * TWO_OVER_K if (u0 & 1) else lo[:, :1] * K_F
        return np.repeat(v, c1 - c0, axis=1)
    nat = _native()
    if nat is not None and lo.shape[1] and hi.shape[1]:
        return nat.win_inv97_axis(lo.astype(np.float32, copy=False),
                                  lo_k0,
                                  hi.astype(np.float32, copy=False),
                                  hi_k0, u0, n, c0, c1)
    fe, fo, ne, no = _parity(u0, n)
    u1 = u0 + n
    ev = lo.astype(np.float32) * K_F
    od = hi.astype(np.float32) * TWO_OVER_K
    ev_ks = np.arange(lo_k0, lo_k0 + ev.shape[1])
    od_ks = np.arange(hi_k0, hi_k0 + od.shape[1])
    ev_pos = fe + 2 * ev_ks
    od_pos = fo + 2 * od_ks

    def nbrs(pos, other_first):
        a = (_reflect(pos - 1, u0, u1) - other_first) >> 1
        b = (_reflect(pos + 1, u0, u1) - other_first) >> 1
        return a, b

    for coef, target in ((DELTA, "e"), (GAMMA, "o"), (BETA, "e"),
                         (ALPHA, "o")):
        if target == "e":
            a, b = nbrs(ev_pos, fo)
            ev = ev - coef * (_take(od, a - hi_k0) + _take(od, b - hi_k0))
        else:
            a, b = nbrs(od_pos, fe)
            od = od - coef * (_take(ev, a - lo_k0) + _take(ev, b - lo_k0))

    out = np.empty((ev.shape[0], c1 - c0), dtype=np.float32)
    sel_e = (ev_pos >= c0) & (ev_pos < c1)
    out[:, ev_pos[sel_e] - c0] = ev[:, sel_e]
    sel_o = (od_pos >= c0) & (od_pos < c1)
    out[:, od_pos[sel_o] - c0] = od[:, sel_o]
    return out


def inv_dwt_2d_window(fetch: Callable[..., np.ndarray], rect: Rect,
                      numresolutions: int, window: Rect,
                      reversible: bool = True,
                      max_res: int = None) -> Tuple[np.ndarray, int, int]:
    """Reconstruct `window` (canvas coords on the level-`reduce` grid
    when max_res < levels, else the full-resolution grid).

    Returns (array, x0, y0): the reconstructed window and its canvas
    origin on the output grid (the window clipped to the grid).
    """
    levels = numresolutions - 1
    if max_res is None:
        max_res = levels
    reduce = levels - max_res
    pad = PAD53 if reversible else PAD97
    inv_axis = _inv53_axis if reversible else _inv97_axis
    dtype = np.int32 if reversible else np.float32

    # per-level grid geometry (origin, size) — mirrors the forward
    xs = [rect.x0]
    ys = [rect.y0]
    ws = [rect.w]
    hs = [rect.h]
    for _ in range(levels):
        fex, _, nex, _ = _parity(xs[-1], ws[-1])
        fey, _, ney, _ = _parity(ys[-1], hs[-1])
        ws.append(nex if ws[-1] > 0 else 0)
        hs.append(ney if hs[-1] > 0 else 0)
        xs.append(ceil_div(xs[-1], 2))
        ys.append(ceil_div(ys[-1], 2))

    def rec(lev: int, cx0: int, cy0: int, cx1: int, cy1: int) -> np.ndarray:
        """Array covering canvas [cx0,cx1) x [cy0,cy1) (already clipped)
        at the level-`lev` grid."""
        if lev == levels:
            a = fetch(0, 0, cx0 - xs[levels], cy0 - ys[levels],
                      cx1 - xs[levels], cy1 - ys[levels])
            return a.astype(dtype, copy=False)
        u0x, nx = xs[lev], ws[lev]
        u0y, ny = ys[lev], hs[lev]
        r = levels - lev
        # packed row/col fetch ranges
        ex0, ex1, ox0, ox1 = _ranges(u0x, nx, cx0, cx1, pad)
        ey0, ey1, oy0, oy1 = _ranges(u0y, ny, cy0, cy1, pad)
        ll = rec(lev + 1, xs[lev + 1] + ex0, ys[lev + 1] + ey0,
                 xs[lev + 1] + ex1, ys[lev + 1] + ey1)
        hl = fetch(r, 1, ox0, ey0, ox1, ey1).astype(dtype, copy=False)
        lh = fetch(r, 2, ex0, oy0, ex1, oy1).astype(dtype, copy=False)
        hh = fetch(r, 3, ox0, oy0, ox1, oy1).astype(dtype, copy=False)
        # horizontal inverse: top rows (vlo) and bottom rows (vhi)
        top = inv_axis(ll, ex0, hl, ox0, u0x, nx, cx0, cx1)
        bot = inv_axis(lh, ex0, hh, ox0, u0x, nx, cx0, cx1)
        # vertical inverse: operate along rows via transpose
        out_t = inv_axis(np.ascontiguousarray(top.T), ey0,
                         np.ascontiguousarray(bot.T), oy0,
                         u0y, ny, cy0, cy1)
        return np.ascontiguousarray(out_t.T)

    # window on the output (level-`reduce`) grid
    wx0 = max(xs[reduce], ceil_div(window.x0, 1 << reduce))
    wy0 = max(ys[reduce], ceil_div(window.y0, 1 << reduce))
    wx1 = min(xs[reduce] + ws[reduce], ceil_div(window.x1, 1 << reduce))
    wy1 = min(ys[reduce] + hs[reduce], ceil_div(window.y1, 1 << reduce))
    if wx1 <= wx0 or wy1 <= wy0:
        return np.zeros((0, 0), dtype=dtype), wx0, wy0
    return rec(reduce, wx0, wy0, wx1, wy1), wx0, wy0
