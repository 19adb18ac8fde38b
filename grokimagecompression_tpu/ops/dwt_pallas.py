"""Pallas TPU kernel for the 5/3 DWT: all decomposition levels fused in one
kernel, batched over tiles.

TPU-native formulation: Mosaic supports neither strided slices nor
sub-128-lane reshapes inside kernels, so instead of compacting even/odd
samples per level (the CPU-style layout, reference:
src/lib/jp2/transform/WaveletForward.h deinterleave_h/v), the kernel runs
**in-place masked lifting**: level `lev` updates rows/columns at stride
2^lev using shifted copies (contiguous slices + concat) and parity masks
from iota — every op is elementwise or a transpose, all of it in VMEM.
HBM traffic is one read + one write of the tile for the entire multi-level
transform.  The final interleaved->subband deinterleave (a strided gather)
runs outside the kernel in XLA where strided slicing is free.

Scope: even canvas origin and >= 2 active samples per axis per level
(`supports()`); other geometries use ops/dwt_jax.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_up(x, s):
    """up[i] = x[i+s] along axis 0 (tail rows hold junk, masked off)."""
    return jnp.concatenate([x[s:, :], x[-s:, :]], axis=0)


def _shift_down(x, s):
    """down[i] = x[i-s] along axis 0 (head rows hold junk, masked off)."""
    return jnp.concatenate([x[:s, :], x[:-s, :]], axis=0)


def _fwd_lift_axis0(x, lev: int):
    """One forward 5/3 lifting level along axis 0, in place at stride
    2^lev, with symmetric extension at the active-sample boundaries."""
    hgt = x.shape[0]
    s = 1 << lev
    n_act = -(-hgt // s)          # ceil: active rows 0, s, 2s, ...
    if n_act < 2:
        return x
    m = 2 * s
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    active_col = (col % s) == 0      # only this level's samples change
    odd_mask = ((row % m) == s) & active_col
    even_mask = ((row % m) == 0) & active_col
    k_last = n_act - 1
    last_row = k_last * s

    up = _shift_up(x, s)
    down = _shift_down(x, s)
    # Odd update (high): left always exists; right reflects if the last
    # active sample is odd-indexed.
    if k_last % 2 == 1:
        right = jnp.where(row == last_row, down, up)
    else:
        right = up
    high = x - ((down + right) >> 1)
    x = jnp.where(odd_mask, high, x)

    up = _shift_up(x, s)
    down = _shift_down(x, s)
    # Even update (low): left reflects at row 0; right reflects if the last
    # active sample is even-indexed.
    left = jnp.where(row == 0, up, down)
    if k_last % 2 == 0:
        right = jnp.where(row == last_row, down, up)
    else:
        right = up
    low = x + ((left + right + 2) >> 2)
    return jnp.where(even_mask, low, x)


def _inv_lift_axis0(x, lev: int):
    """Inverse of _fwd_lift_axis0."""
    hgt = x.shape[0]
    s = 1 << lev
    n_act = -(-hgt // s)
    if n_act < 2:
        return x
    m = 2 * s
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    active_col = (col % s) == 0
    odd_mask = ((row % m) == s) & active_col
    even_mask = ((row % m) == 0) & active_col
    k_last = n_act - 1
    last_row = k_last * s

    up = _shift_up(x, s)
    down = _shift_down(x, s)
    left = jnp.where(row == 0, up, down)
    if k_last % 2 == 0:
        right = jnp.where(row == last_row, down, up)
    else:
        right = up
    xe = x - ((left + right + 2) >> 2)
    x = jnp.where(even_mask, xe, x)

    up = _shift_up(x, s)
    down = _shift_down(x, s)
    if k_last % 2 == 1:
        right = jnp.where(row == last_row, down, up)
    else:
        right = up
    xo = x + ((down + right) >> 1)
    return jnp.where(odd_mask, xo, x)


import numpy as _np

# numpy scalars (not traced jnp constants — Pallas kernels cannot capture
# device arrays) with float32 weak typing.
ALPHA = _np.float32(-1.586134342059924)
BETA = _np.float32(-0.052980118572961)
GAMMA = _np.float32(0.882911075530934)
DELTA = _np.float32(0.443506852043971)
_K = 1.230174104914001
INV_K = _np.float32(1.0 / _K)
K_HALF = _np.float32(_K / 2.0)
K_F = _np.float32(_K)
TWO_OVER_K = _np.float32(2.0 / _K)


def _nbr_masks(x, lev: int):
    """Shared mask/boundary machinery for one lifting level."""
    hgt = x.shape[0]
    s = 1 << lev
    n_act = -(-hgt // s)
    m = 2 * s
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    active_col = (col % s) == 0
    odd_mask = ((row % m) == s) & active_col
    even_mask = ((row % m) == 0) & active_col
    k_last = n_act - 1
    last_row = k_last * s
    return s, n_act, row, odd_mask, even_mask, k_last, last_row


def _odd_nbrs(x, s, row, k_last, last_row):
    """(left, right) even neighbors for the odd update, with reflection."""
    up = _shift_up(x, s)
    down = _shift_down(x, s)
    if k_last % 2 == 1:
        right = jnp.where(row == last_row, down, up)
    else:
        right = up
    return down, right


def _even_nbrs(x, s, row, k_last, last_row):
    """(left, right) odd neighbors for the even update, with reflection."""
    up = _shift_up(x, s)
    down = _shift_down(x, s)
    left = jnp.where(row == 0, up, down)
    if k_last % 2 == 0:
        right = jnp.where(row == last_row, down, up)
    else:
        right = up
    return left, right


def _fwd_lift97_axis0(x, lev: int):
    """One forward 9/7 level along axis 0 (float32), masked in place:
    alpha/beta/gamma/delta lifting then the K scaling, arithmetic-order
    identical to the numpy oracle."""
    geo = _nbr_masks(x, lev)
    s, n_act, row, odd_mask, even_mask, k_last, last_row = geo
    if n_act < 2:
        return x
    for coef, odd_step in ((ALPHA, True), (BETA, False), (GAMMA, True),
                           (DELTA, False)):
        if odd_step:
            l, r = _odd_nbrs(x, s, row, k_last, last_row)
            x = jnp.where(odd_mask, x + coef * (l + r), x)
        else:
            l, r = _even_nbrs(x, s, row, k_last, last_row)
            x = jnp.where(even_mask, x + coef * (l + r), x)
    return jnp.where(even_mask, x * INV_K,
                     jnp.where(odd_mask, x * K_HALF, x))


def _inv_lift97_axis0(x, lev: int):
    geo = _nbr_masks(x, lev)
    s, n_act, row, odd_mask, even_mask, k_last, last_row = geo
    if n_act < 2:
        return x
    x = jnp.where(even_mask, x * K_F,
                  jnp.where(odd_mask, x * TWO_OVER_K, x))
    for coef, odd_step in ((DELTA, False), (GAMMA, True), (BETA, False),
                           (ALPHA, True)):
        if odd_step:
            l, r = _odd_nbrs(x, s, row, k_last, last_row)
            x = jnp.where(odd_mask, x - coef * (l + r), x)
        else:
            l, r = _even_nbrs(x, s, row, k_last, last_row)
            x = jnp.where(even_mask, x - coef * (l + r), x)
    return x


def _fwd_kernel97(nlevels: int, x_ref, out_ref):
    x = x_ref[0]
    for lev in range(nlevels):
        x = _fwd_lift97_axis0(x, lev)
        x = _fwd_lift97_axis0(x.swapaxes(0, 1), lev).swapaxes(0, 1)
    out_ref[0] = x


def _inv_kernel97(nlevels: int, x_ref, out_ref):
    x = x_ref[0]
    for lev in range(nlevels - 1, -1, -1):
        x = _inv_lift97_axis0(x.swapaxes(0, 1), lev).swapaxes(0, 1)
        x = _inv_lift97_axis0(x, lev)
    out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("nlevels", "interpret"))
def fwd97_fused(x, nlevels: int, interpret: bool = False):
    """Forward 9/7, all levels, interleaved layout: (B, H, W) float32."""
    b, hgt, wid = x.shape
    bspec = pl.BlockSpec((1, hgt, wid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel97, nlevels),
        grid=(b,),
        in_specs=[bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((b, hgt, wid), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("nlevels", "interpret"))
def inv97_fused(x, nlevels: int, interpret: bool = False):
    b, hgt, wid = x.shape
    bspec = pl.BlockSpec((1, hgt, wid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_inv_kernel97, nlevels),
        grid=(b,),
        in_specs=[bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((b, hgt, wid), x.dtype),
        interpret=interpret,
    )(x)


def _fwd_kernel2(nlevels: int, x_ref, out_ref):
    x = x_ref[0]
    for lev in range(nlevels):
        # Vertical pass (lifting across rows), then horizontal via
        # transpose — matching the numpy oracle's per-level order.
        x = _fwd_lift_axis0(x, lev)
        x = _fwd_lift_axis0(x.swapaxes(0, 1), lev).swapaxes(0, 1)
    out_ref[0] = x


def _inv_kernel2(nlevels: int, x_ref, out_ref):
    x = x_ref[0]
    for lev in range(nlevels - 1, -1, -1):
        # Inverse order: horizontal first, then vertical.
        x = _inv_lift_axis0(x.swapaxes(0, 1), lev).swapaxes(0, 1)
        x = _inv_lift_axis0(x, lev)
    out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("nlevels", "interpret"))
def fwd53_fused(x, nlevels: int, interpret: bool = False):
    """Forward 5/3, all levels, in interleaved layout: (B, H, W) int32 ->
    (B, H, W) transformed in place."""
    b, hgt, wid = x.shape
    bspec = pl.BlockSpec((1, hgt, wid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel2, nlevels),
        grid=(b,),
        in_specs=[bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((b, hgt, wid), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("nlevels", "interpret"))
def inv53_fused(x, nlevels: int, interpret: bool = False):
    b, hgt, wid = x.shape
    bspec = pl.BlockSpec((1, hgt, wid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_inv_kernel2, nlevels),
        grid=(b,),
        in_specs=[bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((b, hgt, wid), x.dtype),
        interpret=interpret,
    )(x)


def _band_positions(numresolutions: int, r: int, orient: int):
    """(row_offset, row_stride, col_offset, col_stride) of a band's samples
    in the interleaved layout (even-origin tiles)."""
    nl = numresolutions - 1
    if r == 0:
        s = 1 << nl
        return 0, s, 0, s
    nb = nl - r + 1
    m = 1 << nb
    half = m >> 1
    xo = half if orient & 1 else 0     # HL/HH: odd columns
    yo = half if orient & 2 else 0     # LH/HH: odd rows
    return yo, m, xo, m


def deinterleave(x, numresolutions: int) -> Dict[Tuple[int, int], jnp.ndarray]:
    """Interleaved in-place layout -> {(r, orient): band} (outside the
    kernel: XLA strided slices are free)."""
    bands = {}
    keys = [(0, 0)] + [(r, o) for r in range(1, numresolutions)
                       for o in (1, 2, 3)]
    for (r, o) in keys:
        yo, ys, xo, xs = _band_positions(numresolutions, r, o)
        bands[(r, o)] = x[..., yo::ys, xo::xs]
    return bands


def interleave(bands, numresolutions: int, hgt: int, wid: int):
    """Inverse of deinterleave."""
    some = bands[(0, 0)]
    batch = some.shape[:-2]
    out = jnp.zeros(batch + (hgt, wid), some.dtype)
    keys = [(0, 0)] + [(r, o) for r in range(1, numresolutions)
                       for o in (1, 2, 3)]
    for (r, o) in keys:
        yo, ys, xo, xs = _band_positions(numresolutions, r, o)
        out = out.at[..., yo::ys, xo::xs].set(bands[(r, o)])
    return out


def supports(rect, numresolutions: int) -> bool:
    """Kernel path: even origin, >= 2 active samples per axis per level."""
    if rect.x0 % 2 or rect.y0 % 2:
        return False
    for lev in range(numresolutions - 1):
        s = 1 << lev
        if -(-rect.w // s) < 2 or -(-rect.h // s) < 2:
            return False
    return True


def fwd_dwt_2d(x, rect, numresolutions: int, interpret: bool = False,
               reversible: bool = True):
    """Multi-level forward DWT via the fused Pallas kernels.

    `x`: (B, rect.h, rect.w), int32 (5/3) or float32 (9/7). Returns
    {(r, orient): (B, ...)} bands matching ops/dwt_np.py. Requires
    supports(rect, numresolutions).
    """
    if reversible:
        y = fwd53_fused(x, numresolutions - 1, interpret=interpret)
    else:
        y = fwd97_fused(jnp.asarray(x, jnp.float32), numresolutions - 1,
                        interpret=interpret)
    return deinterleave(y, numresolutions)


def inv_dwt_2d(bands, rect, numresolutions: int, interpret: bool = False,
               reversible: bool = True):
    """Multi-level inverse DWT via the fused Pallas kernels."""
    y = interleave(bands, numresolutions, rect.h, rect.w)
    if reversible:
        return inv53_fused(y, numresolutions - 1, interpret=interpret)
    return inv97_fused(jnp.asarray(y, jnp.float32), numresolutions - 1,
                       interpret=interpret)
