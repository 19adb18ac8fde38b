"""Pallas TPU kernels for the 5/3 and 9/7 DWT: all decomposition levels
fused, batched over tiles, with a halo-striped grid for tiles past VMEM.

TPU-native formulation: Mosaic supports neither strided slices nor
sub-128-lane reshapes inside kernels, so instead of compacting even/odd
samples per level (the CPU-style layout, reference:
src/lib/jp2/transform/WaveletForward.h deinterleave_h/v), the kernels run
**in-place masked lifting**: level `lev` updates rows/columns at stride
2^lev using shifted copies (contiguous slices + concat) and parity masks
from iota — every op is elementwise or a transpose, all of it in VMEM.
All parity/reflection logic runs in *canvas* coordinates, so odd tile
origins (interior tiles of an offset tile grid) are first-class.

Two dispatch shapes:
 - whole-tile: one VMEM block per tile; HBM traffic is one read + one
   write for the entire multi-level transform.
 - striped (tiles past the VMEM budget): a (block_h, block_w) grid where
   each kernel instance DMAs its block plus a `halo` ring from HBM into
   VMEM scratch, lifts all levels, and writes back only the interior.
   Lifting corrupts at most 2*(2^L - 1) samples (4*(2^L - 1) for 9/7)
   inward from a junk edge per axis, so that is the halo; blocks interior
   to the tile use real neighbor data and true tile edges keep the
   canvas-coordinate reflection, making the result bit-exact with the
   whole-tile kernel. (The reference strips rows per level on host
   threads: src/lib/jp2/transform/WaveletForward.h:96; here stripes are
   grid axes of one fused kernel.)
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large multiple of every level stride (strides are powers of two), added
# before % so halo coordinates below the canvas origin stay non-negative.
_PARITY_BIAS = 1 << 24


def _shift_up(x, s):
    """up[i] = x[i+s] along axis 0 (tail rows hold junk, masked off)."""
    return jnp.concatenate([x[s:, :], x[-s:, :]], axis=0)


def _shift_down(x, s):
    """down[i] = x[i-s] along axis 0 (head rows hold junk, masked off)."""
    return jnp.concatenate([x[:s, :], x[:-s, :]], axis=0)


def _axis_geom(u0: int, u1: int, lev: int):
    """Static per-level geometry along one axis, canvas coords [u0, u1):
    (s, m, ufirst, ulast, n_act, first_odd, last_odd)."""
    s = 1 << lev
    m = 2 * s
    ufirst = -(-u0 // s) * s
    ulast = ((u1 - 1) // s) * s
    n_act = (ulast - ufirst) // s + 1
    first_odd = (ufirst // s) % 2 == 1
    last_odd = (ulast // s) % 2 == 1
    return s, m, ufirst, ulast, n_act, first_odd, last_odd


def _masks(x, lev: int, u0: int, u1: int, c0: int, c1: int, off, off_c):
    """Parity masks/boundary data for one lifting level along axis 0.

    (u0, u1): static canvas range of the lifted axis; (c0, c1): of the
    other axis. `off`/`off_c`: canvas coordinate of local index 0 on each
    axis (python int for whole-tile kernels, traced scalar for striped).
    """
    s, m, ufirst, ulast, n_act, first_odd, last_odd = _axis_geom(
        u0, u1, lev)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + off
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + off_c
    active_col = ((col + _PARITY_BIAS) % s) == 0 if s > 1 else True
    ph = (row + _PARITY_BIAS) % m
    odd_mask = (ph == s) & active_col
    even_mask = (ph == 0) & active_col
    return (s, n_act, row, odd_mask, even_mask, ufirst, ulast,
            first_odd, last_odd)


def _odd_nbrs(x, s, row, ufirst, ulast, first_odd, last_odd):
    """(left, right) even neighbors for the odd update, reflecting at the
    true canvas boundaries (a first/last active sample in odd position
    mirrors its single neighbor)."""
    up = _shift_up(x, s)
    down = _shift_down(x, s)
    left = jnp.where(row == ufirst, up, down) if first_odd else down
    right = jnp.where(row == ulast, down, up) if last_odd else up
    return left, right


def _even_nbrs(x, s, row, ufirst, ulast, first_odd, last_odd):
    """(left, right) odd neighbors for the even update."""
    up = _shift_up(x, s)
    down = _shift_down(x, s)
    left = down if first_odd else jnp.where(row == ufirst, up, down)
    right = up if last_odd else jnp.where(row == ulast, down, up)
    return left, right


def _fwd_lift_axis0(x, lev, u0, u1, c0, c1, off, off_c):
    """One forward 5/3 lifting level along axis 0, in place at stride
    2^lev, canvas-coordinate parities and symmetric extension."""
    (s, n_act, row, odd_mask, even_mask, ufirst, ulast,
     first_odd, last_odd) = _masks(x, lev, u0, u1, c0, c1, off, off_c)
    if n_act < 2:
        return x
    l, r = _odd_nbrs(x, s, row, ufirst, ulast, first_odd, last_odd)
    x = jnp.where(odd_mask, x - ((l + r) >> 1), x)
    l, r = _even_nbrs(x, s, row, ufirst, ulast, first_odd, last_odd)
    return jnp.where(even_mask, x + ((l + r + 2) >> 2), x)


def _inv_lift_axis0(x, lev, u0, u1, c0, c1, off, off_c):
    """Inverse of _fwd_lift_axis0."""
    (s, n_act, row, odd_mask, even_mask, ufirst, ulast,
     first_odd, last_odd) = _masks(x, lev, u0, u1, c0, c1, off, off_c)
    if n_act < 2:
        return x
    l, r = _even_nbrs(x, s, row, ufirst, ulast, first_odd, last_odd)
    x = jnp.where(even_mask, x - ((l + r + 2) >> 2), x)
    l, r = _odd_nbrs(x, s, row, ufirst, ulast, first_odd, last_odd)
    return jnp.where(odd_mask, x + ((l + r) >> 1), x)


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


def _fwd_lift97_axis0(x, lev, u0, u1, c0, c1, off, off_c):
    """One forward 9/7 level along axis 0 (float32), masked in place:
    alpha/beta/gamma/delta lifting then the K scaling, arithmetic-order
    identical to the numpy oracle."""
    (s, n_act, row, odd_mask, even_mask, ufirst, ulast,
     first_odd, last_odd) = _masks(x, lev, u0, u1, c0, c1, off, off_c)
    if n_act < 2:
        return x
    for coef, odd_step in ((ALPHA, True), (BETA, False), (GAMMA, True),
                           (DELTA, False)):
        if odd_step:
            l, r = _odd_nbrs(x, s, row, ufirst, ulast, first_odd, last_odd)
            x = jnp.where(odd_mask, x + coef * (l + r), x)
        else:
            l, r = _even_nbrs(x, s, row, ufirst, ulast, first_odd,
                              last_odd)
            x = jnp.where(even_mask, x + coef * (l + r), x)
    return jnp.where(even_mask, x * INV_K,
                     jnp.where(odd_mask, x * K_HALF, x))


def _inv_lift97_axis0(x, lev, u0, u1, c0, c1, off, off_c):
    (s, n_act, row, odd_mask, even_mask, ufirst, ulast,
     first_odd, last_odd) = _masks(x, lev, u0, u1, c0, c1, off, off_c)
    if n_act < 2:
        return x
    x = jnp.where(even_mask, x * K_F,
                  jnp.where(odd_mask, x * TWO_OVER_K, x))
    for coef, odd_step in ((DELTA, False), (GAMMA, True), (BETA, False),
                           (ALPHA, True)):
        if odd_step:
            l, r = _odd_nbrs(x, s, row, ufirst, ulast, first_odd, last_odd)
            x = jnp.where(odd_mask, x - coef * (l + r), x)
        else:
            l, r = _even_nbrs(x, s, row, ufirst, ulast, first_odd,
                              last_odd)
            x = jnp.where(even_mask, x - coef * (l + r), x)
    return x


_LIFTS = {
    (True, True): _fwd_lift_axis0,
    (True, False): _inv_lift_axis0,
    (False, True): _fwd_lift97_axis0,
    (False, False): _inv_lift97_axis0,
}


def _run_levels(x, nlevels, rev, fwd, rect, off_y, off_x):
    """All lifting levels over a 2D array whose local (0, 0) sits at
    canvas (off_y, off_x); rect gives the static active canvas box."""
    lift = _LIFTS[(rev, fwd)]
    ybox = (rect.y0, rect.y1)
    xbox = (rect.x0, rect.x1)
    if fwd:
        levs = range(nlevels)
    else:
        levs = range(nlevels - 1, -1, -1)
    for lev in levs:
        if fwd:
            # Vertical pass (lifting across rows), then horizontal via
            # transpose — matching the numpy oracle's per-level order.
            x = lift(x, lev, *ybox, *xbox, off_y, off_x)
            x = lift(x.swapaxes(0, 1), lev, *xbox, *ybox,
                     off_x, off_y).swapaxes(0, 1)
        else:
            # Inverse order: horizontal first, then vertical.
            x = lift(x.swapaxes(0, 1), lev, *xbox, *ybox,
                     off_x, off_y).swapaxes(0, 1)
            x = lift(x, lev, *ybox, *xbox, off_y, off_x)
    return x


# ---------------------------------------------------------------------------
# Whole-tile kernels (tile fits VMEM)
# ---------------------------------------------------------------------------


class _R(tuple):
    """Hashable static rect carrier (y0, y1, x0, x1)."""
    @property
    def y0(self):
        return self[0]

    @property
    def y1(self):
        return self[1]

    @property
    def x0(self):
        return self[2]

    @property
    def x1(self):
        return self[3]


def _whole_kernel(nlevels, rev, fwd, rect, x_ref, out_ref):
    out_ref[0] = _run_levels(x_ref[0], nlevels, rev, fwd, rect,
                             rect.y0, rect.x0)


@functools.partial(jax.jit,
                   static_argnames=("nlevels", "rev", "fwd", "rect",
                                    "interpret"))
def _fused_whole(x, nlevels, rev, fwd, rect, interpret=False):
    b, hgt, wid = x.shape
    bspec = pl.BlockSpec((1, hgt, wid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_whole_kernel, nlevels, rev, fwd, rect),
        grid=(b,),
        in_specs=[bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((b, hgt, wid), x.dtype),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# Striped kernels (halo blocks; tiles past the VMEM budget)
# ---------------------------------------------------------------------------


def halo_for(nlevels: int, reversible: bool) -> Tuple[int, int]:
    """Max inward corruption from a junk edge: each 5/3 level adds 2
    strides (odd then even update), each 9/7 level 4 strides. Returns
    (halo_y, halo_x): 2*halo_y keeps block heights 8-aligned (sublane
    tiling) and 2*halo_x keeps block widths 128-aligned (lane tiling),
    which Mosaic requires of DMA slice shapes."""
    per = 2 if reversible else 4
    h = per * ((1 << nlevels) - 1)
    return -(-h // 4) * 4, -(-h // 64) * 64


def _striped_kernel(nlevels, rev, fwd, rect, bh, bw, halo_y, halo_x,
                    x_hbm, out_ref, scratch, sem):
    gy = pl.program_id(1)
    gx = pl.program_id(2)
    bi = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(gy * bh, bh + 2 * halo_y),
                 pl.ds(gx * bw, bw + 2 * halo_x)],
        scratch, sem)
    dma.start()
    dma.wait()
    off_y = rect.y0 + gy * bh - halo_y
    off_x = rect.x0 + gx * bw - halo_x
    y = _run_levels(scratch[:, :], nlevels, rev, fwd, rect, off_y, off_x)
    out_ref[0] = y[halo_y:halo_y + bh, halo_x:halo_x + bw]


@functools.partial(jax.jit,
                   static_argnames=("nlevels", "rev", "fwd", "rect", "bh",
                                    "bw", "interpret"))
def _fused_striped(x, nlevels, rev, fwd, rect, bh, bw, interpret=False):
    b, hgt, wid = x.shape
    halo_y, halo_x = halo_for(nlevels, rev)
    gy = -(-hgt // bh)
    gx = -(-wid // bw)
    xp = jnp.pad(x, ((0, 0), (halo_y, gy * bh - hgt + halo_y),
                     (halo_x, gx * bw - wid + halo_x)))
    out = pl.pallas_call(
        functools.partial(_striped_kernel, nlevels, rev, fwd, rect,
                          bh, bw, halo_y, halo_x),
        grid=(b, gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, bh, bw), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, gy * bh, gx * bw), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * halo_y, bw + 2 * halo_x), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return out[:, :hgt, :wid]


# Whole-tile VMEM budget: block + temporaries must fit alongside Mosaic's
# double buffering; 4 MB blocks measure fastest on this part.
WHOLE_TILE_MAX_BYTES = 4 << 20
STRIP_BH = 256
STRIP_BW = 512


def _dispatch(x, nlevels, rev, fwd, rect, interpret=False):
    b, hgt, wid = x.shape
    if hgt * wid * x.dtype.itemsize <= WHOLE_TILE_MAX_BYTES:
        return _fused_whole(x, nlevels, rev, fwd, rect,
                            interpret=interpret)
    halo_y, halo_x = halo_for(nlevels, rev)
    # Block dims stay 8/128-aligned even when a tile axis is shorter
    # than the stripe (the pad-to-grid in _fused_striped absorbs it).
    bh = -(-min(max(STRIP_BH, 2 * halo_y), hgt) // 8) * 8
    bw = -(-min(max(STRIP_BW, 2 * halo_x), wid) // 128) * 128
    return _fused_striped(x, nlevels, rev, fwd, rect, bh, bw,
                          interpret=interpret)


# ---------------------------------------------------------------------------
# Subband (de)interleave — outside the kernel: XLA strided slices are free
# ---------------------------------------------------------------------------


def _band_positions(numresolutions: int, r: int, orient: int,
                    y0: int, x0: int):
    """(row_offset, row_stride, col_offset, col_stride) of a band's
    samples in the interleaved local layout. Band sample positions live
    at fixed canvas-coordinate residues (low at u = 0 mod 2^k, high at
    2^(k-1)); local offsets shift by the tile origin."""
    nl = numresolutions - 1
    if r == 0:
        s = 1 << nl
        return (-y0) % s, s, (-x0) % s, s
    nb = nl - r + 1
    m = 1 << nb
    half = m >> 1
    xo = half if orient & 1 else 0     # HL/HH: odd columns
    yo = half if orient & 2 else 0     # LH/HH: odd rows
    return (yo - y0) % m, m, (xo - x0) % m, m


def deinterleave(x, numresolutions: int,
                 y0: int = 0, x0: int = 0) -> Dict[Tuple[int, int],
                                                   jnp.ndarray]:
    """Interleaved in-place layout -> {(r, orient): band}."""
    bands = {}
    keys = [(0, 0)] + [(r, o) for r in range(1, numresolutions)
                       for o in (1, 2, 3)]
    for (r, o) in keys:
        yo, ys, xo, xs = _band_positions(numresolutions, r, o, y0, x0)
        bands[(r, o)] = x[..., yo::ys, xo::xs]
    return bands


def interleave(bands, numresolutions: int, hgt: int, wid: int,
               y0: int = 0, x0: int = 0):
    """Inverse of deinterleave."""
    some = bands[(0, 0)]
    batch = some.shape[:-2]
    out = jnp.zeros(batch + (hgt, wid), some.dtype)
    keys = [(0, 0)] + [(r, o) for r in range(1, numresolutions)
                       for o in (1, 2, 3)]
    for (r, o) in keys:
        yo, ys, xo, xs = _band_positions(numresolutions, r, o, y0, x0)
        out = out.at[..., yo::ys, xo::xs].set(bands[(r, o)])
    return out


def supports(rect, numresolutions: int) -> bool:
    """Kernel path: >= 2 active samples per axis per level (single-sample
    levels take the scale-by-position rule; those geometries use
    ops/dwt_jax.py). Any origin parity and any size are in scope — big
    tiles route through the striped grid."""
    for lev in range(numresolutions - 1):
        s = 1 << lev
        y = (((rect.y1 - 1) // s) - (-(-rect.y0 // s)))
        x = (((rect.x1 - 1) // s) - (-(-rect.x0 // s)))
        if y + 1 < 2 or x + 1 < 2:
            return False
    return True


def _rect_key(rect) -> _R:
    return _R((rect.y0, rect.y1, rect.x0, rect.x1))


def fwd_dwt_2d(x, rect, numresolutions: int, interpret: bool = False,
               reversible: bool = True):
    """Multi-level forward DWT via the fused Pallas kernels.

    `x`: (B, rect.h, rect.w), int32 (5/3) or float32 (9/7). Returns
    {(r, orient): (B, ...)} bands matching ops/dwt_np.py. Requires
    supports(rect, numresolutions).
    """
    rk = _rect_key(rect)
    if not reversible:
        x = jnp.asarray(x, jnp.float32)
    y = _dispatch(x, numresolutions - 1, reversible, True, rk,
                  interpret=interpret)
    return deinterleave(y, numresolutions, rect.y0, rect.x0)


def inv_dwt_2d(bands, rect, numresolutions: int, interpret: bool = False,
               reversible: bool = True):
    """Multi-level inverse DWT via the fused Pallas kernels."""
    rk = _rect_key(rect)
    y = interleave(bands, numresolutions, rect.h, rect.w,
                   rect.y0, rect.x0)
    if not reversible:
        y = jnp.asarray(y, jnp.float32)
    return _dispatch(y, numresolutions - 1, reversible, False, rk,
                     interpret=interpret)


# Back-compat entry points (tests/benches call these directly).
def fwd53_fused(x, nlevels: int, interpret: bool = False):
    b, hgt, wid = x.shape
    return _fused_whole(x, nlevels, True, True, _R((0, hgt, 0, wid)),
                        interpret=interpret)


def inv53_fused(x, nlevels: int, interpret: bool = False):
    b, hgt, wid = x.shape
    return _fused_whole(x, nlevels, True, False, _R((0, hgt, 0, wid)),
                        interpret=interpret)


def fwd97_fused(x, nlevels: int, interpret: bool = False):
    b, hgt, wid = x.shape
    return _fused_whole(jnp.asarray(x, jnp.float32), nlevels, False, True,
                        _R((0, hgt, 0, wid)), interpret=interpret)


def inv97_fused(x, nlevels: int, interpret: bool = False):
    b, hgt, wid = x.shape
    return _fused_whole(jnp.asarray(x, jnp.float32), nlevels, False,
                        False, _R((0, hgt, 0, wid)), interpret=interpret)
