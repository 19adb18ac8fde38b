"""Pallas TPU kernel for the lane-parallel MQ coder scan.

Same step semantics as ops/mq_jax.mq_step (shared body); only the
iteration machinery differs: the slot stream and all coder state live
in VMEM and an in-kernel fori_loop walks the sequence, with the grid
chunking the scan dimension (TPU grid cells execute sequentially, so
per-lane state carries across chunks in scratch).

Layout: the block batch is blocked as (S, 128) = (sublanes, lanes) so
every per-step vector op covers whole (8, 128) vregs instead of a
single replicated (1, B) row — with S = 8 one step processes 1024
code-blocks for the same instruction count a (1, 128) row formulation
spends on 128. Everything stays in this blocked layout end to end
(slot build -> scan -> word compaction): reshaping a (T, B) array to
(T, S, 128) is a full lane-split relayout that costs more than the
scan itself at large B.

Besides the emitted words, the kernel tracks a per-lane within-chunk
word counter and emits each word's chunk-local index (m8). Downstream
compaction (mq_jax._compact_words) turns that into packed per-lane
byte runs with pure masked reductions — no big cumsative scan and no
XLA scatter, both of which cost more than the MQ scan itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mq_jax

_CHUNK = 256


def _lane_tile_of(s: int) -> int:
    st = s
    for cand in (8, 4, 2, 1):
        if s % cand == 0:
            st = cand
            break
    return min(st, s)


def _legal_s(s: int) -> int:
    """Sublane count Mosaic accepts for a (.., st, 128) block: the
    lane-tile must be 8 (divisible-by-8 rule) or equal the full array
    dim, so pad s to the next power of two up to 8, then to a multiple
    of 8 (padded lanes carry zero slots and cost only idle lanes)."""
    if s <= 8:
        return 1 << (s - 1).bit_length() if s > 1 else 1
    return -(-s // 8) * 8


@functools.partial(jax.jit, static_argnames=("s", "interpret"))
def mq_scan_compact_blocked(slots, s: int, interpret: bool = False):
    """Compacting MQ scan: slots (T, B) int8 slot bytes, B == s * 128.

    Returns (comp1 (nch, CCAP, s, 128) int32 = each 256-step chunk's
    first CCAP emitted words, counts1 (nch, s, 128) raw per-chunk word
    counts, nboc (nch, s, 128) per-chunk byteout sums, state
    (NSTATE, s, 128)); nch = ceil(T / 256).

    Level-1 word compaction runs INSIDE the kernel: the per-lane
    chunk-local word counter that mq_scan_blocked exported as m8 is
    instead used to accumulate each emitted word into one of CCAP
    masked accumulators, so the dense (T, s, 128) words/m8/nbo arrays
    (12 B per slot-lane — ~13 GB on a 2048^2 RGB tile, the round-3 HBM
    gate) never exist. HBM traffic is the 1 B/slot packed stream in and
    the ~0.15 B/slot compacted grids out. The 4-per-int32 slot packing
    keeps the stream at byte density without int8 loads in the kernel.
    """
    T, B = slots.shape
    s_in = s
    s_legal = _legal_s(s)
    if s_legal != s:
        slots = jnp.pad(slots, ((0, 0), (0, (s_legal - s) * 128)))
        s = s_legal
    t_pad = -(-T // _CHUNK) * _CHUNK
    nch = t_pad // _CHUNK
    ccap = mq_jax.MQ_CCAP
    nstate = mq_jax.NSTATE
    init = list(mq_jax.STATE_INIT)
    sl = jnp.pad(slots.astype(jnp.uint8), ((0, t_pad - T), (0, 0)))
    sl = sl.reshape(t_pad // 4, 4, s, 128).astype(jnp.int32)
    sl = (sl[:, 0] | (sl[:, 1] << 8) | (sl[:, 2] << 16)
          | (sl[:, 3] << 24))
    st = _lane_tile_of(s)
    n_lane = s // st
    nq = _CHUNK // 4

    # Activity map, (n_lane, nch) int32: 1 iff any slot in the
    # (256-step chunk x lane-tile) cell has its emit bit set. Noop
    # slots are exact state passthroughs in mq_step, so a fully
    # inactive cell can skip the scan entirely (its outputs are zero
    # and the carried state is unchanged). Real streams are mostly
    # padding — EBCOT's static slot layout reserves ~5.75 slots per
    # sample per plane but codes ~1-2, and planes above a block's
    # actual MSB are entirely dead — measured emit density on cinema
    # content is ~8%, with ~half of all cells fully inactive.
    act = ((sl.reshape(nch, nq, n_lane, st, 128) & 0x01010101) != 0) \
        .any(axis=(1, 3, 4))
    act = act.T.astype(jnp.int32)                      # (n_lane, nch)

    def kernel(act_ref, s_ref, c1_ref, cnt_ref, nbo_ref, st_ref,
               scratch):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            for k, v in enumerate(init):
                scratch[k, :, :] = jnp.full((st, 128), v, jnp.int32)

        zero = jnp.zeros((st, 128), jnp.int32)
        active = act_ref[i, j] != 0

        @pl.when(active)
        def _():
            def body(tq, carry):
                state = carry[:nstate]
                cnt, nbos = carry[nstate], carry[nstate + 1]
                acc = list(carry[nstate + 2:])
                wq = s_ref[tq]
                for sub in range(4):
                    slot = (wq >> (8 * sub)) & 0xFF
                    state, word, full, nbo = mq_jax.mq_step(jnp, state,
                                                            slot)
                    for k in range(ccap):
                        acc[k] = acc[k] | jnp.where(full & (cnt == k),
                                                    word, 0)
                    cnt = cnt + full.astype(jnp.int32)
                    nbos = nbos + nbo
                return tuple(state) + (cnt, nbos) + tuple(acc)

            carry = tuple(scratch[k, :, :] for k in range(nstate))
            carry = carry + (zero, zero) + tuple(zero
                                                 for _ in range(ccap))
            carry = lax.fori_loop(0, nq, body, carry)
            for k in range(nstate):
                scratch[k, :, :] = carry[k]
            cnt_ref[0] = carry[nstate]
            nbo_ref[0] = carry[nstate + 1]
            for k in range(ccap):
                c1_ref[0, k] = carry[nstate + 2 + k]

        @pl.when(jnp.logical_not(active))
        def _():
            cnt_ref[0] = zero
            nbo_ref[0] = zero
            for k in range(ccap):
                c1_ref[0, k] = zero

        # same output block for every j: the last chunk's write is the
        # final per-lane coder state
        for k in range(nstate):
            st_ref[k, :, :] = scratch[k, :, :]

    out_shape = [
        jax.ShapeDtypeStruct((nch, ccap, s, 128), jnp.int32),
        jax.ShapeDtypeStruct((nch, s, 128), jnp.int32),
        jax.ShapeDtypeStruct((nch, s, 128), jnp.int32),
        jax.ShapeDtypeStruct((nstate, s, 128), jnp.int32),
    ]
    in_spec = pl.BlockSpec((nq, st, 128), lambda i, j, *_: (j, i, 0),
                           memory_space=pltpu.VMEM)
    ch_spec = pl.BlockSpec((1, st, 128), lambda i, j, *_: (j, i, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_lane, nch),
        in_specs=[in_spec],
        out_specs=[
            pl.BlockSpec((1, ccap, st, 128),
                         lambda i, j, *_: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            ch_spec, ch_spec,
            pl.BlockSpec((nstate, st, 128), lambda i, j, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((nstate, st, 128), jnp.int32)],
    )
    comp1, counts1, nboc, state = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(act, sl)
    if s_in != s:
        comp1 = comp1[:, :, :s_in]
        counts1 = counts1[:, :s_in]
        nboc = nboc[:, :s_in]
        state = state[:, :s_in]
    return comp1, counts1, nboc, state


@functools.partial(jax.jit, static_argnames=("s",))
def mq_scan_blocked(slots, s: int):
    """slots: (T, B) int32/int8 slot bytes with B == s * 128.
    Returns blocked (t_pad, s, 128) words (int32), m8 (int32: the
    word's index within its 256-step chunk, -1 where no word), nbo
    (int32 per-step byteout counts, for pass-boundary truncation
    rates), and the final state as an (NSTATE, s, 128) int32 array."""
    T, B = slots.shape
    s_in = s
    s_legal = _legal_s(s)
    if s_legal != s:
        slots = jnp.pad(slots, ((0, 0), (0, (s_legal - s) * 128)))
        s = s_legal
    t_pad = -(-T // _CHUNK) * _CHUNK
    sl = jnp.pad(slots.astype(jnp.int32),
                 ((0, t_pad - T), (0, 0))).reshape(t_pad, s, 128)
    nstate = mq_jax.NSTATE
    init = list(mq_jax.STATE_INIT)

    # Lane-tile the sublane axis so per-cell VMEM stays bounded: a
    # whole-tile MQ batch can reach s = 24+ sublanes (3072+ blocks),
    # and (256, s, 128) x 4 double-buffered blocks would blow the 16 MB
    # scoped-vmem budget. Grid = (lane_tiles, step_chunks); step chunks
    # run innermost with the coder state carried in scratch, so the
    # 256-step chunk-local word-index semantics (m8, downstream
    # compaction) are unchanged.
    st = _lane_tile_of(s)
    n_lane = s // st

    def kernel(s_ref, out_w, out_m, out_b, st_ref, scratch):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            for k, v in enumerate(init):
                scratch[k, :, :] = jnp.full((st, 128), v, jnp.int32)

        def body(t, carry):
            cnt = carry[-1]
            carry, word, full, nbo = mq_jax.mq_step(jnp, carry[:-1],
                                                    s_ref[t])
            out_w[t] = word
            out_m[t] = jnp.where(full, cnt, -1)
            out_b[t] = nbo
            cnt = cnt + full.astype(jnp.int32)
            return carry + (cnt,)

        carry = tuple(scratch[k, :, :] for k in range(nstate))
        carry = carry + (jnp.zeros((st, 128), jnp.int32),)
        carry = lax.fori_loop(0, _CHUNK, body, carry)
        for k in range(nstate):
            scratch[k, :, :] = carry[k]
            st_ref[k, :, :] = carry[k]

    out_shape = [
        jax.ShapeDtypeStruct((t_pad, s, 128), jnp.int32),
        jax.ShapeDtypeStruct((t_pad, s, 128), jnp.int32),
        jax.ShapeDtypeStruct((t_pad, s, 128), jnp.int32),
        jax.ShapeDtypeStruct((nstate, s, 128), jnp.int32),
    ]
    blk = pl.BlockSpec((_CHUNK, st, 128), lambda i, j: (j, i, 0),
                       memory_space=pltpu.VMEM)
    words, m8, nbo, state = pl.pallas_call(
        kernel,
        grid=(n_lane, t_pad // _CHUNK),
        in_specs=[blk],
        out_specs=[
            blk, blk, blk,
            pl.BlockSpec((nstate, st, 128), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nstate, st, 128), jnp.int32)],
    )(sl)
    if s_in != s:
        words = words[:, :s_in]
        m8 = m8[:, :s_in]
        nbo = nbo[:, :s_in]
        state = state[:, :s_in]
    return words, m8, nbo, state


def mq_scan(slots):
    """Back-compat wrapper: (T, B) in -> flat (T, B) words/mask/nbo +
    state tuple (tests only; production uses mq_scan_blocked)."""
    T, B = slots.shape
    words, m8, nbo, state = mq_scan_blocked(slots, B // 128)
    words = words.reshape(-1, B)[:T]
    mask = (m8.reshape(-1, B)[:T]) >= 0
    nbo = nbo.reshape(-1, B)[:T]
    st = tuple(state.reshape(mq_jax.NSTATE, B)[k]
               for k in range(mq_jax.NSTATE))
    return words, mask, nbo, st
