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


@functools.partial(jax.jit, static_argnames=("s",))
def mq_scan_blocked(slots, s: int):
    """slots: (T, B) int32/int8 slot bytes with B == s * 128.
    Returns blocked (t_pad, s, 128) words (int32), m8 (int32: the
    word's index within its 256-step chunk, -1 where no word), nbo
    (int32 per-step byteout counts, for pass-boundary truncation
    rates), and the final state as an (NSTATE, s, 128) int32 array."""
    T, B = slots.shape
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
    st = s
    for cand in (8, 4, 2, 1):
        if s % cand == 0:
            st = cand
            break
    st = min(st, s)
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
