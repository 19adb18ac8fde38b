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
spends on 128. Slot stream: (T, S, 128) int32; state: (NSTATE, S, 128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mq_jax

_CHUNK = 256


@jax.jit
def mq_scan(slots):
    """slots: (T, B) int32 slot bytes, B % 128 == 0 (caller pads).
    Returns (words (T, B) int32, mask (T, B) bool, final state tuple of
    NSTATE (B,) vectors) — the same contract as mq_jax._mq_scan_w."""
    T, B = slots.shape
    S = B // 128
    t_pad = -(-T // _CHUNK) * _CHUNK
    sl = jnp.pad(slots, ((0, t_pad - T), (0, 0))).reshape(t_pad, S, 128)
    nstate = mq_jax.NSTATE
    init = [0x8000, 0, 12, -1, 0, 0] + list(mq_jax._CTX_INIT)

    def kernel(s_ref, out_w, out_m, st_ref, scratch):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for k, v in enumerate(init):
                scratch[k, :, :] = jnp.full((S, 128), v, jnp.int32)

        def body(t, carry):
            slot = s_ref[pl.ds(t, 1), :, :][0]
            carry, word, full = mq_jax.mq_step(jnp, carry, slot)
            out_w[pl.ds(t, 1), :, :] = word[None]
            out_m[pl.ds(t, 1), :, :] = full.astype(jnp.uint8)[None]
            return carry

        carry = tuple(scratch[k, :, :] for k in range(nstate))
        carry = lax.fori_loop(0, _CHUNK, body, carry)
        for k in range(nstate):
            scratch[k, :, :] = carry[k]
            st_ref[k, :, :] = carry[k]

    out_shape = [
        jax.ShapeDtypeStruct((t_pad, S, 128), jnp.int32),
        jax.ShapeDtypeStruct((t_pad, S, 128), jnp.uint8),
        jax.ShapeDtypeStruct((nstate, S, 128), jnp.int32),
    ]
    words, mask, state = pl.pallas_call(
        kernel,
        grid=(t_pad // _CHUNK,),
        in_specs=[
            pl.BlockSpec((_CHUNK, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHUNK, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nstate, S, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nstate, S, 128), jnp.int32)],
    )(sl)
    words = words.reshape(t_pad, B)[:T]
    mask = mask.reshape(t_pad, B)[:T].astype(bool)
    state = tuple(state.reshape(nstate, B)[k] for k in range(nstate))
    return words, mask, state
