"""Pallas TPU kernels for the HT stream coders (MEL / VLC / MagSgn).

The lax.scan formulation in ht_jax.py is correct everywhere but pays
while-loop overhead per step on TPU; these kernels keep the op streams
and the coder state in VMEM and walk the sequence with an in-kernel
fori_loop, so a step is a handful of VPU instructions on a (1, B) row.

Output contract (shared with the ht_jax lax.scan fallbacks): the coders
emit WORDS, not bytes — each lane packs its emitted bytes into a 32-bit
little-endian accumulator and flushes one word per 4 bytes. Per scan
step at most one word can complete (every byte carries >= 7 payload
bits, and a step pushes <= 23 bits), so the dense output is (T, B)
int32 words + a (T, B) valid mask — 4x denser than per-byte emission,
which quarters the cost of the packed-segment scatter that follows
(XLA lowers HBM scatter element-serially; slots are what it pays for).
MEL processes 4 run events per step (4 x <= 1 byte -> still <= 1 word),
shrinking its op stream another 4x.

Layout: ops are (T, B) int32 with the block batch B in the lane
dimension (padded to a multiple of 128); the grid walks T in chunks
with the lane-parallel coder state carried in VMEM scratch across grid
steps (TPU grid cells execute sequentially).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 256


def word_push(jnp, wacc, wcnt, byte, emit):
    """Push `byte` into the little-endian word accumulator where `emit`;
    returns (wacc', wcnt', word_out, word_full). At most one flush per
    call chain of <= 4 pushed bytes."""
    e = emit.astype(jnp.int32)
    wacc = wacc | jnp.where(e == 1, byte << (8 * wcnt), 0)
    wcnt = wcnt + e
    full = wcnt >= 4
    word = jnp.where(full, wacc, 0)
    wacc = jnp.where(full, 0, wacc)
    wcnt = jnp.where(full, 0, wcnt)
    return wacc, wcnt, word, full


def mel_step(jnp, carry, val, b):
    """One MEL event on lane vectors (bit-accumulator part only).
    MEL_EXP = [0,0,0,1,1,1,2,2,2,3,3,4,5] computed arithmetically (a
    captured constant array cannot enter a Pallas kernel)."""
    tmp, nbits, cap, run, k = carry
    eval_ = jnp.where(
        k < 3, 0, jnp.where(k < 6, 1, jnp.where(k < 9, 2, jnp.where(
            k < 11, 3, jnp.where(k < 12, 4, 5)))))
    threshold = jnp.int32(1) << eval_
    run0 = run + 1
    hit = run0 >= threshold
    ebits_1 = run & ((jnp.int32(1) << eval_) - 1)
    ecnt = jnp.where(b == 1, 1 + eval_, jnp.where(hit, 1, 0))
    ebits = jnp.where(b == 1, ebits_1, 1)
    ecnt = jnp.where(val == 1, ecnt, 0)
    ebits = ebits & ((jnp.int32(1) << ecnt) - 1)
    new_run = jnp.where(val == 1,
                        jnp.where(b == 1, 0, jnp.where(hit, 0, run0)),
                        run)
    new_k = jnp.where(
        val == 1,
        jnp.where(b == 1, jnp.maximum(k - 1, 0),
                  jnp.where(hit, jnp.minimum(k + 1, 12), k)),
        k)
    combined = (tmp << ecnt) | ebits
    nb = nbits + ecnt
    full = nb >= cap
    out_byte = jnp.where(full, combined >> (nb - cap), 0)
    rem = jnp.where(full, nb - cap, nb)
    new_tmp = jnp.where(
        full, combined & ((jnp.int32(1) << (nb - cap)) - 1), combined)
    new_cap = jnp.where(full, jnp.where(out_byte == 0xFF, 7, 8), cap)
    return (new_tmp, rem, new_cap, new_run, new_k), out_byte, full


def mel_super_step(jnp, carry, vals4, bits4):
    """4 MEL events -> <= 4 bytes -> <= 1 word. carry: 7 lane vectors
    (tmp, nbits, cap, run, k, wacc, wcnt)."""
    tmp, nbits, cap, run, k, wacc, wcnt = carry
    core = (tmp, nbits, cap, run, k)
    word_o = None
    full_o = None
    for j in range(4):
        core, byte, full = mel_step(jnp, core, vals4[j], bits4[j])
        wacc, wcnt, w, wf = word_push(jnp, wacc, wcnt, byte, full)
        word_o = w if word_o is None else (word_o | w)
        full_o = wf if full_o is None else (full_o | wf)
    return core + (wacc, wcnt), word_o, full_o


def vlc_step(jnp, carry, q, qbits):
    """One VLC append (<= 16 bits) -> <= 3 bytes -> <= 1 word. carry: 5
    lane vectors (tmp, used, lg8f, wacc, wcnt)."""
    tmp, used, lg8f, wacc, wcnt = carry
    word_o = None
    full_o = None
    for _ in range(7):
        active = qbits > 0
        avail = 8 - lg8f - used
        t = jnp.clip(jnp.minimum(avail, qbits), 0, 8)
        t = jnp.where(active, t, 0)
        tmp = tmp | ((q & ((jnp.int32(1) << t) - 1)) << used)
        used = used + t
        q = jnp.where(active, q >> t, q)
        qbits = qbits - t
        boundary = active & (used == (8 - lg8f))
        retry = boundary & (lg8f == 1) & (tmp != 0x7F)
        emit = boundary & ~retry
        wacc, wcnt, w, wf = word_push(
            jnp, wacc, wcnt, jnp.where(emit, tmp, 0), emit)
        word_o = w if word_o is None else (word_o | w)
        full_o = wf if full_o is None else (full_o | wf)
        lg8f = jnp.where(retry, 0,
                         jnp.where(emit, (tmp > 0x8F).astype(jnp.int32),
                                   lg8f))
        tmp = jnp.where(emit, 0, tmp)
        used = jnp.where(emit, 0, used)
    return (tmp, used, lg8f, wacc, wcnt), word_o, full_o


def ms_step(jnp, carry, v, ln):
    """One MagSgn push (<= 16 bits) -> <= 3 bytes -> <= 1 word. carry: 5
    lane vectors (q, qbits, maxb, wacc, wcnt)."""
    q, qbits, maxb, wacc, wcnt = carry
    q = q | (v << qbits)
    qbits = qbits + ln
    word_o = None
    full_o = None
    for _ in range(3):
        emit = qbits >= maxb
        byte = jnp.where(emit, q & ((jnp.int32(1) << maxb) - 1), 0)
        q = jnp.where(emit, q >> maxb, q)
        qbits = jnp.where(emit, qbits - maxb, qbits)
        maxb = jnp.where(emit & (byte == 0xFF), 7,
                         jnp.where(emit, 8, maxb))
        wacc, wcnt, w, wf = word_push(jnp, wacc, wcnt, byte, emit)
        word_o = w if word_o is None else (word_o | w)
        full_o = wf if full_o is None else (full_o | wf)
    return (q, qbits, maxb, wacc, wcnt), word_o, full_o


def _pad(x, t_pad, b_pad):
    T, B = x.shape
    return jnp.pad(x, ((0, t_pad - T), (0, b_pad - B)))


def _grid_scan_call(kernel, nstate, vals, lens, chunk=_CHUNK):
    """Shared pallas_call wrapper: chunked (T, B) op arrays in, dense
    (T, B) word/mask arrays out (3-D (T, 1, B) internally — Mosaic
    cannot prove alignment for dynamic-row stores into 2-D tiles),
    (nstate, B) final state out."""
    T, B = vals.shape
    b_pad = -(-B // 128) * 128
    t_pad = -(-T // chunk) * chunk
    vals_p = _pad(vals, t_pad, b_pad)
    lens_p = _pad(lens, t_pad, b_pad)
    grid = (t_pad // chunk,)
    out_shape = [
        jax.ShapeDtypeStruct((t_pad, 1, b_pad), jnp.int32),
        jax.ShapeDtypeStruct((t_pad, 1, b_pad), jnp.uint8),
        jax.ShapeDtypeStruct((nstate, b_pad), jnp.int32),
    ]
    words, mask, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, b_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, 1, b_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1, b_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nstate, b_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nstate, b_pad), jnp.int32)],
    )(vals_p, lens_p)
    return (words[:T, 0, :B], mask[:T, 0, :B].astype(bool), state[:, :B])


def _state_tuple(ref, n):
    # keep every lane vector 2-D (1, B): Mosaic layouts require rank>=2
    return tuple(ref[i:i + 1, :] for i in range(n))


def _write_state(ref, carry):
    for i, c in enumerate(carry):
        ref[i:i + 1, :] = c


def _init_scratch(scratch, init_vals):
    for i, v in enumerate(init_vals):
        scratch[i:i + 1, :] = jnp.full_like(scratch[0:1, :], v)


@jax.jit
def mel_scan(valid, bit):
    """valid/bit: (T, B) with T a multiple of 4 (caller pads); events are
    consumed 4 per step. Returns words (T//4, B), mask, final state
    (7, B): (tmp, nbits, cap, run, k, wacc, wcnt)."""
    T, B = valid.shape
    v4 = valid.reshape(T // 4, 4, B)
    b4 = bit.reshape(T // 4, 4, B)
    # interleave into (T//4, B) rows of 4-tuples via lane stacking:
    # feed as two (T//4*4, B) arrays walked 4 rows per iteration.
    vv = v4.reshape(T, B)
    bb = b4.reshape(T, B)

    def kernel(v_ref, b_ref, out_w, out_m, st_ref, scratch):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            _init_scratch(scratch, (0, 0, 8, 0, 0, 0, 0))

        def body(t, carry):
            vals4 = [v_ref[pl.ds(4 * t + j, 1), :] for j in range(4)]
            bits4 = [b_ref[pl.ds(4 * t + j, 1), :] for j in range(4)]
            carry, word, full = mel_super_step(jnp, carry, vals4, bits4)
            out_w[pl.ds(t, 1), :, :] = word[:, None, :]
            out_m[pl.ds(t, 1), :, :] = full.astype(jnp.uint8)[:, None, :]
            return carry

        carry = _state_tuple(scratch, 7)
        carry = lax.fori_loop(0, _CHUNK // 4, body, carry)
        _write_state(scratch, carry)
        _write_state(st_ref, carry)

    Tq, Bq = T // 4, B
    b_pad = -(-B // 128) * 128
    t_pad = -(-T // _CHUNK) * _CHUNK
    vals_p = _pad(vv, t_pad, b_pad)
    lens_p = _pad(bb, t_pad, b_pad)
    grid = (t_pad // _CHUNK,)
    out_shape = [
        jax.ShapeDtypeStruct((t_pad // 4, 1, b_pad), jnp.int32),
        jax.ShapeDtypeStruct((t_pad // 4, 1, b_pad), jnp.uint8),
        jax.ShapeDtypeStruct((7, b_pad), jnp.int32),
    ]
    words, mask, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK, b_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, b_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHUNK // 4, 1, b_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK // 4, 1, b_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, b_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((7, b_pad), jnp.int32)],
    )(vals_p, lens_p)
    return (words[:Tq, 0, :Bq], mask[:Tq, 0, :Bq].astype(bool),
            state[:, :Bq])


@jax.jit
def vlc_scan(vals, lens):
    """(T, B) append ops -> words (T, B), mask, final state (5, B):
    (tmp, used, lg8f, wacc, wcnt)."""
    def kernel(v_ref, l_ref, out_w, out_m, st_ref, scratch):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            _init_scratch(scratch, (0xF, 4, 1, 0, 0))

        def body(t, carry):
            carry, word, full = vlc_step(
                jnp, carry, v_ref[pl.ds(t, 1), :], l_ref[pl.ds(t, 1), :])
            out_w[pl.ds(t, 1), :, :] = word[:, None, :]
            out_m[pl.ds(t, 1), :, :] = full.astype(jnp.uint8)[:, None, :]
            return carry

        carry = _state_tuple(scratch, 5)
        carry = lax.fori_loop(0, _CHUNK, body, carry)
        _write_state(scratch, carry)
        _write_state(st_ref, carry)

    return _grid_scan_call(kernel, 5, vals, lens)


@jax.jit
def ms_scan(vals, lens):
    """(T, B) append ops -> words (T, B), mask, final state (5, B):
    (q, qbits, maxb, wacc, wcnt)."""
    def kernel(v_ref, l_ref, out_w, out_m, st_ref, scratch):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            _init_scratch(scratch, (0, 0, 8, 0, 0))

        def body(t, carry):
            carry, word, full = ms_step(
                jnp, carry, v_ref[pl.ds(t, 1), :], l_ref[pl.ds(t, 1), :])
            out_w[pl.ds(t, 1), :, :] = word[:, None, :]
            out_m[pl.ds(t, 1), :, :] = full.astype(jnp.uint8)[:, None, :]
            return carry

        carry = _state_tuple(scratch, 5)
        carry = lax.fori_loop(0, _CHUNK, body, carry)
        _write_state(scratch, carry)
        _write_state(st_ref, carry)

    return _grid_scan_call(kernel, 5, vals, lens)
