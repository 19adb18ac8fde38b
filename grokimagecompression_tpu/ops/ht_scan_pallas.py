"""Pallas TPU kernels for the HT stream coders (MEL / VLC / MagSgn).

The lax.scan formulation in ht_jax.py is correct everywhere but pays
~1-2us of while-loop overhead per step on TPU (HBM dynamic-slice per
iteration). These kernels keep the op streams and the coder state in
VMEM and walk the sequence with an in-kernel fori_loop, so a step is
just a handful of VPU instructions on a (1, B) row.

Layout: ops are (T, B) int32 with the block batch B in the lane
dimension (padded to a multiple of 128 by the caller); the grid walks
T in chunks with the lane-parallel coder state carried in VMEM scratch
across grid steps (TPU grid cells execute sequentially).

Semantics are identical to ht_jax._mel_scan/_vlc_scan/_ms_scan — the
step bodies are shared; only the iteration machinery differs. Outputs
are the same dense (T[, K], B) byte/mask arrays plus the final state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ht_jax as _hj

_CHUNK = 256


def _mel_step(jnp, carry, val, b):
    """One MEL event on lane vectors; mirrors ht_jax._mel_scan's body.
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


def _vlc_step(jnp, carry, q, qbits):
    tmp, used, lg8f = carry
    out_b = []
    out_m = []
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
        out_b.append(jnp.where(emit, tmp, 0))
        out_m.append(emit)
        lg8f = jnp.where(retry, 0,
                         jnp.where(emit, (tmp > 0x8F).astype(jnp.int32),
                                   lg8f))
        tmp = jnp.where(emit, 0, tmp)
        used = jnp.where(emit, 0, used)
    return (tmp, used, lg8f), out_b, out_m


def _ms_step(jnp, carry, v, ln):
    q, qbits, maxb = carry
    q = q | (v << qbits)
    qbits = qbits + ln
    out_b = []
    out_m = []
    for _ in range(3):
        emit = qbits >= maxb
        byte = jnp.where(emit, q & ((jnp.int32(1) << maxb) - 1), 0)
        q = jnp.where(emit, q >> maxb, q)
        qbits = jnp.where(emit, qbits - maxb, qbits)
        maxb = jnp.where(emit & (byte == 0xFF), 7,
                         jnp.where(emit, 8, maxb))
        out_b.append(byte)
        out_m.append(emit)
    return (q, qbits, maxb), out_b, out_m


def _pad(x, t_pad, b_pad):
    T, B = x.shape
    return jnp.pad(x, ((0, t_pad - T), (0, b_pad - B)))


def _grid_scan_call(kernel, nstate, K, vals, lens):
    """Shared pallas_call wrapper: chunked (T, B) op arrays in, dense
    (T, K, B) bytes/masks out, (nstate, B) final state out."""
    T, B = vals.shape
    b_pad = -(-B // 128) * 128
    t_pad = -(-T // _CHUNK) * _CHUNK
    vals_p = _pad(vals, t_pad, b_pad)
    lens_p = _pad(lens, t_pad, b_pad)
    grid = (t_pad // _CHUNK,)
    out_shape = [
        jax.ShapeDtypeStruct((t_pad, K, b_pad), jnp.uint8),
        jax.ShapeDtypeStruct((t_pad, K, b_pad), jnp.uint8),
        jax.ShapeDtypeStruct((nstate, b_pad), jnp.int32),
    ]
    bytes_, mask, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK, b_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, b_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHUNK, K, b_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, K, b_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nstate, b_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nstate, b_pad), jnp.int32)],
    )(vals_p, lens_p)
    return (bytes_[:T, :, :B], mask[:T, :, :B].astype(bool),
            state[:, :B])


def _state_tuple(jnp, ref, n):
    # keep every lane vector 2-D (1, B): Mosaic layouts require rank>=2
    return tuple(ref[i:i + 1, :] for i in range(n))


def _write_state(ref, carry):
    for i, c in enumerate(carry):
        ref[i:i + 1, :] = c


@functools.partial(jax.jit, static_argnames=())
def mel_scan(valid, bit):
    """(T, B) -> dense (T, 1, B) bytes/mask + state tuple; same contract
    as ht_jax._mel_scan but Pallas-accelerated."""
    def kernel(v_ref, b_ref, out_b, out_m, st_ref, scratch):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            scratch[0, :] = jnp.zeros_like(scratch[0, :])
            scratch[1, :] = jnp.zeros_like(scratch[0, :])
            scratch[2, :] = jnp.full_like(scratch[0, :], 8)
            scratch[3, :] = jnp.zeros_like(scratch[0, :])
            scratch[4, :] = jnp.zeros_like(scratch[0, :])

        def body(t, carry):
            carry, byte, full = _mel_step(
                jnp, carry, v_ref[pl.ds(t, 1), :], b_ref[pl.ds(t, 1), :])
            out_b[pl.ds(t, 1), :, :] = byte.astype(jnp.uint8)[:, None, :]
            out_m[pl.ds(t, 1), :, :] = full.astype(jnp.uint8)[:, None, :]
            return carry

        carry = _state_tuple(jnp, scratch, 5)
        carry = lax.fori_loop(0, _CHUNK, body, carry)
        _write_state(scratch, carry)
        _write_state(st_ref, carry)

    bytes_, mask, state = _grid_scan_call(kernel, 5, 1, valid, bit)
    return bytes_[:, 0], mask[:, 0], tuple(state)


@functools.partial(jax.jit, static_argnames=())
def vlc_scan(vals, lens):
    def kernel(v_ref, l_ref, out_b, out_m, st_ref, scratch):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            scratch[0, :] = jnp.full_like(scratch[0, :], 0xF)
            scratch[1, :] = jnp.full_like(scratch[0, :], 4)
            scratch[2, :] = jnp.full_like(scratch[0, :], 1)

        def body(t, carry):
            carry, bs, ms = _vlc_step(
                jnp, carry, v_ref[pl.ds(t, 1), :], l_ref[pl.ds(t, 1), :])
            out_b[pl.ds(t, 1), :, :] = jnp.concatenate(
                [b.astype(jnp.uint8)[:, None, :] for b in bs], axis=1)
            out_m[pl.ds(t, 1), :, :] = jnp.concatenate(
                [m.astype(jnp.uint8)[:, None, :] for m in ms], axis=1)
            return carry

        carry = _state_tuple(jnp, scratch, 3)
        carry = lax.fori_loop(0, _CHUNK, body, carry)
        _write_state(scratch, carry)
        _write_state(st_ref, carry)

    bytes_, mask, state = _grid_scan_call(kernel, 3, 7, vals, lens)
    return bytes_, mask, tuple(state)


@functools.partial(jax.jit, static_argnames=())
def ms_scan(vals, lens):
    def kernel(v_ref, l_ref, out_b, out_m, st_ref, scratch):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            scratch[0, :] = jnp.zeros_like(scratch[0, :])
            scratch[1, :] = jnp.zeros_like(scratch[0, :])
            scratch[2, :] = jnp.full_like(scratch[0, :], 8)

        def body(t, carry):
            carry, bs, ms = _ms_step(
                jnp, carry, v_ref[pl.ds(t, 1), :], l_ref[pl.ds(t, 1), :])
            out_b[pl.ds(t, 1), :, :] = jnp.concatenate(
                [b.astype(jnp.uint8)[:, None, :] for b in bs], axis=1)
            out_m[pl.ds(t, 1), :, :] = jnp.concatenate(
                [m.astype(jnp.uint8)[:, None, :] for m in ms], axis=1)
            return carry

        carry = _state_tuple(jnp, scratch, 3)
        carry = lax.fori_loop(0, _CHUNK, body, carry)
        _write_state(scratch, carry)
        _write_state(st_ref, carry)

    bytes_, mask, state = _grid_scan_call(kernel, 3, 3, vals, lens)
    return bytes_, mask, tuple(state)
