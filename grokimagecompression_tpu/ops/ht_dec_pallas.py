"""Pallas TPU kernel for the HT cleanup-pass DECODER scan.

The lax.scan formulation (ht_dec_jax.decode_group_core) is correct but
slow on TPU: every data-dependent stream read is an XLA gather over the
(W, B) word matrix (~30 us each on v5e — the lowering materializes the
full one-hot), and a 64x64 block costs 512 scan steps x ~28 gathers.
This kernel removes every gather from the hot path:

- Each stream (MEL / VLC / MagSgn) carries a per-lane 96-bit WINDOW
  (three uint32 lane vectors) plus a word pointer in VMEM scratch.
  In-step fetches are pure shifts out of the window. A step consumes
  <= 30 bits of VLC, <= 18 of MEL and <= 32 per MagSgn sample, so each
  window refill shifts by at most one word.
- The refill "gather" is a one-hot select+reduce over the (W, B) word
  block resident in VMEM — VPU work at register speed instead of an
  XLA gather. MagSgn refills once per sample (8/step), MEL/VLC once
  per step.
- The CxtVLC decode LUTs (1024 entries) are passed as (1024, 1) inputs
  and looked up by one-hot reduce as well.
- The quad line state lives in VMEM scratch with dynamic sublane
  slices at the static-per-step quad index (prefetched in SMEM).

The grid is (lane_tiles, step_chunks): step chunks run innermost with
the coder state carried in scratch across grid cells (TPU cells execute
sequentially); lane tiles re-initialize at chunk 0.

Scope guard: magnitude exponents must satisfy U_p <= 32 (true for every
encoder-legal stream at <= 16-bit precision; the plan gate checks Mb).
Outputs are bit-exact with ht_dec_jax.decode_group_core on such
streams (tests/test_ht_dec_pallas.py).

Reference: src/lib/jp2/t1/t1_ht/coding/ojph_block_decoder.cpp:687 (the
scalar per-block decoder this replaces on-device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ht_dec_jax

_STEP_CHUNK = 256
_LANE_TILE = 512

# scratch row indices (all (1, B) int32 lane vectors)
_NSTATE = 19
(_V_WP, _V_BO, _V_W0, _V_W1, _V_W2,
 _M_WP, _M_BO, _M_W0, _M_W1, _M_W2, _M_RUN, _M_K,
 _S_WP, _S_BO, _S_W0, _S_W1, _S_W2,
 _C_P, _LS0) = range(_NSTATE)


def _u(x):
    return x.astype(jnp.uint32)


def _i(x):
    return x.astype(jnp.int32)


def _fetch_win_lsb(w0, w1, w2, d):
    """32 stream bits at window-relative bit offset d (0..62), LSB."""
    c = d < 32
    a = jnp.where(c, w0, w1)
    b = jnp.where(c, w1, w2)
    sh = _u(d) & jnp.uint32(31)
    lo = _u(a) >> sh
    hi = jnp.where(sh > 0, _u(b) << (jnp.uint32(32) - sh), jnp.uint32(0))
    return lo | hi


def _fetch_win_msb(w0, w1, w2, d):
    """32 stream bits at offset d, MSB-aligned (MEL layout)."""
    c = d < 32
    a = jnp.where(c, w0, w1)
    b = jnp.where(c, w1, w2)
    sh = _u(d) & jnp.uint32(31)
    hi = _u(a) << sh
    lo = jnp.where(sh > 0, _u(b) >> (jnp.uint32(32) - sh), jnp.uint32(0))
    return hi | lo


def _onehot_word(words_ref, wp, W, pad):
    """words[wp, lane] via one-hot select+reduce; `pad` fills reads past
    the buffer (the stream's infinite-pad pattern)."""
    iota = lax.broadcasted_iota(jnp.int32, (W, words_ref.shape[1]), 0)
    m = iota == wp
    v = jnp.sum(jnp.where(m, _i(words_ref[...]), 0), axis=0,
                keepdims=True)
    return jnp.where(wp >= W, jnp.int32(pad), v)


def _refill(words_ref, W, pad, wp, bo, w0, w1, w2):
    """Shift the window one word where bo >= 32."""
    c = bo >= 32
    nw = _onehot_word(words_ref, wp + 3, W, pad)
    return (jnp.where(c, wp + 1, wp), jnp.where(c, bo - 32, bo),
            jnp.where(c, w1, w0), jnp.where(c, w2, w1),
            jnp.where(c, nw, w2))


def _mel_get_run(mw0, mw1, mw2, bo, k):
    """One MEL run decode against the window. Returns (run, dbits, k')."""
    win = _fetch_win_msb(mw0, mw1, mw2, bo)
    eval_ = jnp.where(k < 3, 0, jnp.where(k < 6, 1, jnp.where(
        k < 9, 2, jnp.where(k < 11, 3, jnp.where(k < 12, 4, 5)))))
    msb = _i((win >> 31) & 1)
    full = msb == 1
    run_full = ((jnp.int32(1) << eval_) - 1) << 1
    rest = (win << 1) >> ((jnp.uint32(32) - _u(eval_)) & jnp.uint32(31))
    rest = _i(jnp.where(eval_ > 0, rest, jnp.uint32(0)))
    run = jnp.where(full, run_full, (rest << 1) + 1)
    k2 = jnp.where(full, jnp.minimum(k + 1, 12), jnp.maximum(k - 1, 0))
    dbits = jnp.where(full, 1, eval_ + 1)
    return run, dbits, k2


def _uvlc_classify(win):
    b0 = win & 1
    b01 = win & 3
    b02 = win & 7
    pre = jnp.where(b0 == 1, 1, jnp.where(b01 == 2, 2, 3))
    suf = jnp.where(b0 == 1, 0,
                    jnp.where(b01 == 2, 0, jnp.where(b02 == 4, 1, 5)))
    base = jnp.where(b0 == 1, 1,
                     jnp.where(b01 == 2, 2, jnp.where(b02 == 4, 3, 5)))
    return pre, suf, base


def _uvlc_decode(win, mode, row0):
    """Vectorized uvlc for both the initial and non-initial row,
    selected by the per-step scalar row0. Returns (u0, u1, consumed)."""
    win = _u(win)
    p1, s1, b1 = _uvlc_classify(_i(win))
    w_after1 = win >> _u(p1)
    v_single = b1 + _i(w_after1 & ((jnp.uint32(1) << _u(s1)) - 1))
    c_single = p1 + s1

    p2, s2, b2 = _uvlc_classify(_i(w_after1))
    wB = w_after1 >> _u(p2)
    u0_B = b1 + _i(wB & ((jnp.uint32(1) << _u(s1)) - 1))
    wB2 = wB >> _u(s1)
    u1_B = b2 + _i(wB2 & ((jnp.uint32(1) << _u(s2)) - 1))
    c_B = p1 + p2 + s1 + s2

    # initial-row mode 3: long u_q0 prefix -> 1-bit u1 branch
    long0 = p1 > 2
    wA = w_after1 >> jnp.uint32(1)
    u1_A = _i(w_after1 & 1) + 1
    u0_A = b1 + _i(wA & ((jnp.uint32(1) << _u(s1)) - 1))
    c_A = p1 + 1 + s1
    u0_m3i = jnp.where(long0, u0_A, u0_B)
    u1_m3i = jnp.where(long0, u1_A, u1_B)
    c_m3i = jnp.where(long0, c_A, c_B)

    u0_m3 = jnp.where(row0, u0_m3i, u0_B)
    u1_m3 = jnp.where(row0, u1_m3i, u1_B)
    c_m3 = jnp.where(row0, c_m3i, c_B)
    u0_m4 = jnp.where(row0, u0_B + 2, u0_B)
    u1_m4 = jnp.where(row0, u1_B + 2, u1_B)
    c_m4 = jnp.where(row0, c_B, c_m3)

    zero = jnp.zeros_like(mode)
    u0 = jnp.where(mode == 0, zero,
                   jnp.where(mode == 1, v_single,
                             jnp.where(mode == 2, zero,
                                       jnp.where(mode == 3, u0_m3,
                                                 u0_m4))))
    u1 = jnp.where(mode == 0, zero,
                   jnp.where(mode == 1, zero,
                             jnp.where(mode == 2, v_single,
                                       jnp.where(mode == 3, u1_m3,
                                                 u1_m4))))
    c = jnp.where(mode == 0, zero,
                  jnp.where(mode <= 2, c_single,
                            jnp.where(mode == 3, c_m3, c_m4)))
    return u0, u1, c


def _bit_length(v):
    x = _u(v)
    n = jnp.zeros(x.shape, jnp.int32)
    for s in (16, 8, 4, 2, 1):
        big = x >= (jnp.uint32(1) << s)
        n = n + jnp.where(big, s, 0)
        x = jnp.where(big, x >> s, x)
    return n + _i(x > 0)


def _build_kernel(w: int, h: int, Wm: int, Wv: int, Ws: int,
                  chunk_steps: int, qw: int):
    """Kernel body closure for one (w, h, word-dims) geometry."""

    def kernel(q_smem, row0_smem, first_smem, hq1_smem,
               mel_ref, vlc_ref, ms_ref, dec0_ref, dec1_ref,
               out_ref, st_ref, state, lstate):
        j = pl.program_id(1)

        B = state.shape[1]

        @pl.when(j == 0)
        def _init():
            for r in range(_NSTATE):
                state[r:r + 1, :] = jnp.zeros((1, B), jnp.int32)
            lstate[...] = jnp.zeros_like(lstate[...])
            state[_V_W0:_V_W0 + 1, :] = _i(vlc_ref[0:1, :])
            state[_V_W1:_V_W1 + 1, :] = _i(vlc_ref[1:2, :])
            state[_V_W2:_V_W2 + 1, :] = _i(vlc_ref[2:3, :])
            state[_M_W0:_M_W0 + 1, :] = _i(mel_ref[0:1, :])
            state[_M_W1:_M_W1 + 1, :] = _i(mel_ref[1:2, :])
            state[_M_W2:_M_W2 + 1, :] = _i(mel_ref[2:3, :])
            state[_S_W0:_S_W0 + 1, :] = _i(ms_ref[0:1, :])
            state[_S_W1:_S_W1 + 1, :] = _i(ms_ref[1:2, :])
            state[_S_W2:_S_W2 + 1, :] = _i(ms_ref[2:3, :])
            # initial MEL run
            run, dbits, k2 = _mel_get_run(
                _i(mel_ref[0:1, :]), _i(mel_ref[1:2, :]),
                _i(mel_ref[2:3, :]), jnp.zeros((1, B), jnp.int32),
                jnp.zeros((1, B), jnp.int32))
            state[_M_RUN:_M_RUN + 1, :] = run
            state[_M_K:_M_K + 1, :] = k2
            state[_M_BO:_M_BO + 1, :] = dbits

        def mel_need_run(need, run, bo, k, w0, w1, w2, wp):
            r2, db, k2 = _mel_get_run(w0, w1, w2, bo, k)
            run = jnp.where(need, r2, run)
            bo = jnp.where(need, bo + db, bo)
            k = jnp.where(need, k2, k)
            wp, bo, w0, w1, w2 = _refill(mel_ref, Wm, -1, wp, bo,
                                         w0, w1, w2)
            return run, bo, k, w0, w1, w2, wp

        def decode_quad(qf, U_p, s_wp, s_bo, s_w0, s_w1, s_w2):
            mags = []
            signs = []
            exps = []
            sigs = []
            for n in range(4):
                sig = ((qf >> (4 + n)) & 1) == 1
                win = _fetch_win_lsb(s_w0, s_w1, s_w2, s_bo)
                m_n = _u(U_p - ((qf >> (12 + n)) & 1))
                sign = win & 1
                mask = jnp.where(
                    m_n < 32,
                    (jnp.uint32(1) << (m_n & jnp.uint32(31))) - 1,
                    jnp.uint32(0xFFFFFFFF))
                v_n = (win & mask) \
                    | (_u((qf >> (8 + n)) & 1) << (m_n & jnp.uint32(31))) \
                    | jnp.uint32(1)
                v_n = jnp.where(sig, v_n, jnp.uint32(0))
                s_bo = s_bo + jnp.where(sig, _i(m_n), 0)
                s_wp, s_bo, s_w0, s_w1, s_w2 = _refill(
                    ms_ref, Ws, -1, s_wp, s_bo, s_w0, s_w1, s_w2)
                mags.append(jnp.where(sig, (v_n + 2) >> 1, jnp.uint32(0)))
                signs.append(jnp.where(sig, sign, jnp.uint32(0)))
                exps.append(_bit_length(v_n))
                sigs.append(sig)
            return (mags, signs, exps[1], exps[3], sigs[1], sigs[3],
                    s_wp, s_bo, s_w0, s_w1, s_w2)

        def body(tl, _):
            t = j * chunk_steps + tl
            q = q_smem[t]
            row0s = row0_smem[t]
            firsts = first_smem[t]
            hq1s = hq1_smem[t]

            v_wp = state[_V_WP:_V_WP + 1, :]
            v_bo = state[_V_BO:_V_BO + 1, :]
            v_w0 = state[_V_W0:_V_W0 + 1, :]
            v_w1 = state[_V_W1:_V_W1 + 1, :]
            v_w2 = state[_V_W2:_V_W2 + 1, :]
            m_wp = state[_M_WP:_M_WP + 1, :]
            m_bo = state[_M_BO:_M_BO + 1, :]
            m_w0 = state[_M_W0:_M_W0 + 1, :]
            m_w1 = state[_M_W1:_M_W1 + 1, :]
            m_w2 = state[_M_W2:_M_W2 + 1, :]
            mel_run = state[_M_RUN:_M_RUN + 1, :]
            mel_k = state[_M_K:_M_K + 1, :]
            s_wp = state[_S_WP:_S_WP + 1, :]
            s_bo = state[_S_BO:_S_BO + 1, :]
            s_w0 = state[_S_W0:_S_W0 + 1, :]
            s_w1 = state[_S_W1:_S_W1 + 1, :]
            s_w2 = state[_S_W2:_S_W2 + 1, :]
            c_p = state[_C_P:_C_P + 1, :]
            ls0 = state[_LS0:_LS0 + 1, :]

            ls_q1 = lstate[pl.ds(q + 1, 1), 0, :]
            ls_q2 = lstate[pl.ds(q + 2, 1), 0, :]

            first = jnp.full(c_p.shape, firsts, jnp.bool_)
            row0 = jnp.full(c_p.shape, row0s, jnp.bool_)
            has_q1 = jnp.full(c_p.shape, hq1s, jnp.bool_)

            ls0 = jnp.where(first, lstate[0:1, 0, :], ls0)

            @pl.when(firsts == 1)
            def _():
                lstate[0:1, 0, :] = jnp.zeros((1, B), jnp.int32)

            c_p = jnp.where(first, 0, c_p)

            # select LUT once per step (row0 is a per-step scalar)
            dec = jnp.where(row0s == 1, _i(dec0_ref[...]),
                            _i(dec1_ref[...]))  # (1024, 1)
            iota1k = lax.broadcasted_iota(jnp.int32, (1024, B), 0)

            def lut(idx):
                m = iota1k == idx
                return jnp.sum(jnp.where(m, dec, 0), axis=0,
                               keepdims=True)

            # ---- quad 0 ----
            cq0 = jnp.where(row0, c_p,
                            c_p | (ls0 >> 7) | ((ls_q1 >> 5) & 4))
            win = _fetch_win_lsb(v_w0, v_w1, v_w2, v_bo)
            qf0 = lut((cq0 << 7) | _i(win & 0x7F))
            azc0 = cq0 == 0
            mel_run = mel_run - jnp.where(azc0, 2, 0)
            qf0 = jnp.where(azc0 & (mel_run != -1), 0, qf0)
            need = azc0 & (mel_run < 0)
            mel_run, m_bo, mel_k, m_w0, m_w1, m_w2, m_wp = mel_need_run(
                need, mel_run, m_bo, mel_k, m_w0, m_w1, m_w2, m_wp)
            c_p = jnp.where(
                row0,
                ((qf0 & 0x10) >> 4) | ((qf0 & 0xE0) >> 5),
                ((qf0 & 0x40) >> 5) | ((qf0 & 0x80) >> 6))
            v_bo = v_bo + (qf0 & 0x7)

            # ---- quad 1 ----
            cq1 = jnp.where(row0, c_p,
                            c_p | (ls_q1 >> 7) | ((ls_q2 >> 5) & 4))
            win = _fetch_win_lsb(v_w0, v_w1, v_w2, v_bo)
            qf1 = lut((cq1 << 7) | _i(win & 0x7F))
            azc1 = (cq1 == 0) & has_q1
            mel_run = mel_run - jnp.where(azc1, 2, 0)
            qf1 = jnp.where(azc1 & (mel_run != -1), 0, qf1)
            qf1 = jnp.where(has_q1, qf1, 0)
            need = azc1 & (mel_run < 0)
            mel_run, m_bo, mel_k, m_w0, m_w1, m_w2, m_wp = mel_need_run(
                need, mel_run, m_bo, mel_k, m_w0, m_w1, m_w2, m_wp)
            c_p = jnp.where(
                has_q1,
                jnp.where(row0,
                          ((qf1 & 0x10) >> 4) | ((qf1 & 0xE0) >> 5),
                          ((qf1 & 0x40) >> 5) | ((qf1 & 0x80) >> 6)),
                c_p)
            v_bo = v_bo + jnp.where(has_q1, qf1 & 0x7, 0)

            # ---- u values ----
            uvlc_mode = ((qf0 & 0x8) >> 3) | ((qf1 & 0x8) >> 2)
            m3 = uvlc_mode == 3
            mel_run = mel_run - jnp.where(row0 & m3, 2, 0)
            uvlc_mode = uvlc_mode + jnp.where(
                row0 & m3 & (mel_run == -1), 1, 0)
            need = row0 & m3 & (mel_run < 0)
            mel_run, m_bo, mel_k, m_w0, m_w1, m_w2, m_wp = mel_need_run(
                need, mel_run, m_bo, mel_k, m_w0, m_w1, m_w2, m_wp)
            win = _fetch_win_lsb(v_w0, v_w1, v_w2, v_bo)
            u0, u1, c_u = _uvlc_decode(win, uvlc_mode, row0)
            v_bo = v_bo + c_u
            v_wp, v_bo, v_w0, v_w1, v_w2 = _refill(
                vlc_ref, Wv, 0, v_wp, v_bo, v_w0, v_w1, v_w2)

            U_p0 = u0 + 1
            U_p1 = u1 + 1
            multi0 = ((qf0 & 0xF0) & ((qf0 & 0xF0) - 1)) != 0
            multi1 = ((qf1 & 0xF0) & ((qf1 & 0xF0) - 1)) != 0
            e0 = jnp.maximum(ls0 & 0x7F, ls_q1 & 0x7F) - 2
            e1 = jnp.maximum(ls_q1 & 0x7F, ls_q2 & 0x7F) - 2
            U_p0 = U_p0 + jnp.where((~row0) & multi0,
                                    jnp.maximum(e0, 0), 0)
            U_p1 = U_p1 + jnp.where((~row0) & multi1,
                                    jnp.maximum(e1, 0), 0)

            ls0 = jnp.where(row0, ls0, ls_q2)
            lstate[pl.ds(q + 1, 1), 0, :] = jnp.zeros((1, B), jnp.int32)
            lstate[pl.ds(q + 2, 1), 0, :] = jnp.zeros((1, B), jnp.int32)

            (m0, sg0, bl_e0, br_e0, bl_s0, br_s0,
             s_wp, s_bo, s_w0, s_w1, s_w2) = decode_quad(
                qf0, U_p0, s_wp, s_bo, s_w0, s_w1, s_w2)
            (m1, sg1, bl_e1, br_e1, bl_s1, br_s1,
             s_wp, s_bo, s_w0, s_w1, s_w2) = decode_quad(
                qf1, U_p1, s_wp, s_bo, s_w0, s_w1, s_w2)

            ent_q = lstate[pl.ds(q, 1), 0, :]
            ent_q = jnp.where(
                bl_s0,
                (ent_q & 0x80) | 0x80 | jnp.maximum(ent_q & 0x7F, bl_e0),
                ent_q)
            e_q1 = jnp.where(br_s0, 0x80 | br_e0, 0)
            e_q1 = jnp.where(
                bl_s1, (e_q1 & 0x80) | 0x80 | jnp.maximum(e_q1 & 0x7F,
                                                          bl_e1), e_q1)
            e_q2 = jnp.where(br_s1 & has_q1, 0x80 | br_e1, 0)
            lstate[pl.ds(q, 1), 0, :] = ent_q
            lstate[pl.ds(q + 1, 1), 0, :] = e_q1
            lstate[pl.ds(q + 2, 1), 0, :] = e_q2

            # pack sign in bit 31 (mags are (v+2)>>1 <= 2^30-ish)
            for n in range(4):
                out_ref[pl.ds(8 * tl + n, 1), :, :] = _i(
                    m0[n] | (sg0[n] << 31))[:, None, :]
                out_ref[pl.ds(8 * tl + 4 + n, 1), :, :] = _i(
                    m1[n] | (sg1[n] << 31))[:, None, :]

            state[_V_WP:_V_WP + 1, :] = v_wp
            state[_V_BO:_V_BO + 1, :] = v_bo
            state[_V_W0:_V_W0 + 1, :] = v_w0
            state[_V_W1:_V_W1 + 1, :] = v_w1
            state[_V_W2:_V_W2 + 1, :] = v_w2
            state[_M_WP:_M_WP + 1, :] = m_wp
            state[_M_BO:_M_BO + 1, :] = m_bo
            state[_M_W0:_M_W0 + 1, :] = m_w0
            state[_M_W1:_M_W1 + 1, :] = m_w1
            state[_M_W2:_M_W2 + 1, :] = m_w2
            state[_M_RUN:_M_RUN + 1, :] = mel_run
            state[_M_K:_M_K + 1, :] = mel_k
            state[_S_WP:_S_WP + 1, :] = s_wp
            state[_S_BO:_S_BO + 1, :] = s_bo
            state[_S_W0:_S_W0 + 1, :] = s_w0
            state[_S_W1:_S_W1 + 1, :] = s_w1
            state[_S_W2:_S_W2 + 1, :] = s_w2
            state[_C_P:_C_P + 1, :] = c_p
            state[_LS0:_LS0 + 1, :] = ls0
            return 0

        lax.fori_loop(0, chunk_steps, body, 0)
        st_ref[...] = state[...]

    return kernel


@functools.lru_cache(maxsize=64)
def _pallas_group_decoder(w: int, h: int, Wm: int, Wv: int, Ws: int,
                          B_pad: int, lane_tile: int = _LANE_TILE,
                          interpret: bool = False):
    """Compiled pallas decoder for one geometry. Takes (mel, vlc, ms)
    (W*, B_pad) uint32 word matrices, returns packed (T*8, B_pad) int32
    (sign<<31 | centered magnitude) in step-major sample order."""
    qw = (w + 1) // 2
    nx = (w + 3) // 4
    ny = (h + 1) // 2
    T = nx * ny
    chunk_steps = min(_STEP_CHUNK, T)
    t_pad = -(-T // chunk_steps) * chunk_steps
    bt = min(lane_tile, B_pad)
    n_lane = B_pad // bt

    xs_x = np.tile(np.arange(nx, dtype=np.int32) * 4, ny)
    q_arr = (xs_x >> 1).astype(np.int32)
    first_arr = ((np.arange(T, dtype=np.int32) % nx) == 0).astype(np.int32)
    row0_arr = ((np.arange(T, dtype=np.int32) // nx) == 0).astype(np.int32)
    hq1_arr = (xs_x + 2 < w).astype(np.int32)

    def padT(a):
        return np.pad(a, (0, t_pad - T))

    # keep kernel constants as NUMPY: run() may be traced inside a
    # larger jitted program, and device constants created during one
    # trace must not leak into another via this function's lru_cache
    q_np = padT(q_arr)
    row0_np = padT(row0_arr)
    first_np = padT(first_arr)
    hq1_np = padT(hq1_arr)
    dec0_np, dec1_np = ht_dec_jax._dec_tables()
    dec0_np = dec0_np.reshape(1024, 1)
    dec1_np = dec1_np.reshape(1024, 1)

    kernel = _build_kernel(w, h, Wm, Wv, Ws, chunk_steps, qw)
    grid = (n_lane, t_pad // chunk_steps)

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def run(mel, vlc, ms):
        q_c = jnp.asarray(q_np)
        row0_c = jnp.asarray(row0_np)
        first_c = jnp.asarray(first_np)
        hq1_c = jnp.asarray(hq1_np)
        dec0_c = jnp.asarray(dec0_np)
        dec1_c = jnp.asarray(dec1_np)
        out, _ = pl.pallas_call(
            kernel,
            grid=grid,
            interpret=interpret,
            in_specs=[
                smem_spec, smem_spec, smem_spec, smem_spec,
                pl.BlockSpec((Wm, bt), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wv, bt), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Ws, bt), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1024, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1024, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8 * chunk_steps, 1, bt),
                             lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_NSTATE, bt), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((8 * t_pad, 1, B_pad), jnp.int32),
                jax.ShapeDtypeStruct((_NSTATE, B_pad), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((_NSTATE, bt), jnp.int32),
                pltpu.VMEM((qw + 4, 1, bt), jnp.int32),
            ],
        )(q_c, row0_c, first_c, hq1_c,
          _i(mel), _i(vlc), _i(ms), dec0_c, dec1_c)
        return out[:8 * T, 0, :]

    return run, T, ny, nx


def supports(w: int, h: int, max_Up: int) -> bool:
    """Window-refill invariant: every MagSgn read consumes <= 32 bits."""
    return max_Up <= 32


def decode_group_pallas(w: int, h: int, interpret: bool = False):
    """Drop-in for ht_dec_jax.decode_group_core on real TPU hardware:
    (mel, vlc, ms) (W, B) uint32 -> (mags, signs) (B, 2*ny, 4*nx)."""

    def run(mel_words, vlc_words, ms_words):
        B = mel_words.shape[1]
        B_pad = -(-B // 128) * 128
        Wm, Wv, Ws = (mel_words.shape[0], vlc_words.shape[0],
                      ms_words.shape[0])

        def _padB(a):
            if a.shape[1] == B_pad:
                return a
            return jnp.pad(a, ((0, 0), (0, B_pad - a.shape[1])))

        fn, T, ny, nx = _pallas_group_decoder(w, h, Wm, Wv, Ws, B_pad,
                                              interpret=interpret)
        packed = fn(_padB(mel_words), _padB(vlc_words), _padB(ms_words))
        packed = packed.reshape(T, 8, B_pad)[:, :, :B]
        mags = _u(packed) & jnp.uint32(0x7FFFFFFF)
        signs = _u(packed) >> 31

        def to_grid(a):
            a = a.reshape(ny, nx, 2, 2, 2, B)
            a = a.transpose(5, 0, 4, 1, 2, 3)
            return a.reshape(B, 2 * ny, 4 * nx)

        return to_grid(mags), to_grid(signs)

    return run
