"""Pallas TPU kernel for the EBCOT Part-1 MQ DECODER slot walk.

The lax.scan formulation (ops/mq_dec_jax.decode_core) is correct but
~0.1 MP/s on TPU: every per-step neighbor read and every BYTEIN is an
XLA gather over (HW, B) / (L, B) matrices. This kernel removes all of
them from the hot path:

- The stuffing-aware BYTEIN is PRECOMPUTED. Annex C's byte-feed logic
  depends only on the byte VALUES (0xFF stuffing / >0x8F markers), not
  on the decode path, so the host prepass unstuffs each segment into a
  stream of 16-bit "field entries" (9-bit addend F + a 7-vs-8-bit
  flag): BYTEIN j is exactly `c += F_j << 8; ct = nbits_j` for every
  possible decode. In-kernel byteins become pure shifts out of a
  4-word register window per lane; the window refills by at most one
  word at a time with a one-hot select+reduce over the (Lw, s, 128)
  word block resident in VMEM (VPU work, no XLA gather).
- The significance/magnitude/sign and visited planes live in VMEM
  scratch as (HW+1, s, 128) lane blocks (row HW = zero sentinel for
  out-of-range neighbors); per-step reads/writes are dynamic sublane
  slices at statically-scheduled scalar indices (prefetched in SMEM).
- The flat slot schedule is regrouped into COLUMN-TRIPLE steps: one
  step per 4-sample stripe column per pass, doing all of that column's
  masked MQ decode units back to back (SPP: 4x(ZC+SC); MRP: 4; CLN:
  RL+UNI+UNI head + 4x(ZC+SC)). The 18-cell neighborhood box is
  gathered once per step and carried in registers, so within-column
  dependencies never touch VMEM.

The decode order and per-unit semantics are IDENTICAL to
ops/mq_dec_jax.decode_core (itself bit-exact vs the Annex-D oracle
t1/t1_np.py); enforced by tests/test_mq_dec_pallas.py. Scope: default
code-block style, one codeword segment (same scope as the scan core).

Reference counterpart: the scalar triple-pass decoder
src/lib/jp2/t1/t1_part1/t1.cpp:1038 + mqc.cpp (opj_mqc_decode); the
reference has no accelerator analog of this path at all.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from ..t1.mq import CTX_MAG, CTX_RL, CTX_SC, CTX_UNI, CTX_ZC
from .mq_jax import NCTX_WORDS, _CTX_INIT_PACKED, tbl_select
from .mq_dec_jax import _zc_ctx_rows, _sc_ctx_rows

# Two 0xFF/8-bit pad entries packed in one word: reads past the stream
# feed the decoder's infinite-1s tail (Annex C.3.4 past-the-end rule).
_PAD_WORD = 0x00FF00FF

# VMEM budget (bytes) the lane tiler sizes kernel calls against; also
# the scope gate for falling back to the XLA decoder on oversized
# single-segment buckets (segment length is attacker-controlled).
_VMEM_BUDGET = 10 << 20


# ---------------------------------------------------------------------------
# Host prepass: segment bytes -> field-entry words
# ---------------------------------------------------------------------------


def unstuff_fields(data: bytes, cap: int) -> np.ndarray:
    """Vectorized field-entry prepass for one segment.

    Entry 0 is the INITDEC first byte (consumed at << 16); entry j >= 1
    is the j-th BYTEIN result: bits 0..8 = addend F (c += F << 8),
    bit 15 set = stuffed 7-bit feed (ct = 7). Entries past the marker /
    end freeze stay 0x00FF (0xFF / 8 bits)."""
    out = np.full(cap, 0x00FF, np.uint16)
    end = len(data)
    if end == 0:
        return out
    arr = np.frombuffer(data, np.uint8)
    out[0] = arr[0]
    nxt = np.empty(end, np.uint16)
    nxt[:-1] = arr[1:]
    nxt[-1] = 0xFF
    is7 = arr == 0xFF
    marker = is7 & (nxt > 0x8F)
    mpos = int(np.argmax(marker)) if marker.any() else end
    n = min(mpos, cap - 1)
    f = np.where(is7[:n], (nxt[:n] << 1) | 0x8000, nxt[:n])
    out[1:1 + n] = f
    return out


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def pack_field_lanes(lanes):
    """Pack [(data, orient, numbps, numpasses), ...] into the kernel's
    blocked arrays. Returns ((words (Lw, S, 128) int32, g0, gend, ori
    each (1, S*128 -> (1, S, 128)) int32), (S, npl, Lw, s_tile)).

    Buckets: batch to a multiple of 128 lanes, entry capacity and plane
    count like mq_dec_jax.pack_lanes (stable jit keys)."""
    npl = -(-max(nb for (_, _, nb, _) in lanes) // 2) * 2
    maxlen = max(len(d) for (d, _, _, _) in lanes)
    cap = _bucket(maxlen + 4, 32)          # entries (16-bit)
    Lw = cap // 2
    B = len(lanes)
    S = max(1, -(-B // 128))
    Btot = S * 128
    fields = np.full((Btot, cap), 0x00FF, np.uint16)
    g0 = np.full(Btot, 3 * npl + 2, np.int32)   # pad lanes: never enabled
    gend = np.full(Btot, 3 * npl + 2, np.int32)
    ori = np.zeros(Btot, np.int32)
    for k, (d, o, nb, npas) in enumerate(lanes):
        fields[k] = unstuff_fields(d, cap)
        g0[k] = 3 * (npl - nb) + 2
        gend[k] = g0[k] + npas
        ori[k] = o
    words = (fields[:, 0::2].astype(np.uint32)
             | (fields[:, 1::2].astype(np.uint32) << 16)).astype(np.int32)
    # 8-word sublane blocks: (Lw/8, 8, S, 128). The kernel's window
    # refill one-hot then sums (8, s, 128) full-vreg rows over Lw/8
    # block indices instead of Lw sub-vreg rows — 8x cheaper at s = 1.
    Lwb = Lw // 8
    words = np.ascontiguousarray(
        words.reshape(Btot, Lwb, 8).transpose(1, 2, 0)).reshape(
            Lwb, 8, S, 128)

    def lane3(a):
        return a.reshape(1, S, 128)

    return ((words, lane3(g0), lane3(gend), lane3(ori)),
            (S, npl, Lw))


# ---------------------------------------------------------------------------
# Schedule: one entry per 4-sample stripe column (order matches
# mq_dec_jax._dec_schedule's column order: stripes down, x across).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _col_schedule(h: int, w: int):
    """(i0, flags) int32 arrays, one per stripe column. flags packs
    sh (bits 0-2) | xlo<<3 | xhi<<4 | rowvalid[0..5]<<5 where
    rowvalid[r] covers box row y0-1+r."""
    i0 = []
    flags = []
    for y0 in range(0, h, 4):
        sh = min(4, h - y0)
        for x in range(w):
            rv = 0
            for r in range(6):
                y = y0 - 1 + r
                if 0 <= y < h:
                    rv |= 1 << r
            fl = (sh | ((1 if x == 0 else 0) << 3)
                  | ((1 if x == w - 1 else 0) << 4) | (rv << 5))
            i0.append(y0 * w + x)
            flags.append(fl)
    return (np.asarray(i0, np.int32), np.asarray(flags, np.int32))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _build_kernel(h: int, w: int, Lw: int, nplanes: int, ncols: int,
                  s: int, HWp: int):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    HW = h * w

    def _u(x):
        return x.astype(jnp.uint32)

    def _i(x):
        return x.astype(jnp.int32)

    def kernel(i0_smem, fl_smem, g0_ref, gend_ref, ori_ref, words_ref,
               out_ref, magneg, vp):
        g0 = g0_ref[...]
        gend = gend_ref[...]
        ori = ori_ref[...]

        # ---- scratch init (chunked stores) ----
        zrow = jnp.zeros((128, s, 128), jnp.int32)
        mrow = jnp.full((128, s, 128), -1, jnp.int32)

        def zinit(i, _):
            magneg[pl.ds(i * 128, 128), :, :] = zrow
            vp[pl.ds(i * 128, 128), :, :] = mrow
            return 0

        lax.fori_loop(0, HWp // 128, zinit, 0)

        Lwb = Lw // 8
        NWIN = 16  # window words (two 8-word blocks, 32 entries)

        def fetch_block(bi):
            """8-word stream block bi as (8, s, 128): one-hot sum over
            the block axis — full-vreg rows, Lw/8 of them."""
            iota = lax.broadcasted_iota(jnp.int32, (Lwb, 8, s, 128), 0)
            m = iota == bi.reshape(1, 1, s, 128)
            v = jnp.sum(jnp.where(m, words_ref[...], 0), axis=0)
            return jnp.where(
                (bi >= Lwb).reshape(1, s, 128), jnp.int32(_PAD_WORD), v)

        def entry_at(win, bo):
            wi = bo >> 1
            wsel = win[0]
            for j in range(1, NWIN):
                wsel = jnp.where(wi == j, win[j], wsel)
            sh16 = _u((bo & 1) << 4)
            return _i((_u(wsel) >> sh16) & jnp.uint32(0xFFFF))

        def refill(st):
            (a, c, ct, wpb, bo) = st[:5]
            win = list(st[5:5 + NWIN])
            need = bo >= 16
            nb = fetch_block(wpb + 2)
            for j in range(8):
                win[j] = jnp.where(need, win[j + 8], win[j])
                win[j + 8] = jnp.where(need, nb[j:j + 1], win[j + 8])
            wpb = wpb + need.astype(jnp.int32)
            bo = bo - 16 * need.astype(jnp.int32)
            return (a, c, ct, wpb, bo) + tuple(win) + st[5 + NWIN:]

        def mq_unit(st, cx, en):
            """One masked MQ decode (mirrors mq_dec_jax.mq_dec_step,
            window bytein instead of segment gathers)."""
            (a, c, ct, wpb, bo) = st[:5]
            win = st[5:5 + NWIN]
            cps = list(st[5 + NWIN:])
            cw = cx >> 2
            sh8 = _u((cx & 3) << 3)
            pw = cps[0]
            for k in range(1, NCTX_WORDS):
                pw = jnp.where(cw == k, cps[k], pw)
            p = _i((_u(pw) >> sh8) & jnp.uint32(0x7F))
            idx = p >> 1
            mps = p & 1
            row = tbl_select(jnp, idx)
            qe = _u(row >> 13)
            nmps = (row >> 7) & 63
            nlps = (row >> 1) & 63
            sw = row & 1

            a1 = _i(_u(a) - qe)
            chigh = _u(c) >> 16
            lps_path = chigh < qe
            a_lt = a1 < _i(qe)

            d_l = jnp.where(a_lt, mps, 1 - mps)
            ns_l = jnp.where(a_lt, nmps, nlps)
            fl_l = (~a_lt) & (sw == 1)
            c_m = _u(c) - (qe << 16)
            rn_m = (a1 & 0x8000) == 0
            d_m = jnp.where(rn_m & a_lt, 1 - mps, mps)
            ns_m = jnp.where(a_lt, nlps, nmps)
            fl_m = rn_m & a_lt & (sw == 1)

            d = jnp.where(lps_path, d_l, d_m)
            c2 = jnp.where(lps_path, _u(c), c_m)
            a2 = jnp.where(lps_path, _i(qe), a1)
            renorm = lps_path | rn_m
            flip = (lps_path & fl_l) | (~lps_path & fl_m)
            newp = ((jnp.where(lps_path, ns_l, ns_m) << 1)
                    | jnp.where(flip, 1 - mps, mps))
            fmask = _i(jnp.uint32(0x7F) << sh8)
            newfield = _i((_u(newp) << sh8)) & fmask
            upd = en & renorm
            for k in range(NCTX_WORDS):
                cps[k] = jnp.where(upd & (cw == k),
                                   (cps[k] & ~fmask) | newfield, cps[k])

            # renorm shift count
            n = jnp.zeros_like(a2)
            t = jnp.where(renorm, a2, 0x8000)
            n = jnp.where(t < 0x100, n + 8, n)
            t = jnp.where(t < 0x100, t << 8, t)
            n = jnp.where(t < 0x1000, n + 4, n)
            t = jnp.where(t < 0x1000, t << 4, t)
            n = jnp.where(t < 0x4000, n + 2, n)
            t = jnp.where(t < 0x4000, t << 2, t)
            n = jnp.where(t < 0x8000, n + 1, n)
            n = jnp.where(en, n, 0)
            a3 = jnp.where(en & renorm, (a2 << n) & 0xFFFF,
                           jnp.where(en, a2, a))
            c3, ct3 = c2, ct
            nrem = n
            for _ in range(3):
                bi = en & (nrem > 0) & (ct3 == 0)
                e = entry_at(win, bo)
                c3 = jnp.where(bi, c3 + (_u(e & 0x1FF) << 8), c3)
                ct3 = jnp.where(bi, 8 - (e >> 15), ct3)
                bo = bo + bi.astype(jnp.int32)
                sft = jnp.minimum(nrem, ct3)
                c3 = c3 << _u(sft)
                ct3 = ct3 - sft
                nrem = nrem - sft
            c3 = _i(jnp.where(en, c3, _u(c)))
            ct3 = jnp.where(en, ct3, ct)
            d = jnp.where(en, d, 0)
            st = (a3, c3, ct3, wpb, bo) + tuple(win) + tuple(cps)
            return d, refill(st)

        # ---- INITDEC ----
        vshape = (1, s, 128)
        win0 = [_i(jnp.reshape(words_ref[b:b + 1, j:j + 1, :, :],
                               (1, s, 128)))
                for b in range(2) for j in range(8)]
        w0 = win0[0]
        e0 = w0 & 0xFFFF
        c = (_u(e0 & 0x1FF) << 16)
        e1 = _i((_u(w0) >> 16)) & 0xFFFF
        c = c + (_u(e1 & 0x1FF) << 8)
        ct = 8 - (e1 >> 15)
        c = _i(c << 7)
        ct = ct - 7
        a = jnp.full(vshape, 0x8000, jnp.int32)
        wpb = jnp.zeros(vshape, jnp.int32)
        bo = jnp.full(vshape, 2, jnp.int32)
        st = (a, c, ct, wpb, bo) + tuple(win0) + tuple(
            jnp.full(vshape, v, jnp.int32) for v in _CTX_INIT_PACKED)

        def box_reads(ci):
            """SMEM scalars + the 18 box indices (sentinel HW)."""
            i0 = i0_smem[ci]
            fl = fl_smem[ci]
            shc = fl & 7
            xlo = (fl >> 3) & 1
            xhi = (fl >> 4) & 1
            idxs = {}
            for r in range(6):
                rv = (fl >> (5 + r)) & 1
                for cc in range(3):
                    v = rv
                    if cc == 0:
                        v = v * (1 - xlo)
                    if cc == 2:
                        v = v * (1 - xhi)
                    ii = i0 + (r - 1) * w + (cc - 1)
                    idxs[(r, cc)] = jnp.where(v == 1, ii, HW)
            return i0, shc, idxs

        def gather_box(idxs):
            return {k: magneg[pl.ds(v, 1), :, :] for k, v in idxs.items()}

        def nbr8(mn, own, k):
            """Neighbor cells of sample k in _OFFS order: left/right
            columns from the step-start box registers, own column from
            the live (within-column updated) registers."""
            return [mn[(k, 0)], own[k], mn[(k, 2)],
                    mn[(k + 1, 0)], mn[(k + 1, 2)],
                    mn[(k + 2, 0)], own[k + 2], mn[(k + 2, 2)]]

        def sig_of(x):
            return ((x & 0x7FFFFFFF) != 0).astype(jnp.int32)

        def neg_of(x):
            return _i(_u(x) >> 31)

        def make_plane_body(phase):
            def plane_phase(p, st, plane, bit, en_pass):
                def col_body(ci, st):
                    i0, shc, idxs = box_reads(ci)
                    mn = gather_box(idxs)
                    own_idx = [idxs[(k + 1, 1)] for k in range(4)]
                    vpo = [vp[pl.ds(own_idx[k], 1), :, :]
                           for k in range(4)]
                    own = {r: mn[(r, 1)] for r in range(6)}

                    if phase == 2:
                        # CLN head (full stripes only)
                        box_sig = jnp.zeros(vshape, bool)
                        for v in mn.values():
                            box_sig = box_sig | ((v & 0x7FFFFFFF) != 0)
                        col_vis = jnp.zeros(vshape, bool)
                        for k in range(4):
                            col_vis = col_vis | (vpo[k] == plane)
                        full = jnp.full(vshape, shc, jnp.int32) == 4
                        m_rl = en_pass & full & ~box_sig & ~col_vis
                        rl_cx = jnp.full(vshape, CTX_RL, jnp.int32)
                        d, st = mq_unit(st, rl_cx, m_rl)
                        run = m_rl & (d == 1)
                        skip = m_rl & (d == 0)
                        uni_cx = jnp.full(vshape, CTX_UNI, jnp.int32)
                        d1, st = mq_unit(st, uni_cx, run)
                        d2, st = mq_unit(st, uni_cx, run)
                        rr = (d1 << 1) | d2
                    else:
                        run = skip = None
                        rr = None

                    for k in range(4):
                        enk = jnp.full(vshape, shc, jnp.int32) > k
                        cell = own[k + 1]
                        mag = cell & 0x7FFFFFFF
                        sig = mag != 0
                        nb = nbr8(mn, own, k)
                        nb_sig8 = [sig_of(x) for x in nb]
                        nb_neg8 = [neg_of(x) for x in nb]
                        nb_any = (nb_sig8[0] + nb_sig8[1] + nb_sig8[2]
                                  + nb_sig8[3] + nb_sig8[4] + nb_sig8[5]
                                  + nb_sig8[6] + nb_sig8[7]) > 0

                        if phase == 0:   # SPP: ZC + SC
                            zc = _zc_ctx_rows(jnp, nb_sig8, ori)
                            sc, spb = _sc_ctx_rows(jnp, nb_sig8, nb_neg8)
                            m_zc = (en_pass & enk & ~sig & nb_any)
                            d, st = mq_unit(st, zc, m_zc)
                            vpo[k] = jnp.where(m_zc, plane, vpo[k])
                            pend = m_zc & (d == 1)
                            d2, st = mq_unit(st, sc, pend)
                            sgn = jnp.where(pend, d2 ^ spb, 0)
                            own[k + 1] = jnp.where(
                                pend, cell | bit | (sgn << 31), cell)
                        elif phase == 1:  # MRP
                            visited = vpo[k] == plane
                            shr = jnp.minimum(plane + 2, 31)
                            refined = (_u(mag) >> _u(
                                jnp.full(vshape, shr, jnp.int32))) != 0
                            mag_cx = jnp.where(
                                refined, CTX_MAG + 2,
                                CTX_MAG + nb_any.astype(jnp.int32))
                            m_mrp = en_pass & enk & sig & ~visited
                            d, st = mq_unit(st, mag_cx, m_mrp)
                            own[k + 1] = jnp.where(m_mrp & (d == 1),
                                                   cell | bit, cell)
                        else:            # CLN: ZC + SC
                            zc = _zc_ctx_rows(jnp, nb_sig8, ori)
                            sc, spb = _sc_ctx_rows(jnp, nb_sig8, nb_neg8)
                            visited = vpo[k] == plane
                            k_eq_r = run & (rr == k)
                            skip_col = skip | (run & (rr > k))
                            m_zc = (en_pass & enk & ~sig & ~visited
                                    & ~skip_col & ~k_eq_r)
                            d, st = mq_unit(st, zc, m_zc)
                            pend = ((m_zc & (d == 1))
                                    | (k_eq_r & en_pass & enk))
                            d2, st = mq_unit(st, sc, pend)
                            sgn = jnp.where(pend, d2 ^ spb, 0)
                            own[k + 1] = jnp.where(
                                pend, cell | bit | (sgn << 31), cell)

                    for k in range(4):
                        magneg[pl.ds(own_idx[k], 1), :, :] = own[k + 1]
                        if phase == 0:
                            vp[pl.ds(own_idx[k], 1), :, :] = vpo[k]
                    return st

                return lax.fori_loop(0, ncols, col_body, st)

            return plane_phase

        phase_fns = [make_plane_body(ph) for ph in range(3)]

        def plane_body(p, st):
            plane = nplanes - 1 - p
            bit = jnp.int32(1) << plane
            for ph in range(3):
                g = 3 * p + ph
                en_pass = (g >= g0) & (g < gend)
                st = phase_fns[ph](p, st, plane, bit, en_pass)
            return st

        st = lax.fori_loop(0, nplanes, plane_body, st)

        nfull = HW // 128

        def copy_body(i, _):
            out_ref[pl.ds(i * 128, 128), :, :] = magneg[
                pl.ds(i * 128, 128), :, :]
            return 0

        if nfull:  # static guard: the body traces a 128-row store even
            # at trip count 0, which interpret-mode discharge rejects
            # for HW < 128
            lax.fori_loop(0, nfull, copy_body, 0)
        if HW % 128:
            out_ref[nfull * 128:HW, :, :] = magneg[nfull * 128:HW, :, :]

    return kernel


def mq_pallas_fits(h: int, w: int, seg_len: int) -> bool:
    """True when a code-block of (h, w) with a segment of seg_len bytes
    fits the kernel's VMEM budget at the minimum (s = 1) lane tile.
    Oversized segments (legal but long — the length is
    attacker-controlled on decode) must take the XLA decoder instead of
    failing Mosaic compilation."""
    HW = h * w
    HWp = -(-(HW + 1) // 128) * 128
    Lw = _bucket(seg_len + 4, 32) // 2
    budget = _VMEM_BUDGET // 4 // 128
    return (2 * HWp + Lw + HW) <= budget


def _lane_tile(HW: int, Lw: int, S_tot: int) -> int:
    """Sublane count per kernel call, bounded by the VMEM budget for
    2 state planes + stream words + the out block."""
    HWp = -(-(HW + 1) // 128) * 128
    budget = _VMEM_BUDGET // 4 // 128
    s = 1
    while s * 2 <= 8 and (2 * HWp + Lw + HW) * (s * 2) <= budget:
        s *= 2
    return min(s, S_tot)


@functools.lru_cache(maxsize=64)
def _pallas_mq_decoder_tile(h: int, w: int, Lw: int, s: int,
                            nplanes: int, interpret: bool = False):
    """One-kernel-call decoder for an s-sublane lane tile (grid of 1:
    Mosaic requires lane-vector block sublane dims to equal the array's,
    so batches wider than the VMEM budget are split into separate calls
    by _pallas_mq_decoder rather than grid-tiled)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HW = h * w
    HWp = -(-(HW + 1) // 128) * 128
    i0_np, fl_np = _col_schedule(h, w)
    ncols = len(i0_np)
    kernel = _build_kernel(h, w, Lw, nplanes, ncols, s, HWp)

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    lane_spec = pl.BlockSpec((1, s, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    def run(words, g0, gend, ori):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            interpret=interpret,
            in_specs=[
                smem_spec, smem_spec,
                lane_spec, lane_spec, lane_spec,
                pl.BlockSpec((Lw // 8, 8, s, 128),
                             lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((HW, s, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((HW, s, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((HWp, s, 128), jnp.int32),
                pltpu.VMEM((HWp, s, 128), jnp.int32),
            ],
        )(jnp.asarray(i0_np), jnp.asarray(fl_np), g0, gend, ori, words)

    return run


@functools.lru_cache(maxsize=64)
def _pallas_mq_decoder(h: int, w: int, Lw: int, S_tot: int, nplanes: int,
                       interpret: bool = False):
    """Traceable decoder for one geometry bucket. Takes the
    pack_field_lanes arrays; returns (HW, S_tot*128) packed int32
    (sign<<31 | magnitude). Splits the batch into VMEM-sized lane
    tiles, one kernel call each (XLA queues them back to back)."""
    import jax.numpy as jnp

    HW = h * w
    s = _lane_tile(HW, Lw, S_tot)
    tile = _pallas_mq_decoder_tile(h, w, Lw, s, nplanes, interpret)

    S_pad = -(-S_tot // s) * s

    def run(words, g0, gend, ori):
        if S_pad != S_tot:
            # pad lanes idle: g0 == gend == 0 never enables a pass
            pad = ((0, 0), (0, S_pad - S_tot), (0, 0))
            g0, gend, ori = (jnp.pad(a, pad) for a in (g0, gend, ori))
            words = jnp.pad(
                words, ((0, 0), (0, 0), (0, S_pad - S_tot), (0, 0)))
        outs = []
        for k in range(0, S_pad, s):
            sl = (slice(None), slice(k, k + s), slice(None))
            sw = (slice(None), slice(None), slice(k, k + s), slice(None))
            outs.append(tile(words[sw], g0[sl], gend[sl], ori[sl]))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        return out.reshape(HW, S_pad * 128)[:, :S_tot * 128]

    return run


def decode_core_pallas(h: int, w: int, S_tot: int, nplanes: int, Lw: int,
                       interpret: bool = False):
    """Traceable core for one shape group: fn(words, g0, gend, ori) ->
    (HW, B) packed int32 (composable into fused decode programs)."""
    return _pallas_mq_decoder(h, w, Lw, S_tot, nplanes, interpret)


@functools.lru_cache(maxsize=64)
def _jitted_pallas_decode(h: int, w: int, Lw: int, S_tot: int,
                          nplanes: int, interpret: bool = False):
    """jit-wrapped standalone entry: without the jit wrapper every call
    re-traces the (large) kernel on the host — ~1000x the device time."""
    import jax
    return jax.jit(_pallas_mq_decoder(h, w, Lw, S_tot, nplanes, interpret))


def decode_blocks(blocks, interpret: bool = False
                  ) -> List[Optional[Tuple[np.ndarray, np.ndarray]]]:
    """Drop-in for mq_dec_jax.decode_blocks running the Pallas kernel:
    [(data, w, h, orient, numbps, numpasses), ...] -> [(mag, neg), ...].
    Groups by (shape, entry-capacity bucket) so short segments never pay
    a long segment's refill cost."""
    import jax.numpy as jnp

    out: List = [None] * len(blocks)
    groups = {}
    oversize = []
    for bi, (data, w, h, orient, nb, npas) in enumerate(blocks):
        if nb <= 0 or npas <= 0:
            out[bi] = (np.zeros((h, w), np.uint32),
                       np.zeros((h, w), np.uint8))
            continue
        if not mq_pallas_fits(h, w, len(data)):
            # segment too long for the s=1 VMEM tile: XLA decoder
            oversize.append(bi)
            continue
        cap = _bucket(len(data) + 4, 32)
        groups.setdefault((h, w, cap), []).append(bi)
    if oversize:
        from . import mq_dec_jax
        big = mq_dec_jax.decode_blocks([blocks[i] for i in oversize])
        for i, r in zip(oversize, big):
            out[i] = r
    for (h, w, cap), idxs in sorted(groups.items()):
        lanes = [(blocks[i][0], blocks[i][3], blocks[i][4], blocks[i][5])
                 for i in idxs]
        (words, g0, gend, ori), (S, npl, Lw) = pack_field_lanes(lanes)
        fn = _jitted_pallas_decode(h, w, Lw, S, npl, interpret)
        packed = np.asarray(fn(jnp.asarray(words), jnp.asarray(g0),
                               jnp.asarray(gend), jnp.asarray(ori)))
        mags = (packed.astype(np.uint32) & 0x7FFFFFFF)
        negs = (packed.astype(np.uint32) >> 31).astype(np.uint8)
        for k, i in enumerate(idxs):
            out[i] = (mags[:, k].reshape(h, w),
                      negs[:, k].reshape(h, w))
    return out
