"""Device (TPU) EBCOT Tier-1 Part-1 DECODER: lane-parallel MQ slot walk.

Encoding could precompute its whole decision stream because the stream
is a static function of the magnitudes (ops/mq_jax.py). Decoding cannot
— pass membership and contexts depend on the bits being decoded — so
the device formulation keeps the TRUE sequential block state in the
scan carry and walks the same static visit schedule the encoder's slot
layout uses:

  per plane: [SPP (zc, sc) per sample | MRP per sample |
              CLN per column: (rl, uni, uni) heads + (zc, sc) per sample]

Every step operates on a whole lane vector of code-blocks at once: the
(h*w)-sample significance/magnitude/sign planes live as (HW+1, B)
arrays in the carry (+1 = zero sentinel row for out-of-range neighbor
indices), the step gathers the slot's statically-known neighbor rows,
computes membership and context from the lane's own state, runs one
masked MQ *decoder* step (table-driven interval subdivision with
stuffing-aware BYTEIN, C.3.2/C.3.3), and scatters the decoded bit back
into the state rows. Blocks ride the lanes exactly like the encoder
scan; a lane whose block has fewer bitplanes or passes is masked idle
by its (numbps, numpasses) window.

Scope: default code-block style (no bypass/termination/VSC), encoder
segment layout (one codeword segment). Callers with other styles use
the host coder. Bit-exact with t1/t1_np.decode_cblk (the Annex-D
oracle); enforced by tests/test_mq_dec_device.py.

Reference counterpart: the scalar triple-pass decoder
src/lib/jp2/t1/t1_part1/t1.cpp:1038 + mqc.cpp (opj_mqc_decode); there
is no accelerator analog in the reference.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from ..t1.mq import CTX_MAG, CTX_RL, CTX_SC, CTX_UNI, CTX_ZC, MQ_TABLE
from .mq_jax import NCTX_WORDS, _CTX_INIT_PACKED, tbl_select

# slot kinds
K_SPP_ZC, K_SPP_SC, K_MRP = 0, 1, 2
K_RL, K_UNI1, K_UNI2, K_CLN_ZC, K_CLN_SC = 3, 4, 5, 6, 7

# neighbor offset order shared with the context formulas below
_OFFS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
         (1, -1), (1, 0), (1, 1))
_NBR_W = 18  # 8 sample neighbors, or the 6x3 aggregation box (RL slots)


@functools.lru_cache(maxsize=128)
def _dec_schedule(h: int, w: int):
    """Static per-plane visit schedule for an (h, w) block.

    Returns dict of numpy arrays of length Tp: kind, idx (flat y*w+x),
    nbr (Tp, 18) flat neighbor indices (-1 out of range), kcol (sample
    index within its 4-row column; heads carry 0), ptype (0 SPP, 1 MRP,
    2 CLN)."""
    def flat(y, x):
        return y * w + x

    def nbrs8(y, x):
        out = []
        for (dy, dx) in _OFFS:
            yy, xx = y + dy, x + dx
            out.append(flat(yy, xx) if 0 <= yy < h and 0 <= xx < w else -1)
        return out + [-1] * (_NBR_W - 8)

    def box18(y0, x):
        out = []
        for yy in range(y0 - 1, y0 + 5):
            for xx in range(x - 1, x + 2):
                out.append(flat(yy, xx)
                           if 0 <= yy < h and 0 <= xx < w else -1)
        return out

    kind: List[int] = []
    idx: List[int] = []
    nbr: List[List[int]] = []
    kcol: List[int] = []
    ptype: List[int] = []
    creset: List[int] = []

    def emit(k, i, n, kc, pt, cr=0):
        kind.append(k)
        idx.append(i)
        nbr.append(n)
        kcol.append(kc)
        ptype.append(pt)
        creset.append(cr)

    cols = []
    for y0 in range(0, h, 4):
        sh = min(4, h - y0)
        for x in range(w):
            cols.append((y0, x, sh))
    # SPP
    for (y0, x, sh) in cols:
        for k in range(sh):
            n = nbrs8(y0 + k, x)
            emit(K_SPP_ZC, flat(y0 + k, x), n, k, 0)
            emit(K_SPP_SC, flat(y0 + k, x), n, k, 0)
    # MRP
    for (y0, x, sh) in cols:
        for k in range(sh):
            emit(K_MRP, flat(y0 + k, x), nbrs8(y0 + k, x), k, 1)
    # CLN
    for (y0, x, sh) in cols:
        if sh == 4:
            emit(K_RL, flat(y0, x), box18(y0, x), 0, 2)
            emit(K_UNI1, flat(y0, x), [-1] * _NBR_W, 0, 2)
            emit(K_UNI2, flat(y0, x), [-1] * _NBR_W, 0, 2)
        for k in range(sh):
            n = nbrs8(y0 + k, x)
            # partial stripes have no RL head: the first sample slot
            # must clear any run state left by the previous column
            emit(K_CLN_ZC, flat(y0 + k, x), n, k, 2,
                 cr=1 if (sh < 4 and k == 0) else 0)
            emit(K_CLN_SC, flat(y0 + k, x), n, k, 2)

    return dict(
        kind=np.asarray(kind, np.int32),
        idx=np.asarray(idx, np.int32),
        nbr=np.asarray(nbr, np.int32),
        kcol=np.asarray(kcol, np.int32),
        ptype=np.asarray(ptype, np.int32),
        creset=np.asarray(creset, np.int32),
    )


def _bytein(jnp, c, ct, pos, seg, end, en):
    """Masked BYTEIN (C.3.4 decoder form, mirrors t1/mq.py _bytein)."""
    L = seg.shape[0]
    posc = jnp.clip(pos, 0, L - 1)
    cur = jnp.take_along_axis(seg, posc[None, :], axis=0)[0]
    posn = jnp.clip(pos + 1, 0, L - 1)
    nxt0 = jnp.take_along_axis(seg, posn[None, :], axis=0)[0]
    nxt = jnp.where(pos + 1 < end, nxt0, 0xFF).astype(jnp.uint32)
    in_r = pos < end
    ff = in_r & (cur == 0xFF)
    marker = ff & (nxt > 0x8F)
    # four cases: marker / stuffed / normal / past-end
    c_new = jnp.where(
        marker | ~in_r, c + jnp.uint32(0xFF00),
        jnp.where(ff, c + (nxt << 9), c + (nxt << 8)))
    ct_new = jnp.where(ff & ~marker, 7, 8)
    pos_new = jnp.where(in_r & ~marker, pos + 1, pos)
    return (jnp.where(en, c_new, c), jnp.where(en, ct_new, ct),
            jnp.where(en, pos_new, pos))


def mq_dec_step(jnp, regs, cps, seg, end, cx, en):
    """One masked MQ decode (C.3.2 DECODE + renorm/bytein).

    regs: (a, c, ct, pos) int32/uint32 lane vectors; cps: packed context
    state words (list, updated in place semantics — returns new list).
    Returns (d, regs', cps')."""
    a, c, ct, pos = regs
    cw = cx >> 2
    sh = (cx & 3) << 3
    pw = cps[0]
    for k in range(1, NCTX_WORDS):
        pw = jnp.where(cw == k, cps[k], pw)
    p = (pw >> sh) & 0x7F
    idx = p >> 1
    mps = p & 1
    row = tbl_select(jnp, idx)
    qe = (row >> 13).astype(jnp.uint32)
    nmps = (row >> 7) & 63
    nlps = (row >> 1) & 63
    sw = row & 1

    a1 = (a.astype(jnp.uint32) - qe).astype(jnp.int32)
    chigh = c >> 16
    lps_path = chigh < qe
    a_lt = a1 < qe.astype(jnp.int32)

    # LPS-exchange branch (chigh < qe): a := qe, always renorm
    d_l = jnp.where(a_lt, mps, 1 - mps)
    ns_l = jnp.where(a_lt, nmps, nlps)
    fl_l = (~a_lt) & (sw == 1)          # MPS flip on true LPS
    # MPS branch: c -= qe<<16; renorm iff a1 lost bit 15
    c_m = c - (qe << 16)
    rn_m = (a1 & 0x8000) == 0
    d_m = jnp.where(rn_m & a_lt, 1 - mps, mps)
    ns_m = jnp.where(a_lt, nlps, nmps)
    fl_m = rn_m & a_lt & (sw == 1)

    d = jnp.where(lps_path, d_l, d_m)
    c2 = jnp.where(lps_path, c, c_m)
    a2 = jnp.where(lps_path, qe.astype(jnp.int32), a1)
    renorm = lps_path | rn_m
    trans = renorm                       # state transitions iff renorm
    newp = ((jnp.where(lps_path, ns_l, ns_m) << 1)
            | jnp.where(jnp.where(lps_path, fl_l, fl_m),
                        1 - mps, mps))
    fmask = jnp.full_like(cx, 0x7F) << sh
    newfield = (newp << sh) & fmask
    upd = en & trans
    cps = list(cps)
    for k in range(NCTX_WORDS):
        cps[k] = jnp.where(upd & (cw == k),
                           (cps[k] & ~fmask) | newfield, cps[k])

    # renorm shift count: bits to bring a2's bit 15 up
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
    a3 = jnp.where(en & renorm, (a2 << n) & 0xFFFF, jnp.where(en, a2, a))
    c3, ct3, pos3 = c2, ct, pos
    nrem = n
    for _ in range(4):
        bi = en & (nrem > 0) & (ct3 == 0)
        c3, ct3, pos3 = _bytein(jnp, c3, ct3, pos3, seg, end, bi)
        s = jnp.minimum(nrem, ct3)
        c3 = (c3 << s.astype(jnp.uint32)).astype(jnp.uint32)
        ct3 = ct3 - s
        nrem = nrem - s
    c3 = jnp.where(en, c3, c)
    ct3 = jnp.where(en, ct3, ct)
    pos3 = jnp.where(en, pos3, pos)
    d = jnp.where(en, d, 0)
    return d, (a3, c3, ct3, pos3), cps


def _zc_ctx_rows(jnp, nbsig, orient):
    """Table D.1 from gathered neighbor significance rows (8, B)."""
    hh = nbsig[3] + nbsig[4]
    vv = nbsig[1] + nbsig[6]
    dd = nbsig[0] + nbsig[2] + nbsig[5] + nbsig[7]
    h_ = jnp.where(orient == 1, vv, hh)
    v_ = jnp.where(orient == 1, hh, vv)
    hv = h_ + v_
    ll = jnp.where(
        h_ == 2, 8,
        jnp.where(h_ == 1,
                  jnp.where(v_ >= 1, 7, jnp.where(dd >= 1, 6, 5)),
                  jnp.where(v_ == 2, 4,
                            jnp.where(v_ == 1, 3,
                                      jnp.where(dd >= 2, 2,
                                                jnp.where(dd == 1, 1,
                                                          0))))))
    hh_f = jnp.where(
        dd >= 3, 8,
        jnp.where(dd == 2, jnp.where(hv >= 1, 7, 6),
                  jnp.where(dd == 1,
                            jnp.where(hv >= 2, 5, jnp.where(hv == 1, 4, 3)),
                            jnp.where(hv >= 2, 2, jnp.where(hv == 1, 1,
                                                            0)))))
    return CTX_ZC + jnp.where(orient == 3, hh_f, ll)


def _sc_ctx_rows(jnp, nbsig, nbneg):
    """Sign context + prediction from gathered h/v neighbor rows."""
    def contrib(i):
        return nbsig[i] * (1 - 2 * nbneg[i])

    hc = jnp.clip(contrib(3) + contrib(4), -1, 1)
    vc = jnp.clip(contrib(1) + contrib(6), -1, 1)
    spb = ((hc < 0) | ((hc == 0) & (vc < 0))).astype(jnp.int32)
    hc2 = jnp.where(spb == 1, -hc, hc)
    vc2 = jnp.where(spb == 1, -vc, vc)
    off = jnp.where(hc2 == 1,
                    jnp.where(vc2 == 1, 4, jnp.where(vc2 == 0, 3, 2)),
                    jnp.where(vc2 == 1, 1, 0))
    return CTX_SC + off, spb


@functools.lru_cache(maxsize=64)
def decode_core(h: int, w: int, B: int, nplanes: int):
    """Traceable decode core for one shape group: fn(seg (L, B) uint8,
    end, nbps, npasses, orient) -> ((HW, B) int32 magnitudes, signs).
    Un-jitted so callers can compose it into larger fused programs
    (models/fused_decode.py); _jitted_mq_decode wraps it for the
    standalone block API."""
    import jax
    import jax.numpy as jnp

    sched = _dec_schedule(h, w)
    HW = h * w
    Tp = len(sched["kind"])

    xs = {
        k: jnp.asarray(np.tile(sched[k], (nplanes,) + (1,) * (
            sched[k].ndim - 1)).reshape((nplanes * Tp,) + sched[k].shape[1:]))
        for k in ("kind", "idx", "nbr", "kcol", "ptype", "creset")
    }
    planes = np.repeat(np.arange(nplanes - 1, -1, -1, dtype=np.int32), Tp)
    xs["plane"] = jnp.asarray(planes)
    # global pass number of each slot (0 = CLN of the TOP plane would be
    # g=2 for a full-depth lane; lanes offset by their own numbps)
    xs["g"] = jnp.asarray(3 * (nplanes - 1 - planes)
                          + np.tile(np.asarray(sched["ptype"], np.int32),
                                    nplanes))

    def run(seg, end, nbps, npasses, orient):
        # INITDEC (C.3.5)
        b0 = jnp.where(end > 0, seg[0].astype(jnp.uint32), 0xFF)
        c = b0 << 16
        pos = jnp.zeros((B,), jnp.int32)
        ct = jnp.zeros((B,), jnp.int32)
        c, ct, pos = _bytein(jnp, c, ct, pos,
                             seg, end, jnp.ones((B,), bool))
        c = c << 7
        ct = ct - 7
        a = jnp.full((B,), 0x8000, jnp.int32)
        cps = [jnp.full((B,), v, jnp.int32) for v in _CTX_INIT_PACKED]

        # lane pass window: first pass = CLN of plane nbps-1
        g0 = 3 * (nplanes - nbps) + 2
        gend = g0 + npasses

        magf = jnp.zeros((HW + 1, B), jnp.uint32)
        negf = jnp.zeros((HW + 1, B), jnp.int32)
        vpf = jnp.full((HW + 1, B), -1, jnp.int32)

        pend = jnp.zeros((B,), jnp.int32)     # sign decode pending
        colmode = jnp.zeros((B,), jnp.int32)  # 0 normal, 1 skip, 2 run
        rrun = jnp.zeros((B,), jnp.int32)

        def gather(rows, ind):
            ii = jnp.where(ind < 0, HW, ind)
            return jnp.take(rows, ii, axis=0)

        def step(carry, x):
            (a, c, ct, pos, cps, magf, negf, vpf, pend, colmode,
             rrun) = carry
            # all schedule fields are per-step SCALARS (the visit
            # order is static and shared by every lane)
            kind = x["kind"]
            i = x["idx"]
            plane = x["plane"]
            valid = (x["g"] >= g0) & (x["g"] < gend)   # (B,)

            own_mag = magf[i]                          # (B,)
            own_vp = vpf[i]
            sig = own_mag != 0
            visited = own_vp == plane
            nb_mag = gather(magf, x["nbr"])            # (18, B)
            nb_sig8 = (nb_mag[:8] != 0).astype(jnp.int32)
            nb_any = nb_sig8.sum(axis=0) > 0
            nb_neg8 = gather(negf, x["nbr"][:8])

            zc = _zc_ctx_rows(jnp, nb_sig8, orient)
            sc, spb = _sc_ctx_rows(jnp, nb_sig8, nb_neg8)
            refined = (own_mag >> jnp.minimum(
                plane.astype(jnp.uint32) + 2, 31)) != 0
            mag_cx = jnp.where(refined, CTX_MAG + 2,
                               CTX_MAG + nb_any.astype(jnp.int32))

            is_spp_zc = kind == K_SPP_ZC
            is_spp_sc = kind == K_SPP_SC
            is_mrp = kind == K_MRP
            is_rl = kind == K_RL
            is_uni = (kind == K_UNI1) | (kind == K_UNI2)
            is_cln_zc = kind == K_CLN_ZC
            is_cln_sc = kind == K_CLN_SC

            # partial-stripe columns have no RL head: clear run state
            colmode = jnp.where(is_cln_zc & (x["creset"] == 1),
                                0, colmode)

            # membership per kind
            m_spp_zc = is_spp_zc & valid & ~sig & nb_any
            m_mrp = is_mrp & valid & sig & ~visited
            # CLN aggregation: no significance in the 6x3 box and no
            # visited sample among the 4 column cells
            col_cells = i + jnp.asarray([0, w, 2 * w, 3 * w], jnp.int32)
            col_vp = gather(vpf, jnp.where(is_rl, col_cells, -1))
            col_visited = (col_vp == plane).any(axis=0)
            box_sig = (nb_mag != 0).any(axis=0)
            m_rl = is_rl & valid & ~box_sig & ~col_visited
            m_uni = is_uni & (colmode == 2) & valid
            in_run = colmode == 2
            k_lt_r = x["kcol"] < rrun
            k_eq_r = x["kcol"] == rrun
            skip_col = (colmode == 1) | (in_run & k_lt_r)
            m_cln_zc = (is_cln_zc & valid & ~sig & ~visited
                        & ~skip_col & ~(in_run & k_eq_r))
            m_sc = (is_spp_sc | is_cln_sc) & (pend == 1)

            cx = jnp.where(is_mrp, mag_cx,
                           jnp.where(is_rl, CTX_RL,
                                     jnp.where(is_uni, CTX_UNI,
                                               jnp.where(m_sc, sc, zc))))
            en = m_spp_zc | m_mrp | m_rl | m_uni | m_cln_zc | m_sc
            d, (a, c, ct, pos), cps = mq_dec_step(
                jnp, (a, c, ct, pos), cps, seg, end, cx, en)

            # ---- state updates ----
            bit = jnp.uint32(1) << plane.astype(jnp.uint32)
            # SPP visit marks (vp write is a no-op on non-SPP steps)
            vpf = vpf.at[i].set(jnp.where(m_spp_zc, plane, own_vp))
            # MRP refinement bit
            mag_mrp = jnp.where(m_mrp & (d == 1), own_mag | bit, own_mag)
            # sign slots: new significance
            newsig = m_sc & valid
            sgn = jnp.where(m_sc, d ^ spb, 0)
            mag_sc = jnp.where(newsig, own_mag | bit, own_mag)
            mag_new = jnp.where(is_mrp, mag_mrp,
                                jnp.where(is_spp_sc | is_cln_sc,
                                          mag_sc, own_mag))
            magf = magf.at[i].set(mag_new)
            negf = negf.at[i].set(jnp.where(newsig, sgn, negf[i]))

            # pending-sign handoff: SPP_ZC d=1, CLN_ZC d=1, or the
            # run-interrupt sample (colmode 2, k == r)
            pend = jnp.where(
                is_spp_zc, (m_spp_zc & (d == 1)).astype(jnp.int32),
                jnp.where(is_cln_zc,
                          ((m_cln_zc & (d == 1))
                           | (in_run & k_eq_r & valid)).astype(jnp.int32),
                          jnp.where(is_spp_sc | is_cln_sc,
                                    jnp.zeros_like(pend), pend)))
            # column-run state machine
            colmode = jnp.where(
                is_rl, jnp.where(m_rl, jnp.where(d == 1, 2, 1), 0),
                colmode)
            rrun = jnp.where(is_rl, jnp.zeros_like(rrun), rrun)
            rrun = jnp.where(kind == K_UNI1,
                             jnp.where(m_uni, d << 1, rrun), rrun)
            rrun = jnp.where(kind == K_UNI2,
                             jnp.where(m_uni, rrun | d, rrun), rrun)

            return (a, c, ct, pos, cps, magf, negf, vpf, pend, colmode,
                    rrun), None

        carry = (a, c, ct, pos, cps, magf, negf, vpf, pend, colmode,
                 rrun)
        carry, _ = jax.lax.scan(step, carry, xs)
        magf, negf = carry[5], carry[6]
        return magf[:HW].astype(jnp.int32), negf[:HW]

    return run


@functools.lru_cache(maxsize=64)
def _jitted_mq_decode(h: int, w: int, B: int, nplanes: int, L: int):
    """One jitted program: (L, B) uint8 segments (+ per-lane end/nbps/
    npasses/orient) -> decoded (HW, B) magnitudes and signs."""
    import jax
    return jax.jit(decode_core(h, w, B, nplanes))


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def pack_lanes(lanes):
    """Pack [(data, orient, numbps, numpasses), ...] into the decoder's
    lane arrays with stable jit-key buckets: batch and byte capacity
    round to powers of two, the plane count rounds up to even (lanes
    idle through the extra top plane — their pass window starts later).
    Shared by the staged route (decode_blocks) and the fused decode
    program (models/fused_decode.py) so the two paths cannot drift."""
    npl = -(-max(nb for (_, _, nb, _) in lanes) // 2) * 2
    L = _bucket(max(len(d) for (d, _, _, _) in lanes) + 2)
    B = _bucket(len(lanes), 8)
    seg = np.zeros((L, B), np.uint8)
    end = np.zeros((B,), np.int32)
    nbps = np.zeros((B,), np.int32)
    npas = np.zeros((B,), np.int32)
    ori = np.zeros((B,), np.int32)
    for k, (d, o, nb, np_) in enumerate(lanes):
        seg[:len(d), k] = np.frombuffer(d, np.uint8)
        end[k] = len(d)
        ori[k] = o
        nbps[k] = nb
        npas[k] = np_
    return (seg, end, nbps, npas, ori), (B, npl, L)


def decode_blocks(blocks) -> List[Optional[Tuple[np.ndarray, np.ndarray]]]:
    """blocks: [(data bytes, w, h, orient, numbps, numpasses), ...] ->
    [(mag (h, w) uint32, neg (h, w) uint8), ...] for the default
    code-block style. Groups by block shape; lanes are padded to
    power-of-2 batch and byte-capacity buckets for stable jit keys."""
    import jax.numpy as jnp

    out: List = [None] * len(blocks)
    groups = {}
    for bi, (data, w, h, orient, nb, npas) in enumerate(blocks):
        if nb <= 0 or npas <= 0:
            out[bi] = (np.zeros((h, w), np.uint32),
                       np.zeros((h, w), np.uint8))
            continue
        groups.setdefault((h, w), []).append(bi)
    for (h, w), idxs in sorted(groups.items()):
        lanes = [(blocks[i][0], blocks[i][3], blocks[i][4], blocks[i][5])
                 for i in idxs]
        (seg, end, nbps, npas, ori), (B, npl, L) = pack_lanes(lanes)
        fn = _jitted_mq_decode(h, w, B, npl, L)
        magf, negf = fn(jnp.asarray(seg), jnp.asarray(end),
                        jnp.asarray(nbps), jnp.asarray(npas),
                        jnp.asarray(ori))
        magf = np.asarray(magf).astype(np.uint32)
        negf = np.asarray(negf).astype(np.uint8)
        for k, i in enumerate(idxs):
            out[i] = (magf[:, k].reshape(h, w),
                      negf[:, k].reshape(h, w))
    return out
