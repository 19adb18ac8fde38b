"""Device (TPU) EBCOT Tier-1 Part-1 encoder: bitplane passes + MQ coder.

The reference codes each block with a scalar triple-pass loop driving a
branchy MQ coder (reference: src/lib/jp2/t1/t1_part1/t1.cpp:1182,
mqc_enc.cpp:63-120). That shape is hostile to a vector machine, but the
algorithm has a property the scalar formulation hides: *the entire
decision stream is a static function of the magnitudes*. Significance
evolution does not depend on the coder — a sample becomes significant
in the plane of its MSB, pass membership follows from neighbor
significance with a monotone within-pass propagation, and every
context can be evaluated with a "temporal" neighbor rule (a neighbor
earlier in scan order contributes its post-pass state, a later one its
pre-pass state). So the TPU formulation is:

1. ANALYSIS (vector ops over the (B, H, W) block batch, no scan): for
   every (sample, plane) compute pass membership, contexts and decision
   bits. The significance-propagation membership is the one fixpoint
   (lax.while_loop over shifted ORs); everything else is closed-form.
   The result is a per-lane slot stream in exact scan order: packed
   (emit, decision, context) bytes.
2. MQ SCAN (lane-parallel): the batch of blocks rides the vector lanes
   while the scan walks the slot stream, updating per-lane coder state
   (A, C, ct, 19 context states). A one-byte delay register makes the
   byte output carry-free (an MQ carry only ever reaches the
   immediately-preceding byte), and bytes pack into 32-bit words like
   the HT coders (ops/ht_scan_pallas.py word contract).
3. HOST TAIL: the final FLUSH (two byteouts + trailing-0xFF drop) runs
   on the host from the tiny per-lane end state.

Byte-exact with t1/t1_np.encode_cblk (the Annex-D oracle) for the
default code-block style; enforced by tests/test_mq_device.py.

Scope: default style (no LAZY/RESET/TERMALL/VSC/PTERM; SEGSYM
unsupported), encoder only. Callers needing per-pass PCRD rates
(multi-layer / rate-targeted encodes) use the host coder.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

from ..t1.mq import CTX_MAG, CTX_RL, CTX_SC, CTX_UNI, CTX_ZC, MQ_TABLE

NUM_CTXS = 19

# Packed MQ table row: qe(16) << 13 | nmps(6) << 7 | nlps(6) << 1 | switch.
_TBL_PACKED = tuple(
    (qe << 13) | (nmps << 7) | (nlps << 1) | sw
    for (qe, nmps, nlps, sw) in MQ_TABLE)

# Initial context states (Annex D): (idx << 1) | mps.
_CTX_INIT = [0] * NUM_CTXS
_CTX_INIT[CTX_ZC] = 4 << 1
_CTX_INIT[CTX_RL] = 3 << 1
_CTX_INIT[CTX_UNI] = 46 << 1


# ---------------------------------------------------------------------------
# Static scan geometry (numpy, cached per (h, w))
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def _geometry(h: int, w: int):
    """Static per-shape data for the padded (hp, w) grid.

    Returns dict of numpy arrays:
      alive (hp, w): sample is inside the true block
      o (hp, w): scan-order index (stripes of 4, column-major in stripe)
      earlier[k] (hp, w) for the 8 neighbor offsets: neighbor's o < own o
      earlier_col[k]: neighbor's o < o of own column head
      agg_ok (hp, w): sample's stripe may aggregate (full, real stripe)
    """
    hp = -(-h // 4) * 4
    alive = np.zeros((hp, w), bool)
    alive[:h, :] = True
    o = np.zeros((hp, w), np.int64)
    idx = 0
    for y0 in range(0, hp, 4):
        for x in range(w):
            for yy in range(y0, y0 + 4):
                o[yy, x] = idx
                idx += 1
    colhead_o = o[(np.arange(hp) // 4) * 4][:, :]  # o of own column head
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
            (1, -1), (1, 0), (1, 1)]
    earlier = {}
    earlier_col = {}
    for (dy, dx) in offs:
        e = np.zeros((hp, w), bool)
        ec = np.zeros((hp, w), bool)
        ys, xs = np.mgrid[0:hp, 0:w]
        ny, nx = ys + dy, xs + dx
        inb = (ny >= 0) & (ny < hp) & (nx >= 0) & (nx < w)
        nyc = np.clip(ny, 0, hp - 1)
        nxc = np.clip(nx, 0, w - 1)
        e = inb & (o[nyc, nxc] < o)
        ec = inb & (o[nyc, nxc] < colhead_o)
        earlier[(dy, dx)] = e
        earlier_col[(dy, dx)] = ec
    # a stripe aggregates only when its 4 rows are all real
    agg_ok = np.zeros((hp, w), bool)
    for y0 in range(0, hp, 4):
        agg_ok[y0:y0 + 4, :] = (y0 + 4) <= h
    return dict(hp=hp, alive=alive, o=o, offs=offs,
                earlier=earlier, earlier_col=earlier_col, agg_ok=agg_ok)


# ---------------------------------------------------------------------------
# Analysis (jnp; runs under jit)
# ---------------------------------------------------------------------------


def _shift(jnp, a, dy, dx):
    """result[..., y, x] = a[..., y+dy, x+dx], 0 outside."""
    H, W = a.shape[-2], a.shape[-1]
    ys = slice(max(dy, 0), H + min(dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    core = a[..., ys, xs]
    pad = [(0, 0)] * (a.ndim - 2) + [(max(-dy, 0), max(dy, 0)),
                                     (max(-dx, 0), max(dx, 0))]
    return jnp.pad(core, pad)


def _temporal_neighbors(jnp, before, after, geo, col=False):
    """For each of the 8 offsets, neighbor significance under the
    temporal rule (earlier in scan order -> after, else before)."""
    key = "earlier_col" if col else "earlier"
    out = {}
    for off in geo["offs"]:
        e = jnp.asarray(geo[key][off])
        nb_b = _shift(jnp, before, *off)
        nb_a = _shift(jnp, after, *off)
        out[off] = jnp.where(e, nb_a, nb_b)
    return out


def _zc_ctx(jnp, nb, orient):
    """Vectorized Table D.1. nb: dict offset -> 0/1 arrays (B, hp, w);
    orient: (B, 1, 1) int32. Returns CTX_ZC + context."""
    hh = nb[(0, -1)] + nb[(0, 1)]
    vv = nb[(-1, 0)] + nb[(1, 0)]
    dd = (nb[(-1, -1)] + nb[(-1, 1)] + nb[(1, -1)] + nb[(1, 1)])
    # HL swaps h/v
    h_ = jnp.where(orient == 1, vv, hh)
    v_ = jnp.where(orient == 1, hh, vv)
    hv = h_ + v_
    # LL/LH/HL form
    ll = jnp.where(
        h_ == 2, 8,
        jnp.where(h_ == 1,
                  jnp.where(v_ >= 1, 7, jnp.where(dd >= 1, 6, 5)),
                  jnp.where(v_ == 2, 4,
                            jnp.where(v_ == 1, 3,
                                      jnp.where(dd >= 2, 2,
                                                jnp.where(dd == 1, 1, 0))))))
    # HH form (diagonal-major)
    hh_f = jnp.where(
        dd >= 3, 8,
        jnp.where(dd == 2, jnp.where(hv >= 1, 7, 6),
                  jnp.where(dd == 1,
                            jnp.where(hv >= 2, 5, jnp.where(hv == 1, 4, 3)),
                            jnp.where(hv >= 2, 2, jnp.where(hv == 1, 1, 0)))))
    return CTX_ZC + jnp.where(orient == 3, hh_f, ll)


def _sc_ctx(jnp, nbsig, neg, geo):
    """Sign context + prediction bit. nbsig: temporal dict for the 4
    h/v offsets; neg: (B, hp, w) static sign plane."""
    def contrib(off):
        return nbsig[off].astype(jnp.int32) * (
            1 - 2 * _shift(jnp, neg, *off).astype(jnp.int32))

    hc = jnp.clip(contrib((0, -1)) + contrib((0, 1)), -1, 1)
    vc = jnp.clip(contrib((-1, 0)) + contrib((1, 0)), -1, 1)
    spb = ((hc < 0) | ((hc == 0) & (vc < 0))).astype(jnp.int32)
    hc2 = jnp.where(spb == 1, -hc, hc)
    vc2 = jnp.where(spb == 1, -vc, vc)
    off = jnp.where(hc2 == 1,
                    jnp.where(vc2 == 1, 4, jnp.where(vc2 == 0, 3, 2)),
                    jnp.where(vc2 == 1, 1, 0))
    return CTX_SC + off, spb


def _spp_members(jnp, lax, sigS, bit_p, geo):
    """Significance-propagation membership fixpoint."""
    def nb_any(member):
        sigM = sigS | (member & bit_p)
        acc = None
        for off in geo["offs"]:
            e = jnp.asarray(geo["earlier"][off])
            nb = jnp.where(e, _shift(jnp, sigM, *off),
                           _shift(jnp, sigS, *off))
            acc = nb if acc is None else (acc | nb)
        return acc

    def body(state):
        member, _ = state
        new = (~sigS) & nb_any(member)
        return new, jnp.any(new != member)

    def cond(state):
        return state[1]

    zero = jnp.zeros_like(sigS)
    member0 = (~sigS) & nb_any(zero)
    member, _ = lax.while_loop(
        cond, body, (member0, jnp.array(True)))
    return member


def _pack_slot(jnp, emit, d, cx):
    """Slot byte: emit | d<<1 | cx<<2 (int32 arrays)."""
    return (emit.astype(jnp.int32)
            | (d.astype(jnp.int32) << 1)
            | (cx.astype(jnp.int32) << 2))


def _plane_slots(jnp, lax, mag, neg, orient, nbps, plane, geo):
    """All slot bytes for one plane, in exact scan order.

    mag: (B, hp, w) uint32; neg: (B, hp, w) int32; orient: (B, 1, 1);
    nbps: (B, 1, 1); plane: scalar int32 (traced). Returns
    (B, T_plane) int32 slot bytes with T_plane = 5*hp*w + 3*w*hp/4.
    """
    B, hp, w = mag.shape
    alive = jnp.asarray(geo["alive"])
    agg_ok = jnp.asarray(geo["agg_ok"])
    u1 = jnp.uint32(1)

    bit_p = ((mag >> plane.astype(jnp.uint32)) & u1).astype(jnp.int32)
    sigS = ((mag >> (plane.astype(jnp.uint32) + 1)) != 0)
    sigE = ((mag >> plane.astype(jnp.uint32)) != 0)
    bit_b = bit_p == 1

    spp_valid = plane <= (nbps - 2)
    cln_valid = plane <= (nbps - 1)

    member = _spp_members(jnp, lax, sigS, bit_b, geo) & spp_valid & alive
    sigM = sigS | (member & bit_b)

    # ---- SPP slots ----
    nb_spp = _temporal_neighbors(jnp, sigS, sigM, geo)
    zc = _zc_ctx(jnp, {k: v.astype(jnp.int32) for k, v in nb_spp.items()},
                 orient)
    scc, spb = _sc_ctx(jnp, nb_spp, neg, geo)
    spp_zc = _pack_slot(jnp, member, bit_p, zc)
    spp_sc = _pack_slot(jnp, member & bit_b, neg ^ spb, scc)

    # ---- MRP slots ----
    # members = sig before the plane; context from post-SPP significance
    # (uniform — MRP changes no significance); refined iff the sample's
    # MSB plane q satisfies q >= plane + 2 (a strictly earlier MRP coded
    # it).
    mrp_member = sigS & spp_valid & alive
    nb_m = {off: _shift(jnp, sigM, *off) for off in geo["offs"]}
    nb_any_m = None
    for off in geo["offs"]:
        nb_any_m = nb_m[off] if nb_any_m is None else (nb_any_m | nb_m[off])
    # q = MSB index; mag >> (plane+2) != 0 <=> q >= plane+2 (magnitudes
    # are < 2^30 so the clamp at 31 cannot produce a false positive)
    refined = (mag >> jnp.minimum(plane.astype(jnp.uint32) + 2, 31)) != 0
    mag_ctx = jnp.where(refined, CTX_MAG + 2,
                        CTX_MAG + nb_any_m.astype(jnp.int32))
    mrp = _pack_slot(jnp, mrp_member, bit_p, mag_ctx)

    # ---- CLN ----
    visited = member
    cln_member = (~sigM) & (~visited) & cln_valid & alive

    # column-level aggregation: evaluated at column-start time
    nb_col = _temporal_neighbors(jnp, sigM, sigE, geo, col=True)
    nb_any_col = None
    for off in geo["offs"]:
        nb_any_col = (nb_col[off] if nb_any_col is None
                      else (nb_any_col | nb_col[off]))
    sample_blocks_agg = sigM | visited | nb_any_col
    # reduce over the 4 stripe rows
    sba = sample_blocks_agg.reshape(B, hp // 4, 4, w)
    agg_col4 = (~sba.any(axis=2))[:, :, None, :] & agg_ok.reshape(
        1, hp // 4, 4, w) & cln_valid[..., None]
    agg = agg_col4.reshape(B, hp, w)

    bits4 = (bit_p == 1).reshape(B, hp // 4, 4, w)
    any4 = bits4.any(axis=2)
    # r = first set row index in the column (0..3), 4 when none
    rowi = jnp.arange(4, dtype=jnp.int32).reshape(1, 1, 4, 1)
    r4 = jnp.min(jnp.where(bits4, rowi, 4), axis=2)          # (B, hp/4, w)
    hit = (any4 & agg_col4[:, :, 0, :])                       # (B, hp/4, w)

    # per-sample coded-normally mask
    hit_s = jnp.repeat(hit[:, :, None, :], 4, axis=2).reshape(B, hp, w)
    r_s = jnp.repeat(r4[:, :, None, :], 4, axis=2).reshape(B, hp, w)
    idx_in_col = jnp.asarray(
        (np.arange(geo["hp"]) % 4).reshape(1, geo["hp"], 1))
    normal = cln_member & jnp.where(
        agg, hit_s & (idx_in_col > r_s), True)
    is_r = agg & hit_s & (idx_in_col == r_s)

    # contexts at sample-visit time
    nb_cln = _temporal_neighbors(jnp, sigM, sigE, geo)
    zc_c = _zc_ctx(jnp, {k: v.astype(jnp.int32) for k, v in nb_cln.items()},
                   orient)
    scc_c, spb_c = _sc_ctx(jnp, nb_cln, neg, geo)
    cln_zc = _pack_slot(jnp, normal, bit_p, zc_c)
    cln_sc = _pack_slot(jnp, (normal & bit_b) | is_r,
                        neg ^ spb_c, scc_c)

    # column-head slots (B, hp/4, w)
    agg_head = agg_col4[:, :, 0, :]
    rl = _pack_slot(jnp, agg_head, any4,
                    jnp.full_like(r4, CTX_RL))
    uni1 = _pack_slot(jnp, hit, (r4 >> 1) & 1,
                      jnp.full_like(r4, CTX_UNI))
    uni2 = _pack_slot(jnp, hit, r4 & 1, jnp.full_like(r4, CTX_UNI))

    # ---- assemble in scan order ----
    ns = hp // 4

    def scan_order_pairs(a, b):
        # per-sample pair slots -> (B, ns, w, 4, 2) -> flat
        st = jnp.stack([a, b], axis=-1).reshape(B, ns, 4, w, 2)
        return st.transpose(0, 1, 3, 2, 4).reshape(B, -1)

    def scan_order_single(a):
        return a.reshape(B, ns, 4, w).transpose(0, 1, 3, 2).reshape(B, -1)

    spp_flat = scan_order_pairs(spp_zc, spp_sc)          # (B, 8*ns*w)
    mrp_flat = scan_order_single(mrp)                    # (B, 4*ns*w)
    heads = jnp.stack([rl, uni1, uni2], axis=-1)         # (B, ns, w, 3)
    samples = jnp.stack([cln_zc, cln_sc], axis=-1).reshape(
        B, ns, 4, w, 2).transpose(0, 1, 3, 2, 4).reshape(B, ns, w, 8)
    cln_flat = jnp.concatenate([heads, samples], axis=-1).reshape(B, -1)
    return jnp.concatenate([spp_flat, mrp_flat, cln_flat], axis=-1)


def slots_per_plane(h: int, w: int) -> int:
    hp = -(-h // 4) * 4
    return 3 * hp * w + 3 * (hp // 4) * w


def build_slot_stream(jnp, lax, mag, neg, orient, nbps, nplanes, geo):
    """Full slot stream over `nplanes` planes (descending), scan-ordered.
    Returns (B, nplanes * T_plane) int8."""
    B = mag.shape[0]

    def body(carry, plane):
        s = _plane_slots(jnp, lax, mag, neg, orient, nbps, plane, geo)
        return carry, s.astype(jnp.int8)

    planes = jnp.arange(nplanes - 1, -1, -1, dtype=jnp.int32)
    _, out = lax.scan(body, 0, planes)
    # (nplanes, B, T) -> (B, nplanes*T)
    return out.transpose(1, 0, 2).reshape(B, -1)


# ---------------------------------------------------------------------------
# MQ scan (lax.scan fallback; Pallas kernel shares the step body)
# ---------------------------------------------------------------------------


def mq_step(jnp, carry, slot):
    """One MQ decision slot on lane vectors.

    carry: (a, c, ct, last, wacc, wcnt, ctx0..ctx18) int32 lanes, `last`
    is the delayed output byte (-1 = none yet). Returns
    (carry', word, word_valid).
    """
    a, c, ct, last, wacc, wcnt = carry[:6]
    ctxs = list(carry[6:])
    emit = slot & 1
    d = (slot >> 1) & 1
    cx = slot >> 2

    p = ctxs[0]
    for k in range(1, NUM_CTXS):
        p = jnp.where(cx == k, ctxs[k], p)
    idx = p >> 1
    mps = p & 1

    row = jnp.full_like(p, _TBL_PACKED[0])
    for k in range(1, 47):
        row = jnp.where(idx == k, _TBL_PACKED[k], row)
    qe = row >> 13
    nmps = (row >> 7) & 63
    nlps = (row >> 1) & 63
    sw = row & 1

    a1 = a - qe
    mpspath = d == mps
    short = mpspath & ((a1 & 0x8000) != 0) | (emit == 0)
    a_lt = a1 < qe
    c_long = jnp.where(mpspath,
                       jnp.where(a_lt, c, c + qe),
                       jnp.where(a_lt, c + qe, c))
    a_long = jnp.where(mpspath,
                       jnp.where(a_lt, qe, a1),
                       jnp.where(a_lt, a1, qe))
    c2 = jnp.where(short, jnp.where(emit == 1, c + qe, c), c_long)
    a2 = jnp.where(short, jnp.where(emit == 1, a1, a), a_long)
    wb = (emit == 1) & ~short
    newp = (jnp.where(mpspath, nmps, nlps) << 1) | jnp.where(
        mpspath, mps, jnp.where(sw == 1, 1 - mps, mps))
    for k in range(NUM_CTXS):
        ctxs[k] = jnp.where(wb & (cx == k), newp, ctxs[k])

    # renorm shift count: make bit 15 of a2 set (a2 >= 1)
    n = jnp.zeros_like(a2)
    t = a2
    n = jnp.where(t < 0x100, n + 8, n)
    t = jnp.where(t < 0x100, t << 8, t)
    n = jnp.where(t < 0x1000, n + 4, n)
    t = jnp.where(t < 0x1000, t << 4, t)
    n = jnp.where(t < 0x4000, n + 2, n)
    t = jnp.where(t < 0x4000, t << 2, t)
    n = jnp.where(t < 0x8000, n + 1, n)
    n = jnp.where(wb, n, 0)
    a3 = jnp.where(wb, (a2 << n) & 0xFFFF, a2)

    word_o = jnp.zeros_like(a2)
    full_o = jnp.zeros_like(a2, dtype=jnp.bool_)
    cc, cct, clast = c2, ct, last
    nrem = n
    for _ in range(3):
        s_i = jnp.minimum(nrem, cct)
        cc = cc << s_i
        cct = cct - s_i
        nrem = nrem - s_i
        bo = wb & (cct == 0)
        # ---- byteout (masked by bo), delay-register form ----
        ff = clast == 0xFF
        carry_b = cc > 0x7FFFFFF
        lastc = jnp.where(carry_b & (clast >= 0), clast + 1, clast)
        ffc = lastc == 0xFF      # became FF via carry
        path_ff = ff
        path_ffc = (~ff) & ffc
        # emit byte = delayed byte (post-carry); valid when a byte exists
        ebyte = jnp.where(path_ff, clast, lastc)
        evalid = bo & (clast >= 0)
        c_ff = cc & 0xFFFFF
        new_ff = (cc >> 20) & 0xFF
        cc_ffc = cc & 0x7FFFFFF
        new_ffc = (cc_ffc >> 20) & 0xFF
        c_ffc = cc_ffc & 0xFFFFF
        cc_n = jnp.where(carry_b, cc & 0x7FFFFFF, cc)
        new_n = (cc_n >> 19) & 0xFF
        c_n = cc_n & 0x7FFFF
        newlast = jnp.where(path_ff, new_ff,
                            jnp.where(path_ffc, new_ffc, new_n))
        newc = jnp.where(path_ff, c_ff,
                         jnp.where(path_ffc, c_ffc, c_n))
        newct = jnp.where(path_ff | path_ffc, 7, 8)
        clast = jnp.where(bo, newlast, clast)
        cc = jnp.where(bo, newc, cc)
        cct = jnp.where(bo, newct, cct)
        # ---- word push ----
        e32 = (evalid).astype(jnp.int32)
        wacc = wacc | jnp.where(e32 == 1, ebyte << (8 * wcnt), 0)
        wcnt = wcnt + e32
        wfull = wcnt >= 4
        word_o = word_o | jnp.where(wfull, wacc, 0)
        full_o = full_o | wfull
        wacc = jnp.where(wfull, 0, wacc)
        wcnt = jnp.where(wfull, 0, wcnt)

    out = (a3, cc, cct, clast, wacc, wcnt) + tuple(ctxs)
    return out, word_o, full_o


NSTATE = 6 + NUM_CTXS  # a, c, ct, last, wacc, wcnt, 19 contexts


def _init_state(jnp, B):
    vals = [0x8000, 0, 12, -1, 0, 0] + list(_CTX_INIT)
    return tuple(jnp.full((B,), v, jnp.int32) for v in vals)


def _mq_scan_w(jnp, lax, slots, B):
    """slots: (T, B) int32 -> (words (T, B), mask (T, B), final state
    tuple)."""
    def step(carry, s):
        carry, word, full = mq_step(jnp, carry, s)
        return carry, (word, full)

    carry, (words, mask) = lax.scan(step, _init_state(jnp, B), slots,
                                    unroll=1)
    return words, mask, carry


def _use_pallas() -> bool:
    import os

    import jax
    return (os.environ.get("GROK_TPU_MQ_PALLAS", "1") != "0"
            and jax.default_backend() != "cpu")


def run_mq_scans(jnp, lax, slots, B):
    if _use_pallas():
        from . import mq_scan_pallas
        b_pad = -(-B // 128) * 128
        if b_pad != B:
            slots = jnp.pad(slots, ((0, 0), (0, b_pad - B)))
        words, mask, st = mq_scan_pallas.mq_scan(slots)
        if b_pad != B:
            words = words[:, :B]
            mask = mask[:, :B]
            st = tuple(s[:B] for s in st)
        return words, mask, st
    return _mq_scan_w(jnp, lax, slots, B)


# ---------------------------------------------------------------------------
# Host tail: FLUSH + byte splicing
# ---------------------------------------------------------------------------


def flush_tail(a: int, c: int, ct: int, last: int) -> bytes:
    """The MQ FLUSH (C.3.4) from the end-of-scan state; returns the final
    trailing bytes (everything after the scan-emitted words)."""
    out = []

    def byteout():
        nonlocal c, ct, last
        if last == 0xFF:
            out.append(last)
            last = (c >> 20) & 0xFF
            c &= 0xFFFFF
            ct = 7
            return
        if c > 0x7FFFFFF:
            if last >= 0:
                last += 1
                if last == 0xFF:
                    c &= 0x7FFFFFF
                    out.append(last)
                    last = (c >> 20) & 0xFF
                    c &= 0xFFFFF
                    ct = 7
                    return
            c &= 0x7FFFFFF
        if last >= 0:
            out.append(last)
        last = (c >> 19) & 0xFF
        c &= 0x7FFFF
        ct = 8

    tempc = c + a
    c |= 0xFFFF
    if c >= tempc:
        c -= 0x8000
    c <<= ct
    byteout()
    c <<= ct
    byteout()
    if last >= 0 and last != 0xFF:
        out.append(last)
    return bytes(out)


def assemble_mq_segments(words_np: np.ndarray,
                         metrics_np: np.ndarray) -> List[bytes]:
    """metrics rows: (nbytes_scan, a, c, ct, last, wacc). Lane i's words
    occupy [starts[i], starts[i] + ceil(nbytes/4)) of words_np."""
    m = metrics_np
    n = m.shape[0]
    nbytes = m[:, 0].astype(np.int64)
    wc = (nbytes + 3) >> 2
    starts = np.zeros(n, np.int64)
    np.cumsum(wc[:-1], out=starts[1:])
    bytes_all = np.ascontiguousarray(
        words_np.astype("<i4")).view(np.uint8)
    out: List[bytes] = []
    for i in range(n):
        p = int(starts[i]) * 4
        body = bytes(bytes_all[p:p + int(nbytes[i])])
        tail = flush_tail(int(m[i, 1]), int(m[i, 2]), int(m[i, 3]),
                          int(m[i, 4]))
        out.append(body + tail)
    return out


# ---------------------------------------------------------------------------
# Jitted launch (one shape group) + public API
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _jitted_mq_group(h: int, w: int, B: int, nplanes: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    geo = _geometry(h, w)

    def run(mag, neg, orient, nbps):
        slots = build_slot_stream(jnp, lax, mag, neg,
                                  orient[:, None, None],
                                  nbps[:, None, None], nplanes, geo)
        slotsT = jax.lax.optimization_barrier(
            slots.astype(jnp.int32).T)
        words, mask, st = run_mq_scans(jnp, lax, slotsT, B)
        # scan-emitted byte count: 4 * full words + wcnt partial
        wcount = mask.astype(jnp.int32).sum(axis=0)
        nbytes = 4 * wcount + st[5]
        metrics = jnp.stack(
            [nbytes, st[0], st[1], st[2], st[3], st[4]], axis=-1)
        # pack words contiguously: per-lane offsets
        base = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum((nbytes + 3) >> 2)[:-1].astype(jnp.int32)])
        bound = words.shape[0]
        out = jnp.zeros((bound * B + 1,), jnp.int32)
        DROP = bound * B
        wvm = mask.astype(jnp.int32)
        idx = jnp.cumsum(wvm, axis=0) - 1
        pos = jnp.where(wvm > 0, base[None, :] + idx, DROP)
        out = out.at[pos.reshape(-1)].set(words.reshape(-1), mode="drop")
        # partial-word tail bytes fold into the word stream: lane's last
        # (possibly partial) word is wacc when wcnt > 0
        tail_pos = jnp.where(st[5] > 0, base + ((nbytes) >> 2), DROP)
        out = out.at[tail_pos].set(st[4], mode="drop")
        return jnp.concatenate([metrics.reshape(-1), out[:-1]])

    return jax.jit(run)


def mq_encode_blocks(blocks) -> List[Tuple[bytes, int, int]]:
    """blocks: [(mag (h,w) uint32, neg (h,w) 0/1, orient int), ...] ->
    [(data, numbps, numpasses), ...] for the default code-block style.
    Groups by shape; all groups dispatch before any collects."""
    import jax.numpy as jnp

    from . import ht_jax

    groups = {}
    for i, (mag, neg, orient) in enumerate(blocks):
        nb = int(mag.max()).bit_length()
        groups.setdefault(mag.shape, []).append((i, nb))
    results: List = [None] * len(blocks)
    handles = []
    for shape, entries in sorted(groups.items()):
        h, w = shape
        hp = -(-h // 4) * 4
        nbs = [nb for (_, nb) in entries]
        npl = max(max(nbs), 1)
        Bp = _pad_batch(len(entries))
        mags = np.zeros((Bp, hp, w), np.uint32)
        negs = np.zeros((Bp, hp, w), np.int32)
        orients = np.zeros((Bp,), np.int32)
        nbps = np.zeros((Bp,), np.int32)
        for k, (i, nb) in enumerate(entries):
            mags[k, :h, :] = blocks[i][0]
            negs[k, :h, :] = blocks[i][1]
            orients[k] = blocks[i][2]
            nbps[k] = nb
        fn = _jitted_mq_group(h, w, Bp, npl)
        flat = fn(jnp.asarray(mags), jnp.asarray(negs),
                  jnp.asarray(orients), jnp.asarray(nbps))
        T = npl * slots_per_plane(h, w)
        bound = T * Bp  # words bound (loose; ladder-fetched)
        fetch = ht_jax.submit_fetch(flat, Bp * 6, bound,
                                    ("mq", h, w, Bp, npl))
        handles.append((entries, fetch))
    for (entries, fetch) in handles:
        metrics_np, words = ht_jax.collect_fetch(
            fetch, ncols=6,
            total_words_fn=lambda m: int(
                ((m[:, 0].astype(np.int64) + 3) >> 2).sum()))
        segs = assemble_mq_segments(words, metrics_np)
        for k, (i, nb) in enumerate(entries):
            results[i] = (segs[k] if nb > 0 else b"", nb,
                          3 * nb - 2 if nb > 0 else 0)
    return results


def _pad_batch(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b
