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
unsupported), encoder only. Per-pass PCRD inputs ARE produced on
device when requested (`want_rd`): per-chunk byteout sums reconstruct
pass-end truncation rates (pass_cum_byteouts) and the builder emits
per-(plane, pass) distortion-decrease tables — models/fused_encode.py
wires both into the host PCRD allocator. Non-default code-block
styles still stage through the host coder.
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

def tbl_select(jnp, idx):
    """47-way select of the packed MQ table row (shared by the encoder
    and decoder steps).

    Two-level select (idx = 8*hi + lo): the 8 lo-masks are computed
    once and reused by all 6 groups, and the where-tree is ~13 deep
    instead of a 47-long serial chain — measurably faster on the VPU,
    bit-identical selections."""
    lo = idx & 7
    hi = idx >> 3
    lom = [lo == k for k in range(1, 8)]
    groups = []
    for g in range(6):
        base = 8 * g
        row = jnp.full_like(idx, _TBL_PACKED[base])
        for k in range(1, 8):
            if base + k < 47:
                row = jnp.where(lom[k - 1], _TBL_PACKED[base + k], row)
        groups.append(row)
    row = groups[0]
    for g in range(1, 6):
        row = jnp.where(hi == g, groups[g], row)
    return row


# Context states packed 4-per-int32 (8 bits each; values fit 7 bits):
# word k holds contexts 4k..4k+3. Five packed planes instead of 19
# keeps the scan's live state inside the vector register file — the
# single biggest per-step cost is context select/update.
NCTX_WORDS = 5
_CTX_INIT_PACKED = [
    sum(_CTX_INIT[4 * k + j] << (8 * j)
        for j in range(4) if 4 * k + j < NUM_CTXS)
    for k in range(NCTX_WORDS)]


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
    """result[y, x, :] = a[y+dy, x+dx, :], 0 outside.

    Arrays are (hp, w, B) — the block batch rides the minor (lane) axis
    so every vector op fills whole 128-lane vregs regardless of block
    width (a (B, hp, w) layout wastes half the vreg for w = 64 blocks
    and 3/4 of it for w = 32)."""
    H, W = a.shape[0], a.shape[1]
    ys = slice(max(dy, 0), H + min(dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    core = a[ys, xs]
    pad = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)), (0, 0)]
    return jnp.pad(core, pad)


def _g(jnp, geo, name, off=None):
    """Geometry mask as a (hp, w, 1) jnp array (broadcasts over lanes)."""
    a = geo[name] if off is None else geo[name][off]
    return jnp.asarray(a)[:, :, None]


def _temporal_neighbors(jnp, before, after, geo, col=False):
    """For each of the 8 offsets, neighbor significance under the
    temporal rule (earlier in scan order -> after, else before)."""
    key = "earlier_col" if col else "earlier"
    out = {}
    for off in geo["offs"]:
        e = _g(jnp, geo, key, off)
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
    """Significance-propagation membership fixpoint.

    For booleans, where(e, shift(sigS | mb), shift(sigS)) ==
    shift(sigS) | (e & shift(mb)), so the OR over all 8 offsets splits
    into a loop-INVARIANT base (the plain significance neighborhood)
    plus the member-dependent part — the while_loop body shifts only
    the small member&bit plane instead of both planes, ~35% less work
    per fixpoint iteration (the builder's one data-dependent loop)."""
    base = None
    for off in geo["offs"]:
        s = _shift(jnp, sigS, *off)
        base = s if base is None else (base | s)

    def nb_any(member):
        mb = member & bit_p
        acc = base
        for off in geo["offs"]:
            e = _g(jnp, geo, "earlier", off)
            acc = acc | (e & _shift(jnp, mb, *off))
        return acc

    def body(state):
        member, _ = state
        new = (~sigS) & nb_any(member)
        return new, jnp.any(new != member)

    def cond(state):
        return state[1]

    member0 = (~sigS) & base
    member, _ = lax.while_loop(
        cond, body, (member0, jnp.array(True)))
    return member


def _pack_slot(jnp, emit, d, cx):
    """Slot byte: emit | d<<1 | cx<<2 (int32 arrays)."""
    return (emit.astype(jnp.int32)
            | (d.astype(jnp.int32) << 1)
            | (cx.astype(jnp.int32) << 2))


def _plane_slots(jnp, lax, mag, neg, orient, nbps, plane, geo,
                 want_dist: bool = False):
    """All slot bytes for one plane, in exact scan order.

    mag: (hp, w, B) uint32; neg: (hp, w, B) int32; orient: (1, 1, B)
    int32; nbps: (1, 1, B); plane: scalar int32 (traced). Returns
    (T_plane, B) int32 slot bytes, T_plane = 3*hp*w + 11*(hp/4)*w;
    with `want_dist` also a (3, B) float32 of the plane's per-pass
    distortion-decrease sums (SPP, MRP, CLN), scaled by 4^-plane —
    the host rescales by 4^plane so every plane's sum is accumulated
    at similar float magnitude (t1/t1_np.py sig_dist/ref_dist terms).
    """
    hp, w, B = mag.shape
    alive = _g(jnp, geo, "alive")
    agg_ok = _g(jnp, geo, "agg_ok")
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
    ns = hp // 4
    # reduce over the 4 stripe rows
    sba = sample_blocks_agg.reshape(ns, 4, w, B)
    agg_col4 = ((~sba.any(axis=1))[:, None, :, :]
                & agg_ok.reshape(ns, 4, w, 1) & cln_valid)
    agg = agg_col4.reshape(hp, w, B)

    bits4 = (bit_p == 1).reshape(ns, 4, w, B)
    any4 = bits4.any(axis=1)
    # r = first set row index in the column (0..3), 4 when none
    rowi = jnp.arange(4, dtype=jnp.int32).reshape(1, 4, 1, 1)
    r4 = jnp.min(jnp.where(bits4, rowi, 4), axis=1)          # (ns, w, B)
    hit = (any4 & agg_col4[:, 0, :, :])                       # (ns, w, B)

    # per-sample coded-normally mask
    hit_s = jnp.repeat(hit[:, None], 4, axis=1).reshape(hp, w, B)
    r_s = jnp.repeat(r4[:, None], 4, axis=1).reshape(hp, w, B)
    idx_in_col = jnp.asarray(
        (np.arange(geo["hp"]) % 4).reshape(geo["hp"], 1, 1))
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

    # column-head slots (ns, w, B)
    agg_head = agg_col4[:, 0, :, :]
    rl = _pack_slot(jnp, agg_head, any4,
                    jnp.full_like(r4, CTX_RL))
    uni1 = _pack_slot(jnp, hit, (r4 >> 1) & 1,
                      jnp.full_like(r4, CTX_UNI))
    uni2 = _pack_slot(jnp, hit, r4 & 1, jnp.full_like(r4, CTX_UNI))

    # ---- assemble in scan order (stripe-major, column-major inside) ----
    # Each pass section is padded with no-op slots (byte 0: emit=0, a
    # pure pass-through in mq_step) to a multiple of the scan kernel's
    # 256-step chunk, so every pass boundary lands exactly on a chunk
    # boundary and per-chunk byteout sums reconstruct the pass-end
    # buffer lengths PCRD needs (pass_cum_byteouts) without a dense
    # per-step nbo array in HBM.
    def scan_order_pairs(a, b):
        st = jnp.stack([a, b], axis=2)                   # (hp, w, 2, B)
        st = st.reshape(ns, 4, w, 2, B).transpose(0, 2, 1, 3, 4)
        return st.reshape(-1, B)

    def scan_order_single(a):
        return a.reshape(ns, 4, w, B).transpose(0, 2, 1, 3).reshape(-1, B)

    def pad_pass(x):
        t = x.shape[0]
        return jnp.pad(x, ((0, _pad256(t) - t), (0, 0)))

    spp_flat = scan_order_pairs(spp_zc, spp_sc)          # (8*ns*w, B)
    mrp_flat = scan_order_single(mrp)                    # (4*ns*w, B)
    heads = jnp.stack([rl, uni1, uni2], axis=2)          # (ns, w, 3, B)
    samples = jnp.stack([cln_zc, cln_sc], axis=2).reshape(
        ns, 4, w, 2, B).transpose(0, 2, 1, 3, 4).reshape(ns, w, 8, B)
    cln_flat = jnp.concatenate([heads, samples], axis=2).reshape(-1, B)
    slots = jnp.concatenate([pad_pass(spp_flat), pad_pass(mrp_flat),
                             pad_pass(cln_flat)], axis=0)
    if not want_dist:
        return slots

    # ---- per-pass distortion decreases (PCRD), scaled by 4^-plane ----
    # sig_dist/4^p = 3*(v/2^p) - 2.25 for a sample becoming significant;
    # ref_dist/4^p = (r/2^p - 1)^2 - (s/2^p - 0.5)^2 with r = v mod
    # 2^(p+1), s = v mod 2^p (the same closed forms t1_np.py sums in
    # scan order — term-level identical, float32-summed here).
    pu = plane.astype(jnp.uint32)
    inv = jnp.exp2(-plane.astype(jnp.float32))
    t = mag.astype(jnp.float32) * inv
    sig_term = 3.0 * t - 2.25
    r = (mag & ((jnp.uint32(2) << pu) - 1)).astype(jnp.float32) * inv
    sv = (mag & ((jnp.uint32(1) << pu) - 1)).astype(jnp.float32) * inv
    ref_term = (r - 1.0) * (r - 1.0) - (sv - 0.5) * (sv - 0.5)
    zero = jnp.zeros_like(t)
    d_spp = jnp.where(member & bit_b, sig_term, zero).sum(axis=(0, 1))
    d_mrp = jnp.where(mrp_member, ref_term, zero).sum(axis=(0, 1))
    d_cln = jnp.where((normal & bit_b) | is_r, sig_term,
                      zero).sum(axis=(0, 1))
    return slots, jnp.stack([d_spp, d_mrp, d_cln], axis=0)


def _pad256(n: int) -> int:
    return -(-n // 256) * 256


@functools.lru_cache(maxsize=256)
def pass_spans_padded(h: int, w: int):
    """(SPP, MRP, CLN) slot-stream section lengths per plane, each
    padded to a multiple of the scan's 256-step chunk (the no-op pad
    slots are inserted by _plane_slots)."""
    hp = -(-h // 4) * 4
    nsw = (hp // 4) * w
    return (_pad256(8 * nsw), _pad256(4 * nsw), _pad256(11 * nsw))


def slots_per_plane(h: int, w: int) -> int:
    return sum(pass_spans_padded(h, w))


def build_slot_stream(jnp, lax, mag, neg, orient, nbps, nplanes, geo,
                      want_dist: bool = False):
    """Full slot stream over `nplanes` planes (descending), scan-ordered.
    mag/neg: (hp, w, B). Returns (nplanes * T_plane, B) int8; with
    `want_dist` also a (nplanes, 3, B) float32 of per-(plane, pass)
    distortion sums scaled by 4^-plane (plane axis MSB-first, matching
    the slot stream's plane order)."""
    B = mag.shape[2]
    # Planes at or above the batch's actual max bit depth are dead for
    # every lane (spp/cln validity needs plane <= nbps-1): branch to a
    # zero fill instead of the full neighbor/context analysis. The
    # static plane count is the band kmax bound (e.g. 19 for 12-bit
    # cinema) while content typically uses ~8-10, so this skips a
    # third or more of builder compute; the zero slots are exact
    # (emit=0 is the pure passthrough byte) and the scan kernel's
    # activity map skips their cells too.
    maxnb = jnp.max(nbps)

    hp, w_ = mag.shape[0], mag.shape[1]

    def body(carry, plane):
        tp = slots_per_plane(hp, w_)  # hp pre-padded: pad is idempotent

        def live(_):
            if want_dist:
                s, d = _plane_slots(jnp, lax, mag, neg, orient, nbps,
                                    plane, geo, want_dist=True)
                return s.astype(jnp.int8), d
            s = _plane_slots(jnp, lax, mag, neg, orient, nbps, plane,
                             geo)
            return (s.astype(jnp.int8),)

        def dead(_):
            z = jnp.zeros((tp, B), jnp.int8)
            if want_dist:
                return z, jnp.zeros((3, B), jnp.float32)
            return (z,)

        out = lax.cond(plane < maxnb, live, dead, 0)
        if want_dist:
            return carry, (out[0], out[1])
        return carry, out[0]

    planes = jnp.arange(nplanes - 1, -1, -1, dtype=jnp.int32)
    _, out = lax.scan(body, 0, planes)
    if want_dist:
        slots, dists = out
        return slots.reshape(-1, B), dists
    # (nplanes, T_plane, B) -> (nplanes*T_plane, B)
    return out.reshape(-1, B)


# ---------------------------------------------------------------------------
# MQ scan (lax.scan fallback; Pallas kernel shares the step body)
# ---------------------------------------------------------------------------


def mq_step(jnp, carry, slot):
    """One MQ decision slot on lane vectors.

    carry: (a, c, ct, last, wacc, wcnt, cp0..cp4) int32 lanes, `last`
    is the delayed output byte (-1 = none yet); cp_k packs context
    states 4k..4k+3 at 8 bits each. Returns (carry', word, word_valid,
    nbo) where nbo counts the step's byteouts (0..3) — each byteout
    grows the host coder's byte buffer by exactly one byte, so summing
    nbo over a coding pass's (static) slot range gives the same
    truncation-rate byte counts the host coder records for PCRD.
    """
    a, c, ct, last, wacc, wcnt = carry[:6]
    cps = list(carry[6:])
    emit = slot & 1
    d = (slot >> 1) & 1
    cx = slot >> 2
    cw = cx >> 2
    sh = (cx & 3) << 3

    cwm = [cw == k for k in range(1, NCTX_WORDS)]
    pw = cps[0]
    for k in range(1, NCTX_WORDS):
        pw = jnp.where(cwm[k - 1], cps[k], pw)
    p = (pw >> sh) & 0x7F
    idx = p >> 1
    mps = p & 1

    row = tbl_select(jnp, idx)
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
    fmask = jnp.full_like(slot, 0x7F) << sh
    newfield = (newp << sh) & fmask
    cw0 = cw == 0
    for k in range(NCTX_WORDS):
        m = cw0 if k == 0 else cwm[k - 1]
        cps[k] = jnp.where(wb & m,
                           (cps[k] & ~fmask) | newfield, cps[k])

    # renorm shift count: make bit 15 of a2 set. a2 in [1, 0xFFFF] on
    # the wb path, so float32 conversion is exact and the exponent
    # field gives floor(log2): n = 15 - (exp - 127) = 142 - exp —
    # 4 vector ops instead of the 11-op branchless clz ladder.
    from jax import lax as lax_mod
    fa = lax_mod.bitcast_convert_type(a2.astype(jnp.float32), jnp.int32)
    n = jnp.int32(142) - (fa >> 23)
    n = jnp.where(wb, n, 0)
    a3 = jnp.where(wb, (a2 << n) & 0xFFFF, a2)

    nbo = jnp.zeros_like(a2)
    cc, cct, clast = c2, ct, last
    nrem = n
    ebytes = []
    evalids = []
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
        nbo = nbo + bo.astype(jnp.int32)
        ebytes.append(ebyte)
        evalids.append(evalid)

    # ---- single word push (a step emits <= 3 bytes, so at most ONE
    # 4-byte word can complete): pack the valid bytes consecutively
    # into bb, splice at the lane's byte cursor, spill the overflow
    # into the next accumulator — ~8 fewer vector ops than pushing
    # byte-by-byte inside the loop. ----
    e0 = evalids[0].astype(jnp.int32)
    e1 = evalids[1].astype(jnp.int32)
    e2 = evalids[2].astype(jnp.int32)
    bb = jnp.where(evalids[0], ebytes[0] & 0xFF, 0)
    bb = bb | jnp.where(evalids[1], (ebytes[1] & 0xFF) << (8 * e0), 0)
    bb = bb | jnp.where(evalids[2],
                        (ebytes[2] & 0xFF) << (8 * (e0 + e1)), 0)
    wacc_new = wacc | (bb << (8 * wcnt))          # wcnt <= 3: shift <= 24
    # spill = bytes past slot 3; two-step shift keeps amounts < 32
    spill = (bb >> (8 * (3 - wcnt))) >> 8
    newcnt = wcnt + e0 + e1 + e2
    full_o = newcnt >= 4
    word_o = jnp.where(full_o, wacc_new, 0)
    wacc = jnp.where(full_o, spill, wacc_new)
    wcnt = jnp.where(full_o, newcnt - 4, newcnt)

    out = (a3, cc, cct, clast, wacc, wcnt) + tuple(cps)
    return out, word_o, full_o, nbo


NSTATE = 6 + NCTX_WORDS  # a, c, ct, last, wacc, wcnt, 5 packed ctx words
STATE_INIT = [0x8000, 0, 12, -1, 0, 0] + _CTX_INIT_PACKED


def _init_state(jnp, B):
    vals = list(STATE_INIT)
    return tuple(jnp.full((B,), v, jnp.int32) for v in vals)


def _mq_scan_w(jnp, lax, slots, B):
    """slots: (T, B) int32 -> (words (T, B), mask (T, B), nbo (T, B)
    per-step byteout counts, final state tuple)."""
    def step(carry, s):
        carry, word, full, nbo = mq_step(jnp, carry, s)
        return carry, (word, full, nbo)

    carry, (words, mask, nbo) = lax.scan(step, _init_state(jnp, B), slots,
                                         unroll=1)
    return words, mask, nbo, carry


# Word-compaction caps. Sized for the DENSEST legal emission, not the
# average: PCRD-quality natural content measures up to 9 words per
# 256-step chunk and 126 words per 16-chunk group (2048^2 RGB 9/7 at
# ~3 bpp), and with the on-device lane-major splice the capacity grids
# never cross the host link, so headroom costs only device FLOPs.
# Overflow (pathological content beyond these) is flagged per lane and
# the frame re-encodes on the host coder — a performance knob, never a
# correctness bound.
MQ_CCAP = 12      # words kept per lane per 256-step chunk (level 1)
MQ_GRP = 16       # chunks per level-2 group
MQ_CAP2 = 128     # words kept per lane per group (level 2)


def _compact_words(jnp, words, m8, st, ccap=MQ_CCAP, grp=MQ_GRP,
                   cap2=MQ_CAP2):
    """Compact the sparse per-step word emissions into short per-lane
    runs with pure masked reductions — no scatter, no full-stream
    cumsum (an XLA scatter costs ~25 ms fixed + ~7 ns/element on this
    part, several times the MQ scan itself).

    Inputs stay in the scan's blocked layout: words (t_pad, S, 128)
    int32, m8 (t_pad, S, 128) int32 = each word's index within its
    256-step chunk (-1 where no word; from the scan kernel's per-lane
    counter), st (NSTATE, S, 128).

    Level 1: each 256-step chunk keeps its first `ccap` words via
    one-hot masked sums over the chunk axis. Level 2: groups of `grp`
    chunks compact to `cap2` slots the same way, using the within-group
    prefix of (clamped) chunk counts. The host does the final ragged
    splice with numpy boolean indexing (mq_encode_blocks) — the level-2
    grid is small enough to fetch whole.

    A lane that ever exceeds a cap (adversarial content, >8x the
    typical emission rate) is flagged in `overflow`; the caller
    re-encodes it on the host, so the caps are a performance knob, not
    a correctness bound.

    Returns (comp2 (ngrp, cap2, S, 128), counts2 (ngrp, S, 128) clamped,
    nbytes (S, 128), overflow (S, 128) bool).
    """
    t_pad, S, _ = words.shape
    k = 256
    nch = t_pad // k
    wrd = words.reshape(nch, k, S, 128)
    idx = m8.reshape(nch, k, S, 128)
    comp1 = jnp.stack(
        [jnp.sum(jnp.where(idx == j, wrd, 0), axis=1)
         for j in range(ccap)], axis=1)                # (nch, ccap, S, 128)
    counts1 = jnp.max(idx, axis=1) + 1                 # (nch, S, 128)
    return _compact_level2(jnp, comp1, counts1, st, ccap, grp, cap2)


def _compact_level2(jnp, comp1, counts1, st, ccap=MQ_CCAP, grp=MQ_GRP,
                    cap2=MQ_CAP2):
    """Level-2 compaction from the level-1 per-chunk word grid (the
    compacting scan kernel's native output contract): comp1 (nch, ccap,
    S, 128) = each 256-step chunk's first `ccap` emitted words, counts1
    (nch, S, 128) = raw (unclamped) per-chunk word counts. Returns the
    same (comp2, counts2, nbytes, overflow) as _compact_words."""
    nch, _, S, _ = comp1.shape
    over1 = (counts1 > ccap).any(axis=0)
    cc1 = jnp.minimum(counts1, ccap)

    ngrp = -(-nch // grp)
    if ngrp * grp != nch:
        pad = ngrp * grp - nch
        comp1 = jnp.pad(comp1, ((0, pad), (0, 0), (0, 0), (0, 0)))
        cc1 = jnp.pad(cc1, ((0, pad), (0, 0), (0, 0)))
    cc1g = cc1.reshape(ngrp, grp, S, 128)
    pre = jnp.cumsum(cc1g, axis=1) - cc1g              # words before chunk
    # position of (chunk-local c, slot j) within its group
    jc = jnp.arange(ccap, dtype=jnp.int32).reshape(1, 1, ccap, 1, 1)
    pos2 = pre[:, :, None] + jc                        # (ngrp, grp, ccap, ...)
    valid = jc < cc1g[:, :, None]
    c1g = comp1.reshape(ngrp, grp, ccap, S, 128)
    comp2 = jnp.stack(
        [jnp.sum(jnp.where(valid & (pos2 == j2), c1g, 0), axis=(1, 2))
         for j2 in range(cap2)], axis=1)               # (ngrp, cap2, S, 128)
    counts2 = cc1g.sum(axis=1)                         # (ngrp, S, 128)
    over2 = (counts2 > cap2).any(axis=0)
    counts2 = jnp.minimum(counts2, cap2)
    wcount = counts2.sum(axis=0)
    nbytes = 4 * wcount + st[5]                        # (S, 128)
    overflow = over1 | over2
    return comp2, counts2, nbytes, overflow


def mq_cap3(h: int, w: int, nplanes: int) -> int:
    """Per-lane packed-word capacity for the lane-sort compaction:
    4 B/sample bounds any legal MQ output for the block (the MQ coder
    cannot emit more than ~1.3 B/sample even on max-entropy content;
    the margin also covers stuffing + segment tails), and never exceeds
    the level-2 grid's own capacity. Lanes that somehow exceed it carry
    the existing overflow flag (host re-encode of that frame)."""
    T = nplanes * slots_per_plane(h, w)
    nch = -(-T // 256)
    ngrp = -(-nch // MQ_GRP)
    return min(ngrp * MQ_CAP2, h * w)


def _compact_lanes(jnp, lax, comp2, counts2, cap3: int):
    """Per-lane pack of the level-2 word grid with ONE lane-parallel
    sort: each valid (group, slot) word is keyed by its per-lane global
    word index (invalid slots key FAR), so sorting along the flattened
    (group, slot) axis moves every lane's words, in order, into the
    leading `cap3` rows. This replaces the flat global position sort
    over the full grid capacity (ngrp*cap2 per lane — 20M entries and
    ~108 ms/frame at cinema-2K geometry) with a batched sort whose
    global phase shrinks by ngrp*cap2/cap3 (~3-6x).

    Returns (packed (1, cap3, S, 128), counts (1, S, 128), over
    (S, 128) bool)."""
    ngrp, cap2, S, _ = comp2.shape
    cc = counts2                                   # clamped (ngrp,S,128)
    pre = jnp.cumsum(cc, axis=0) - cc              # words before group
    j = jnp.arange(cap2, dtype=jnp.int32).reshape(1, cap2, 1, 1)
    key = pre[:, None] + j
    far = jnp.int32(1 << 30)
    key = jnp.where(j < cc[:, None], key, far)
    k2 = key.reshape(ngrp * cap2, S, 128)
    v2 = comp2.reshape(ngrp * cap2, S, 128)
    _, sv = lax.sort_key_val(k2, v2, dimension=0)
    wcount = cc.sum(axis=0)
    over = wcount > cap3
    return (sv[:cap3][None], jnp.minimum(wcount, cap3)[None], over)


def _use_pallas() -> bool:
    import os

    import jax
    return (os.environ.get("GROK_TPU_MQ_PALLAS", "1") != "0"
            and jax.default_backend() != "cpu")


def run_mq_scans(jnp, lax, slots, B):
    """Flat-contract scan: (T, B) -> ((T, B) words, mask, nbo, state
    tuple). Test/back-compat surface; production uses
    run_mq_scans_blocked."""
    if _use_pallas():
        from . import mq_scan_pallas
        b_pad = -(-B // 128) * 128
        if b_pad != B:
            slots = jnp.pad(slots, ((0, 0), (0, b_pad - B)))
        words, mask, nbo, st = mq_scan_pallas.mq_scan(slots)
        if b_pad != B:
            words = words[:, :B]
            mask = mask[:, :B]
            nbo = nbo[:, :B]
            st = tuple(s[:B] for s in st)
        return words, mask, nbo, st
    return _mq_scan_w(jnp, lax, slots, B)


def run_mq_scans_blocked(jnp, lax, slots):
    """Blocked-layout scan: slots (T, B) with B % 128 == 0 ->
    (words (t_pad, S, 128), m8 (t_pad, S, 128) int32 chunk-local word
    indices (-1 where none), nbo (t_pad, S, 128) per-step byteout
    counts, state (NSTATE, S, 128)); t_pad rounds T up to the 256-step
    scan chunk."""
    T, B = slots.shape
    S = B // 128
    if _use_pallas():
        from . import mq_scan_pallas
        return mq_scan_pallas.mq_scan_blocked(slots, S)
    w, m, nbo, st = _mq_scan_w(jnp, lax, slots.astype(jnp.int32), B)
    t_pad = -(-T // 256) * 256
    w = jnp.pad(w, ((0, t_pad - T), (0, 0)))
    nbo = jnp.pad(nbo, ((0, t_pad - T), (0, 0)))
    mv = jnp.pad(m.astype(jnp.int32), ((0, t_pad - T), (0, 0)))
    mc = mv.reshape(-1, 256, B)
    m8 = jnp.where(mv.reshape(-1, 256, B) > 0,
                   jnp.cumsum(mc, axis=1) - 1, -1).reshape(t_pad, B)
    return (w.reshape(t_pad, S, 128), m8.reshape(t_pad, S, 128),
            nbo.reshape(t_pad, S, 128),
            jnp.stack(st).reshape(NSTATE, S, 128))


def run_mq_scans_compact(jnp, lax, slots):
    """Compacting-scan contract: slots (T, B) int8, B % 128 == 0 ->
    (comp1 (nch, MQ_CCAP, S, 128) int32 = each 256-step chunk's first
    CCAP emitted words, counts1 (nch, S, 128) raw per-chunk word
    counts, nboc (nch, S, 128) per-chunk byteout sums, state
    (NSTATE, S, 128)); nch = ceil(T / 256).

    This is the production scan: level-1 word compaction happens inside
    the Pallas kernel, so nothing O(T x B) beyond the 1-byte-per-slot
    stream itself ever lands in HBM. The dense-words contract
    (run_mq_scans_blocked) cost 12 B/slot/lane — ~13 GB for a 2048^2
    RGB tile, which forced a host fallback for exactly the big-tile
    configs the kernel exists for; this contract costs ~0.15 B of
    output per slot, so whole-tile MQ fusion holds at any BASELINE
    geometry (reference never materializes pass state either:
    src/lib/jp2/t1/t1_part1/t1.cpp:1182 streams per block)."""
    T, B = slots.shape
    S = B // 128
    if _use_pallas():
        from . import mq_scan_pallas
        return mq_scan_pallas.mq_scan_compact_blocked(slots, S)
    return _mq_scans_compact_ref(jnp, lax, slots)


def _mq_scans_compact_ref(jnp, lax, slots, ccap=MQ_CCAP):
    """XLA reference implementation of the compacting-scan contract
    (CPU fallback / kernel-correctness oracle): runs the dense scan and
    reduces its outputs to the compact contract."""
    T, B = slots.shape
    S = B // 128
    w, m, nbo, st = _mq_scan_w(jnp, lax, slots.astype(jnp.int32), B)
    t_pad = -(-T // 256) * 256
    nch = t_pad // 256
    w = jnp.pad(w, ((0, t_pad - T), (0, 0))).reshape(nch, 256, S, 128)
    nbo = jnp.pad(nbo, ((0, t_pad - T), (0, 0))).reshape(nch, 256, S, 128)
    mv = jnp.pad(m.astype(jnp.int32), ((0, t_pad - T), (0, 0)))
    mc = mv.reshape(nch, 256, S, 128)
    m8 = jnp.where(mc > 0, jnp.cumsum(mc, axis=1) - 1, -1)
    comp1 = jnp.stack(
        [jnp.sum(jnp.where(m8 == j, w, 0), axis=1)
         for j in range(ccap)], axis=1)
    counts1 = jnp.max(m8, axis=1) + 1
    nboc = nbo.sum(axis=1)
    return comp1, counts1, nboc, jnp.stack(st).reshape(NSTATE, S, 128)


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


NMETRICS = 8  # nbytes, a, c, ct, last, wacc, overflow, nbps


def mq_flat_sizes(h: int, w: int, B: int, nplanes: int,
                  want_rd: bool) -> Tuple[int, int]:
    """(metrics-head length, packed-word bound) of the flat fused-MQ
    output for one shape group. Head layout: metrics (B, NMETRICS) ++
    [want_rd: cumbo (3*nplanes, B) ++ dists bitcast (3*nplanes, B)]."""
    mhead = B * NMETRICS + (2 * 3 * nplanes * B if want_rd else 0)
    return mhead, B * (mq_cap3(h, w, nplanes) + 1)


@functools.lru_cache(maxsize=128)
def _jitted_mq_group(h: int, w: int, B: int, nplanes: int,
                     want_rd: bool = False):
    """One XLA program -> ONE flat int32 array: [metrics head | packed
    words], the ht_jax.submit_fetch/collect_fetch single-prefix-fetch
    contract. The packed words are spliced lane-major ON DEVICE
    (mq_scatter_flat) at exact per-lane offsets, so the fetch moves
    only ~the emitted bytes, not the compaction grid's capacity."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    geo = _geometry(h, w)
    mhead, total_bound = mq_flat_sizes(h, w, B, nplanes, want_rd)

    def run(mag, neg, orient, nbps):
        # mag/neg: (hp, w, B) lanes-last
        dists = None
        if want_rd:
            slots, dists = build_slot_stream(
                jnp, lax, mag, neg, orient[None, None, :],
                nbps[None, None, :], nplanes, geo, want_dist=True)
        else:
            slots = build_slot_stream(jnp, lax, mag, neg,
                                      orient[None, None, :],
                                      nbps[None, None, :], nplanes, geo)
        b_pad = -(-B // 128) * 128
        if b_pad != B:
            slots = jnp.pad(slots, ((0, 0), (0, b_pad - B)))
        slots = jax.lax.optimization_barrier(slots)
        comp1, counts1, nboc, st = run_mq_scans_compact(jnp, lax, slots)
        comp2, counts2, nbytes, overflow = _compact_level2(
            jnp, comp1, counts1, st)
        comp2, counts2, over3 = _compact_lanes(
            jnp, lax, comp2, counts2, mq_cap3(h, w, nplanes))
        overflow = overflow | over3
        nbp = jnp.pad(nbps, (0, b_pad - B)).reshape(nbytes.shape)
        metrics = jnp.stack(
            [nbytes, st[0], st[1], st[2], st[3], st[4],
             overflow.astype(jnp.int32), nbp], axis=-1)  # (S, 128, 8)
        metrics = metrics.reshape(-1, NMETRICS)[:B]
        nw = ((metrics[:, 0] + 3) >> 2)
        base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(nw)[:-1].astype(jnp.int32)])
        keys, vals = mq_splice_keys(jnp, base, comp2, counts2,
                                    st[4].reshape(-1)[:B],
                                    st[5].reshape(-1)[:B], B)
        out = mq_splice_sort(jnp, keys, vals, total_bound)
        parts = [metrics.reshape(-1)]
        if want_rd:
            # Cumulative byteout counts at each (static) pass boundary:
            # the host coder's buffer length at pass end, the quantity
            # PCRD truncation rates are built from (t1_np.py rate=...+5).
            parts.append(pass_cum_byteouts(jnp, nboc, h, w,
                                           nplanes).reshape(-1, b_pad)
                         [:, :B].reshape(-1))
            parts.append(lax.bitcast_convert_type(
                dists.reshape(-1, B), jnp.int32).reshape(-1))
        # head and words stay SEPARATE outputs: concatenating the
        # scatter result with the head makes XLA schedule the scatter
        # pathologically (minutes instead of ~60 ms on a 5.7M-element
        # buffer); mq_submit_fetch copies both with one round trip.
        return jnp.concatenate(parts), out

    return jax.jit(run), total_bound, mhead


def pass_cum_byteouts(jnp, nboc, h: int, w: int, nplanes: int):
    """nboc (nch, S, 128) per-256-chunk byteout sums -> (3*nplanes, S,
    128) cumulative byteouts at each pass boundary. Every pass section
    is padded to a 256-slot multiple (_plane_slots), so pass boundaries
    coincide with chunk boundaries and the chunk sums reconstruct the
    pass-end buffer lengths exactly."""
    sa, sb, sc = pass_spans_padded(h, w)
    tp = (sa + sb + sc) // 256
    ca, cb = sa // 256, (sa + sb) // 256
    cum = jnp.cumsum(nboc, axis=0)
    rows = []
    for q in range(nplanes):
        base = q * tp
        for c in (base + ca, base + cb, base + tp):
            rows.append(cum[c - 1])
    return jnp.stack(rows)


def mq_splice_keys(jnp, base, comp2, counts2, wacc, wcnt, B):
    """Per-group (position keys, word values) for the device splice.

    Each valid word of the level-2 grid is keyed by its final position
    in the lane-major packed word buffer (the exact layout
    assemble_mq_segments expects); invalid capacity slots key to
    INT32_MAX. base (B,) per-lane word starts (global across groups);
    comp2 (ngrp, cap2, S, 128) with S*128 >= B; counts2 (ngrp, S, 128);
    wacc/wcnt (B,) the partial-word accumulator and its byte count (the
    tail word when nbytes % 4 != 0)."""
    ngrp, cap2 = comp2.shape[0], comp2.shape[1]
    c = comp2.reshape(ngrp, cap2, -1)[:, :, :B]
    cc = counts2.reshape(ngrp, -1)[:, :B]
    pre = jnp.cumsum(cc, axis=0) - cc              # words before group
    j = jnp.arange(cap2, dtype=jnp.int32)[None, :, None]
    pos = base[None, None, :] + pre[:, None, :] + j
    far = jnp.int32(2**31 - 1)
    pos = jnp.where(j < cc[:, None, :], pos, far)
    wcount = cc.sum(axis=0)
    tpos = jnp.where(wcnt > 0, base + wcount, far)
    keys = jnp.concatenate([pos.reshape(-1), tpos])
    vals = jnp.concatenate([c.reshape(-1), wacc])
    return keys, vals


def mq_splice_sort(jnp, keys, vals, total_bound):
    """Sort the (pos, word) pairs of every group at once: the sorted
    values ARE the packed lane-major word buffer. A key sort, not an
    XLA scatter — the TPU lowers the sort ~2x faster than the
    element-at-a-time scatter at whole-tile size (107 ms vs 190 ms for
    a 2048^2 RGB tile). Returns (total_bound + 1,) int32."""
    from jax import lax

    _, sv = lax.sort_key_val(keys, vals)
    n = total_bound + 1
    return sv[:n] if sv.shape[0] >= n else jnp.pad(
        sv, (0, n - sv.shape[0]))


def mq_submit_fetch(head, words, total_bound, hint_key):
    """Start the async device->host copies for a fused-MQ result: the
    (small) metrics head in full plus a history-predicted prefix of the
    packed word buffer (ht_jax's bucket-hint scheme; the hint store is
    shared). Returns a handle for mq_collect_fetch."""
    from . import ht_jax

    hint = ht_jax._bucket_hints.get(hint_key, max(total_bound // 8, 256))
    bucket = min(ht_jax._bucket_up(hint), ht_jax._bucket_up(total_bound))
    pre = words[:bucket]
    for x in (head, pre):
        try:
            x.copy_to_host_async()
        except Exception:
            pass
    return (head, words, pre, bucket, hint_key)


def mq_collect_fetch(handle, total_words_fn):
    """Block on an mq_submit_fetch handle -> (head np array, words np
    array of exactly total_words_fn(head) words)."""
    from . import ht_jax

    head, words, pre, bucket, hint_key = handle
    head_np = np.asarray(head)
    total = int(total_words_fn(head_np))
    ht_jax._bucket_hints[hint_key] = max(
        total + total // 16, (ht_jax._bucket_hints.get(hint_key, 0) * 3) // 4)
    if total <= bucket:
        words_np = np.asarray(pre)[:total]
    else:
        cap = int(words.shape[0])
        fetch = min(ht_jax._bucket_up(total), cap)
        words_np = np.asarray(words[:fetch])[:total]
    return head_np, words_np


def mq_encode_blocks(blocks, want_rd: bool = False) -> List[Tuple]:
    """blocks: [(mag (h,w) uint32, neg (h,w) 0/1, orient int), ...] ->
    [(data, numbps, numpasses), ...] for the default code-block style,
    or [(data, numbps, numpasses, passes), ...] with `want_rd` (PCRD /
    multi-layer callers), where `passes` carries per-pass truncation
    rates byte-identical to the host coder's (t1/t1_np.py PassInfo) and
    distortion decreases float32-summed on device.
    Groups by shape; all groups dispatch (and start their async
    device->host copies) before any collects. Lanes whose chunked word
    compaction overflowed (pathological content) are re-encoded with
    the host coder — correctness never depends on the compaction caps.
    """
    import jax.numpy as jnp

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
        mags = np.zeros((hp, w, Bp), np.uint32)
        negs = np.zeros((hp, w, Bp), np.int32)
        orients = np.zeros((Bp,), np.int32)
        nbps = np.zeros((Bp,), np.int32)
        for k, (i, nb) in enumerate(entries):
            mags[:h, :, k] = blocks[i][0]
            negs[:h, :, k] = blocks[i][1]
            orients[k] = blocks[i][2]
            nbps[k] = nb
        fn, total_bound, mhead = _jitted_mq_group(h, w, Bp, npl, want_rd)
        head, words_dev = fn(jnp.asarray(mags), jnp.asarray(negs),
                             jnp.asarray(orients), jnp.asarray(nbps))
        fetch = mq_submit_fetch(head, words_dev, total_bound,
                                ("mq", h, w, Bp, npl, want_rd))
        handles.append((entries, Bp, npl, fetch))
    for (entries, Bp, npl, fetch) in handles:
        head_np, words = mq_collect_fetch(
            fetch,
            total_words_fn=lambda m, Bp=Bp: int(
                ((m.reshape(-1)[:Bp * NMETRICS].reshape(Bp, NMETRICS)
                  [:, 0].astype(np.int64)) + 3 >> 2).sum()))
        head_np = np.ascontiguousarray(head_np.reshape(-1))
        metrics_np = head_np[:Bp * NMETRICS].reshape(Bp, NMETRICS)
        if want_rd:
            off = Bp * NMETRICS
            cumbo_np = head_np[off:off + 3 * npl * Bp].reshape(
                3 * npl, Bp)
            off += 3 * npl * Bp
            dists_np = head_np[off:off + 3 * npl * Bp].view(
                np.float32).astype(np.float64).reshape(3 * npl, Bp)
        else:
            cumbo_np = None
            dists_np = None
        segs = assemble_mq_segments(words, metrics_np)
        if want_rd:
            totals = np.asarray([len(s) for s in segs], np.int64)
            rates_t, dcum_t = batch_pass_tables(
                totals, metrics_np[:, 7], npl, cumbo_np, dists_np)
        for k, (i, nb) in enumerate(entries):
            if metrics_np[k, 6]:
                from ..t1 import backend as _t1b
                full = _t1b.encode_cblk(
                    blocks[i][0], blocks[i][1].astype(np.uint8),
                    blocks[i][2], 0)
                results[i] = full if want_rd else full[:3]
                continue
            data = segs[k] if nb > 0 else b""
            npasses = 3 * nb - 2 if nb > 0 else 0
            if not want_rd:
                results[i] = (data, nb, npasses)
                continue
            results[i] = (data, nb, npasses,
                          _passes_from_tables(nb, npl, rates_t[:, k],
                                              dcum_t[:, k]))
    return results


def _lane_passes(data: bytes, nb: int, npl: int, cumbo: np.ndarray,
                 dists: np.ndarray):
    """Build the host-contract PassInfo list for one lane (delegates to
    the vectorized batch form)."""
    rates, dcum = batch_pass_tables(
        np.asarray([len(data)], np.int64), np.asarray([nb], np.int32),
        npl, cumbo[:, None], dists[:, None])
    return _passes_from_tables(nb, npl, rates[:, 0], dcum[:, 0])


def batch_pass_tables(totals: np.ndarray, nbs: np.ndarray, npl: int,
                      cumbo: np.ndarray, dists: np.ndarray):
    """Vectorized PCRD pass tables for a lane batch.

    totals (B,) segment byte lengths; nbs (B,) per-lane bitplane
    counts; cumbo/dists (3*npl, B) device cumulative byteouts /
    4^-plane-scaled distortion sums (rows: plane npl-1..0 x SPP, MRP,
    CLN). Returns (rates (3*npl, B) int64, dist_cum (3*npl, B)
    float64). Rates follow t1_np.encode_cblk exactly: non-terminated
    rate = bytes_so_far + 5 clamped monotone into [prev, total]; the
    final (terminated) pass is the exact segment length. A pure-numpy
    reformulation of the per-lane loop: the forward/backward clamp
    passes are running min/max scans along the pass axis."""
    nrows = 3 * npl
    planes = npl - 1 - (np.arange(nrows) // 3)
    dist_cum = np.cumsum(dists * np.power(4.0, planes)[:, None], axis=0)
    rates = np.minimum(cumbo.astype(np.int64) + 5, totals[None, :])
    rates[-1] = totals
    # backward min scan then forward max scan (the two clamp loops)
    rates = np.minimum.accumulate(rates[::-1], axis=0)[::-1]
    rates = np.maximum.accumulate(rates, axis=0)
    return rates, dist_cum


def _passes_from_tables(nb: int, npl: int, rates: np.ndarray,
                        dcum: np.ndarray):
    """PassInfo list for one lane from its batch_pass_tables columns.
    A lane with nb < npl bitplanes starts at the CLN of plane nb-1
    (row 3*(npl-nb)+2); rows before it carry no distortion (the device
    masks those planes out), so the cumulative rows are aligned."""
    from ..t1.t1_np import PassInfo

    if nb <= 0:
        return []
    j0 = 3 * (npl - nb) + 2
    n = 3 * nb - 2
    last = 3 * npl - 1
    return [PassInfo(rate=int(rates[j]), distortion=float(dcum[j]),
                     terminated=j == last)
            for j in range(j0, 3 * npl)]


def _pad_batch(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b
