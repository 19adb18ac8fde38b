"""Fully-fused on-device HT tile encode: one dispatch, one fetch.

Runs DC shift -> MCT -> multi-level DWT -> code-block gather -> HT
cleanup-pass coding -> packed segment assembly as a SINGLE jitted XLA
program per tile geometry, batched over a leading frame axis. The host
uploads raw component samples and fetches exactly two arrays back: the
per-block segment lengths and one contiguous byte buffer holding every
block's final HT segment. This collapses the 4-5 serialized
host<->device round trips of the staged path (transform fetch + block
upload + stream fetches) into one async pair — on a tunneled device
round-trip latency dominates, so this is the difference between ~2 MP/s
and wire-speed.

The reference has no analog: its accelerator seam (reference:
src/lib/jp2/plugin/plugin_bridge.cpp:24) ships DWT+T1 to a plugin but
re-synchronizes whole coefficient tiles with the host; here the only
thing that ever leaves the device is the compressed bytes.

Byte-exactness: the segment content is produced by the same
ops/ht_jax.py stream coders that are tested byte-identical to the native
host coder (native/src/ht.cpp, itself interop-verified against the
reference's ojph_block_encoder.cpp:465), and the gather/quantize stage
reproduces the native block gather exactly for the reversible path
(integer magnitudes; no rounding freedom).

Scope: standard RCT/ICT or no MCT; HT (0x40) or default-MQ block
style. Both transforms are in scope: the reversible 5/3 path is
byte-identical to the host encoder; the irreversible 9/7 path
quantizes on device in float32 (the TPU has no float64), so a
coefficient landing exactly on a deadzone boundary can round to the
adjacent magnitude vs the host's float64 quantizer — the streams are
equally conformant and equal-quality but not byte-identical
(tests/test_fused_encode.py asserts PSNR/size parity instead). With
`want_rd` the MQ program also returns per-pass truncation rates
(byte-identical to the host coder's) and device-summed distortion
decreases, so PCRD rate control runs directly on fused device encodes.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.geometry import Rect
from ..ops import ht_jax
from . import pipeline


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """Static description of one code-block inside a tile (hashable)."""
    comp: int
    key: Tuple[int, int]        # (resolution, orient) band key
    y0: int                     # offset inside the band plane
    x0: int
    h: int
    w: int
    kmax: int                   # band M_b (guard bits + expn - 1)
    step: float = 1.0           # band stepsize (irreversible quant)


@dataclasses.dataclass(frozen=True)
class FusedPlan:
    """Static per-tile-geometry encode plan (jit cache key)."""
    cfg: pipeline.TileTransformConfig
    # (qh, qw, blocks) per shape group — qh/qw in quads for the HT
    # coder, full (h, w) sample dims for the MQ coder
    groups: Tuple[Tuple[int, int, Tuple[BlockSpec, ...]], ...]
    nblocks: int
    # order[g][j] = global t1-desc index of group g's j-th block
    order: Tuple[Tuple[int, ...], ...]
    coder: str = "ht"
    # emit per-pass R-D tables from the MQ program (PCRD callers)
    want_rd: bool = False


def build_plan(siz, cod, qcd, tile: Rect,
               cod_comp=None, qcd_comp=None,
               coder: str = "ht",
               want_rd: bool = False) -> Optional[FusedPlan]:
    """Build the fused plan for one tile, or None when out of scope.

    The block iteration order (comp -> resolution -> band -> precinct ->
    cblk) matches codestream/tile.py's t1 desc construction exactly, so
    collected segments slot into the T2 stage positionally.

    `coder` selects the device entropy stage: "ht" (Part-15 cleanup
    coder, ops/ht_jax.py) or "mq" (Part-1 EBCOT bitplane passes + MQ
    scan, ops/mq_jax.py; default code-block style only). `want_rd`
    (MQ only) makes the program also return per-pass truncation rates
    and distortion tables for PCRD.
    """
    from ..codestream.tile import build_comp_plan
    from ..core.params import Transform

    ncomps = len(siz.comps)
    cods = [cod_comp[c] if cod_comp and cod_comp[c] else cod
            for c in range(ncomps)]
    qcds = [qcd_comp[c] if qcd_comp and qcd_comp[c] else qcd
            for c in range(ncomps)]
    if any(cc.transform != cods[0].transform for cc in cods):
        return None  # mixed per-component transforms: staged path
    reversible = cods[0].transform == Transform.DWT_53
    if cod.mct not in (0, 1):
        return None
    plans = [build_comp_plan(siz, cods[c], qcds[c], tile, c)
             for c in range(ncomps)]
    groups: Dict[Tuple[int, int], List[Tuple[int, BlockSpec]]] = {}
    gi = 0
    for c in range(ncomps):
        plan = plans[c]
        for res in plan.layout.resolutions:
            for band in res.bands:
                bp = plan.bands[(res.r, band.orient)]
                for prc in band.precincts:
                    for cb in prc.cblks:
                        spec = BlockSpec(
                            comp=c, key=(res.r, band.orient),
                            y0=cb.rect.y0 - band.rect.y0,
                            x0=cb.rect.x0 - band.rect.x0,
                            h=cb.rect.h, w=cb.rect.w, kmax=bp.kmax,
                            step=1.0 if reversible
                            else float(bp.stepsize))
                        if coder == "ht":
                            gk = ((spec.h + 1) // 2, (spec.w + 1) // 2)
                        else:
                            gk = (spec.h, spec.w)
                        groups.setdefault(gk, []).append((gi, spec))
                        gi += 1
    gtuple = []
    order = []
    for gk in sorted(groups.keys()):
        entries = groups[gk]
        if coder == "mq":
            # Cluster lanes by static band depth (kmax): the MQ scan
            # kernel skips (chunk x lane-tile) cells with no emitting
            # slot, and planes above a block's bit depth are dead — a
            # kmax-sorted lane order makes whole tiles go quiet on the
            # same planes instead of one deep block keeping 1023
            # shallow neighbours' tiles active. Stable, static, and
            # positionally transparent (`order` carries the mapping).
            entries = sorted(entries, key=lambda e: -e[1].kmax)
        gtuple.append((gk[0], gk[1], tuple(s for (_, s) in entries)))
        order.append(tuple(i for (i, _) in entries))
    if coder == "mq":
        # HBM gate: with the compacting scan (ops/mq_scan_pallas.
        # mq_scan_compact_blocked) the stream costs ~1 B/slot-lane in
        # HBM plus the packed copy and the level-1 grids (~2.5 B total)
        # — a whole 2048^2 RGB tile is ~2.3 GB, a 4096^2 RGB one ~9 GB.
        # Fall back to the host coder only past the budget
        # (GROK_TPU_MQ_HBM_MB, default 6144), which no BASELINE config
        # reaches.
        import os
        from ..ops import mq_jax as _mq
        budget = int(os.environ.get("GROK_TPU_MQ_HBM_MB", "6144")) << 20
        total = 0
        for (gh, gw, specs) in gtuple:
            kmax = max(sp.kmax for sp in specs)
            lanes = -(-(len(specs) * 1) // 128) * 128
            total += int(kmax * _mq.slots_per_plane(gh, gw)
                         * lanes * 2.5)
        if total > budget:
            return None
    return FusedPlan(cfg=pipeline.config_for_tile(siz, cod, tile),
                     groups=tuple(gtuple), nblocks=gi,
                     order=tuple(order), coder=coder,
                     want_rd=bool(want_rd and coder == "mq"))


@functools.lru_cache(maxsize=64)
def _jitted_fused(plan: FusedPlan, nframes: int):
    """One XLA program: frames' samples in, packed HT stream words +
    per-block metrics out (host splices the final segment bytes —
    ht_jax.assemble_segments_host).

    Returns (jitted fn, total word bound). Block order inside the packed
    buffer and the metrics rows: group-major, then frame-major within a
    group, then block order within the (group, frame)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    tables = ht_jax._tables()
    total_bound = 0
    for (qh, qw, blocks) in plan.groups:
        mbb = max(b.kmax for b in blocks)
        total_bound += (sum(ht_jax._bounds(qh, qw, mbb)) // 4 + 3) \
            * len(blocks) * nframes

    def run(*comps):
        bands_list = pipeline._fwd_transform(plan.cfg, comps)
        streams = []
        mets = []
        wcs_l = []
        for (qh, qw, blocks) in plan.groups:
            mats = []
            for b in blocks:
                band = bands_list[b.comp][b.key]
                blk = band[..., b.y0:b.y0 + b.h, b.x0:b.x0 + b.w]
                if b.h != 2 * qh or b.w != 2 * qw:
                    blk = jnp.pad(
                        blk, ((0, 0), (0, 2 * qh - b.h), (0, 2 * qw - b.w)))
                mats.append(blk)
            # (N, B, 2qh, 2qw) frame-major so a frame's blocks are
            # contiguous in the packed output
            v = jnp.stack(mats, axis=1).reshape(-1, 2 * qh, 2 * qw)
            if plan.cfg.reversible:
                mag = jnp.abs(v).astype(jnp.uint32)
            else:
                # deadzone quantization on device (float32; see module
                # docstring for the host-float64 boundary caveat)
                inv = np.tile(np.asarray(
                    [1.0 / b.step for b in blocks], np.float32), nframes)
                mag = jnp.floor(jnp.abs(v)
                                * inv[:, None, None]).astype(jnp.uint32)
            neg = (v < 0).astype(jnp.uint8)
            kmaxs = np.asarray([b.kmax for b in blocks], np.int32)
            mbs = jnp.asarray(np.tile(kmaxs, nframes))
            mbb = int(kmaxs.max())
            B = len(blocks) * nframes
            mel, vlc, ms = ht_jax._encode_streams(
                jnp, jax, lax, mag, neg, mbs, tables, mbb)
            cstreams, wcs, over = ht_jax._compact_streams(jnp, mel, vlc,
                                                          ms)
            streams.append(cstreams)
            metrics, _ = ht_jax._group_metrics(jnp, B, mel, vlc, ms,
                                               wcs=wcs)
            mets.append(jnp.concatenate(
                [metrics, over[:, None].astype(jnp.int32)], axis=1))
            wcs_l.append(wcs)
        wctot = jnp.concatenate([w.sum(axis=-1) for w in wcs_l])
        base_all = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(wctot)[:-1].astype(jnp.int32)])
        out = jnp.zeros((total_bound + 1,), jnp.int32)
        pos = 0
        for gidx, (qh, qw, blocks) in enumerate(plan.groups):
            B = len(blocks) * nframes
            base = lax.dynamic_slice(base_all, (pos,), (B,))
            out = ht_jax._scatter_group_compact(jnp, out, base,
                                                wcs_l[gidx], streams[gidx])
            pos += B
        # single-fetch layout (see ht_jax._jitted_encode_multi)
        met = jnp.concatenate(mets, axis=0)
        return jnp.concatenate([met.reshape(-1), out[:-1]])

    mhead = plan.nblocks * nframes * ht_jax.NMETRICS
    return jax.jit(run), total_bound, mhead


@functools.lru_cache(maxsize=64)
def _jitted_fused_mq(plan: FusedPlan, nframes: int):
    """One XLA program for the MQ coder: frames' samples in -> ONE flat
    int32 array [per-group metrics heads | packed words], fetched with
    the ht_jax.submit_fetch prefix contract. The packed words are
    spliced lane-major on device (mq_jax.mq_scatter_flat) at exact
    per-lane offsets — group-major, frame-major within a group — so
    the device->host copy moves ~the emitted bytes only (the level-2
    compaction grid's 15x capacity slack stays on device; over a
    tunneled link that slack cost 6x the encode program itself).

    Per-lane nbps is computed on device (bit-length of the block's max
    magnitude); the scan runs the group's kmax planes with per-lane
    validity masking, so no host round trip is needed before coding.
    Returns (jitted fn, total word bound, metrics-head length)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops import mq_jax

    mhead = 0
    total_bound = 0
    for (h, w, blocks) in plan.groups:
        B = nframes * len(blocks)
        kmaxg = max(b.kmax for b in blocks)
        mh, tb = mq_jax.mq_flat_sizes(h, w, B, kmaxg, plan.want_rd)
        mhead += mh
        total_bound += tb

    def run(*comps):
        bands_list = pipeline._fwd_transform(plan.cfg, comps)
        smalls = []
        gword = []
        for (h, w, blocks) in plan.groups:
            hp = -(-h // 4) * 4
            geo = mq_jax._geometry(h, w)
            mats = []
            for b in blocks:
                band = bands_list[b.comp][b.key]
                mats.append(band[..., b.y0:b.y0 + b.h, b.x0:b.x0 + b.w])
            v = jnp.stack(mats, axis=1)          # (N, B0, h, w)
            B = nframes * len(blocks)
            b_pad = -(-B // 128) * 128
            vt = v.reshape(B, h, w).transpose(1, 2, 0)   # (h, w, B)
            vt = jnp.pad(vt, ((0, hp - h), (0, 0), (0, b_pad - B)))
            if plan.cfg.reversible:
                mag = jnp.abs(vt).astype(jnp.uint32)
            else:
                # device deadzone quantization (float32; module docstring)
                inv = np.zeros((b_pad,), np.float32)
                inv[:B] = np.tile(np.asarray(
                    [1.0 / b.step for b in blocks], np.float32), nframes)
                mag = jnp.floor(jnp.abs(vt) * inv).astype(jnp.uint32)
            neg = (vt < 0).astype(jnp.int32)
            orients = jnp.asarray(np.tile(
                np.array([b.key[1] for b in blocks], np.int32), nframes))
            orients = jnp.pad(orients, (0, b_pad - B))
            # device nbps: bit length of the max magnitude per lane
            mx = jnp.max(mag, axis=(0, 1))
            nbps = jnp.zeros((b_pad,), jnp.int32)
            kmaxg = max(b.kmax for b in blocks)
            for k in range(kmaxg):
                nbps = jnp.where((mx >> np.uint32(k)) != 0, k + 1, nbps)
            if plan.want_rd:
                slots, dists = mq_jax.build_slot_stream(
                    jnp, lax, mag, neg, orients[None, None, :],
                    nbps[None, None, :], kmaxg, geo, want_dist=True)
            else:
                slots = mq_jax.build_slot_stream(
                    jnp, lax, mag, neg, orients[None, None, :],
                    nbps[None, None, :], kmaxg, geo)
            slots = jax.lax.optimization_barrier(slots)
            comp1, counts1, nboc, st = mq_jax.run_mq_scans_compact(
                jnp, lax, slots)
            comp2, counts2, nbytes, overflow = mq_jax._compact_level2(
                jnp, comp1, counts1, st)
            comp2, counts2, over3 = mq_jax._compact_lanes(
                jnp, lax, comp2, counts2, mq_jax.mq_cap3(h, w, kmaxg))
            overflow = overflow | over3
            metrics = jnp.stack(
                [nbytes, st[0], st[1], st[2], st[3], st[4],
                 overflow.astype(jnp.int32),
                 nbps.reshape(nbytes.shape)], axis=-1)
            metrics = metrics.reshape(-1, mq_jax.NMETRICS)[:B]
            parts = [metrics.reshape(-1)]
            if plan.want_rd:
                cumbo = mq_jax.pass_cum_byteouts(jnp, nboc, h, w, kmaxg)
                parts.append(cumbo.reshape(3 * kmaxg, -1)[:, :B]
                             .reshape(-1))
                parts.append(lax.bitcast_convert_type(
                    dists.reshape(3 * kmaxg, -1)[:, :B],
                    jnp.int32).reshape(-1))
            smalls.append(jnp.concatenate(parts))
            gword.append(((metrics[:, 0] + 3) >> 2, comp2, counts2,
                          st[4].reshape(-1)[:B], st[5].reshape(-1)[:B]))
        wctot = jnp.concatenate([g[0] for g in gword])
        base_all = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(wctot)[:-1].astype(jnp.int32)])
        keys_l, vals_l = [], []
        pos = 0
        for (nw, comp2, counts2, wacc, wcnt) in gword:
            B = nw.shape[0]
            base = lax.dynamic_slice(base_all, (pos,), (B,))
            k, v = mq_jax.mq_splice_keys(jnp, base, comp2, counts2,
                                         wacc, wcnt, B)
            keys_l.append(k)
            vals_l.append(v)
            pos += B
        out = mq_jax.mq_splice_sort(jnp, jnp.concatenate(keys_l),
                                    jnp.concatenate(vals_l), total_bound)
        # two outputs, not one concat: see mq_jax._jitted_mq_group —
        # concatenating the splice result into the head degraded the
        # XLA schedule by orders of magnitude back when it was a
        # scatter; keep the contract separate regardless.
        return jnp.concatenate(smalls), out

    return jax.jit(run), total_bound, mhead


def encode_tile_submit(comps_data: List[np.ndarray], plan: FusedPlan):
    """Dispatch the fused encode for one tile (or a batch of same-geometry
    tiles/frames stacked on a leading axis) and start the single async
    device->host copy. Returns a handle for encode_tile_collect."""
    import jax.numpy as jnp

    nframes = comps_data[0].shape[0] if comps_data[0].ndim == 3 else 1
    args = []
    for c, a in enumerate(comps_data):
        # Upload at the component's natural width (the device transform
        # widens to int32 on arrival): 4x less host->device traffic for
        # 8-bit content — the upload is a first-order cost on a
        # bandwidth-limited device link.
        prec = plan.cfg.precs[c]
        signed = plan.cfg.signeds[c]
        if prec <= 8:
            dt = np.int8 if signed else np.uint8
        elif prec <= 16:
            dt = np.int16 if signed else np.uint16
        else:
            dt = np.int32
        args.append(jnp.asarray((a if a.ndim == 3 else a[None]).astype(dt)))
    if plan.coder == "mq":
        from ..ops import mq_jax
        fn, total_bound, mhead = _jitted_fused_mq(plan, nframes)
        head, words = fn(*args)
        fetch = mq_jax.mq_submit_fetch(head, words, total_bound,
                                       (plan, nframes))
        return (plan, nframes, fetch)
    fn, total_bound, mhead = _jitted_fused(plan, nframes)
    flat = fn(*args)
    fetch = ht_jax.submit_fetch(flat, mhead, total_bound, (plan, nframes))
    return (plan, nframes, fetch)


def encode_tile_collect(handle) -> List[Optional[List]]:
    """Block on the device result; returns per-frame segment lists in
    global t1-desc order (frames x nblocks). HT entries are segment
    bytes; MQ entries are (data, numbps, numpasses) tuples. An MQ frame
    whose word compaction overflowed comes back as None — the caller
    re-encodes that frame on the host (correctness never depends on the
    compaction caps)."""
    (plan, nframes, fetch) = handle
    if plan.coder == "mq":
        from ..ops import mq_jax
        head_np, words_np = mq_jax.mq_collect_fetch(
            fetch, total_words_fn=_mq_head_total_words(plan, nframes))
        return assemble_collected_mq(plan, nframes, head_np, words_np)
    metrics_np, words = ht_jax.collect_fetch(fetch)
    return assemble_collected_ht(plan, nframes, metrics_np, words)


def assemble_collected_ht(plan: FusedPlan, nframes: int, metrics_np,
                          words) -> List[Optional[List]]:
    """Host splice of a fetched HT result (shared by the single-device
    collect and the mesh path, which fetches per-shard chunks)."""
    segs = ht_jax.assemble_segments_host(words, metrics_np)
    over = metrics_np[:, 15] != 0
    res: List[Optional[List]] = [
        [b""] * plan.nblocks for _ in range(nframes)]
    bad_frames = set()
    pos = 0
    for gidx, (qh, qw, blocks) in enumerate(plan.groups):
        nb = len(blocks)
        for f in range(nframes):
            for j in range(nb):
                if over[pos]:
                    # word-compaction cap exceeded (adversarially dense
                    # content): this frame re-encodes on the host
                    bad_frames.add(f)
                res[f][plan.order[gidx][j]] = segs[pos]
                pos += 1
    for f in bad_frames:
        res[f] = None
    return res


def _mq_head_total_words(plan: FusedPlan, nframes: int):
    """total_words_fn for collect_fetch: walk the per-group metrics
    heads and sum each lane's ceil(nbytes / 4)."""
    from ..ops import mq_jax

    def fn(head):
        head = head.reshape(-1)
        total = 0
        pos = 0
        for (h, w, blocks) in plan.groups:
            B = nframes * len(blocks)
            kmaxg = max(b.kmax for b in blocks)
            m = head[pos:pos + B * mq_jax.NMETRICS].reshape(
                B, mq_jax.NMETRICS)
            total += int(((m[:, 0].astype(np.int64) + 3) >> 2).sum())
            pos += B * mq_jax.NMETRICS
            if plan.want_rd:
                pos += 2 * 3 * kmaxg * B
        return total

    return fn


def assemble_collected_mq(plan: FusedPlan, nframes: int, head_np,
                          words_np) -> List[Optional[List]]:
    """Host splice of a fetched MQ result (shared by the single-device
    collect and the mesh path)."""
    from ..ops import mq_jax

    head_np = np.ascontiguousarray(np.asarray(head_np).reshape(-1))
    res: List[Optional[List]] = [
        [None] * plan.nblocks for _ in range(nframes)]
    bad_frames = set()
    pos = 0
    wpos = 0
    for gidx, (h, w, blocks) in enumerate(plan.groups):
        B = nframes * len(blocks)
        kmaxg = max(b.kmax for b in blocks)
        metrics_np = head_np[pos:pos + B * mq_jax.NMETRICS].reshape(
            B, mq_jax.NMETRICS)
        pos += B * mq_jax.NMETRICS
        cumbo_np = None
        gdists = None
        if plan.want_rd:
            cumbo_np = head_np[pos:pos + 3 * kmaxg * B].reshape(
                3 * kmaxg, B)
            pos += 3 * kmaxg * B
            gdists = head_np[pos:pos + 3 * kmaxg * B].view(
                np.float32).astype(np.float64).reshape(3 * kmaxg, B)
            pos += 3 * kmaxg * B
        gwords = int(((metrics_np[:, 0].astype(np.int64) + 3) >> 2).sum())
        segs = mq_jax.assemble_mq_segments(
            words_np[wpos:wpos + gwords], metrics_np)
        wpos += gwords
        if plan.want_rd:
            totals = np.asarray([len(s) for s in segs], np.int64)
            rates_t, dcum_t = mq_jax.batch_pass_tables(
                totals, metrics_np[:, 7], kmaxg, cumbo_np, gdists)
        nb0 = len(blocks)
        for f in range(nframes):
            for j in range(nb0):
                lane = f * nb0 + j
                if metrics_np[lane, 6]:
                    bad_frames.add(f)
                    continue
                nbps = int(metrics_np[lane, 7])
                data = segs[lane] if nbps > 0 else b""
                npas = 3 * nbps - 2 if nbps > 0 else 0
                if plan.want_rd:
                    passes = mq_jax._passes_from_tables(
                        nbps, kmaxg, rates_t[:, lane], dcum_t[:, lane])
                    res[f][plan.order[gidx][j]] = (data, nbps, npas,
                                                   passes)
                else:
                    res[f][plan.order[gidx][j]] = (data, nbps, npas)
    for f in bad_frames:
        res[f] = None
    return res


def encode_tile_segments(comps_data: List[np.ndarray],
                         plan: FusedPlan) -> List[bytes]:
    """Synchronous single-tile convenience wrapper."""
    return encode_tile_collect(encode_tile_submit(comps_data, plan))[0]
