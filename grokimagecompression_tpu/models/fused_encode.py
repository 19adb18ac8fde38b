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
        gtuple.append((gk[0], gk[1], tuple(s for (_, s) in entries)))
        order.append(tuple(i for (i, _) in entries))
    if coder == "mq":
        # HBM gate: the MQ scan materializes (slots, lanes) words + m8 +
        # nbo dense in HBM. A whole 2048^2 RGB tile reaches ~350k slots
        # x 3k lanes = 13 GB — beyond a v5e chip. Estimate the footprint
        # (slots ~= planes x 3.5 x h x w upper bound) and fall back to
        # the host coder above the budget (GROK_TPU_MQ_HBM_MB, def 1536).
        import os
        budget = int(os.environ.get("GROK_TPU_MQ_HBM_MB", "1536")) << 20
        total = 0
        for (gh, gw, specs) in gtuple:
            kmax = max(sp.kmax for sp in specs)
            lanes = -(-len(specs) // 128) * 128
            total += int(kmax * 3.5 * gh * gw) * lanes * 4 * 3
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
    """One XLA program for the MQ coder: frames' samples in ->
    (small = per-block metrics + per-group level-2 counts, then one
    level-2 compacted word grid per group). Host does the ragged splice
    (ops/mq_jax.splice_mq_words) and the MQ FLUSH tail.

    Per-lane nbps is computed on device (bit-length of the block's max
    magnitude); the scan runs the group's kmax planes with per-lane
    validity masking, so no host round trip is needed before coding.
    Block/lane order matches the HT path: group-major, frame-major
    within a group."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops import mq_jax

    def run(*comps):
        bands_list = pipeline._fwd_transform(plan.cfg, comps)
        smalls = []
        dists_l = []
        comp2s = []
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
            words, m8, nbo, st = mq_jax.run_mq_scans_blocked(jnp, lax,
                                                             slots)
            comp2, counts2, nbytes, overflow = mq_jax._compact_words(
                jnp, words, m8, st)
            metrics = jnp.stack(
                [nbytes, st[0], st[1], st[2], st[3], st[4],
                 overflow.astype(jnp.int32),
                 nbps.reshape(nbytes.shape)], axis=-1)
            metrics = metrics.reshape(-1, mq_jax.NMETRICS)[:B]
            parts = [metrics.reshape(-1),
                     counts2.reshape(counts2.shape[0], -1)[:, :B]
                     .reshape(-1)]
            if plan.want_rd:
                cumbo = mq_jax.pass_cum_byteouts(jnp, nbo, h, w, kmaxg)
                parts.append(cumbo.reshape(3 * kmaxg, -1)[:, :B]
                             .reshape(-1))
                dists_l.append(dists.reshape(3 * kmaxg, -1)[:, :B]
                               .reshape(-1))
            smalls.append(jnp.concatenate(parts))
            comp2s.append(comp2)
        out = (jnp.concatenate(smalls),)
        if plan.want_rd:
            out = out + (jnp.concatenate(dists_l),)
        return out + tuple(comp2s)

    return jax.jit(run)


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
        fn = _jitted_fused_mq(plan, nframes)
        outs = fn(*args)
        for a in outs:
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        return (plan, nframes, outs)
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
        return _collect_mq(plan, nframes, fetch)
    metrics_np, words = ht_jax.collect_fetch(fetch)
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


def _collect_mq(plan: FusedPlan, nframes: int, outs) -> List[Optional[List]]:
    from ..ops import mq_jax

    small_np = np.asarray(outs[0])
    dists_np = np.asarray(outs[1], np.float64) if plan.want_rd else None
    cidx = 2 if plan.want_rd else 1
    res: List[Optional[List]] = [
        [None] * plan.nblocks for _ in range(nframes)]
    bad_frames = set()
    pos = 0
    dpos = 0
    for gidx, (h, w, blocks) in enumerate(plan.groups):
        B = nframes * len(blocks)
        kmaxg = max(b.kmax for b in blocks)
        comp2_np = np.asarray(outs[cidx + gidx])
        ngrp, cap2 = comp2_np.shape[0], comp2_np.shape[1]
        comp2_np = comp2_np.reshape(ngrp, cap2, -1)[:, :, :B]
        nsm = B * mq_jax.NMETRICS + ngrp * B
        metrics_np = small_np[pos:pos + B * mq_jax.NMETRICS].reshape(
            B, mq_jax.NMETRICS)
        counts2_np = small_np[pos + B * mq_jax.NMETRICS:pos + nsm].reshape(
            ngrp, B)
        pos += nsm
        cumbo_np = None
        gdists = None
        if plan.want_rd:
            cumbo_np = small_np[pos:pos + 3 * kmaxg * B].reshape(
                3 * kmaxg, B)
            pos += 3 * kmaxg * B
            gdists = dists_np[dpos:dpos + 3 * kmaxg * B].reshape(
                3 * kmaxg, B)
            dpos += 3 * kmaxg * B
        words = mq_jax.splice_mq_words(comp2_np, counts2_np, metrics_np)
        segs = mq_jax.assemble_mq_segments(words, metrics_np)
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
                    passes = mq_jax._lane_passes(
                        data, nbps, kmaxg, cumbo_np[:, lane],
                        gdists[:, lane])
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
