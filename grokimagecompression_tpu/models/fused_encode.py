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

Restrictions (callers fall back to the staged path): reversible 5/3
only (irreversible deadzone quantization needs float64 semantics the
TPU lacks), standard RCT/no-MCT, HT (0x40) block style.
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


@dataclasses.dataclass(frozen=True)
class FusedPlan:
    """Static per-tile-geometry encode plan (jit cache key)."""
    cfg: pipeline.TileTransformConfig
    # (qh, qw, blocks) per shape group, qh/qw in quads
    groups: Tuple[Tuple[int, int, Tuple[BlockSpec, ...]], ...]
    nblocks: int
    # order[g][j] = global t1-desc index of group g's j-th block
    order: Tuple[Tuple[int, ...], ...]


def build_plan(siz, cod, qcd, tile: Rect,
               cod_comp=None, qcd_comp=None) -> Optional[FusedPlan]:
    """Build the fused plan for one tile, or None when out of scope.

    The block iteration order (comp -> resolution -> band -> precinct ->
    cblk) matches codestream/tile.py's t1 desc construction exactly, so
    collected segments slot into the T2 stage positionally.
    """
    from ..codestream.tile import build_comp_plan
    from ..core.params import Transform

    ncomps = len(siz.comps)
    cods = [cod_comp[c] if cod_comp and cod_comp[c] else cod
            for c in range(ncomps)]
    qcds = [qcd_comp[c] if qcd_comp and qcd_comp[c] else qcd
            for c in range(ncomps)]
    if any(cc.transform != Transform.DWT_53 for cc in cods):
        return None
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
                            h=cb.rect.h, w=cb.rect.w, kmax=bp.kmax)
                        qh = (spec.h + 1) // 2
                        qw = (spec.w + 1) // 2
                        groups.setdefault((qh, qw), []).append((gi, spec))
                        gi += 1
    gtuple = []
    order = []
    for (qh, qw) in sorted(groups.keys()):
        entries = groups[(qh, qw)]
        gtuple.append((qh, qw, tuple(s for (_, s) in entries)))
        order.append(tuple(i for (i, _) in entries))
    return FusedPlan(cfg=pipeline.config_for_tile(siz, cod, tile),
                     groups=tuple(gtuple), nblocks=gi,
                     order=tuple(order))


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
            mag = jnp.abs(v).astype(jnp.uint32)
            neg = (v < 0).astype(jnp.uint8)
            kmaxs = np.asarray([b.kmax for b in blocks], np.int32)
            mbs = jnp.asarray(np.tile(kmaxs, nframes))
            mbb = int(kmaxs.max())
            B = len(blocks) * nframes
            mel, vlc, ms = ht_jax._encode_streams(
                jnp, jax, lax, mag, neg, mbs, tables, mbb)
            streams.append((mel, vlc, ms))
            metrics, wcs = ht_jax._group_metrics(jnp, B, mel, vlc, ms)
            mets.append(metrics)
            wcs_l.append(wcs)
        wctot = jnp.concatenate([w.sum(axis=-1) for w in wcs_l])
        base_all = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(wctot)[:-1].astype(jnp.int32)])
        out = jnp.zeros((total_bound + 1,), jnp.int32)
        pos = 0
        for gidx, (qh, qw, blocks) in enumerate(plan.groups):
            B = len(blocks) * nframes
            (mel, vlc, ms) = streams[gidx]
            base = lax.dynamic_slice(base_all, (pos,), (B,))
            out = ht_jax._scatter_group_words(jnp, out, base, wcs_l[gidx],
                                              mel, vlc, ms)
            pos += B
        # single-fetch layout (see ht_jax._jitted_encode_multi)
        met = jnp.concatenate(mets, axis=0)
        return jnp.concatenate([met.reshape(-1), out[:-1]])

    mhead = plan.nblocks * nframes * ht_jax.NMETRICS
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
    fn, total_bound, mhead = _jitted_fused(plan, nframes)
    flat = fn(*args)
    fetch = ht_jax.submit_fetch(flat, mhead, total_bound, (plan, nframes))
    return (plan, nframes, fetch)


def encode_tile_collect(handle) -> List[List[bytes]]:
    """Block on the device result; returns per-frame segment lists in
    global t1-desc order (frames x nblocks)."""
    (plan, nframes, fetch) = handle
    metrics_np, words = ht_jax.collect_fetch(fetch)
    segs = ht_jax.assemble_segments_host(words, metrics_np)
    res: List[List[bytes]] = [[b""] * plan.nblocks for _ in range(nframes)]
    pos = 0
    for gidx, (qh, qw, blocks) in enumerate(plan.groups):
        nb = len(blocks)
        for f in range(nframes):
            for j in range(nb):
                res[f][plan.order[gidx][j]] = segs[pos]
                pos += 1
    return res


def encode_tile_segments(comps_data: List[np.ndarray],
                         plan: FusedPlan) -> List[bytes]:
    """Synchronous single-tile convenience wrapper."""
    return encode_tile_collect(encode_tile_submit(comps_data, plan))[0]
