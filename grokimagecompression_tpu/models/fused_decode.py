"""Fully-fused on-device HT tile DECODE: one dispatch per tile.

The decode mirror of models/fused_encode.py: after the host parses the
packets (T2 is byte-serial), the per-block HT cleanup segments are
expanded to dense unstuffed stream words (ops/ht_dec_jax.py prepass) and
ONE jitted XLA program per tile geometry runs: lane-parallel HT entropy
decode (scan over the quad grid, blocks in lanes) -> signed/dequantized
coefficients -> band-plane assembly (static dynamic_update_slice chain)
-> inverse DWT -> inverse MCT -> DC unshift. Only sample arrays come
back to the host.

Reference decode hot loops this replaces on-device:
src/lib/jp2/t1/t1_ht/coding/ojph_block_decoder.cpp:687 (block decode),
src/lib/jp2/transform/dwt.cpp:1208/2154 (inverse DWT),
src/lib/jp2/TileProcessor.cpp:1303 (inverse MCT).

Scope (callers fall back to the staged/host path): HT (0x40) style,
full-tile decode (no window), reduce == 0, no per-component COD
overrides, standard MCT. Bit-exact with the host decoder for the
reversible path; float-identical for 9/7 (same single-precision op
order as the native mid-point dequantizer).
"""

from __future__ import annotations

import dataclasses
import functools
import threading as _threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_compile_locks: Dict = {}
_compiled: set = set()

from ..core.geometry import Rect
from ..ops import ht_dec_jax
from . import pipeline


@dataclasses.dataclass(frozen=True)
class DecBlock:
    comp: int
    key: Tuple[int, int]
    y0: int
    x0: int
    h: int
    w: int


@dataclasses.dataclass(frozen=True)
class FusedDecPlan:
    cfg: pipeline.TileTransformConfig
    # (w, h, lanes) per shape group; lanes are DecBlock rows
    groups: Tuple[Tuple[int, int, Tuple[DecBlock, ...]], ...]
    band_shapes: Tuple[Tuple[int, int, int, int], ...]  # (comp,key...)
    stepsizes: Tuple[float, ...]      # per band (same order), 1.0 if rev
    coder: str = "ht"
    backend: str = "xla"              # entropy-core backend (xla|pallas)


@functools.lru_cache(maxsize=32)
def _jitted_fused_dec(plan: FusedDecPlan,
                      word_dims: Tuple[Tuple[int, ...], ...]):
    """One XLA program: per-group entropy inputs -> component sample
    arrays for the tile. HT groups take 3 dense stream-word arrays;
    MQ groups take (seg, end, nbps, npasses, orient) and run the
    lane-parallel slot-walk decoder (ops/mq_dec_jax.py) in-program."""
    import jax
    import jax.numpy as jnp

    from ..ops import mq_dec_jax

    cfg = plan.cfg
    keys = pipeline._band_keys(cfg.numresolutions)
    ncomps = len(cfg.tc_rects)
    rev = cfg.reversible
    if plan.coder == "ht":
        nargs = 3
    else:
        # MQ groups carry a trailing per-lane reconstruction-offset
        # array (halves): truncated blocks reconstruct at the center of
        # their lowest DECODED plane, matching the host dequantizer.
        nargs = 5 if plan.backend == "pallas" else 6

    def run(*words):
        # decode every group
        grids = []
        halfs_l = []
        for gi, (w, h, lanes) in enumerate(plan.groups):
            if plan.coder == "ht":
                mel_w, vlc_w, ms_w = words[3 * gi: 3 * gi + 3]
                mags, signs = ht_dec_jax.decode_group_backend(
                    w, h, plan.backend)(mel_w, vlc_w, ms_w)
                halfs_l.append(None)
            elif plan.backend == "pallas":
                from ..ops import mq_dec_pallas
                wrd, g0, gend, ori, halfs = \
                    words[nargs * gi: nargs * gi + nargs]
                S, npl, Lw = word_dims[gi]
                packed = mq_dec_pallas.decode_core_pallas(
                    h, w, S, npl, Lw)(wrd, g0, gend, ori)
                B = S * 128
                pu = packed.astype(jnp.uint32)
                mags = (pu & jnp.uint32(0x7FFFFFFF)).T.reshape(B, h, w)
                signs = (pu >> 31).astype(jnp.int32).T.reshape(B, h, w)
                halfs_l.append(halfs)
            else:
                seg, end, nbps, npas, ori, halfs = \
                    words[nargs * gi: nargs * gi + nargs]
                B, npl = word_dims[gi][0], word_dims[gi][1]
                magf, negf = mq_dec_jax.decode_core(h, w, B, npl)(
                    seg, end, nbps, npas, ori)
                # (HW, B) -> (B, h, w) lane grids like the HT core
                mags = magf.T.reshape(B, h, w).astype(jnp.uint32)
                signs = negf.T.reshape(B, h, w)
                halfs_l.append(halfs)
            grids.append((mags, signs))
        # band planes
        bands: Dict[Tuple[int, Tuple[int, int]], object] = {}
        steps: Dict[Tuple[int, Tuple[int, int]], float] = {}
        for (c, r, o, bh, bw), st in zip(plan.band_shapes,
                                         plan.stepsizes):
            dt = jnp.int32 if rev else jnp.float32
            bands[(c, (r, o))] = jnp.zeros((bh, bw), dt)
            steps[(c, (r, o))] = st
        for gi, (w, h, lanes) in enumerate(plan.groups):
            mags, signs = grids[gi]
            halfs = halfs_l[gi]
            for li, b in enumerate(lanes):
                m = mags[li, :b.h, :b.w]
                s = signs[li, :b.h, :b.w]
                if rev:
                    mi = m.astype(jnp.int32)
                    if halfs is not None:
                        mi = jnp.where(m != 0, mi + halfs[li], mi)
                    v = jnp.where(s != 0, -mi, mi)
                else:
                    mm = m.astype(jnp.float32)
                    half = (halfs[li] if halfs is not None
                            else jnp.float32(0.5))
                    mm = jnp.where(m != 0, mm + half, mm)
                    v = mm * jnp.float32(steps[(b.comp, b.key)])
                    v = jnp.where(s != 0, -v, v)
                bands[(b.comp, b.key)] = jax.lax.dynamic_update_slice(
                    bands[(b.comp, b.key)], v, (b.y0, b.x0))
        bands_list = [{k: bands[(c, k)] for k in keys}
                      for c in range(ncomps)]
        return pipeline._inv_transform(cfg, bands_list)

    return jax.jit(run)



def _lane_halves(nb_np_pairs, rev: bool):
    """Per-lane mid-point reconstruction offsets for MQ lanes: the half
    belongs at each block's lowest DECODED plane (quant.trunc_plane) so
    truncated blocks reconstruct like the host dequantizer. float32
    factors for irreversible bands, int32 addends for reversible."""
    from ..ops.quant import trunc_plane
    pms = [trunc_plane(nb, np_) for (nb, np_) in nb_np_pairs]
    if rev:
        return np.asarray([(1 << (pm - 1)) if pm > 0 else 0
                           for pm in pms], np.int32)
    return np.asarray([0.5 * (1 << pm) for pm in pms], np.float32)


def _entropy_backend(plans, coder: str) -> str:
    """Pick the group-decoder backend: the Pallas kernels on real
    accelerator hardware (ops/ht_dec_pallas.py window-refill scan /
    ops/mq_dec_pallas.py column-step walk), the lax.scan cores
    otherwise. Scope gates: the HT kernel's window invariant needs
    every MagSgn read <= 32 bits (U_p <= 32, i.e. band kmax + 3 fits);
    the MQ kernel packs the sign in bit 31 (kmax <= 30). Both hold for
    every encoder-legal stream at <= 16-bit precision.
    GROK_TPU_DEC_PALLAS=0 forces the scan cores."""
    import os
    if os.environ.get("GROK_TPU_DEC_PALLAS", "1") == "0":
        return "xla"
    try:
        import jax
        if jax.default_backend() == "cpu":
            return "xla"
    except Exception:  # pragma: no cover - backend probe
        return "xla"
    kmax = 0
    for p in plans:
        for res in p.layout.resolutions:
            for band in res.bands:
                kmax = max(kmax, p.bands[(res.r, band.orient)].kmax)
    if coder == "ht":
        return "pallas" if kmax + 3 <= 32 else "xla"
    return "pallas" if kmax <= 30 else "xla"


def decode_tile_device(t1_jobs, t1_job_slots, plans, cods, siz, cod,
                       tile: Rect, stepsizes_by_band,
                       _prepare_only=False) -> Optional[list]:
    """Full fused device decode of one tile. Returns [per-comp sample
    array] in tile-component layout, or None when out of scope (caller
    runs the host path). `_prepare_only` returns (fn, staged word
    arrays) without dispatching (bench.py chip-mq-dec)."""
    from ..core.params import Transform

    if cod.mct not in (0, 1):
        return None
    cfg = pipeline.config_for_tile(siz, cod, tile)
    rev = cfg.reversible
    keys = pipeline._band_keys(cfg.numresolutions)
    ncomps = len(plans)

    # band shapes + steps in (comp, key) order
    band_shapes = []
    steps = []
    for c in range(ncomps):
        for k in keys:
            br = None
            for res in plans[c].layout.resolutions:
                for band in res.bands:
                    if (res.r, band.orient) == k:
                        br = band.rect
            if br is None:
                return None
            band_shapes.append((c, k[0], k[1], br.h, br.w))
            steps.append(1.0 if rev else float(
                stepsizes_by_band[(c, k)]))

    coder = "ht" if (cod.cblk_style & 0x40) else "mq"
    # group blocks by sample dims; skip empty segments (stay zero)
    groups: Dict[Tuple[int, int], List[Tuple[int, DecBlock]]] = {}
    for i, ((c, key, cb), job) in enumerate(zip(t1_job_slots, t1_jobs)):
        data = job[0]
        w, h = int(job[2]), int(job[3])
        if coder == "ht":
            if len(data) < 2:
                continue
            scup = (data[-1] << 4) + (data[-2] & 0xF)
            if scup > len(data) or scup < 2:
                return None  # structurally invalid: host path owns errors
        else:
            if job[1] is not None and len(job[1]) > 1:
                return None  # multi-segment layout: host path
            if int(job[5]) <= 0 or int(job[6]) <= 0:
                continue
        band = None
        for res in plans[c].layout.resolutions:
            for bd in res.bands:
                if (res.r, bd.orient) == key:
                    band = bd
        blk = DecBlock(comp=c, key=key,
                       y0=cb.geom.rect.y0 - band.rect.y0,
                       x0=cb.geom.rect.x0 - band.rect.x0, h=h, w=w)
        groups.setdefault((w, h), []).append((i, blk))

    backend = _entropy_backend(plans, coder)
    import jax.numpy as jnp

    from ..ops import mq_dec_jax, mq_dec_pallas
    if coder == "mq" and backend == "pallas":
        # segment length is decoder input: a legal-but-long segment that
        # exceeds the kernel's s=1 VMEM tile must take the XLA core
        # instead of failing Mosaic compilation
        for (w, h), entries in groups.items():
            if any(not mq_dec_pallas.mq_pallas_fits(
                    h, w, len(t1_jobs[i][0])) for (i, _) in entries):
                backend = "xla"
                break
    gtuple = []
    words = []
    word_dims = []
    for (w, h) in sorted(groups.keys()):
        entries = groups[(w, h)]
        segs = [bytes(t1_jobs[i][0]) for (i, _) in entries]
        if coder == "ht":
            lcups = [len(s) for s in segs]
            scups = [(s[-1] << 4) + (s[-2] & 0xF) for s in segs]
            wm_mel = ht_dec_jax.bucket_words(
                (8 * (max(scups) + 7)) // 32 + 4)
            wm_vlc = ht_dec_jax.bucket_words(
                (8 * (max(scups) + 7)) // 32 + 4)
            wm_ms = ht_dec_jax.bucket_words(
                (8 * (max(lc - sc for lc, sc in zip(lcups, scups)) + 8))
                // 32 + 4)
            mel_np, vlc_np, ms_np = ht_dec_jax.prepass_all(
                segs, lcups, scups, wm_mel, wm_vlc, wm_ms)
            words.append(jnp.asarray(mel_np))
            words.append(jnp.asarray(vlc_np))
            words.append(jnp.asarray(ms_np))
            word_dims.append((wm_mel, wm_vlc, wm_ms))
        else:
            jobs = [t1_jobs[i] for (i, _) in entries]
            lanes = [(s, int(j[4]), int(j[5]), int(j[6]))
                     for j, s in zip(jobs, segs)]
            if backend == "pallas":
                arrays, dims = mq_dec_pallas.pack_field_lanes(lanes)
            else:
                arrays, dims = mq_dec_jax.pack_lanes(lanes)
            words += [jnp.asarray(a) for a in arrays]
            words.append(jnp.asarray(_lane_halves(
                [(int(j[5]), int(j[6])) for j in jobs], rev)))
            word_dims.append(dims)
        gtuple.append((w, h, tuple(b for (_, b) in entries)))

    plan = FusedDecPlan(cfg=cfg, groups=tuple(gtuple),
                        band_shapes=tuple(band_shapes),
                        stepsizes=tuple(steps), coder=coder,
                        backend=backend)
    key = (plan, tuple(word_dims))
    fn = _jitted_fused_dec(plan, tuple(word_dims))
    if _prepare_only:
        return fn, words
    if key in _compiled:
        comps = fn(*words)
    else:
        # Serialize the first call per geometry: concurrent tile threads
        # would otherwise each compile the (large) program in parallel.
        with _compile_locks.setdefault(key, _threading.Lock()):
            comps = fn(*words)
            _compiled.add(key)
    return [np.asarray(a) for a in comps]


# ---------------------------------------------------------------------------
# Batched (multi-frame) fused decode: serving mirror of fused_encode's
# chunked submit/collect. One XLA program decodes F same-geometry tiles:
# lanes are frame-major (frame f's blocks at f*B..), content-dependent
# emptiness is a per-lane validity input (NOT a compile constant), so
# one compile serves any content mix.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _jitted_fused_dec_batch(plan: FusedDecPlan,
                            word_dims: Tuple[Tuple[int, ...], ...],
                            nframes: int):
    """Program: per-group (mel, vlc, ms, valid) [HT] or (words, g0,
    gend, ori) [MQ pallas] -> per-component (F, th, tw) sample
    arrays."""
    import jax
    import jax.numpy as jnp

    cfg = plan.cfg
    keys = pipeline._band_keys(cfg.numresolutions)
    ncomps = len(cfg.tc_rects)
    rev = cfg.reversible

    gstride = 5 if plan.coder == "mq" else 4

    def run(*args):
        grids = []
        halfs_l = []
        for gi, (w, h, lanes) in enumerate(plan.groups):
            B = len(lanes)
            if plan.coder == "mq":
                from ..ops import mq_dec_pallas
                wrd, g0, gend, ori, halfs = \
                    args[gstride * gi: gstride * gi + gstride]
                S, npl, Lw = word_dims[gi]
                packed = mq_dec_pallas.decode_core_pallas(
                    h, w, S, npl, Lw)(wrd, g0, gend, ori)
                pu = packed.astype(jnp.uint32)[:, :nframes * B]
                mags = (pu & jnp.uint32(0x7FFFFFFF)).T.reshape(
                    nframes, B, h, w)
                signs = (pu >> 31).astype(jnp.int32).T.reshape(
                    nframes, B, h, w)
                grids.append((mags, signs))
                halfs_l.append(halfs.reshape(nframes, B))
                continue
            mel_w, vlc_w, ms_w, valid = \
                args[gstride * gi: gstride * gi + 4]
            halfs_l.append(None)
            mags, signs = ht_dec_jax.decode_group_backend(
                w, h, plan.backend)(mel_w, vlc_w, ms_w)
            vm = valid.astype(mags.dtype)[:, None, None]
            mags = (mags * vm).reshape(nframes, B, *mags.shape[1:])
            signs = (signs * vm.astype(signs.dtype)).reshape(
                nframes, B, *signs.shape[1:])
            grids.append((mags, signs))
        bands: Dict[Tuple[int, Tuple[int, int]], object] = {}
        steps: Dict[Tuple[int, Tuple[int, int]], float] = {}
        for (c, r, o, bh, bw), st in zip(plan.band_shapes,
                                         plan.stepsizes):
            dt = jnp.int32 if rev else jnp.float32
            bands[(c, (r, o))] = jnp.zeros((nframes, bh, bw), dt)
            steps[(c, (r, o))] = st
        for gi, (w, h, lanes) in enumerate(plan.groups):
            mags, signs = grids[gi]
            halfs = halfs_l[gi]
            for li, b in enumerate(lanes):
                m = mags[:, li, :b.h, :b.w]
                s = signs[:, li, :b.h, :b.w]
                if rev:
                    mi = m.astype(jnp.int32)
                    if halfs is not None:
                        mi = jnp.where(
                            m != 0, mi + halfs[:, li][:, None, None], mi)
                    v = jnp.where(s != 0, -mi, mi)
                else:
                    mm = m.astype(jnp.float32)
                    half = (halfs[:, li][:, None, None]
                            if halfs is not None else jnp.float32(0.5))
                    mm = jnp.where(m != 0, mm + half, mm)
                    v = mm * jnp.float32(steps[(b.comp, b.key)])
                    v = jnp.where(s != 0, -v, v)
                bands[(b.comp, b.key)] = jax.lax.dynamic_update_slice(
                    bands[(b.comp, b.key)], v, (0, b.y0, b.x0))
        bands_list = [{k: bands[(c, k)] for k in keys}
                      for c in range(ncomps)]
        return pipeline._inv_transform(cfg, bands_list)

    return jax.jit(run)


def decode_tiles_device_submit(frames, plans, cods, siz, cod, tile: Rect,
                               stepsizes_by_band, _prepare_only=False,
                               device=None):
    """Submit F same-geometry tiles for one fused batched device decode.

    frames: list of (t1_jobs, t1_job_slots) — every frame MUST carry the
    same slot layout (same tile geometry; slots are geometry-derived).
    Returns an opaque handle for decode_tiles_device_collect, or None
    when out of scope (caller runs per-frame paths).
    `_prepare_only` returns (fn, staged word arrays) without dispatching
    (bench.py chip-dec stages chunks ahead and times dispatches alone).
    `device` pins the staged arrays (and therefore the program) to one
    mesh device — the multi-chip decode dispatches tile sub-batches
    round-robin across devices this way (tiles are independent, so
    throughput scales without collectives).
    """
    import jax
    import jax.numpy as jnp

    if device is not None:
        def _stage(a):
            return jax.device_put(np.asarray(a), device)
    else:
        _stage = jnp.asarray

    if cod.mct not in (0, 1):
        return None
    coder = "ht" if (cod.cblk_style & 0x40) else "mq"
    backend = _entropy_backend(plans, coder)
    if coder == "mq" and (cod.cblk_style != 0 or backend != "pallas"):
        return None  # MQ batch rides the Pallas kernel only
    cfg = pipeline.config_for_tile(siz, cod, tile)
    rev = cfg.reversible
    keys = pipeline._band_keys(cfg.numresolutions)
    ncomps = len(plans)
    nframes = len(frames)
    if nframes == 0:
        return None

    band_shapes = []
    steps = []
    for c in range(ncomps):
        for k in keys:
            br = None
            for res in plans[c].layout.resolutions:
                for band in res.bands:
                    if (res.r, band.orient) == k:
                        br = band.rect
            if br is None:
                return None
            band_shapes.append((c, k[0], k[1], br.h, br.w))
            steps.append(1.0 if rev else float(stepsizes_by_band[(c, k)]))

    # Lane layout from the SLOT list (geometry), not content: group all
    # blocks by (w, h); a frame whose block is empty/invalid gets a
    # dummy zero segment and valid=0 in that lane.
    slots0 = frames[0][1]
    for jobs, slots in frames[1:]:
        if len(slots) != len(slots0):
            return None
    groups: Dict[Tuple[int, int], List[Tuple[int, DecBlock]]] = {}
    for i, ((c, key, cb), job) in enumerate(zip(slots0, frames[0][0])):
        w, h = int(job[2]), int(job[3])
        band = None
        for res in plans[c].layout.resolutions:
            for bd in res.bands:
                if (res.r, bd.orient) == key:
                    band = bd
        blk = DecBlock(comp=c, key=key,
                       y0=cb.geom.rect.y0 - band.rect.y0,
                       x0=cb.geom.rect.x0 - band.rect.x0, h=h, w=w)
        groups.setdefault((w, h), []).append((i, blk))

    gtuple = []
    words = []
    word_dims = []
    for (w, h) in sorted(groups.keys()):
        entries = groups[(w, h)]
        if coder == "mq":
            from ..ops import mq_dec_pallas
            lanes = []
            nbnp = []
            for jobs, _slots in frames:
                for (i, _) in entries:
                    j = jobs[i]
                    if j[1] is not None and len(j[1]) > 1:
                        return None  # multi-segment layout: host path
                    nb, npas = int(j[5]), int(j[6])
                    if nb <= 0 or npas <= 0:
                        lanes.append((b"", 0, 0, 0))  # idle lane
                        nbnp.append((0, 0))
                    else:
                        if not mq_dec_pallas.mq_pallas_fits(
                                h, w, len(j[0])):
                            return None  # VMEM-oversized segment
                        lanes.append((bytes(j[0]), int(j[4]), nb, npas))
                        nbnp.append((nb, npas))
            arrays, dims = mq_dec_pallas.pack_field_lanes(lanes)
            words += [_stage(a) for a in arrays]
            words.append(_stage(_lane_halves(nbnp, rev)))
            word_dims.append(dims)
            gtuple.append((w, h, tuple(b for (_, b) in entries)))
            continue
        segs: List[bytes] = []
        valid = np.zeros(nframes * len(entries), np.int32)
        li = 0
        for jobs, _slots in frames:
            for (i, _) in entries:
                data = bytes(jobs[i][0])
                ok = len(data) >= 2
                if ok:
                    scup = (data[-1] << 4) + (data[-2] & 0xF)
                    ok = 2 <= scup <= len(data)
                if ok:
                    segs.append(data)
                    valid[li] = 1
                else:
                    segs.append(b"\x00\x00")
                li += 1
        lcups = [len(s) for s in segs]
        scups = [(s[-1] << 4) + (s[-2] & 0xF) if v else 2
                 for s, v in zip(segs, valid)]
        wm_mel = ht_dec_jax.bucket_words((8 * (max(scups) + 7)) // 32 + 4)
        wm_vlc = wm_mel
        wm_ms = ht_dec_jax.bucket_words(
            (8 * (max(lc - sc for lc, sc in zip(lcups, scups)) + 8))
            // 32 + 4)
        mel_np, vlc_np, ms_np = ht_dec_jax.prepass_all(
            segs, lcups, scups, wm_mel, wm_vlc, wm_ms)
        words += [_stage(mel_np), _stage(vlc_np),
                  _stage(ms_np), _stage(valid)]
        word_dims.append((wm_mel, wm_vlc, wm_ms))
        gtuple.append((w, h, tuple(b for (_, b) in entries)))

    plan = FusedDecPlan(cfg=cfg, groups=tuple(gtuple),
                        band_shapes=tuple(band_shapes),
                        stepsizes=tuple(steps), coder=coder,
                        backend=backend)
    key = (plan, tuple(word_dims), nframes)
    fn = _jitted_fused_dec_batch(plan, tuple(word_dims), nframes)
    if _prepare_only:
        return fn, words
    if key in _compiled:
        out = fn(*words)
    else:
        with _compile_locks.setdefault(key, _threading.Lock()):
            out = fn(*words)
            _compiled.add(key)
    return out


def decode_tiles_device_collect(handle) -> List[list]:
    """Block on a submitted batch; returns per-frame lists of per-comp
    sample arrays (tile-component layout)."""
    comps = [np.asarray(a) for a in handle]
    nframes = comps[0].shape[0]
    return [[a[f] for a in comps] for f in range(nframes)]
