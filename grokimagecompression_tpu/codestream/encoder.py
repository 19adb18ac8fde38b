"""Top-level J2K encoder: image -> codestream bytes.

Analog of the reference encode path (reference: src/lib/jp2/codestream/
j2k.cpp: j2k_setup_encoder:1609, j2k_start_compress:2127, j2k_encode:2059,
tile loop j2k.cpp:2088) with the tile loop expressed as an independent
per-tile map (the sharding axis for the device pipeline) instead of a
sequential stateful loop.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..core.geometry import ceil_div, tile_grid_size, tile_rect
from ..core.image import Image
from ..core.params import EncoderParams, MCT, QuantStyle, Transform
from . import markers
from .markers import CodInfo, ComponentSiz, SizInfo, SotInfo
from .tile import TileEncResult, default_qcd, encode_tile


def build_siz(image: Image, params: EncoderParams) -> SizInfo:
    # Default tile: one tile covering the whole image area from the tile
    # origin (Table A-10 requires XTOsiz + XTsiz > XOsiz; sizing from the
    # image offset would leave phantom tiles before the image origin).
    xt, yt = params.tile_size if params.tile_size else (
        image.xsiz - params.tile_offset[0],
        image.ysiz - params.tile_offset[1],
    )
    comps = [
        ComponentSiz(prec=c.prec, signed=c.signed, dx=c.dx, dy=c.dy)
        for c in image.components
    ]
    return SizInfo(
        xsiz=image.xsiz, ysiz=image.ysiz,
        xosiz=params.image_offset[0], yosiz=params.image_offset[1],
        xtsiz=xt, ytsiz=yt,
        xtosiz=params.tile_offset[0], ytosiz=params.tile_offset[1],
        comps=comps,
    )


def build_cod(image: Image, params: EncoderParams) -> CodInfo:
    if params.custom_mct is not None:
        mct = 2
        precincts = (params.precinct_exps_for(params.numresolutions)
                     if params.precincts is not None else None)
        return CodInfo(
            progression=params.progression,
            numlayers=params.numlayers,
            mct=2,
            numresolutions=params.numresolutions,
            cblk_w_exp=params.cblk_w_exp,
            cblk_h_exp=params.cblk_h_exp,
            cblk_style=params.cblk_style,
            transform=params.transform,
            precincts=precincts,
            sop=params.sop_markers,
            eph=params.eph_markers,
        )
    mct = params.mct
    if mct is None:
        same = (
            image.numcomps >= 3
            and all(image.components[i].dx == image.components[0].dx
                    and image.components[i].dy == image.components[0].dy
                    for i in range(3))
        )
        mct = MCT.RCT_OR_ICT if same else MCT.NONE
    precincts = None
    if params.precincts is not None:
        precincts = params.precinct_exps_for(params.numresolutions)
    return CodInfo(
        progression=params.progression,
        numlayers=params.numlayers,
        mct=int(mct),
        numresolutions=params.numresolutions,
        cblk_w_exp=params.cblk_w_exp,
        cblk_h_exp=params.cblk_h_exp,
        cblk_style=params.cblk_style,
        transform=params.transform,
        precincts=precincts,
        sop=params.sop_markers,
        eph=params.eph_markers,
    )


def extract_tile_comps(image: Image, siz: SizInfo, t: int) -> List[np.ndarray]:
    """Slice per-component tile data out of the full image planes."""
    tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                   siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    out = []
    for comp in image.components:
        tcx0 = ceil_div(tr.x0, comp.dx)
        tcy0 = ceil_div(tr.y0, comp.dy)
        tcx1 = ceil_div(tr.x1, comp.dx)
        tcy1 = ceil_div(tr.y1, comp.dy)
        ox = ceil_div(image.x0, comp.dx)
        oy = ceil_div(image.y0, comp.dy)
        out.append(np.ascontiguousarray(
            comp.data[tcy0 - oy:tcy1 - oy, tcx0 - ox:tcx1 - ox]))
    return out


def _encode_ht_rate_controlled(image: Image, params: EncoderParams,
                               device, rsiz: int, mesh=None) -> bytes:
    """HT + byte-rate targeting: simulate, then confirm.

    HT has no truncation points, so rate control adjusts the 9/7 base
    quantization step. Round-1 did that by bisecting with FULL re-encodes
    (~12x cost). This follows the reference's simulate-don't-recode
    philosophy (reference: src/lib/jp2/t2/T2.cpp:131): the transform is
    computed ONCE and cached; the step search runs the native HT coder
    alone on the cached float bands (no DWT, no T2, no markers) to get
    exact segment byte totals; the T2/header overhead is calibrated from
    the first confirming encode. Typical cost: ~2 full encodes + a
    handful of coder-only simulations.
    """
    if params.transform != Transform.DWT_97:
        raise ValueError("HT rate control requires the 9/7 transform "
                         "(reversible HT has no quantizer to adjust)")
    if len(params.rates) != 1 or params.numlayers != 1:
        raise ValueError("HT rate control supports a single layer/ratio")
    ratio = float(params.rates[0])
    if ratio <= 0:
        raise ValueError("HT rate control needs a positive ratio")
    image_bytes = sum(
        c.data.shape[0] * c.data.shape[1] * c.prec
        for c in image.components) // 8
    target = max(256, int(image_bytes / ratio))

    coeff_by_tile = None
    if params.custom_mct is None:
        coeff_by_tile = _ht_rc_transform_cache(image, params, rsiz)

    def attempt(step: float) -> bytes:
        p = dataclasses.replace(params, rates=(), base_step=step)
        return encode(image, p, device=device, rsiz=rsiz, mesh=mesh,
                      _coeff_bands_by_tile=coeff_by_tile)

    if coeff_by_tile is None:
        return _ht_rc_bisect(attempt, target)

    seg_cache: dict = {}

    def seg(step: float) -> int:
        if step not in seg_cache:
            seg_cache[step] = _ht_rc_segment_bytes(image, params, rsiz,
                                                   coeff_by_tile, step)
        return seg_cache[step]

    def search(ov: int) -> float:
        """Smallest step whose simulated total fits the target."""
        lo, hi = 0.25, 1.0
        while seg(hi) + ov > target and hi < 4096:
            lo, hi = hi, hi * 4.0
        if seg(hi) + ov > target:
            return hi           # floor: even huge steps overshoot
        while seg(lo) + ov <= target and lo > 1e-4:
            hi, lo = lo, lo / 4.0
        if seg(lo) + ov <= target:
            return lo
        for _ in range(10):     # log bisection on the simulator
            mid = (lo * hi) ** 0.5
            if seg(mid) + ov <= target:
                hi = mid
            else:
                lo = mid
            if lo / hi > 0.995:
                break
        return hi

    # Initial overhead guess; calibrated exactly after the first confirm.
    ov = max(200, target // 50)
    best = None
    for _ in range(4):
        step = search(ov)
        cs = attempt(step)
        if len(cs) <= target:
            best = cs
            true_ov = len(cs) - seg(step)
            if true_ov >= ov - max(32, target // 500):
                return cs       # overhead was right: step is optimal
            ov = max(0, true_ov)        # margin was too big: retry finer
            refined = search(ov)
            if refined >= step * 0.995:
                return cs
            cs2 = attempt(refined)
            return cs2 if len(cs2) <= target else cs
        ov = len(cs) - seg(step) + max(32, target // 500)
    return best if best is not None else cs


def _ht_rc_cods(siz, params: EncoderParams, cod):
    cods = [cod] * len(siz.comps)
    if params.comp_cblk_exps:
        for compno, (we, he) in params.comp_cblk_exps.items():
            cods[compno] = dataclasses.replace(
                cod, cblk_w_exp=we, cblk_h_exp=he)
    return cods


def _ht_rc_transform_cache(image: Image, params: EncoderParams, rsiz):
    """DC shift + MCT + 9/7 DWT once per tile -> float band dicts."""
    from .tile import _apply_fwd_transforms, build_comp_plan, default_qcd
    from ..ops import dwt_host

    siz = build_siz(image, params)
    cod = build_cod(image, params)
    cods = _ht_rc_cods(siz, params, cod)
    qcd0 = default_qcd(siz, cod, 1, 1.0)
    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    out = {}
    for t in range(ntx * nty):
        tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                       siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
        comps = extract_tile_comps(image, siz, t)
        plans = [build_comp_plan(siz, cods[c], qcd0, tr, c)
                 for c in range(len(comps))]
        data = _apply_fwd_transforms(comps, plans, cod)
        out[t] = [
            dwt_host.fwd_dwt_2d(data[c], plans[c].layout.tc_rect,
                                cods[c].numresolutions, reversible=False)
            for c in range(len(comps))]
    return out


def _ht_rc_segment_bytes(image: Image, params: EncoderParams, rsiz,
                         coeff_by_tile, step: float) -> int:
    """Exact total HT segment bytes at `step` from the cached bands:
    the native fused gather+quantize+HT-encode, nothing else."""
    from .tile import build_comp_plan, default_qcd
    from ..native import t1_native

    siz = build_siz(image, params)
    cod = build_cod(image, params)
    cods = _ht_rc_cods(siz, params, cod)
    qcd = default_qcd(siz, cod, 1, step)
    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    total = 0
    for t in range(ntx * nty):
        tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                       siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
        bands, steps, descs, mbs = [], [], [], []
        for c, coeff in enumerate(coeff_by_tile[t]):
            plan = build_comp_plan(siz, cods[c], qcd, tr, c)
            for res in plan.layout.resolutions:
                for band in res.bands:
                    bp = plan.bands[(res.r, band.orient)]
                    bi = len(bands)
                    bands.append(np.ascontiguousarray(
                        coeff[(res.r, band.orient)], dtype=np.float32))
                    steps.append(bp.stepsize)
                    for prc in band.precincts:
                        for cb in prc.cblks:
                            descs.append((bi, cb.rect.x0 - band.rect.x0,
                                          cb.rect.y0 - band.rect.y0,
                                          cb.rect.w, cb.rect.h))
                            mbs.append(bp.kmax)
        if descs:
            segs = t1_native.ht_encode_cblk_batch_bands(
                bands, np.asarray(descs, np.int64),
                np.asarray(mbs, np.int64), stepsizes=steps)
            total += sum(len(s) for s in segs)
    return total


def _ht_rc_bisect(attempt, target: int) -> bytes:
    """Fallback full-re-encode bisection (custom-MCT path only)."""
    lo, hi = 0.25, 1.0          # step bracket (bytes(lo) >= bytes(hi))
    cs_hi = attempt(hi)
    while len(cs_hi) > target and hi < 4096:
        lo, hi = hi, hi * 4.0
        cs_hi = attempt(hi)
    if len(cs_hi) > target:
        return cs_hi            # floor: even huge steps overshoot
    best = cs_hi
    cs_lo = attempt(lo)
    while len(cs_lo) <= target and lo > 1e-4:
        hi, best = lo, cs_lo
        lo = lo / 4.0
        cs_lo = attempt(lo)
    if len(cs_lo) <= target:
        return cs_lo
    for _ in range(8):          # bisect in log space
        mid = (lo * hi) ** 0.5
        cs = attempt(mid)
        if len(cs) <= target:
            hi, best = mid, cs
        else:
            lo = mid
        if abs(len(cs) - target) <= max(64, target // 200):
            if len(cs) <= target:
                return cs
    return best


def _device_mq_ok() -> bool:
    """Whether the device MQ coder should serve plain-MQ block coding:
    explicitly via GROK_TPU_T1=device, or automatically when a real
    accelerator backend is present (the lax.scan fallback on CPU is far
    slower than the native host coder)."""
    import os
    if os.environ.get("GROK_TPU_T1", "") == "device":
        return True
    if os.environ.get("GROK_TPU_T1", "") in ("python", "native"):
        return False
    try:
        import jax
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def encode(image: Image, params: Optional[EncoderParams] = None,
           layer_alloc=None, device: Optional[bool] = None,
           rsiz: int = 0, mesh=None,
           _t1_segments_by_tile=None,
           _coeff_bands_by_tile=None,
           _only_tiles=None,
           _tile_results=None) -> bytes:
    """Encode an Image to a raw J2K codestream.

    `device=True` runs the tile transform pipeline (DC shift/MCT/DWT) on the
    JAX device (TPU); default is host numpy unless GROK_TPU_DEVICE=1.
    `mesh` (a jax.sharding.Mesh) shards the tile-batch transform over the
    mesh devices; every other stage (markers, HT/CAP, POC, tile-parts,
    packed headers, rate control) is this same single code path, so the
    sharded bytes are identical to the sequential ones by construction
    (reference contrast: src/lib/jp2/codestream/j2k.cpp:2088 sequential
    tile loop).
    """
    import os
    if device is None:
        from ..utils.device import device_default
        device = device_default()
    params = params or EncoderParams()
    # Layer count follows the rate/quality vectors when they are longer
    # (the reference sets tcp_numlayers from the -r/-q list length:
    # grk_compress.cpp parsing); keeps the library API consistent with
    # the CLI.
    _nl = max(params.numlayers, len(params.rates),
              len(params.quality_psnr))
    if _nl != params.numlayers:
        params = dataclasses.replace(params, numlayers=_nl)
    is_ht = bool(params.cblk_style & 0x40)
    siz = build_siz(image, params)
    if rsiz:
        siz = dataclasses.replace(siz, rsiz=siz.rsiz | rsiz)
    cod = build_cod(image, params)
    # HT (Part 15): JPH rsiz flag, single guard bit (like the reference,
    # j2k.cpp:1834), CAP marker after SIZ.
    guard_bits = 1 if is_ht else params.num_guard_bits
    qcd = default_qcd(siz, cod, guard_bits, params.base_step)
    if is_ht:
        siz = dataclasses.replace(siz, rsiz=siz.rsiz | markers.JPH_RSIZ_FLAG)
        if params.quality_psnr:
            raise ValueError("PSNR targets are not available with the HT "
                             "block coder (single cleanup pass)")
        if params.rates:
            # HT has no truncation points, so rate control happens in the
            # quantizer: search the base step for the byte target — a
            # capability the reference lacks entirely (it disables rate
            # control for HT).
            return _encode_ht_rate_controlled(image, params, device, rsiz,
                                              mesh=mesh)

    # Per-component COD overrides (COC markers).
    cod_comp = None
    if params.comp_cblk_exps:
        cod_comp = [None] * len(siz.comps)
        for compno, (we, he) in params.comp_cblk_exps.items():
            cod_comp[compno] = dataclasses.replace(
                cod, cblk_w_exp=we, cblk_h_exp=he)

    custom_coding_matrix = None
    if params.custom_mct is not None:
        import numpy as _np
        from ..ops.linalg import lup_inverse
        if cod.transform != Transform.DWT_97:
            raise ValueError("custom MCT requires the 9/7 transform")
        decode_matrix = _np.asarray(params.custom_mct, _np.float32)
        n = len(siz.comps)
        if decode_matrix.shape != (n, n):
            raise ValueError("custom MCT matrix must be ncomps x ncomps")
        custom_coding_matrix = lup_inverse(decode_matrix)
        siz = dataclasses.replace(siz, rsiz=siz.rsiz | 0x8000 | 0x0100)
        # Part-2 signalling: CBD + MCT records (decode matrix + DC
        # offsets) + MCC + MCO (reference: j2k_setup_mct_encoding:2580).
        out_extra = markers.write_cbd(siz.comps)
        out_extra += markers.write_mct_record(
            1, markers.MCT_ARRAY_DECORRELATION, decode_matrix)
        offsets = [0 if c.signed else (1 << (c.prec - 1))
                   for c in siz.comps]
        out_extra += markers.write_mct_record(
            2, markers.MCT_ARRAY_OFFSET, _np.asarray(offsets, _np.float32))
        out_extra += markers.write_mcc(n, 1, 2)
        out_extra += markers.write_mco([0])
    else:
        out_extra = b""

    out = bytearray()
    out += markers.write_soc()
    out += markers.write_siz(siz)
    # Custom MCT wire format matches the reference ENCODER: SGcod mct=2 +
    # CBD/MCT/MCC/MCO records. (Note: the reference's own DECODER rejects
    # mct=2 — its custom-MCT decode path is unreachable; ours accepts it.)
    wire_cod = cod
    if is_ht:
        reversible = cod.transform == Transform.DWT_53
        if qcd.style == QuantStyle.NONE:
            max_mb = max(e + qcd.num_guard_bits - 1 for e in qcd.exponents)
        else:
            max_mb = max(e + qcd.num_guard_bits - 1 for (e, m) in qcd.steps)
        out += markers.write_cap(reversible, max_mb)
    out += markers.write_cod(wire_cod)
    if cod_comp:
        for compno, cc in enumerate(cod_comp):
            if cc is not None:
                out += markers.write_coc(compno, cc, len(siz.comps))
    out += markers.write_qcd(qcd)
    if params.pocs:
        out += markers.write_poc(params.pocs, len(siz.comps))

    roishifts = None
    if params.roi_comp is not None and params.roi_shift > 0:
        if is_ht:
            raise ValueError("ROI upshift is not supported with the HT "
                             "block coder")
        roishifts = [0] * len(siz.comps)
        roishifts[params.roi_comp] = params.roi_shift
        out += markers.write_rgn(params.roi_comp, params.roi_shift,
                                 len(siz.comps))
    out += out_extra
    if params.comment:
        out += markers.write_com(params.comment)

    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    needs_rc = bool(params.rates and any(r > 0 for r in params.rates)) \
        or bool(params.quality_psnr)
    _global_alloc = False
    if layer_alloc is None and needs_rc:
        if params.rate_alloc == "global" and _tile_results is not None:
            # Multi-host assembly phase: every tile arrives pre-encoded
            # with its final layer allocation; no allocator runs here.
            if len(_tile_results) < ntx * nty:
                raise NotImplementedError(
                    "rate_alloc='global' with partial _tile_results")
        elif (params.rate_alloc == "global" and _only_tiles is not None
              and ntx * nty > 1):
            # Multi-host phase split (SURVEY.md §2.5): each process
            # registers its OWNED tiles' R-D tables at the local
            # barrier, then the bisection reduces byte/distortion
            # totals over the process mesh — every host derives
            # identical thresholds, so the bytes are deterministic.
            from .pcrd import GlobalPCRDAllocator
            image_bytes = sum(
                c.data.shape[0] * c.data.shape[1] * c.prec
                for c in image.components) // 8
            layer_alloc = GlobalPCRDAllocator(
                rates=params.rates, quality_psnr=params.quality_psnr,
                image_bytes=image_bytes,
                numtiles=max(len(_only_tiles), 1),
                global_numtiles=ntx * nty, numlayers=cod.numlayers,
                process_reduce=True)
            _global_alloc = True
            if not _only_tiles:
                # A host owning zero tiles still joins the collectives.
                layer_alloc.participate_empty()
        elif params.rate_alloc == "global" and ntx * nty > 1:
            from .pcrd import GlobalPCRDAllocator
            image_bytes = sum(
                c.data.shape[0] * c.data.shape[1] * c.prec
                for c in image.components) // 8
            layer_alloc = GlobalPCRDAllocator(
                rates=params.rates, quality_psnr=params.quality_psnr,
                image_bytes=image_bytes, numtiles=ntx * nty, mesh=mesh)
            _global_alloc = True
        else:
            from .pcrd import make_layer_alloc
            layer_alloc = make_layer_alloc(image, params)
    tile_parts = bytearray()
    tp_lengths = []
    ppm_sections: list = []
    numtiles = ntx * nty
    split = params.ppt_markers or params.ppm_markers

    # Mesh-sharded transform: batch same-geometry tiles and run the fused
    # DC-shift/MCT/DWT over the device mesh up front; the per-tile encode
    # below consumes the precomputed bands. Custom-matrix MCT stays on the
    # host (the device pipeline implements RCT/ICT only).
    mesh_coeff = {}
    mesh_comps = {}
    if mesh is not None and custom_coding_matrix is None:
        # Device entropy on the mesh: run the fused transform+block-code
        # program sharded over the tile axis (parallel/sharding.py
        # fused_entropy_tiles_on_mesh) — byte-identical to the host
        # coder, so the assembled stream matches sequential output.
        # Out-of-scope shapes (and rate-controlled MQ, whose R-D tables
        # stay host-side for now) use the transform-only mesh instead.
        if (_t1_segments_by_tile is None and roishifts is None
                and not params.ht_refinement and not needs_rc
                and _coeff_bands_by_tile is None and not cod_comp
                and (is_ht or cod.cblk_style == 0)
                and cod.transform in (Transform.DWT_53, Transform.DWT_97)):
            from ..parallel.sharding import fused_entropy_tiles_on_mesh
            _t1_segments_by_tile = fused_entropy_tiles_on_mesh(
                image, siz, cod, qcd, mesh,
                coder="ht" if is_ht else "mq") or None
        if _t1_segments_by_tile is None:
            from ..parallel.sharding import transform_tiles_on_mesh
            mesh_coeff, mesh_comps = transform_tiles_on_mesh(
                image, siz, cod, mesh)

    # Fully-fused device encode (HT reversible): DC shift -> MCT -> DWT ->
    # block gather -> HT coding -> packed segments, one dispatch + one
    # async fetch per tile, all tiles submitted before any is collected so
    # device work and host packetization pipeline (the tunnel round-trip
    # hides behind the previous tile's T2).
    fused_handles = {}
    fused_mod = None
    # _device_mq_ok() initializes the jax backend (on a tunneled TPU
    # that can block for seconds — or hang if the link is down), so it
    # must only be consulted when the caller asked for device encode.
    # PCRD callers fuse too: the MQ program emits per-pass R-D tables
    # (want_rd) that feed the host allocator directly.
    mq_fusable = (device and cod.cblk_style == 0 and _device_mq_ok())
    if (device and (is_ht or mq_fusable) and custom_coding_matrix is None
            and not params.ht_refinement
            and mesh is None and roishifts is None
            and _t1_segments_by_tile is None
            # precomputed transforms (HT rate-control step search) must
            # not re-enter the fused transform+code program: each step
            # candidate would compile a fresh program (stepsize is part
            # of the plan), and the cache exists precisely to avoid
            # recomputing the transform
            and _coeff_bands_by_tile is None
            and cod.transform in (Transform.DWT_53, Transform.DWT_97)):
        from ..models import fused_encode as fused_mod
        coder = "ht" if is_ht else "mq"
        want_rd = coder == "mq" and layer_alloc is not None
        for t in range(numtiles):
            tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                           siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
            plan = fused_mod.build_plan(siz, cod, qcd, tr,
                                        cod_comp=cod_comp, coder=coder,
                                        want_rd=want_rd)
            if plan is None:
                fused_handles.clear()
                break
            comps = extract_tile_comps(image, siz, t)
            fused_handles[t] = (
                comps, fused_mod.encode_tile_submit(comps, plan))

    def _encode_one(t: int) -> TileEncResult:
        tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                       siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
        t1_segments = None
        if _t1_segments_by_tile is not None:
            t1_segments = _t1_segments_by_tile.get(t)
        if t in fused_handles:
            comps, handle = fused_handles[t]
            t1_segments = fused_mod.encode_tile_collect(handle)[0]
            coeff_bands = None
            if t1_segments is None:
                # MQ word-compaction overflow (pathological content):
                # fall back to the host pipeline for this tile.
                coeff_bands = None
                t1_segments = None
                comps = extract_tile_comps(image, siz, t)
                return encode_tile(comps, siz, cod, qcd, tr,
                                   layer_alloc=layer_alloc,
                                   cod_comp=cod_comp,
                                   pocs=params.pocs or None,
                                   roishifts=roishifts,
                                   custom_mct_matrix=custom_coding_matrix,
                                   split_headers=split,
                                   want_packet_lengths=params.plt_markers
                                   or params.tp_flag is not None,
                                   tile_index=t,
                                   ht_refined=params.ht_refinement)
        else:
            comps = mesh_comps.get(t)
            if comps is None:
                comps = extract_tile_comps(image, siz, t)
            coeff_bands = mesh_coeff.get(t)
            if coeff_bands is None and _coeff_bands_by_tile is not None:
                coeff_bands = _coeff_bands_by_tile.get(t)
            if (coeff_bands is None and device and t1_segments is None
                    and custom_coding_matrix is None):
                from ..models import pipeline as device_pipeline
                cfg = device_pipeline.config_for_tile(siz, cod, tr)
                coeff_bands = device_pipeline.device_fwd_bands(comps, cfg)
        return encode_tile(comps, siz, cod, qcd, tr,
                           layer_alloc=layer_alloc,
                           coeff_bands=coeff_bands,
                           cod_comp=cod_comp,
                           pocs=params.pocs or None,
                           roishifts=roishifts,
                           custom_mct_matrix=custom_coding_matrix,
                           split_headers=split,
                           want_packet_lengths=params.plt_markers
                           or params.tp_flag is not None,
                           t1_segments=t1_segments,
                           tile_index=t,
                           ht_refined=params.ht_refinement)

    # Host tile parallelism (absent in the reference, which encodes
    # tiles sequentially — SURVEY §2.4): tiles fan out over a thread
    # pool; the native batch calls release the GIL, and the per-tile
    # inner worker pools are capped so the core count is shared.
    tile_workers = int(os.environ.get("GROK_TPU_TILE_THREADS", "0"))
    if tile_workers == 0:
        # Oversubscribe ~3x the cores: a tile thread stalled on the GIL
        # (packet assembly, marshaling) leaves its core to another
        # tile's native coding calls (+40% measured on 16-tile encodes).
        tile_workers = min(numtiles, 3 * (os.cpu_count() or 1))             if numtiles > 1 and not device else 1
    if _global_alloc:
        # Global PCRD rendezvous: every tile's thread blocks at the
        # allocator barrier until all tiles have registered their R-D
        # tables, so the pool must admit every tile at once.
        # (phase split: the barrier only counts locally-owned tiles)
        tile_workers = (len(_only_tiles) if _only_tiles is not None
                        else numtiles)
    if tile_workers > 1:
        import concurrent.futures as _cf
        inner = max(1, (os.cpu_count() or 1) // tile_workers)

        def _worker(t: int) -> TileEncResult:
            from ..native import t1_native as _t1n
            _t1n.set_thread_override(inner)
            try:
                return _encode_one(t)
            finally:
                _t1n.set_thread_override(None)

        with _cf.ThreadPoolExecutor(max_workers=tile_workers) as ex:
            if _tile_results is not None:
                todo = [t for t in range(numtiles)
                        if t not in _tile_results]
            elif _only_tiles is not None:
                todo = sorted(_only_tiles)
            else:
                todo = list(range(numtiles))
            done = dict(zip(todo, ex.map(_worker, todo)))
            if _tile_results is not None:
                done.update(_tile_results)
            if _only_tiles is not None:
                return done  # type: ignore[return-value]
            results = [done[t] for t in range(numtiles)]
    else:
        if _tile_results is not None:
            results = [_tile_results[t] if t in _tile_results
                       else _encode_one(t) for t in range(numtiles)]
        elif _only_tiles is not None:
            return {t: _encode_one(t)  # type: ignore[return-value]
                    for t in sorted(_only_tiles)}
        else:
            results = [_encode_one(t) for t in range(numtiles)]

    axis_idx = {"L": 0, "R": 1, "C": 2}
    for t in range(numtiles):
        res = results[t]
        if params.tp_flag is not None:
            # Tile-part generation (reference tp_on/tp_flag,
            # j2k_write_first_tile_part/j2k_write_all_tile_parts): split
            # the packet sequence at changes of the chosen progression
            # coordinate; each run becomes its own SOT..SOD tile-part.
            if params.ppt_markers or params.ppm_markers:
                raise ValueError("tp_flag cannot combine with packed "
                                 "packet headers")
            ai = axis_idx[params.tp_flag.upper()]
            runs = []  # (start_byte, end_byte)
            pos = 0
            cur = None
            start = 0
            for pid, ln in zip(res.packet_ids, res.packet_lengths):
                v = pid[ai]
                if cur is None:
                    cur = v
                elif v != cur:
                    runs.append((start, pos))
                    start = pos
                    cur = v
                pos += ln
            runs.append((start, pos))
            tnsot = len(runs)
            for k, (b0, b1) in enumerate(runs):
                frag = res.body[b0:b1]
                tp_hdr = b""
                if params.plt_markers and k == 0:
                    tp_hdr += markers.write_plt(res.packet_lengths)
                psot = 12 + len(tp_hdr) + 2 + len(frag)
                tile_parts += markers.write_sot(SotInfo(
                    tile_index=t, psot=psot, tpsot=k, tnsot=tnsot))
                tile_parts += tp_hdr
                tile_parts += markers.write_sod()
                tile_parts += frag
                tp_lengths.append((t, psot))
            continue
        tp_hdr = b""
        if params.ppt_markers:
            tp_hdr += markers.write_ppt(res.packet_headers or b"")
        elif params.ppm_markers:
            ppm_sections.append(res.packet_headers or b"")
        if params.plt_markers and res.packet_lengths is not None:
            tp_hdr += markers.write_plt(res.packet_lengths)
        psot = 12 + len(tp_hdr) + 2 + len(res.body)
        tile_parts += markers.write_sot(SotInfo(tile_index=t, psot=psot))
        tile_parts += tp_hdr
        tile_parts += markers.write_sod()
        tile_parts += res.body
        tp_lengths.append((t, psot))
    if params.ppm_markers:
        out += markers.write_ppm(ppm_sections)
    if params.tlm_markers:
        out += markers.write_tlm(tp_lengths)
    out += tile_parts
    out += markers.write_eoc()
    return bytes(out)


def encode_batch(images: List[Image], params: Optional[EncoderParams] = None,
                 device: Optional[bool] = None, rsiz: int = 0,
                 chunk: int = 16) -> List[bytes]:
    """Encode a batch of images; the production serving entry point.

    When the fused device path applies (HT, reversible, shared geometry),
    frames are stacked on a leading batch axis and coded `chunk` frames
    per device dispatch: ONE upload and ONE async fetch pair per chunk,
    with host packetization of earlier chunks overlapping device coding
    of later ones. This amortizes device-link latency across the batch —
    the throughput mode a serving deployment runs in. Falls back to
    per-image `encode` otherwise (which may still use the per-tile fused
    path).

    The reference encodes files strictly one at a time (reference:
    src/bin/jp2/grk_compress.cpp batch dir mode is a sequential loop).
    """
    import os
    if device is None:
        from ..utils.device import device_default
        device = device_default()
    params = params or EncoderParams()
    if not images:
        return []

    def _geom(img: Image):
        return tuple((c.data.shape, c.prec, c.signed, c.dx, c.dy)
                     for c in img.components) + (img.xsiz, img.ysiz)

    is_ht = bool(params.cblk_style & 0x40)
    # only probe the jax backend when device work was requested (see
    # encode(): a tunneled-TPU backend init can block)
    is_mq = device and params.cblk_style == 0 and _device_mq_ok()
    same_geom = all(_geom(im) == _geom(images[0]) for im in images)
    # Rate/quality targets fuse on the MQ path (the device program
    # returns per-pass R-D tables; the per-image allocator runs on the
    # host during collect). HT + rates takes the per-image step-search
    # path — is_mq is False whenever is_ht, so one clause covers it.
    # Same positive-rate condition as encode(): rates=(0.0,) is
    # explicit-lossless and must not pay for R-D tables.
    needs_rc = bool(params.rates and any(r > 0 for r in params.rates)) \
        or bool(params.quality_psnr)
    fusable = (device and (is_ht or is_mq) and same_geom
               and len(images) > 1
               and params.transform in (Transform.DWT_53, Transform.DWT_97)
               and not (needs_rc and not is_mq)
               and params.custom_mct is None
               and (params.roi_comp is None or params.roi_shift == 0))
    if not fusable:
        return [encode(im, params, device=device, rsiz=rsiz)
                for im in images]

    # Mirror encode()'s parameter derivation for the plan inputs.
    _nl = max(params.numlayers, len(params.rates), len(params.quality_psnr))
    p = params if _nl == params.numlayers else dataclasses.replace(
        params, numlayers=_nl)
    siz = build_siz(images[0], p)
    cod = build_cod(images[0], p)
    qcd = default_qcd(siz, cod, 1, p.base_step)
    cod_comp = None
    if p.comp_cblk_exps:
        cod_comp = [None] * len(siz.comps)
        for compno, (we, he) in p.comp_cblk_exps.items():
            cod_comp[compno] = dataclasses.replace(
                cod, cblk_w_exp=we, cblk_h_exp=he)
    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    numtiles = ntx * nty

    from ..models import fused_encode
    plans = {}
    for t in range(numtiles):
        tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                       siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
        plans[t] = fused_encode.build_plan(siz, cod, qcd, tr,
                                           cod_comp=cod_comp,
                                           coder="ht" if is_ht else "mq",
                                           want_rd=needs_rc and not is_ht)
        if plans[t] is None:
            return [encode(im, params, device=device, rsiz=rsiz)
                    for im in images]

    n = len(images)
    chunk = max(1, min(chunk, n))
    # Submit every chunk for every tile before collecting anything: the
    # device queue runs ahead while the host packetizes.
    handles = []  # (frame_lo, frame_hi, {t: handle})
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        per_tile = {}
        for t in range(numtiles):
            stacks = None
            for f in range(lo, hi):
                comps = extract_tile_comps(images[f], siz, t)
                if stacks is None:
                    stacks = [[] for _ in comps]
                for ci, a in enumerate(comps):
                    stacks[ci].append(a)
            # pad the trailing partial chunk so the jit signature stays
            # (plan, chunk) — padded frames are discarded at collect
            nf = hi - lo
            if nf < chunk and n > chunk:
                for ci in range(len(stacks)):
                    stacks[ci] += [stacks[ci][-1]] * (chunk - nf)
            batched = [np.stack(s) for s in stacks]
            per_tile[t] = fused_encode.encode_tile_submit(
                batched, plans[t])
        handles.append((lo, hi, per_tile))

    results: List[Optional[bytes]] = [None] * n
    import concurrent.futures as _cf
    t2_pool = _cf.ThreadPoolExecutor(
        max_workers=min(4, os.cpu_count() or 1))
    futures = []
    for (lo, hi, per_tile) in handles:
        segs_by_tile_frame = {
            t: fused_encode.encode_tile_collect(h)
            for t, h in per_tile.items()}
        for f in range(lo, hi):
            by_tile = {t: segs_by_tile_frame[t][f - lo]
                       for t in range(numtiles)}
            if any(v is None for v in by_tile.values()):
                # MQ compaction overflow on some tile: host re-encode.
                futures.append((f, t2_pool.submit(
                    encode, images[f], params, device=False, rsiz=rsiz)))
                continue
            futures.append((f, t2_pool.submit(
                encode, images[f], params, device=False, rsiz=rsiz,
                _t1_segments_by_tile=by_tile)))
    for f, fut in futures:
        results[f] = fut.result()
    t2_pool.shutdown()
    return results  # type: ignore[return-value]
