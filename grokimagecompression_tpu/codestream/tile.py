"""Per-tile encode/decode pipeline — the analog of the reference
TileProcessor (reference: src/lib/jp2/TileProcessor.cpp: encode_tile:951,
decode_tile:1069) restructured as pure functions over a static tile plan.

Encode: DC shift -> MCT -> DWT -> quantize -> T1 code-blocks -> T2 packets.
Decode: T2 packet parse -> T1 decode -> dequantize -> inverse DWT -> inverse
MCT -> DC unshift/clamp.

The compute stages call into a pluggable T1 backend (Python reference or
native C++); the DWT runs through the numpy reference here, with the JAX
device pipeline (models/) producing identical coefficients for batched use.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.geometry import (
    Rect,
    TileComponentLayout,
    band_gain,
    build_tile_component_layout,
    ceil_div,
    component_rect,
)
from ..core.params import QuantStyle, Transform
from ..ops import dwt_host, mct_np, quant
from ..t1 import backend as t1_backend
from ..utils import trace
from .markers import CodInfo, QcdInfo, SizInfo
from .packetiter import CompIterInfo, packet_order
from .t2 import CblkDec, CblkEnc, PrecDec, PrecEnc, decode_packet, encode_packet


@dataclasses.dataclass
class BandPlan:
    r: int
    orient: int
    rect: Rect
    gain: int
    expn: int
    mant: int
    stepsize: float
    kmax: int  # M_b: maximum coded bit-planes


@dataclasses.dataclass
class TileCompPlan:
    layout: TileComponentLayout
    bands: Dict[Tuple[int, int], BandPlan]
    prec: int
    signed: bool


def _band_index(r: int, orient: int) -> int:
    """Index of band in QCD ordering: LL, then (HL, LH, HH) per resolution."""
    if r == 0:
        return 0
    return 3 * (r - 1) + orient


def build_comp_plan(siz: SizInfo, cod: CodInfo, qcd: QcdInfo,
                    tile: Rect, compno: int,
                    roishift: int = 0) -> TileCompPlan:
    """`roishift` (RGN marker) inflates Kmax like the reference quantizer
    (reference: Quantizer.cpp:91 band->numbps = roishift + expn + gb - 1);
    the coefficient data itself stays unshifted on the wire — the upshift
    exists in the signalled missing-bit-plane budget, which is what gives
    the component of interest earlier truncation priority."""
    comp = siz.comps[compno]
    tc = component_rect(tile, comp.dx, comp.dy)
    precincts = tuple(cod.precincts) if cod.precincts else None
    layout = build_tile_component_layout(
        tc, cod.numresolutions, cod.cblk_w_exp, cod.cblk_h_exp,
        precincts)
    reversible = cod.transform == Transform.DWT_53
    nl = cod.numresolutions - 1
    bands: Dict[Tuple[int, int], BandPlan] = {}
    for res in layout.resolutions:
        for band in res.bands:
            r, orient = res.r, band.orient
            gain = band_gain(orient) if reversible else 0
            bi = _band_index(r, orient)
            if qcd.style == QuantStyle.NONE:
                expn = qcd.exponents[bi]
                mant = 0
                stepsize = 1.0
            elif qcd.style == QuantStyle.SCALAR_EXPOUNDED:
                expn, mant = qcd.steps[bi]
                stepsize = quant.decode_stepsize(expn, mant, comp.prec + gain)
            else:  # SCALAR_DERIVED
                e0, m0 = qcd.steps[0]
                nb = nl if r == 0 else nl - r + 1
                expn = e0 - nl + nb
                mant = m0
                stepsize = quant.decode_stepsize(expn, mant, comp.prec + gain)
            kmax = qcd.num_guard_bits + expn - 1 + roishift
            bands[(r, orient)] = BandPlan(
                r=r, orient=orient, rect=band.rect, gain=gain,
                expn=expn, mant=mant, stepsize=stepsize, kmax=kmax)
    return TileCompPlan(layout=layout, bands=bands, prec=comp.prec,
                        signed=comp.signed)


def default_qcd(siz: SizInfo, cod: CodInfo, num_guard_bits: int = 2,
                base_step: float = 0.0) -> QcdInfo:
    """Encoder-side QCD derivation (all components share one QCD here)."""
    prec = siz.comps[0].prec
    nl = cod.numresolutions - 1
    reversible = cod.transform == Transform.DWT_53
    nbands = 1 + 3 * nl
    if reversible:
        exponents = []
        for bi in range(nbands):
            r = 0 if bi == 0 else (bi - 1) // 3 + 1
            orient = 0 if bi == 0 else (bi - 1) % 3 + 1
            exponents.append(prec + band_gain(orient))
        return QcdInfo(style=QuantStyle.NONE, num_guard_bits=num_guard_bits,
                       exponents=tuple(exponents))
    steps = []
    for bi in range(nbands):
        r = 0 if bi == 0 else (bi - 1) // 3 + 1
        orient = 0 if bi == 0 else (bi - 1) % 3 + 1
        level = nl - r
        step = quant.default_irrev_stepsize(orient, level)
        if base_step > 0.0:
            step *= base_step
        steps.append(quant.encode_stepsize(step, prec))
    return QcdInfo(style=QuantStyle.SCALAR_EXPOUNDED,
                   num_guard_bits=num_guard_bits, steps=tuple(steps))


# --------------------------------------------------------------------------
# Encode
# --------------------------------------------------------------------------

@dataclasses.dataclass
class TileEncResult:
    body: bytes
    num_packets: int
    packet_headers: Optional[bytes] = None   # packed headers (PPM/PPT mode)
    packet_lengths: Optional[List[int]] = None  # per-packet byte counts
    packet_ids: Optional[List[Tuple[int, int, int, int]]] = None  # (l,r,c,p)


def _mct_native():
    if os.environ.get("GROK_TPU_T1") == "python":
        return None
    try:
        from ..native import mct_native
        return mct_native
    except Exception:
        return None


def _apply_fwd_transforms(comps_data: List[np.ndarray], plans,
                          cod: CodInfo,
                          custom_matrix=None) -> List[np.ndarray]:
    """DC shift + MCT; returns per-comp arrays ready for DWT."""
    reversible = cod.transform == Transform.DWT_53
    # Fused native path: DC shift + RCT in one streaming pass over the
    # first three planes (bit-exact pure-int32 arithmetic).
    nat = _mct_native()
    if (cod.mct == 1 and reversible and len(comps_data) >= 3
            and custom_matrix is None and nat is not None):
        shifts = [0 if plans[c].signed else 1 << (plans[c].prec - 1)
                  for c in range(3)]
        fused = nat.rct_dc_fwd(*(np.ascontiguousarray(a, np.int32)
                                 for a in comps_data[:3]), shifts)
        if fused is not None:
            out = list(fused)
            for c in range(3, len(comps_data)):
                p = plans[c]
                out.append(mct_np.dc_shift_fwd(
                    comps_data[c].astype(np.int32), p.prec, p.signed))
            return out
    out = []
    for c, a in enumerate(comps_data):
        p = plans[c]
        fused = None
        if nat is not None and isinstance(a, np.ndarray):
            fused = nat.dc_shift_fwd(np.ascontiguousarray(a, np.int32),
                                     p.prec, p.signed)
        if fused is None:
            fused = mct_np.dc_shift_fwd(a.astype(np.int32), p.prec,
                                        p.signed)
        out.append(fused)
    if cod.mct == 2 and custom_matrix is not None:
        out = mct_np.custom_fwd(out, custom_matrix)
    elif cod.mct and len(out) >= 3:
        if reversible:
            y, u, v = mct_np.rct_fwd(out[0], out[1], out[2])
        else:
            y, u, v = mct_np.ict_fwd(out[0], out[1], out[2])
        out[0], out[1], out[2] = y, u, v
    if not reversible:
        out = [np.asarray(a, np.float32) for a in out]
    return out


def encode_tile(
    comps_data: List[np.ndarray],
    siz: SizInfo,
    cod: CodInfo,
    qcd: QcdInfo,
    tile: Rect,
    layer_alloc=None,
    coeff_bands: Optional[List[Dict[Tuple[int, int], np.ndarray]]] = None,
    image_samples: Optional[int] = None,
    cod_comp: Optional[List[CodInfo]] = None,
    qcd_comp: Optional[List[QcdInfo]] = None,
    pocs=None,
    roishifts: Optional[List[int]] = None,
    custom_mct_matrix=None,
    split_headers: bool = False,
    want_packet_lengths: bool = False,
    t1_segments: Optional[List[bytes]] = None,
    tile_index: int = -1,
    ht_refined: bool = False,
) -> TileEncResult:
    """Encode one tile to its packet body bytes.

    `split_headers=True` routes packet headers to a separate packed
    stream (for PPM/PPT signalling); the body then carries only SOP
    markers and packet payloads.

    `layer_alloc(ctx: pcrd.RateControlCtx) -> None` assigns
    `layer_npasses` on each CblkEnc (e.g. pcrd.PCRDAllocator); default puts
    every pass in layer 0.
    `coeff_bands` (optional) supplies precomputed DWT band coefficients per
    component (e.g. from the JAX device pipeline), skipping the host DWT.
    `image_samples` overrides the whole-image sample count used to scale
    per-tile byte budgets.
    `t1_segments` supplies precoded HT cleanup segments in t1-desc order
    (from the fused device encoder, models/fused_encode.py); transform
    and T1 are skipped entirely — only packetization runs here.
    """
    ncomps = len(comps_data)
    cods = [cod_comp[c] if cod_comp and cod_comp[c] else cod
            for c in range(ncomps)]
    qcds = [qcd_comp[c] if qcd_comp and qcd_comp[c] else qcd
            for c in range(ncomps)]
    plans = [build_comp_plan(siz, cods[c], qcds[c], tile, c,
                             roishifts[c] if roishifts else 0)
             for c in range(ncomps)]
    reversible = cod.transform == Transform.DWT_53

    if coeff_bands is None and t1_segments is None:
        with trace.stage("enc.dc_mct"):
            data = _apply_fwd_transforms(comps_data, plans, cod,
                                         custom_mct_matrix)
        coeff_bands = []
        with trace.stage("enc.dwt",
                         sum(a.nbytes for a in comps_data)):
            for c in range(ncomps):
                tc = plans[c].layout.tc_rect
                coeff_bands.append(
                    dwt_host.fwd_dwt_2d(data[c], tc,
                                        cods[c].numresolutions,
                                        reversible=cods[c].transform
                                        == Transform.DWT_53))

    # T1-encode every code-block: collect the whole tile's blocks first,
    # then run one batched native call (worker threads inside), the analog
    # of the reference's flat block list + atomic-counter pool
    # (reference: src/lib/jp2/t1/Tier1.cpp:24, T1Encoder.cpp:57).
    # Blocks are described by (band, x0, y0, w, h) and gathered out of the
    # signed-int32 band planes inside the native call.
    t1_bands = []           # int32 planes (rev) or float32 (irrev)
    t1_steps = []           # per-band stepsize (irrev quantization)
    t1_descs = []           # (band_idx, x0, y0, w, h)
    t1_orients = []
    t1_kmaxs = []
    t1_slots = []           # (comp, (r, orient), precinct_idx, cb, bp)
    any_irrev = False
    for c in range(ncomps):
        plan = plans[c]
        rev_c = cods[c].transform == Transform.DWT_53
        for res in plan.layout.resolutions:
            for band in res.bands:
                bp = plan.bands[(res.r, band.orient)]
                if t1_segments is None:
                    arr = coeff_bands[c][(res.r, band.orient)]
                    if rev_c:
                        plane = np.ascontiguousarray(arr, dtype=np.int32)
                        t1_steps.append(1.0)
                    else:
                        # float plane; quantization fuses into the native
                        # block gather (stepsize per band)
                        plane = np.ascontiguousarray(arr, dtype=np.float32)
                        t1_steps.append(bp.stepsize)
                        any_irrev = True
                    bi = len(t1_bands)
                    t1_bands.append(plane)
                else:
                    bi = 0
                for pi, prc in enumerate(band.precincts):
                    for cb in prc.cblks:
                        x0 = cb.rect.x0 - band.rect.x0
                        y0 = cb.rect.y0 - band.rect.y0
                        t1_descs.append((bi, x0, y0, cb.rect.w, cb.rect.h))
                        t1_orients.append(band.orient)
                        t1_kmaxs.append(bp.kmax)
                        t1_slots.append((c, (res.r, band.orient), pi, cb, bp))

    if t1_segments is not None:
        # Segments precoded on device (fused pipeline): T1 is done.
        # HT entries are raw segment bytes; MQ entries are
        # (data, numbps, numpasses) tuples, or (data, numbps, numpasses,
        # passes) with full per-pass R-D tables when the fused program
        # ran with want_rd (PCRD callers).
        from ..t1.t1_np import PassInfo
        t1_results = []
        for d in t1_segments:
            if isinstance(d, tuple) and len(d) == 4:
                t1_results.append(d)
            elif isinstance(d, tuple):
                data, nb, npas = d
                t1_results.append(
                    (data, nb, npas,
                     [PassInfo(rate=len(data), distortion=0.0,
                               terminated=(k == npas - 1))
                      for k in range(npas)]))
            else:
                t1_results.append(
                    (d, 1, 1, [PassInfo(rate=len(d), distortion=0.0,
                                        terminated=True)]))
    else:
        if any_irrev and not all(
                b.dtype == np.float32 for b in t1_bands):
            # mixed per-component transforms: promote int planes to float
            # (stepsize 1.0 reproduces the abs/sign split exactly for the
            # magnitudes in range)
            t1_bands = [b.astype(np.float32) if b.dtype != np.float32
                        else b for b in t1_bands]
        with trace.stage("enc.t1", sum(d[3] * d[4] * 4 for d in t1_descs)):
            t1_results = t1_backend.encode_cblk_batch_bands(
                t1_bands, t1_descs, t1_orients, t1_kmaxs, cod.cblk_style,
                stepsizes=t1_steps if any_irrev else None,
                needs_pass_rates=layer_alloc is not None,
                ht_refined=ht_refined and layer_alloc is None)

    all_cblks: List[CblkEnc] = []
    prec_enc: List[Dict[Tuple[int, int], List[PrecEnc]]] = [
        {} for _ in range(ncomps)]
    slot_cblks: Dict[Tuple[int, Tuple[int, int], int], List[CblkEnc]] = {}
    mct_norms = None
    if cod.mct and ncomps >= 3:
        mct_norms = (mct_np.MCT_NORMS_REV if reversible
                     else mct_np.MCT_NORMS_IRREV)
    for (c, key, pi, cb, bp), (dat, numbps, npasses, passes) in zip(
            t1_slots, t1_results):
        if numbps > bp.kmax:
            raise ValueError(
                f"code-block numbps {numbps} exceeds Kmax "
                f"{bp.kmax}; increase guard bits")
        # PCRD distortion weighting: band synthesis norm x stepsize x MCT
        # norm, squared (reference: Tier1.cpp encodeCodeblocks stepsize/
        # band weighting + mct.cpp:67 norms).
        r, orient = key
        nl = cods[c].numresolutions - 1
        level = nl - r if r > 0 else nl
        wgt = quant.band_norm(orient, level, reversible) * bp.stepsize
        if mct_norms is not None and c < 3:
            wgt *= mct_norms[c]
        wgt *= wgt
        if wgt != 1.0:
            for p in passes:
                p.distortion *= wgt
        ce = CblkEnc(geom=cb, data=dat, numbps=numbps,
                     imsb=bp.kmax - numbps if numbps else bp.kmax,
                     numpasses=npasses, passes=passes)
        slot_cblks.setdefault((c, key, pi), []).append(ce)
        all_cblks.append(ce)
    for c in range(ncomps):
        plan = plans[c]
        for res in plan.layout.resolutions:
            for band in res.bands:
                key = (res.r, band.orient)
                plist: List[PrecEnc] = []
                for pi, prc in enumerate(band.precincts):
                    cbs = slot_cblks.get((c, key, pi), [])
                    plist.append(PrecEnc(geom=prc, cblks=cbs))
                prec_enc[c].setdefault(key, []).extend(plist)

    # Progression iteration info (shared by simulation and real emission).
    comps_iter = [
        CompIterInfo(
            numresolutions=cods[c].numresolutions,
            dx=siz.comps[c].dx,
            dy=siz.comps[c].dy,
            tc_rect=plans[c].layout.tc_rect,
            prec_info=[(res.ppx, res.ppy, res.num_precincts_w,
                        res.num_precincts_h)
                       for res in plans[c].layout.resolutions],
        )
        for c in range(ncomps)
    ]
    numlayers = cod.numlayers

    def _packet_iter():
        if pocs:
            from .packetiter import packet_order_poc
            return packet_order_poc(pocs, numlayers, comps_iter, tile)
        return packet_order(cod.progression, numlayers, comps_iter, tile)

    def _reset_t2_state():
        for per_res in prec_enc:
            for plist in per_res.values():
                for pe in plist:
                    for cb in pe.cblks:
                        cb.included = False
                        cb.lblock = 3
                        cb.passes_used = 0
                    pe.init_trees()

    _t2_native = None
    import os as _os
    if _os.environ.get("GROK_TPU_T2", "") != "python":
        try:
            from ..native import t2_native as _t2_native
        except Exception:
            _t2_native = None

    _group_cache: Dict[Tuple[int, int, int], object] = {}

    def _native_group(key):
        grp = _group_cache.get(key)
        if grp is None:
            r, c, p = key
            orients = (0,) if r == 0 else (1, 2, 3)
            precs = [prec_enc[c][(r, o)][p] for o in orients
                     if (r, o) in prec_enc[c]]
            grp = _t2_native.PrecGroupEnc(precs, numlayers,
                                          cod.cblk_style, cod.eph)
            _group_cache[key] = grp
        return grp

    def _emit(max_layer: int, collect: Optional[bytearray]) -> Tuple[int, int]:
        """Emit packets for layers 0..max_layer; returns (bytes, packets)."""
        nbytes = 0
        npk = 0
        if _t2_native is not None:
            # Native path: ONE call encodes every precinct group (worker
            # threads across groups); Python assembles the per-layer
            # fragments in progression order.
            order = list(_packet_iter())
            groups = []
            seen = set()
            for (l, r, c, p) in order:
                key = (r, c, p)
                if key in seen:
                    continue
                seen.add(key)
                orients = (0,) if r == 0 else (1, 2, 3)
                precs = [prec_enc[c][(r, o)][p] for o in orients
                         if (r, o) in prec_enc[c]]
                groups.append((key, c, precs))
            tenc = _t2_native.TileEnc(groups, numlayers, cod.cblk_style,
                                      cod.eph)
            frags = tenc.encode_all(max_layer,
                                    t1_backend.native_threads())
            for (l, r, c, p) in order:
                if l > max_layer:
                    continue
                pkt = frags[(r, c, p)][l]
                if cod.sop:
                    import struct as _struct
                    pkt = _struct.pack(">HHH", 0xFF91, 4,
                                       npk & 0xFFFF) + bytes(pkt)
                nbytes += len(pkt)
                if collect is not None:
                    collect += pkt
                npk += 1
            return nbytes, npk
        _reset_t2_state()
        for (l, r, c, p) in _packet_iter():
            if l > max_layer:
                continue
            orients = (0,) if r == 0 else (1, 2, 3)
            precs = []
            for o in orients:
                plist = prec_enc[c].get((r, o))
                if plist:
                    precs.append(plist[p])
            pkt = encode_packet(l, precs, cod.cblk_style, sop=cod.sop,
                                eph=cod.eph, packet_index=npk)
            nbytes += len(pkt)
            if collect is not None:
                collect += pkt
            npk += 1
        return nbytes, npk

    # Layer allocation (PCRD when a rate/quality allocator is given).
    if layer_alloc is None:
        for cb in all_cblks:
            cb.layer_npasses = [cb.numpasses] + [0] * (numlayers - 1)
    else:
        from .pcrd import RateControlCtx

        tile_samples = sum(p.layout.tc_rect.w * p.layout.tc_rect.h
                           for p in plans)
        if image_samples is None:
            img_samples = sum(
                ceil_div(siz.xsiz - siz.xosiz, c.dx)
                * ceil_div(siz.ysiz - siz.yosiz, c.dy)
                for c in siz.comps)
        else:
            img_samples = image_samples
        _tile_sim = [None]

        def _get_tile_sim():
            if _tile_sim[0] is None:
                groups = []
                seen = set()
                for (l, r, c, p) in _packet_iter():
                    key = (r, c, p)
                    if key in seen:
                        continue
                    seen.add(key)
                    orients = (0,) if r == 0 else (1, 2, 3)
                    precs = [prec_enc[c][(r, o)][p] for o in orients
                             if (r, o) in prec_enc[c]]
                    groups.append((key, c, precs))
                _tile_sim[0] = _t2_native.TileSim(groups, numlayers,
                                                 cod.eph)
            return _tile_sim[0]

        def _simulate(max_layer: int) -> int:
            """Total bytes of layers 0..max_layer (PCRD dry run): one
            native call over every precinct group."""
            if _t2_native is None:
                return _emit(max_layer, None)[0]
            total, _per_group = _get_tile_sim().simulate(max_layer)
            if cod.sop:
                total += 6 * sum(1 for (l, *_rest) in _packet_iter()
                                 if l <= max_layer)
            return total

        def _simulate_comps(max_layer: int) -> Dict[int, int]:
            """Per-component packet byte totals for layers 0..max_layer
            (cinema per-component caps, reference T2.cpp:135-186)."""
            totals: Dict[int, int] = {}
            if _t2_native is not None:
                sim = _get_tile_sim()
                _, per_group = sim.simulate(max_layer)
                for g, c in enumerate(sim.comps):
                    totals[c] = totals.get(c, 0) + int(per_group[g])
            if cod.sop:
                for (l, r, c, p) in _packet_iter():
                    if l <= max_layer:
                        totals[c] = totals.get(c, 0) + 6
            return totals

        def _write_layer(layer, values, cblks_f):
            _get_tile_sim().write_rows(layer, values, cblks_f)

        ctx = RateControlCtx(
            cblks=all_cblks,
            numlayers=numlayers,
            tile_samples=tile_samples,
            image_samples=img_samples,
            max_prec=max(c.prec for c in siz.comps),
            simulate_upto=_simulate,
            simulate_comp_upto=_simulate_comps,
            write_layer=_write_layer if _t2_native is not None else None,
            tile_index=tile_index,
        )
        layer_alloc(ctx)

    # Final packet emission in progression order.
    if split_headers:
        _reset_t2_state()
        hdrs = bytearray()
        body = bytearray()
        npackets = 0
        for (l, r, c, p) in _packet_iter():
            orients = (0,) if r == 0 else (1, 2, 3)
            precs = [prec_enc[c][(r, o)][p] for o in orients
                     if (r, o) in prec_enc[c]]
            h, b = encode_packet(l, precs, cod.cblk_style, sop=cod.sop,
                                 eph=cod.eph, packet_index=npackets,
                                 split=True)
            hdrs += h
            body += b
            npackets += 1
        return TileEncResult(body=bytes(body), num_packets=npackets,
                             packet_headers=bytes(hdrs))
    body = bytearray()
    plens: Optional[List[int]] = [] if want_packet_lengths else None
    with trace.stage("enc.t2"):
        pids: Optional[List[Tuple[int, int, int, int]]] = None
        if plens is not None:
            _reset_t2_state()
            pids = []
            nbytes = 0
            npackets = 0
            for (l, r, c, p) in _packet_iter():
                orients = (0,) if r == 0 else (1, 2, 3)
                precs = [prec_enc[c][(r, o)][p] for o in orients
                         if (r, o) in prec_enc[c]]
                pkt = encode_packet(l, precs, cod.cblk_style, sop=cod.sop,
                                    eph=cod.eph, packet_index=npackets)
                plens.append(len(pkt))
                pids.append((l, r, c, p))
                body += pkt
                nbytes += len(pkt)
                npackets += 1
        else:
            nbytes, npackets = _emit(numlayers - 1, body)
    trace.add_bytes("enc.t2", nbytes)
    return TileEncResult(body=bytes(body), num_packets=npackets,
                         packet_lengths=plens, packet_ids=pids)


# --------------------------------------------------------------------------
# Decode
# --------------------------------------------------------------------------

def _decode_mixed_styles(t1_jobs, t1_job_slots, cods):
    """Batch-decode when components carry different code-block styles
    (COC overrides): group jobs per style, one batch per group."""
    by_style: Dict[int, List[int]] = {}
    for i, slot in enumerate(t1_job_slots):
        by_style.setdefault(cods[slot[0]].cblk_style, []).append(i)
    out = [None] * len(t1_jobs)
    for style, idxs in by_style.items():
        res = t1_backend.decode_cblk_batch([t1_jobs[i] for i in idxs], style,
                                           signed_out=True)
        for i, r in zip(idxs, res):
            out[i] = r
    return out


def _band_window(win: Rect, r: int, orient: int, numresolutions: int,
                 reversible: bool) -> Rect:
    """Conservative band-coordinate region needed to reconstruct `win`
    (full-resolution component canvas coords), grown by the synthesis filter
    margin per level (reference: src/lib/jp2/transform/dwt.cpp
    get_band_coordinates:1131, segment_grow:1172)."""
    margin = 2 if reversible else 4
    nl = numresolutions - 1
    x0, y0, x1, y1 = win.x0, win.y0, win.x1, win.y1
    # Walk down from full resolution to resolution r's band split.
    levels = nl - r + 1 if r > 0 else nl
    for _ in range(levels):
        x0 = (x0 >> 1) - margin
        y0 = (y0 >> 1) - margin
        x1 = ((x1 + 1) >> 1) + margin
        y1 = ((y1 + 1) >> 1) + margin
    # Band offset: HL shifts x by floor at odd grid; conservative region
    # already includes the +-margin growth, so the same rect works for all
    # orientations at this level.
    return Rect(x0, y0, x1, y1)


def _cblk_pmin(cod_c, cb, roishift: int) -> int:
    """Lowest decoded bit-plane of a Part-1 (MQ) code-block
    (quant.trunc_plane) — the plane the mid-point reconstruction offset
    belongs at for truncated blocks. 0 for HT blocks (different pass
    schedule; the HT quarters convention carries its own half bit) and
    under ROI shifts (offset would move with the shifted planes)."""
    if (cod_c.cblk_style & 0x40) or roishift:
        return 0
    return quant.trunc_plane(cb.numbps, cb.numpasses)


def decode_tile(
    body: bytes,
    siz: SizInfo,
    cod: CodInfo,
    qcd: QcdInfo,
    tile: Rect,
    reduce: int = 0,
    max_layers: int = 0,
    window: Optional[Rect] = None,
    cod_comp: Optional[List[CodInfo]] = None,
    qcd_comp: Optional[List[QcdInfo]] = None,
    pocs=None,
    roishifts: Optional[List[int]] = None,
    custom_mct=None,
    packed_headers: Optional[bytes] = None,
    device: Optional[bool] = None,
    _return_bands: bool = False,
    _return_jobs: bool = False,
) -> List[np.ndarray]:
    """Decode one tile's packet body back to component sample arrays.

    `window` (canvas coords at full resolution) enables region decode:
    code-blocks that cannot influence the window are skipped in T1
    (reference: src/lib/jp2/t1/Tier1.cpp prepareDecodeCodeblocks:98 window
    clipping); packets are still parsed to stay synchronized.

    `_return_bands` stops after entropy decode and returns
    ("bands", bands_list, origins) — per-component coefficient band
    dicts for a mesh-batched inverse transform (parallel/sharding.py
    decode path) — when the geometry allows it; otherwise the normal
    sample arrays are returned and the caller inverts nothing.
    """
    ncomps = len(siz.comps)
    cods = [cod_comp[c] if cod_comp and cod_comp[c] else cod
            for c in range(ncomps)]
    qcds = [qcd_comp[c] if qcd_comp and qcd_comp[c] else qcd
            for c in range(ncomps)]
    plans = [build_comp_plan(siz, cods[c], qcds[c], tile, c,
                             roishifts[c] if roishifts else 0)
             for c in range(ncomps)]
    reversible = cod.transform == Transform.DWT_53

    # Build decode structures.
    import time as _time
    _setup_t0 = _time.perf_counter() if trace.enabled() else None
    prec_dec: List[Dict[Tuple[int, int], List[PrecDec]]] = []
    cblk_index: List[Dict[Tuple[int, int], List[CblkDec]]] = []
    for c in range(ncomps):
        plan = plans[c]
        per_res: Dict[Tuple[int, int], List[PrecDec]] = {}
        cb_per_band: Dict[Tuple[int, int], List[CblkDec]] = {}
        for res in plan.layout.resolutions:
            for band in res.bands:
                plist = []
                cbl = []
                for prc in band.precincts:
                    cbs = [CblkDec(geom=cb) for cb in prc.cblks]
                    # Tag trees are initialized lazily on first Python
                    # packet parse; the native parser builds its own.
                    pd = PrecDec(geom=prc, cblks=cbs)
                    plist.append(pd)
                    cbl.extend(cbs)
                per_res[(res.r, band.orient)] = plist
                cb_per_band[(res.r, band.orient)] = cbl
        prec_dec.append(per_res)
        cblk_index.append(cb_per_band)

    comps_iter = [
        CompIterInfo(
            numresolutions=cods[c].numresolutions,
            dx=siz.comps[c].dx,
            dy=siz.comps[c].dy,
            tc_rect=plans[c].layout.tc_rect,
            prec_info=[(res.ppx, res.ppy, res.num_precincts_w,
                        res.num_precincts_h)
                       for res in plans[c].layout.resolutions],
        )
        for c in range(ncomps)
    ]
    numlayers = cod.numlayers if max_layers == 0 else min(
        cod.numlayers, max_layers)
    if pocs:
        from .packetiter import packet_order_poc
        piter = packet_order_poc(pocs, cod.numlayers, comps_iter, tile)
    else:
        piter = packet_order(cod.progression, cod.numlayers, comps_iter,
                             tile)
    pkt_list = list(piter)
    if _setup_t0 is not None:
        trace.add_time("dec.setup", _time.perf_counter() - _setup_t0)

    import os as _os
    _t2_t0 = _time.perf_counter() if trace.enabled() else None
    _t2nat = None
    if _os.environ.get("GROK_TPU_T2", "") != "python" \
            and numlayers == cod.numlayers and packed_headers is None:
        try:
            from ..native import t2_native as _t2nat
        except Exception:
            _t2nat = None
    parsed = False
    if _t2nat is not None:
        groups = []
        group_idx: Dict[Tuple[int, int, int], int] = {}
        packets = []
        for (l, r, c, p) in pkt_list:
            key = (r, c, p)
            if key not in group_idx:
                group_idx[key] = len(groups)
                orients = (0,) if r == 0 else (1, 2, 3)
                groups.append([
                    (prec_dec[c][(r, o)][p],
                     plans[c].bands[(r, o)].kmax,
                     cods[c].cblk_style)
                    for o in orients if (r, o) in prec_dec[c]
                ])
            packets.append((group_idx[key], l))
        rc = _t2nat.decode_tile_packets(body, packets, groups, None, None,
                                        cod.sop, cod.eph)
        parsed = rc is not None
    if not parsed:
        pos = 0
        hpos = 0
        for (l, r, c, p) in pkt_list:
            if pos >= len(body) and packed_headers is None:
                break
            orients = (0,) if r == 0 else (1, 2, 3)
            precs = [prec_dec[c][(r, o)][p] for o in orients
                     if (r, o) in prec_dec[c]]
            kmaxs = [plans[c].bands[(r, o)].kmax for o in orients
                     if (r, o) in plans[c].bands]
            # Layers beyond the decode limit are parsed (to stay in sync)
            # but their pass data is discarded; for every code-block the
            # dropped layers are a suffix of its packets, so the retained
            # segment state stays consistent.
            if packed_headers is not None:
                # PPM/PPT: headers come from the packed stream, the body
                # carries only SOP markers + packet payloads.
                from .t2 import decode_packet_split
                pos, hpos = decode_packet_split(
                    packed_headers, hpos, body, pos, l, precs, kmaxs,
                    cods[c].cblk_style, eph=cod.eph,
                    discard=(l >= numlayers))
            else:
                pos = decode_packet(body, pos, l, precs, kmaxs,
                                    cods[c].cblk_style,
                                    sop=cod.sop, eph=cod.eph,
                                    discard=(l >= numlayers))
    if _t2_t0 is not None:
        trace.add_time("dec.t2", _time.perf_counter() - _t2_t0, len(body))

    # T1 decode (one batched native call over the whole tile's blocks) +
    # dequantize into band arrays, then inverse DWT per comp.
    t1_jobs = []
    t1_job_slots = []
    for c in range(ncomps):
        plan = plans[c]
        comp_win = None
        if window is not None:
            comp_win = component_rect(window, siz.comps[c].dx,
                                      siz.comps[c].dy)
        for res in plan.layout.resolutions:
            for band in res.bands:
                bwin = None
                if comp_win is not None:
                    bwin = _band_window(comp_win, res.r, band.orient,
                                        cod.numresolutions, reversible)
                for cb in cblk_index[c][(res.r, band.orient)]:
                    if cb.numpasses == 0:
                        continue
                    if bwin is not None:
                        r_ = cb.geom.rect
                        if (r_.x1 <= bwin.x0 or r_.x0 >= bwin.x1
                                or r_.y1 <= bwin.y0 or r_.y0 >= bwin.y1):
                            continue
                    data, seg_lengths = cb.data_and_seg_lengths()
                    bp_d = plan.bands[(res.r, band.orient)]
                    t1_jobs.append((data, seg_lengths, cb.geom.rect.w,
                                    cb.geom.rect.h, band.orient, cb.numbps,
                                    cb.numpasses, bp_d.kmax))
                    t1_job_slots.append((c, (res.r, band.orient), cb))

    if _return_jobs:
        # Batched-decode prepass (decoder.decode_batch): hand back the
        # parsed entropy jobs + geometry plans; the caller fuses many
        # same-geometry tiles into one device program.
        return ("jobs", t1_jobs, t1_job_slots, plans, cods)

    use_device = device
    if use_device is None:
        from ..utils.device import device_default
        use_device = device_default()
    # Fully-fused device decode (HT): lane-parallel entropy decode ->
    # band assembly -> inverse DWT/MCT/DC-unshift as ONE XLA program
    # (models/fused_decode.py) — the decode mirror of the fused encoder.
    # Opt-in via GROK_TPU_T1=device (or GROK_TPU_DEC_ENTROPY=device):
    # the default device decode keeps native entropy decode + device
    # inverse transform.
    # Device routes require MCT components of one shape (the host path
    # skips MCT on mismatch like the reference; a device program would
    # fail shape checks instead — fuzz-found via a corrupt SIZ).
    _mct_dims_ok = (not cod.mct or ncomps < 3 or all(
        (plans[c].layout.tc_rect.w, plans[c].layout.tc_rect.h)
        == (plans[0].layout.tc_rect.w, plans[0].layout.tc_rect.h)
        for c in range(3)))
    _dev_entropy = os.environ.get("GROK_TPU_T1") == "device" \
        or os.environ.get("GROK_TPU_DEC_ENTROPY") == "device"
    _ht_refined_jobs = bool(cod.cblk_style & 0x40) and any(
        j[6] > 1 for j in t1_jobs)
    if (use_device and _dev_entropy and not _ht_refined_jobs
            and ((cod.cblk_style & 0x40) or cod.cblk_style == 0)
            and window is None
            and reduce == 0 and not cod_comp and cod.mct != 2
            and _mct_dims_ok
            and not roishifts
            and os.environ.get("GROK_TPU_FUSED_DEC", "1") != "0"):
        from ..models import fused_decode
        steps_by_band = {
            (c, (res.r, band.orient)):
                plans[c].bands[(res.r, band.orient)].stepsize
            for c in range(ncomps)
            for res in plans[c].layout.resolutions
            for band in res.bands}
        comps_dev = fused_decode.decode_tile_device(
            t1_jobs, t1_job_slots, plans, cods, siz, cod, tile,
            steps_by_band)
        if comps_dev is not None:
            origins = [(plans[c].layout.tc_rect.x0,
                        plans[c].layout.tc_rect.y0)
                       for c in range(ncomps)]
            return list(zip(comps_dev, origins))

    # Fused path: native workers decode each block and scatter it (with
    # dequantization for irreversible bands) directly into pre-allocated
    # band planes — no per-block arrays or Python placement loop.
    _fused_bands = None
    _band_bb = None
    if (not cod_comp
            and os.environ.get("GROK_TPU_FUSED_DEC", "1") != "0"):
        bands_list: List[np.ndarray] = []
        steps_list: List[float] = []
        bidx: Dict[Tuple[int, int, int], int] = {}
        _fused_bands = [dict() for _ in range(ncomps)]
        _packed = [None] * ncomps
        fdtype = np.int32 if reversible else np.float32
        if window is not None:
            # Windowed decode: the native scatter targets per-band
            # BOUNDING-BOX arrays over the window-intersecting blocks
            # (t1_job_slots is already window-filtered) — O(window)
            # memory like the sparse store, but the block placement and
            # dequantization stay in threaded native code.
            _band_bb = [dict() for _ in range(ncomps)]
            by_band: Dict[Tuple[int, Tuple[int, int]], list] = {}
            for (c, key, cb) in t1_job_slots:
                by_band.setdefault((c, key), []).append(cb.geom.rect)
        try:
            from ..native import dwt_native as _dwtnat
        except Exception:
            _dwtnat = None
        for c in range(ncomps):
            plan = plans[c]
            views = None
            if _dwtnat is not None and reduce == 0 and window is None \
                    and os.environ.get("GROK_TPU_DWT", "") != "python" \
                    and os.environ.get("GROK_TPU_PACKED_DEC", "1") != "0":
                # Band views into the packed inverse-DWT buffer: the T1
                # scatter then fills it in place and the inverse runs
                # with no copy pass.
                packed = _dwtnat.alloc_inv_bands(
                    plan.layout.tc_rect, cods[c].numresolutions,
                    cods[c].transform == Transform.DWT_53)
                if packed is not None:
                    flat, views, offs_, llo_ = packed
                    ok_shapes = all(
                        views.get((res.r, band.orient)) is not None
                        and views[(res.r, band.orient)].shape
                        == (band.rect.h, band.rect.w)
                        for res in plan.layout.resolutions
                        for band in res.bands)
                    if ok_shapes:
                        _packed[c] = (flat, offs_, llo_)
                    else:
                        views = None
            for res in plan.layout.resolutions:
                for band in res.bands:
                    key = (res.r, band.orient)
                    if views is not None:
                        arr = views[key]
                    elif _band_bb is not None:
                        rects = by_band.get((c, key), [])
                        if rects:
                            bx0 = min(r_.x0 for r_ in rects)
                            by0 = min(r_.y0 for r_ in rects)
                            bx1 = max(r_.x1 for r_ in rects)
                            by1 = max(r_.y1 for r_ in rects)
                        else:
                            bx0, by0 = band.rect.x0, band.rect.y0
                            bx1, by1 = bx0, by0
                        _band_bb[c][key] = (bx0, by0)
                        arr = np.zeros((by1 - by0, bx1 - bx0),
                                       dtype=fdtype)
                    else:
                        arr = np.zeros((band.rect.h, band.rect.w),
                                       dtype=fdtype)
                    _fused_bands[c][key] = arr
                    bidx[(c,) + key] = len(bands_list)
                    bands_list.append(arr)
                    steps_list.append(plan.bands[key].stepsize)
        if _band_bb is not None:
            placements = [(bidx[(c,) + key],
                           cb.geom.rect.x0 - _band_bb[c][key][0],
                           cb.geom.rect.y0 - _band_bb[c][key][1])
                          for (c, key, cb) in t1_job_slots]
        else:
            placements = [(bidx[(c,) + key],
                           cb.geom.rect.x0 - plans[c].bands[key].rect.x0,
                           cb.geom.rect.y0 - plans[c].bands[key].rect.y0)
                          for (c, key, cb) in t1_job_slots]
        with trace.stage("dec.t1", sum(len(j[0]) for j in t1_jobs)):
            ok = t1_backend.decode_cblk_batch_bands(
                t1_jobs, bands_list, placements, cods[0].cblk_style,
                stepsizes=None if reversible else steps_list)
        if not ok:
            _fused_bands = None
    decoded: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    if _fused_bands is None:
        with trace.stage("dec.t1", sum(len(j[0]) for j in t1_jobs)):
            t1_out = t1_backend.decode_cblk_batch(
                t1_jobs, cods[0].cblk_style, signed_out=True) \
                if not cod_comp else _decode_mixed_styles(
                    t1_jobs, t1_job_slots, cods)
        decoded = {id(slot[2]): mn
                   for slot, mn in zip(t1_job_slots, t1_out)}

    # Device inverse path: inverse DWT + inverse MCT + DC unshift as one
    # jitted program on the accelerator (reference decode hot loops:
    # src/lib/jp2/transform/dwt.cpp:1208/2154 decode_53/decode_97,
    # TileProcessor.cpp:1303 mct_decode). Falls back to the host for
    # windowed/reduced/custom-MCT/mixed-style decodes.
    if (_return_bands and _fused_bands is not None and window is None
            and reduce == 0 and not cod_comp and cod.mct != 2
            and _mct_dims_ok):
        origins = [(plans[c].layout.tc_rect.x0,
                    plans[c].layout.tc_rect.y0) for c in range(ncomps)]
        return ("bands", [_fused_bands[c] for c in range(ncomps)],
                origins)

    use_device = device
    if use_device is None:
        from ..utils.device import device_default
        use_device = device_default()
    if (use_device and _fused_bands is not None and window is None
            and reduce == 0 and not cod_comp and cod.mct != 2
            and _mct_dims_ok):
        from ..models import pipeline as device_pipeline
        cfg = device_pipeline.config_for_tile(siz, cod, tile)
        comps_dev = device_pipeline.device_inv_comps(
            [_fused_bands[c] for c in range(ncomps)], cfg)
        origins = [(plans[c].layout.tc_rect.x0,
                    plans[c].layout.tc_rect.y0) for c in range(ncomps)]
        return list(zip(comps_dev, origins))

    out = []
    origins = []
    _dwt_t0 = _time.perf_counter() if trace.enabled() else None
    for c in range(ncomps):
        plan = plans[c]
        rev_c = cods[c].transform == Transform.DWT_53
        max_res = cods[c].numresolutions - 1 - reduce
        dtype = np.int32 if rev_c else np.float32
        tc = plan.layout.tc_rect
        ox = ceil_div(tc.x0, 1 << reduce)
        oy = ceil_div(tc.y0, 1 << reduce)
        if window is not None:
            from ..ops import dwt_window as dww
            if _fused_bands is not None:
                # Banded bounding-box store filled by the native
                # scatter above: fetch slices it with zero fill
                # outside (still O(window) memory).
                def fetch(r, o, bx0, by0, bx1, by1, _c=c):
                    arr = _fused_bands[_c][(r, o)]
                    bb = _band_bb[_c].get((r, o))
                    band_rect = plans[_c].bands[(r, o)].rect
                    out_a = np.zeros((by1 - by0, bx1 - bx0), dtype=dtype)
                    if bb is None or arr.size == 0:
                        return out_a
                    ox = bb[0] - band_rect.x0
                    oy = bb[1] - band_rect.y0
                    # band-local -> bb-local coordinates
                    sx0 = max(bx0, ox)
                    sy0 = max(by0, oy)
                    sx1 = min(bx1, ox + arr.shape[1])
                    sy1 = min(by1, oy + arr.shape[0])
                    if sx1 > sx0 and sy1 > sy0:
                        out_a[sy0 - by0:sy1 - by0, sx0 - bx0:sx1 - bx0] = \
                            arr[sy0 - oy:sy1 - oy, sx0 - ox:sx1 - ox]
                    return out_a
            else:
                # Sparse band storage (mixed-style fallback): O(window)
                # memory (reference: sparse_array.h + dwt.cpp
                # decode_partial_tile).
                from ..core.sparse import SparseArray
                sparse: Dict[Tuple[int, int], SparseArray] = {}
                for res in plan.layout.resolutions:
                    for band in res.bands:
                        bp = plan.bands[(res.r, band.orient)]
                        sa = SparseArray(band.rect.w, band.rect.h,
                                         dtype=dtype)
                        for cb in cblk_index[c][(res.r, band.orient)]:
                            if cb.numpasses == 0 or id(cb) not in decoded:
                                continue
                            coef = decoded[id(cb)]
                            pm = _cblk_pmin(cods[c], cb,
                                            roishifts[c] if roishifts
                                            else 0)
                            if not rev_c:
                                coef = quant.dequantize_signed(
                                    coef, bp.stepsize, p_min=pm)
                            else:
                                coef = quant.rev_trunc_bias(coef, pm)
                            sa.write(cb.geom.rect.x0 - band.rect.x0,
                                     cb.geom.rect.y0 - band.rect.y0, coef)
                        sparse[(res.r, band.orient)] = sa

                def fetch(r, o, bx0, by0, bx1, by1, _s=sparse):
                    return _s[(r, o)].read(bx0, by0, bx1, by1)

            comp_win = component_rect(window, siz.comps[c].dx,
                                      siz.comps[c].dy)
            a, wx0, wy0 = dww.inv_dwt_2d_window(
                fetch, tc, cods[c].numresolutions, comp_win,
                reversible=rev_c, max_res=max_res)
            out.append(a)
            origins.append((wx0, wy0))
            continue
        if _fused_bands is not None:
            if _packed[c] is not None and max_res == \
                    cods[c].numresolutions - 1:
                from ..native import dwt_native as _dwtnat2
                flat, offs_, llo_ = _packed[c]
                a = _dwtnat2.inv_dwt_2d_packed(
                    flat, offs_, llo_, plan.layout.tc_rect,
                    cods[c].numresolutions, reversible=rev_c)
            else:
                a = dwt_host.inv_dwt_2d(_fused_bands[c],
                                        plan.layout.tc_rect,
                                        cods[c].numresolutions,
                                        reversible=rev_c,
                                        max_res=max_res)
            out.append(a)
            origins.append((ox, oy))
            continue
        bands_arrays: Dict[Tuple[int, int], np.ndarray] = {}
        for res in plan.layout.resolutions:
            for band in res.bands:
                bp = plan.bands[(res.r, band.orient)]
                arr = np.zeros((band.rect.h, band.rect.w), dtype=dtype)
                for cb in cblk_index[c][(res.r, band.orient)]:
                    if cb.numpasses == 0 or id(cb) not in decoded:
                        continue
                    coef = decoded[id(cb)]
                    pm = _cblk_pmin(cods[c], cb,
                                    roishifts[c] if roishifts else 0)
                    x0 = cb.geom.rect.x0 - band.rect.x0
                    y0 = cb.geom.rect.y0 - band.rect.y0
                    if rev_c:
                        arr[y0:y0 + cb.geom.rect.h,
                            x0:x0 + cb.geom.rect.w] = \
                            quant.rev_trunc_bias(coef, pm)
                    else:
                        arr[y0:y0 + cb.geom.rect.h, x0:x0 + cb.geom.rect.w] = \
                            quant.dequantize_signed(coef, bp.stepsize,
                                                    p_min=pm)
                bands_arrays[(res.r, band.orient)] = arr
        a = dwt_host.inv_dwt_2d(bands_arrays, plan.layout.tc_rect,
                                cods[c].numresolutions, reversible=rev_c,
                                max_res=max_res)
        out.append(a)
        origins.append((ox, oy))

    if _dwt_t0 is not None:
        trace.add_time("dec.dwt", _time.perf_counter() - _dwt_t0)
    # Inverse MCT + DC unshift.
    if cod.mct == 2 and custom_mct is not None:
        matrix, offsets = custom_mct
        out = mct_np.custom_inv(out, matrix)
        final = []
        for c in range(ncomps):
            a = np.round(out[c]).astype(np.int64)
            a = a + int(round(float(offsets[c])))
            if plans[c].signed:
                lo, hi = -(1 << (plans[c].prec - 1)), \
                    (1 << (plans[c].prec - 1)) - 1
            else:
                lo, hi = 0, (1 << plans[c].prec) - 1
            final.append(np.clip(a, lo, hi).astype(np.int32))
        return list(zip(final, origins))
    nat = _mct_native()
    # Corrupt streams can signal MCT over differently-sized components;
    # the reference skips the MCT step in that case rather than failing
    # (reference: TileProcessor.cpp mct_decode:1303 "Tiles don't all
    # have the same dimension. Skip the MCT step", testcase
    # 1336.pdf.asan.47.376). Match it — a broadcast across mismatched
    # planes would otherwise throw from deep inside the transform.
    _mct_ok = (ncomps >= 3
               and out[0].shape == out[1].shape == out[2].shape)
    if (cod.mct == 1 and reversible and _mct_ok and nat is not None
            and all(out[c].dtype == np.int32 for c in range(3))):
        shifts, los, his = [], [], []
        for c in range(3):
            pn = plans[c]
            if pn.signed:
                shifts.append(0)
                los.append(-(1 << (pn.prec - 1)))
                his.append((1 << (pn.prec - 1)) - 1)
            else:
                shifts.append(1 << (pn.prec - 1))
                los.append(0)
                his.append((1 << pn.prec) - 1)
        fused = nat.rct_dc_inv(*(np.ascontiguousarray(out[c])
                                 for c in range(3)), shifts, los, his)
        if fused is not None:
            final = list(fused)
            for c in range(3, ncomps):
                a = mct_np.dc_shift_inv(out[c], plans[c].prec,
                                        plans[c].signed)
                final.append(a.astype(np.int32))
            return list(zip(final, origins))
    if cod.mct and _mct_ok:
        if reversible:
            r0, g0, b0 = mct_np.rct_inv(out[0], out[1], out[2])
        else:
            r0, g0, b0 = mct_np.ict_inv(out[0], out[1], out[2])
        out[0], out[1], out[2] = r0, g0, b0
    final = []
    for c in range(ncomps):
        a = out[c]
        if a.dtype != np.int32:
            a = np.round(a).astype(np.int64)
        a = mct_np.dc_shift_inv(a, plans[c].prec, plans[c].signed)
        final.append(a.astype(np.int32))
    return list(zip(final, origins))


def index_tile_packets(body: bytes, hdr, tile_index: int):
    """Packet index of one tile: (layer, res, comp, prec, offset, bytes)
    per packet in progression order — the grk_dump codestream-index
    analog (reference: j2k_dump.cpp:176). Parses headers only."""
    from ..core.geometry import tile_rect as _tile_rect
    siz, cod, qcd = hdr.siz, hdr.cod, hdr.qcd
    tile = _tile_rect(tile_index, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                      siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    ncomps = len(siz.comps)
    cod_comp = hdr.cod_comp
    qcd_comp = hdr.qcd_comp
    cods = [cod_comp[c] if cod_comp and cod_comp[c] else cod
            for c in range(ncomps)]
    qcds = [qcd_comp[c] if qcd_comp and qcd_comp[c] else qcd
            for c in range(ncomps)]
    plans = [build_comp_plan(siz, cods[c], qcds[c], tile, c)
             for c in range(ncomps)]
    prec_dec = []
    for c in range(ncomps):
        per_res = {}
        for res in plans[c].layout.resolutions:
            for band in res.bands:
                plist = []
                for prc in band.precincts:
                    pd = PrecDec(geom=prc,
                                 cblks=[CblkDec(geom=cb)
                                        for cb in prc.cblks])
                    pd.init_trees()
                    plist.append(pd)
                per_res[(res.r, band.orient)] = plist
        prec_dec.append(per_res)
    comps_iter = [
        CompIterInfo(
            numresolutions=cods[c].numresolutions,
            dx=siz.comps[c].dx,
            dy=siz.comps[c].dy,
            tc_rect=plans[c].layout.tc_rect,
            prec_info=[(res.ppx, res.ppy, res.num_precincts_w,
                        res.num_precincts_h)
                       for res in plans[c].layout.resolutions],
        )
        for c in range(ncomps)
    ]
    if hdr.pocs:
        from .packetiter import packet_order_poc
        piter = packet_order_poc(hdr.pocs, cod.numlayers, comps_iter, tile)
    else:
        piter = packet_order(cod.progression, cod.numlayers, comps_iter,
                             tile)
    out = []
    pos = 0
    for (l, r, c, p) in piter:
        if pos >= len(body):
            break
        orients = (0,) if r == 0 else (1, 2, 3)
        precs = [prec_dec[c][(r, o)][p] for o in orients
                 if (r, o) in prec_dec[c]]
        kmaxs = [plans[c].bands[(r, o)].kmax for o in orients
                 if (r, o) in plans[c].bands]
        start = pos
        pos = decode_packet(body, pos, l, precs, kmaxs,
                            cods[c].cblk_style, sop=cod.sop, eph=cod.eph,
                            discard=True)
        out.append((l, r, c, p, start, pos - start))
    return out
