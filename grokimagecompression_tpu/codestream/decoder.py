"""Top-level J2K decoder: codestream bytes -> Image.

Analog of the reference decode path (reference: src/lib/jp2/codestream/
j2k.cpp: j2k_read_header:406, marker loop j2k_read_header_procedure:176,
j2k_decode:1376, tile loop/SOT parsing j2k.cpp:627). Unknown markers are
skipped by length; truncated tiles decode as far as the data allows
(degrade, don't fail).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.geometry import ceil_div, tile_grid_size, tile_rect
from ..core.image import Component, Image
from ..core.params import DecoderParams
from . import markers
from .markers import CodInfo, QcdInfo, SizInfo
from .tile import decode_tile


@dataclasses.dataclass
class CodestreamHeader:
    siz: SizInfo
    cod: CodInfo
    qcd: QcdInfo
    comments: List[str]
    main_header_end: int  # offset of first SOT
    cod_comp: Optional[List[Optional[CodInfo]]] = None  # COC overrides
    qcd_comp: Optional[List[Optional[QcdInfo]]] = None  # QCC overrides
    pocs: Optional[list] = None                          # POC entries
    tlm: Optional[list] = None                           # (tile, length)
    roishifts: Optional[List[int]] = None                # RGN per comp
    custom_mct: Optional[tuple] = None                   # (matrix, offsets)
    ppm_sections: Optional[list] = None                  # packed hdrs/tile-part


@dataclasses.dataclass
class TilePart:
    tile_index: int
    body: bytes
    # Tile-part header overrides (COD/COC/QCD/QCC/POC between SOT and SOD);
    # COC/QCC kept as raw payloads, parsed once ncomps is known.
    cod: Optional[CodInfo] = None
    coc_raw: List[bytes] = dataclasses.field(default_factory=list)
    qcd: Optional[QcdInfo] = None
    qcc_raw: List[bytes] = dataclasses.field(default_factory=list)
    poc_raw: Optional[bytes] = None
    ppt_raw: List[bytes] = dataclasses.field(default_factory=list)
    plt_lengths: List[int] = dataclasses.field(default_factory=list)
    # True when the walk skipped this tile-part's header/body (tile not
    # in the caller's `want` set): only tile_index is valid.
    skipped: bool = False


def _validate_siz(siz: SizInfo) -> None:
    """SIZ sanity limits (reference: j2k_read_siz:3361 validation;
    max-tile guard j2k.cpp:2072). Rejecting here keeps corrupt headers
    from driving huge/negative tile grids or absurd allocations."""
    if not (0 <= siz.xosiz < siz.xsiz and 0 <= siz.yosiz < siz.ysiz):
        raise ValueError("SIZ: invalid image area")
    if siz.xtsiz <= 0 or siz.ytsiz <= 0:
        raise ValueError("SIZ: invalid tile size")
    if not (0 <= siz.xtosiz <= siz.xosiz and 0 <= siz.ytosiz <= siz.yosiz):
        raise ValueError("SIZ: tile origin must not exceed image origin")
    if siz.xtosiz + siz.xtsiz <= siz.xosiz or \
            siz.ytosiz + siz.ytsiz <= siz.yosiz:
        raise ValueError("SIZ: first tile does not cover the image origin")
    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    if ntx <= 0 or nty <= 0 or ntx * nty > 65535:
        raise ValueError(f"SIZ: invalid tile grid {ntx}x{nty}")
    if not siz.comps or len(siz.comps) > 16384:
        raise ValueError("SIZ: invalid component count")
    for c in siz.comps:
        if not (1 <= c.prec <= 38):
            raise ValueError(f"SIZ: invalid precision {c.prec}")
        if not (1 <= c.dx <= 255 and 1 <= c.dy <= 255):
            raise ValueError("SIZ: invalid subsampling")


def read_header(data: bytes) -> CodestreamHeader:
    if struct.unpack(">H", data[0:2])[0] != markers.SOC:
        raise ValueError("not a J2K codestream (missing SOC)")
    pos = 2
    siz = cod = qcd = None
    comments: List[str] = []
    coc_raw = []
    qcc_raw = []
    rgn_raw = []
    mct_raw = []
    ppm_raw = []
    pocs = None
    tlm = None
    while pos + 4 <= len(data):
        marker = struct.unpack(">H", data[pos:pos + 2])[0]
        if marker == markers.SOT:
            break
        length = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        payload = data[pos + 4:pos + 2 + length]
        if marker == markers.SIZ:
            siz = markers.parse_siz(payload)
        elif marker == markers.COD:
            cod = markers.parse_cod(payload)
        elif marker == markers.COC:
            coc_raw.append(payload)
        elif marker == markers.QCD:
            qcd = markers.parse_qcd(payload)
        elif marker == markers.QCC:
            qcc_raw.append(payload)
        elif marker == markers.POC:
            pocs = payload  # parsed below once ncomps is known
        elif marker == markers.TLM:
            tlm = markers.parse_tlm(payload)
        elif marker == markers.RGN:
            rgn_raw.append(payload)
        elif marker == markers.MCT:
            mct_raw.append(payload)
        elif marker == markers.PPM:
            ppm_raw.append((payload[0], payload[1:]))
        elif marker == markers.COM:
            if len(payload) >= 2:
                comments.append(payload[2:].decode("latin-1", "replace"))
        # PLM/PPM/CRG/CAP: skipped by length.
        pos += 2 + length
    if siz is None or cod is None or qcd is None:
        raise ValueError("incomplete main header (need SIZ, COD, QCD)")
    _validate_siz(siz)
    ncomps = len(siz.comps)
    cod_comp = None
    if coc_raw:
        cod_comp = [None] * ncomps
        for payload in coc_raw:
            compno, cc = markers.parse_coc(payload, ncomps, cod)
            cod_comp[compno] = cc
    qcd_comp = None
    if qcc_raw:
        qcd_comp = [None] * ncomps
        for payload in qcc_raw:
            compno, qq = markers.parse_qcc(payload, ncomps)
            qcd_comp[compno] = qq
    poc_entries = markers.parse_poc(pocs, ncomps) if pocs else None
    roishifts = None
    if rgn_raw:
        roishifts = [0] * ncomps
        for payload in rgn_raw:
            compno, srgn, shift = markers.parse_rgn(payload, ncomps)
            if srgn == 0:
                roishifts[compno] = shift
    ppm_sections = None
    if ppm_raw:
        ppm_sections = markers.split_ppm_sections(markers.merge_ppx(ppm_raw))
    custom_mct = None
    if mct_raw:
        matrix = offsets = None
        n = ncomps
        for payload in mct_raw:
            idx, at, et, data = markers.parse_mct_record(payload)
            if at == markers.MCT_ARRAY_DECORRELATION and data.size == n * n:
                matrix = data.reshape(n, n)
            elif at == markers.MCT_ARRAY_OFFSET and data.size == n:
                offsets = data
        if matrix is not None:
            if offsets is None:
                offsets = np.zeros(n, dtype=np.float32)
            custom_mct = (matrix, offsets)
    return CodestreamHeader(siz=siz, cod=cod, qcd=qcd, comments=comments,
                            main_header_end=pos, cod_comp=cod_comp,
                            qcd_comp=qcd_comp, pocs=poc_entries, tlm=tlm,
                            roishifts=roishifts, custom_mct=custom_mct,
                            ppm_sections=ppm_sections)


def iter_tile_parts(data: bytes, start: int, want=None):
    """Yield TilePart records by walking SOT/Psot; tolerates truncation.

    `want(tile_index) -> bool` (optional) marks which tiles the caller
    will decode: other tiles' parts are yielded as lightweight
    `skipped` records — no header walk, no body slice — so a windowed
    or single-tile decode of a large tiled stream never copies the
    bytes it does not need (the reference's TLM/seek analog)."""
    pos = start
    while pos + 4 <= len(data):
        marker = struct.unpack(">H", data[pos:pos + 2])[0]
        if marker == markers.EOC:
            return
        if marker != markers.SOT:
            # Resync: skip marker segment if it has a length.
            if pos + 4 <= len(data):
                length = struct.unpack(">H", data[pos + 2:pos + 4])[0]
                pos += 2 + length
                continue
            return
        sot = markers.parse_sot(data[pos + 4:pos + 12])
        psot = sot.psot if sot.psot else len(data) - pos
        tp_end = min(pos + psot, len(data))
        if want is not None and not want(sot.tile_index):
            yield TilePart(tile_index=sot.tile_index, body=b"",
                           skipped=True)
            pos = pos + psot if sot.psot else tp_end
            continue
        # Walk markers inside the tile-part header until SOD, collecting
        # per-tile parameter overrides.
        hp = pos + 12
        tp = TilePart(tile_index=sot.tile_index, body=b"")
        while hp + 2 <= tp_end:
            m = struct.unpack(">H", data[hp:hp + 2])[0]
            if m == markers.SOD:
                hp += 2
                break
            ln = struct.unpack(">H", data[hp + 2:hp + 4])[0]
            payload = data[hp + 4:hp + 2 + ln]
            if m == markers.COD:
                tp.cod = markers.parse_cod(payload)
            elif m == markers.QCD:
                tp.qcd = markers.parse_qcd(payload)
            elif m == markers.COC:
                tp.coc_raw.append(payload)
            elif m == markers.QCC:
                tp.qcc_raw.append(payload)
            elif m == markers.POC:
                tp.poc_raw = payload
            elif m == markers.PPT:
                tp.ppt_raw.append(payload)
            elif m == markers.PLT:
                _, lens, _ = markers.parse_plt(payload)
                tp.plt_lengths.extend(lens)
            hp += 2 + ln
        tp.body = data[hp:tp_end]
        yield tp
        pos = pos + psot if sot.psot else tp_end


def decode(data: bytes, params: Optional[DecoderParams] = None,
           device: Optional[bool] = None, mesh=None) -> Image:
    """Decode a raw J2K codestream (or JP2 file) into an Image.

    `device=True` runs the inverse transform pipeline (inverse DWT,
    inverse MCT, DC unshift) on the JAX device; default is host numpy
    unless GROK_TPU_DEVICE=1.

    `mesh` (a jax.sharding.Mesh) additionally batches same-geometry
    tiles and shards the inverse transform over the mesh devices (tiles
    are the data-parallel axis, SURVEY.md §2.4); T2 parsing and entropy
    decode fan out over host threads per tile as usual. Pixel-identical
    to the host decode by construction.
    """
    params = params or DecoderParams()
    from . import jp2
    if jp2.is_jp2(data):
        data = jp2.extract_codestream(data)
    hdr = read_header(data)
    siz, cod, qcd = hdr.siz, hdr.cod, hdr.qcd
    if hdr.custom_mct is not None:
        cod = dataclasses.replace(cod, mct=2)

    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    numtiles = ntx * nty
    ncomps = len(siz.comps)

    # Restricted decodes (window / single tile) know their tile set up
    # front: the tile-part walk then skips every other tile's header
    # and body outright (no byte copies — for a 600^2 window on a 16K^2
    # tiled stream this is the difference between touching ~4 tiles and
    # materializing all 256).
    needed = None
    if params.tile_index is not None:
        needed = {params.tile_index}
    elif params.window is not None:
        from ..core.geometry import Rect as _Rect
        _wx0, _wy0, _wx1, _wy1 = params.window
        _w = _Rect(max(_wx0, siz.xosiz), max(_wy0, siz.yosiz),
                   min(_wx1, siz.xsiz), min(_wy1, siz.ysiz))
        needed = set()
        for t in range(numtiles):
            _tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                            siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
            if not (_tr.x1 <= _w.x0 or _tr.x0 >= _w.x1
                    or _tr.y1 <= _w.y0 or _tr.y0 >= _w.y1):
                needed.add(t)

    tile_bodies: Dict[int, List[bytes]] = {}
    tile_over: Dict[int, TilePart] = {}
    tile_hdrs: Dict[int, List[bytes]] = {}
    ppm_iter = iter(hdr.ppm_sections or [])
    for tp in iter_tile_parts(data, hdr.main_header_end,
                              want=(needed.__contains__
                                    if needed is not None else None)):
        if tp.skipped:
            if hdr.ppm_sections is not None:
                next(ppm_iter, b"")
            continue
        tile_bodies.setdefault(tp.tile_index, []).append(tp.body)
        if hdr.ppm_sections is not None:
            # one Nppm-framed section per tile-part, in stream order
            tile_hdrs.setdefault(tp.tile_index, []).append(
                next(ppm_iter, b""))
        elif tp.ppt_raw:
            merged = markers.merge_ppx(
                [(pl[0], pl[1:]) for pl in tp.ppt_raw])
            tile_hdrs.setdefault(tp.tile_index, []).append(merged)
        if tp.cod or tp.qcd or tp.coc_raw or tp.qcc_raw or tp.poc_raw:
            tile_over[tp.tile_index] = tp

    def _tile_params(t: int):
        """Effective (cod, qcd, cod_comp, qcd_comp, pocs) for tile t."""
        tcod, tqcd = cod, qcd
        cod_comp = list(hdr.cod_comp) if hdr.cod_comp else None
        qcd_comp = list(hdr.qcd_comp) if hdr.qcd_comp else None
        pocs = hdr.pocs
        tp = tile_over.get(t)
        if tp is not None:
            if tp.cod:
                tcod = tp.cod
                cod_comp = None
            if tp.qcd:
                tqcd = tp.qcd
                qcd_comp = None
            if tp.coc_raw:
                cod_comp = cod_comp or [None] * ncomps
                for payload in tp.coc_raw:
                    compno, cc = markers.parse_coc(payload, ncomps, tcod)
                    cod_comp[compno] = cc
            if tp.qcc_raw:
                qcd_comp = qcd_comp or [None] * ncomps
                for payload in tp.qcc_raw:
                    compno, qq = markers.parse_qcc(payload, ncomps)
                    qcd_comp[compno] = qq
            if tp.poc_raw:
                pocs = markers.parse_poc(tp.poc_raw, ncomps)
        return tcod, tqcd, cod_comp, qcd_comp, pocs

    reduce = min(params.reduce, cod.numresolutions - 1)

    # Decode window (canvas coords), clipped to the image area.
    win = None
    if params.window is not None:
        from ..core.geometry import Rect
        wx0, wy0, wx1, wy1 = params.window
        win = Rect(max(wx0, siz.xosiz), max(wy0, siz.yosiz),
                   min(wx1, siz.xsiz), min(wy1, siz.ysiz))
        if win.x1 <= win.x0 or win.y1 <= win.y0:
            raise ValueError(f"decode window {params.window} is empty "
                             f"after clipping to the image area")
    # Output area (canvas): window, single tile, or whole image.
    # Single-tile decode crops the output to the tile bounds like the
    # reference (grk_decompress -t writes a tile-sized image).
    if win is None and params.tile_index is not None:
        _tr = tile_rect(params.tile_index, siz.xsiz, siz.ysiz, siz.xosiz,
                        siz.yosiz, siz.xtsiz, siz.ytsiz, siz.xtosiz,
                        siz.ytosiz)
        ax0, ay0, ax1, ay1 = _tr.x0, _tr.y0, _tr.x1, _tr.y1
    else:
        ax0 = win.x0 if win else siz.xosiz
        ay0 = win.y0 if win else siz.yosiz
        ax1 = win.x1 if win else siz.xsiz
        ay1 = win.y1 if win else siz.ysiz

    # Output image dims at the reduced resolution.
    comps_out: List[np.ndarray] = []
    for c, cs in enumerate(siz.comps):
        cw = ceil_div(ax1, cs.dx << reduce) - ceil_div(ax0, cs.dx << reduce)
        ch = ceil_div(ay1, cs.dy << reduce) - ceil_div(ay0, cs.dy << reduce)
        comps_out.append(np.zeros((ch, cw), dtype=np.int32))

    tiles = [t for t in (range(numtiles) if params.tile_index is None
                         else [params.tile_index])
             if t in tile_bodies]

    # Mesh device-entropy decode: same-geometry tiles batch through the
    # fused entropy + inverse-transform program, dispatched round-robin
    # across the mesh devices (tiles are independent — throughput
    # scales with devices, no collectives; the decode mirror of
    # parallel/sharding.fused_entropy_tiles_on_mesh). Tiles out of the
    # fused program's scope fall back to the per-tile host path below.
    mesh_fused: Dict[int, list] = {}
    from ..core.params import Transform as _Tf
    if (mesh is not None and win is None and reduce == 0
            and not params.layers and not tile_over and not tile_hdrs
            and not hdr.cod_comp and not hdr.qcd_comp and not hdr.pocs
            and not hdr.roishifts and hdr.custom_mct is None
            and cod.mct in (0, 1)
            # reversible only: the fused 9/7 dequant+inverse can differ
            # from the host float path by 1 ulp on knife-edge samples;
            # irreversible streams keep the (pixel-identical)
            # transform-only mesh below
            and cod.transform == _Tf.DWT_53):
        try:
            mesh_fused = _mesh_fused_decode(tiles, tile_bodies, siz, cod,
                                            qcd, mesh)
        except Exception:
            mesh_fused = {}

    def _decode_one(t: int):
        if t in mesh_fused:
            return mesh_fused[t]
        tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                       siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
        if win is not None and (tr.x1 <= win.x0 or tr.x0 >= win.x1
                                or tr.y1 <= win.y0 or tr.y0 >= win.y1):
            return None
        body = b"".join(tile_bodies[t])
        tcod, tqcd, cod_comp, qcd_comp, pocs = _tile_params(t)
        packed = (b"".join(tile_hdrs[t]) if t in tile_hdrs else None)
        return decode_tile(body, siz, tcod, tqcd, tr, reduce=reduce,
                           max_layers=params.layers, window=win,
                           cod_comp=cod_comp, qcd_comp=qcd_comp,
                           pocs=pocs, roishifts=hdr.roishifts,
                           custom_mct=hdr.custom_mct,
                           packed_headers=packed, device=device,
                           _return_bands=mesh is not None)

    # Host tile parallelism (decode mirror of the encoder's tile fan-out;
    # each tile writes a disjoint region of the output planes).
    import os as _os
    tile_workers = int(_os.environ.get("GROK_TPU_TILE_THREADS", "0"))
    if tile_workers == 0:
        # Oversubscribed like the encoder: hides per-tile GIL stalls.
        tile_workers = min(len(tiles), 3 * (_os.cpu_count() or 1))             if len(tiles) > 1 else 1
    if tile_workers > 1:
        import concurrent.futures as _cf
        from ..native import t1_native as _t1n
        inner = max(1, (_os.cpu_count() or 1) // tile_workers)

        def _worker(t):
            _t1n.set_thread_override(inner)
            try:
                return _decode_one(t)
            finally:
                _t1n.set_thread_override(None)

        with _cf.ThreadPoolExecutor(max_workers=tile_workers) as ex:
            results = list(ex.map(_worker, tiles))
    else:
        results = [_decode_one(t) for t in tiles]

    if mesh is not None:
        # Mesh-batched inverse transform: group the band-returning tiles
        # by (normalized) transform geometry, invert each group sharded
        # over the mesh, and convert to (array, origin) splice entries.
        from ..models.pipeline import config_for_tile
        from ..parallel.sharding import inverse_tiles_on_mesh
        groups: Dict = {}
        origins_by_tile: Dict[int, list] = {}
        for i, (t, r) in enumerate(zip(tiles, results)):
            if not (isinstance(r, tuple) and len(r) == 3
                    and r[0] == "bands"):
                continue
            _, bands_list, origins = r
            tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                           siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
            tcod = _tile_params(t)[0]
            cfg = config_for_tile(siz, tcod, tr)
            groups.setdefault(cfg, []).append((t, bands_list))
            origins_by_tile[t] = origins
        if groups:
            inv = inverse_tiles_on_mesh(groups, mesh)
            results = [
                (list(zip(inv[t], origins_by_tile[t]))
                 if t in inv else r)
                for t, r in zip(tiles, results)
            ]

    for t, tcomps in zip(tiles, results):
        if tcomps is None:
            continue
        for c, (arr, (tx0, ty0)) in enumerate(tcomps):
            cs = siz.comps[c]
            ox = ceil_div(ax0, cs.dx << reduce)
            oy = ceil_div(ay0, cs.dy << reduce)
            # Intersect the tile output with the output area.
            dst = comps_out[c]
            y_lo = max(0, oy - ty0)
            x_lo = max(0, ox - tx0)
            y_hi = min(arr.shape[0], oy + dst.shape[0] - ty0)
            x_hi = min(arr.shape[1], ox + dst.shape[1] - tx0)
            if y_hi <= y_lo or x_hi <= x_lo:
                continue
            dst[ty0 + y_lo - oy:ty0 + y_hi - oy,
                tx0 + x_lo - ox:tx0 + x_hi - ox] = arr[y_lo:y_hi,
                                                       x_lo:x_hi]

    comps = [
        Component(data=comps_out[c], dx=siz.comps[c].dx,
                  dy=siz.comps[c].dy, prec=siz.comps[c].prec,
                  signed=siz.comps[c].signed)
        for c in range(len(siz.comps))
    ]
    return Image(components=comps, x0=ax0, y0=ay0, xsiz=ax1, ysiz=ay1)


def _mesh_fused_decode(tiles, tile_bodies, siz, cod, qcd, mesh):
    """Fused device decode of same-geometry tiles round-robin over the
    mesh devices; returns {tile_index: [(comp_array, origin), ...]} for
    the tiles it handled (possibly none)."""
    import concurrent.futures as _cf
    import os as _os

    from ..models import fused_decode
    from ..models.pipeline import config_for_tile

    def _jobs_of(t):
        tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                       siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
        body = b"".join(tile_bodies[t])
        r = decode_tile(body, siz, cod, qcd, tr, _return_jobs=True)
        return (t, tr, r)

    nw = min(len(tiles), 2 * (_os.cpu_count() or 1))
    if nw > 1:
        with _cf.ThreadPoolExecutor(max_workers=nw) as ex:
            parsed = list(ex.map(_jobs_of, tiles))
    else:
        parsed = [_jobs_of(t) for t in tiles]

    groups: Dict = {}
    for (t, tr, r) in parsed:
        if not (isinstance(r, tuple) and r[0] == "jobs"):
            continue
        _, t1_jobs, t1_slots, plans, cods = r
        cfg = config_for_tile(siz, cod, tr)
        # Batchable frames need IDENTICAL slot geometry: the normalized
        # transform cfg alone is not enough (two same-size tiles whose
        # band origins differ cut their code-block grids differently),
        # so key on every block's band-relative placement as well.
        sig = []
        ok = True
        for (c, key_b, cb), job in zip(t1_slots, t1_jobs):
            bp = plans[c].bands.get(key_b)
            if bp is None:
                ok = False
                break
            sig.append((c, key_b,
                        cb.geom.rect.x0 - bp.rect.x0,
                        cb.geom.rect.y0 - bp.rect.y0,
                        int(job[2]), int(job[3])))
        if not ok:
            continue
        key = (cfg, tuple(sig))
        groups.setdefault(key, []).append((t, tr, t1_jobs, t1_slots,
                                           plans, cods))

    devs = list(mesh.devices.flat)
    out: Dict[int, list] = {}
    for (cfg, _sig), lst in groups.items():
        t0, tr0, _, _, plans0, cods0 = lst[0]
        steps = {
            (c, (res.r, band.orient)):
                plans0[c].bands[(res.r, band.orient)].stepsize
            for c in range(len(plans0))
            for res in plans0[c].layout.resolutions
            for band in res.bands}
        handles = []
        ok = True
        for di, dev in enumerate(devs):
            sub = lst[di::len(devs)]
            if not sub:
                continue
            frames = [(jobs, slots) for (_, _, jobs, slots, _, _) in sub]
            h = fused_decode.decode_tiles_device_submit(
                frames, plans0, cods0, siz, cod, tr0, steps, device=dev)
            if h is None:
                ok = False
                break
            handles.append((h, sub))
        if not ok:
            continue
        for h, sub in handles:
            per = fused_decode.decode_tiles_device_collect(h)
            for (t, tr, _, _, plans_t, _), comps in zip(sub, per):
                # origins are tile-specific (tc_rect of THIS tile)
                org = [(plans_t[c].layout.tc_rect.x0,
                        plans_t[c].layout.tc_rect.y0)
                       for c in range(len(plans_t))]
                out[t] = list(zip([np.asarray(a, np.int32)
                                   for a in comps], org))
    return out


def decode_batch(datas: List[bytes],
                 params: Optional[DecoderParams] = None,
                 device: Optional[bool] = None,
                 chunk: int = 32) -> List[Image]:
    """Decode many same-geometry codestreams (a serving batch).

    With `device=True` and the HT block coder, frames are decoded in
    chunks through ONE fused XLA program per chunk (lane-parallel
    entropy decode -> inverse transform; models/fused_decode.py): all
    chunks are submitted before any result is collected, so device
    compute and host T2 parsing/prepass pipeline. Falls back to
    per-stream `decode` whenever the batch is out of scope. Decode
    mirror of encoder.encode_batch.
    """
    import os as _os

    params = params or DecoderParams()
    if device is None:
        from ..utils.device import device_default
        device = device_default()

    def _fallback():
        return [decode(d, params, device=device) for d in datas]

    if not datas:
        return []
    if not device or params.window is not None or params.reduce \
            or params.layers or params.tile_index is not None:
        return _fallback()
    from . import jp2
    datas = [jp2.extract_codestream(d) if jp2.is_jp2(d) else d
             for d in datas]
    try:
        hdrs = [read_header(d) for d in datas]
    except ValueError:
        return _fallback()
    h0 = hdrs[0]
    if any((h.siz, h.cod, h.qcd) != (h0.siz, h0.cod, h0.qcd)
           for h in hdrs[1:]):
        return _fallback()
    siz, cod, qcd = h0.siz, h0.cod, h0.qcd
    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    numtiles = ntx * nty
    # Gate (round-5 widened: multi-tile, COC/QCC with a batchable
    # geometry, POC, and PPM/PPT streams now run the fused device batch
    # — reference decode generality anchor: src/lib/jp2/t2/T2.cpp:194).
    # Still host-only: ROI shifts, custom MCT, mixed per-comp
    # transforms/styles, per-tile-part header overrides.
    if (not ((cod.cblk_style & 0x40) or cod.cblk_style == 0)
            or cod.mct not in (0, 1)
            or any(h.roishifts or h.custom_mct for h in hdrs)):
        return _fallback()
    if cod.mct and len(siz.comps) >= 3 and any(
            (c.dx, c.dy) != (siz.comps[0].dx, siz.comps[0].dy)
            for c in siz.comps[:3]):
        # MCT over differently-sampled components: host path skips the
        # MCT step like the reference (corrupt-stream tolerance)
        return _fallback()
    if any((h.cod_comp, h.qcd_comp, h.pocs,
            h.ppm_sections is not None)
           != (h0.cod_comp, h0.qcd_comp, h0.pocs,
               h0.ppm_sections is not None) for h in hdrs[1:]):
        return _fallback()
    if h0.cod_comp and any(
            cc and (cc.transform != cod.transform
                    or cc.numresolutions != cod.numresolutions
                    or cc.cblk_style != cod.cblk_style)
            for cc in h0.cod_comp):
        return _fallback()
    trs = [tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                     siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
           for t in range(numtiles)]

    class _HostPath(Exception):
        pass

    def _jobs(i: int):
        tile_bodies: Dict[int, List[bytes]] = {}
        tile_hdrs: Dict[int, List[bytes]] = {}
        ppm_iter = iter(hdrs[i].ppm_sections or [])
        for tp in iter_tile_parts(datas[i], hdrs[i].main_header_end):
            if tp.cod or tp.qcd or tp.coc_raw or tp.qcc_raw \
                    or tp.poc_raw:
                raise _HostPath()  # tile-part header overrides
            tile_bodies.setdefault(tp.tile_index, []).append(tp.body)
            if hdrs[i].ppm_sections is not None:
                tile_hdrs.setdefault(tp.tile_index, []).append(
                    next(ppm_iter, b""))
            elif tp.ppt_raw:
                tile_hdrs.setdefault(tp.tile_index, []).append(
                    markers.merge_ppx([(pl[0], pl[1:])
                                       for pl in tp.ppt_raw]))
        out = []
        for t in range(numtiles):
            body = b"".join(tile_bodies.get(t, []))
            packed = (b"".join(tile_hdrs[t]) if t in tile_hdrs
                      else None)
            r = decode_tile(body, siz, cod, qcd, trs[t],
                            cod_comp=h0.cod_comp, qcd_comp=h0.qcd_comp,
                            pocs=h0.pocs, packed_headers=packed,
                            _return_jobs=True)
            assert isinstance(r, tuple) and r[0] == "jobs"
            out.append(r)
        # tiles with NO tile-parts at all stay zero in the canvas, like
        # the single-stream decode() (a truncated stream can lose whole
        # tiles; an empty-BODY tile-part still decodes to DC midline)
        return out, frozenset(tile_bodies)

    import concurrent.futures as _cf
    nw = min(len(datas), 2 * (_os.cpu_count() or 1))
    try:
        with _cf.ThreadPoolExecutor(max_workers=nw) as ex:
            jobbed = list(ex.map(_jobs, range(len(datas))))
    except _HostPath:
        return _fallback()
    parsed = [j[0] for j in jobbed]
    present = [j[1] for j in jobbed]

    # Group tiles by fused-geometry signature (same trick as the mesh
    # encode route: identical slot layout + band shapes share one
    # compiled program and one submit batch).
    def _sig(t: int):
        r = parsed[0][t]
        plans_t, slots_t, jobs_t = r[3], r[2], r[1]
        bands = []
        for c in range(len(plans_t)):
            for res in plans_t[c].layout.resolutions:
                for band in res.bands:
                    bp = plans_t[c].bands[(res.r, band.orient)]
                    bands.append((c, res.r, band.orient, band.rect.h,
                                  band.rect.w, float(bp.stepsize)))
        blocks = tuple(
            (c, key, j[2], j[3],
             cb.geom.rect.x0
             - plans_t[c].bands[key].rect.x0,
             cb.geom.rect.y0
             - plans_t[c].bands[key].rect.y0)
            for (c, key, cb), j in zip(slots_t, jobs_t))
        return (trs[t].w, trs[t].h, tuple(bands), blocks)

    tgroups: Dict[object, List[int]] = {}
    for t in range(numtiles):
        tgroups.setdefault(_sig(t), []).append(t)
    # every frame must share each tile's slot layout with frame 0
    for i in range(1, len(parsed)):
        for t in range(numtiles):
            if len(parsed[i][t][1]) != len(parsed[0][t][1]):
                return _fallback()

    from ..models import fused_decode
    nframes = len(datas)
    # canvas planes per frame
    ax0, ay0 = siz.xosiz, siz.yosiz
    comps_out = [
        [np.zeros((ceil_div(siz.ysiz, cs.dy) - ceil_div(ay0, cs.dy),
                   ceil_div(siz.xsiz, cs.dx) - ceil_div(ax0, cs.dx)),
                  np.int32) for cs in siz.comps]
        for _ in range(nframes)]

    submits = []  # (handle, [(frame, tile), ...], plans_rep)
    for sig, tlist in tgroups.items():
        t0 = tlist[0]
        plans_rep, cods_rep = parsed[0][t0][3], parsed[0][t0][4]
        steps_by_band = {
            (c, (res.r, band.orient)):
                plans_rep[c].bands[(res.r, band.orient)].stepsize
            for c in range(len(plans_rep))
            for res in plans_rep[c].layout.resolutions
            for band in res.bands}
        instances = [(f, t) for t in tlist for f in range(nframes)
                     if t in present[f]]
        if not instances:
            continue
        for k in range(0, len(instances), chunk):
            part = instances[k:k + chunk]
            frames = [(parsed[f][t][1], parsed[f][t][2])
                      for (f, t) in part]
            hnd = fused_decode.decode_tiles_device_submit(
                frames, plans_rep, cods_rep, siz, cod, trs[part[0][1]],
                steps_by_band)
            if hnd is None:
                return _fallback()
            submits.append((hnd, part, plans_rep))

    for (hnd, part, plans_rep) in submits:
        outs = fused_decode.decode_tiles_device_collect(hnd)
        for (f, t), comps in zip(part, outs):
            for c, a in enumerate(comps):
                cs = siz.comps[c]
                tc = parsed[0][t][3][c].layout.tc_rect
                arr = np.asarray(a, np.int32)
                ox = ceil_div(ax0, cs.dx)
                oy = ceil_div(ay0, cs.dy)
                dst = comps_out[f][c]
                ty0, tx0 = tc.y0, tc.x0
                y_lo = max(0, oy - ty0)
                x_lo = max(0, ox - tx0)
                y_hi = min(arr.shape[0], oy + dst.shape[0] - ty0)
                x_hi = min(arr.shape[1], ox + dst.shape[1] - tx0)
                if y_hi <= y_lo or x_hi <= x_lo:
                    continue
                dst[ty0 + y_lo - oy:ty0 + y_hi - oy,
                    tx0 + x_lo - ox:tx0 + x_hi - ox] = \
                    arr[y_lo:y_hi, x_lo:x_hi]

    out: List[Image] = []
    for f in range(nframes):
        comp_objs = [
            Component(data=comps_out[f][c], dx=siz.comps[c].dx,
                      dy=siz.comps[c].dy, prec=siz.comps[c].prec,
                      signed=siz.comps[c].signed)
            for c in range(len(siz.comps))
        ]
        out.append(Image(components=comp_objs, x0=ax0, y0=ay0,
                         xsiz=siz.xsiz, ysiz=siz.ysiz))
    return out
