"""ctypes binding for the native Tier-2 packet encoder (src/t2.cpp).

One call encodes every layer's packet for a precinct group; Python
assembles fragments in progression order (and prepends SOP markers, which
carry the global packet index)."""

from __future__ import annotations

import ctypes
from typing import List

import numpy as np

from .t1_native import _lib

_lib.grok_t2_encode_precinct.restype = ctypes.c_int
_lib.grok_t2_encode_precinct.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
]


class PrecGroupEnc:
    """Pre-marshaled native T2 state for one precinct group.

    The static per-block data (geometry, pass rates, compressed bytes)
    is packed once; only the per-layer pass assignment is refreshed per
    encode() call. This is what makes the PCRD bisection cheap: each of
    its up-to-128 simulate iterations reuses the marshaling
    (reference: encode_packets_simulate re-walks structs in C++;
    the analog here is keeping the ctypes arrays warm)."""

    def __init__(self, precincts, numlayers: int, cblk_style: int,
                 eph: bool):
        nbands = len(precincts)
        self.numlayers = numlayers
        self.cblk_style = cblk_style
        self.eph = eph
        self.nbands = nbands
        self.grid = np.zeros(nbands * 2, dtype=np.int32)
        self.ncblks = np.zeros(nbands, dtype=np.int32)
        cblks = []
        for b, pr in enumerate(precincts):
            self.grid[b * 2] = max(1, pr.geom.cblk_grid_w)
            self.grid[b * 2 + 1] = max(1, pr.geom.cblk_grid_h)
            self.ncblks[b] = len(pr.cblks)
            cblks.extend(pr.cblks)
        self.cblks = cblks
        n = len(cblks)
        self.n = n
        pass_stride = max([cb.numpasses for cb in cblks] + [1])
        self.pass_stride = pass_stride
        self.meta = np.zeros(max(1, n * 5), dtype=np.int64)
        self.layer_np = np.zeros(max(1, n * numlayers), dtype=np.int32)
        self.rates = np.zeros(max(1, n * pass_stride), dtype=np.int32)
        self.term = np.zeros(max(1, n * pass_stride), dtype=np.uint8)
        datas = []
        off = 0
        for i, cb in enumerate(cblks):
            self.meta[i * 5] = cb.geom.cx
            self.meta[i * 5 + 1] = cb.geom.cy
            self.meta[i * 5 + 2] = cb.imsb
            self.meta[i * 5 + 3] = cb.numpasses
            self.meta[i * 5 + 4] = off
            for j, p in enumerate(cb.passes):
                self.rates[i * pass_stride + j] = p.rate
                self.term[i * pass_stride + j] = 1 if p.terminated else 0
            datas.append(cb.data)
            off += len(cb.data)
        self.total_body = off
        self.data_flat = np.frombuffer(b"".join(datas) or b"\x00",
                                       dtype=np.uint8)
        self.out_cap = self.total_body + 4096 * numlayers + 64 * n
        self.out = np.empty(self.out_cap, dtype=np.uint8)
        self.layer_off = np.zeros(numlayers + 1, dtype=np.int64)

    def encode(self) -> List[bytes]:
        """Encode all layers with the blocks' current layer_npasses."""
        nl = self.numlayers
        lp = self.layer_np
        for i, cb in enumerate(self.cblks):
            lp[i * nl:(i + 1) * nl] = cb.layer_npasses
        rc = _lib.grok_t2_encode_precinct(
            nl, self.cblk_style, 1 if self.eph else 0, self.nbands,
            self.grid.ctypes.data, self.ncblks.ctypes.data,
            self.meta.ctypes.data, lp.ctypes.data,
            self.rates.ctypes.data, self.term.ctypes.data,
            self.pass_stride, self.data_flat.ctypes.data,
            self.out.ctypes.data, self.out_cap,
            self.layer_off.ctypes.data)
        if rc < 0:
            raise RuntimeError("native T2 encode overflow")
        return [bytes(self.out[self.layer_off[l]:self.layer_off[l + 1]])
                for l in range(nl)]

    def simulate_bytes(self, max_layer: int) -> int:
        """Byte count of layers 0..max_layer without materializing the
        fragments."""
        nl = self.numlayers
        lp = self.layer_np
        for i, cb in enumerate(self.cblks):
            lp[i * nl:(i + 1) * nl] = cb.layer_npasses
        rc = _lib.grok_t2_encode_precinct(
            nl, self.cblk_style, 1 if self.eph else 0, self.nbands,
            self.grid.ctypes.data, self.ncblks.ctypes.data,
            self.meta.ctypes.data, lp.ctypes.data,
            self.rates.ctypes.data, self.term.ctypes.data,
            self.pass_stride, self.data_flat.ctypes.data,
            self.out.ctypes.data, self.out_cap,
            self.layer_off.ctypes.data)
        if rc < 0:
            raise RuntimeError("native T2 encode overflow")
        return int(self.layer_off[min(max_layer + 1, nl)])


def encode_precinct_layers(precincts, numlayers: int, cblk_style: int,
                           eph: bool) -> List[bytes]:
    """precincts: list of PrecEnc (1 per band). Returns per-layer packet
    fragments (header+body, EPH included, no SOP)."""
    return PrecGroupEnc(precincts, numlayers, cblk_style, eph).encode()


_lib.grok_t2_simulate_tile.restype = ctypes.c_int
_lib.grok_t2_simulate_tile.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ctypes.c_void_p,
]


_lib.grok_t2_encode_tile.restype = ctypes.c_int
_lib.grok_t2_encode_tile.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_int,
]


class TileSim:
    """Whole-tile packet simulation state for PCRD: all precinct groups
    marshaled once; each simulate() refreshes only the per-layer pass
    assignment and makes a single native call."""

    def __init__(self, groups, numlayers: int, eph: bool):
        """groups: list of (key, comp, [PrecEnc...]) in a fixed order."""
        self.numlayers = numlayers
        self.eph = eph
        self.keys = [g[0] for g in groups]
        self.comps = [g[1] for g in groups]
        self.ngroups = len(groups)
        g_nbands = []
        grid = []
        ncblks = []
        cblks = []
        for (_, _, precs) in groups:
            g_nbands.append(len(precs))
            for pr in precs:
                grid.append(max(1, pr.geom.cblk_grid_w))
                grid.append(max(1, pr.geom.cblk_grid_h))
                ncblks.append(len(pr.cblks))
                cblks.extend(pr.cblks)
        self.order = cblks
        n = len(cblks)
        pass_stride = max([cb.numpasses for cb in cblks] + [1])
        self.g_nbands = np.asarray(g_nbands, np.int32)
        self.grid = np.asarray(grid, np.int32)
        self.ncblks = np.asarray(ncblks, np.int32)
        meta = np.zeros(max(1, n * 5), dtype=np.int64)
        rates = np.zeros(max(1, n * pass_stride), dtype=np.int32)
        term = np.zeros(max(1, n * pass_stride), dtype=np.uint8)
        for i, cb in enumerate(cblks):
            meta[i * 5] = cb.geom.cx
            meta[i * 5 + 1] = cb.geom.cy
            meta[i * 5 + 2] = cb.imsb
            meta[i * 5 + 3] = cb.numpasses
            for j, pss in enumerate(cb.passes):
                rates[i * pass_stride + j] = pss.rate
                term[i * pass_stride + j] = 1 if pss.terminated else 0
        self.meta = meta
        self.rates = rates
        self.term = term
        self.pass_stride = pass_stride
        self.layer_np = np.zeros((max(1, n), numlayers), dtype=np.int32)
        self.out_bytes = np.zeros(max(1, self.ngroups), dtype=np.int64)
        # When the allocator writes layer_np directly (write_rows), the
        # CblkEnc objects are stale during bisection — skip re-reading.
        self.direct = False
        self._row_of = None

    def write_rows(self, layer: int, values, cblks) -> None:
        """Scatter one layer's pass counts for `cblks` into layer_np."""
        if self._row_of is None:
            self._row_of = {id(cb): i for i, cb in enumerate(self.order)}
        rows = np.fromiter((self._row_of[id(cb)] for cb in cblks),
                           np.int64, len(cblks))
        self.layer_np[rows, layer] = values
        self.direct = True

    def refresh(self):
        if self.direct:
            return
        nl = self.numlayers
        if nl == 1:
            self.layer_np[:len(self.order), 0] = np.fromiter(
                (cb.layer_npasses[0] for cb in self.order), np.int32,
                len(self.order))
        else:
            for l in range(nl):
                self.layer_np[:len(self.order), l] = np.fromiter(
                    (cb.layer_npasses[l] for cb in self.order), np.int32,
                    len(self.order))

    def simulate(self, max_layer: int):
        """Returns (total_bytes, per_group int64 array) for layers
        0..max_layer."""
        self.refresh()
        rc = _lib.grok_t2_simulate_tile(
            self.ngroups, self.numlayers, max_layer,
            1 if self.eph else 0, self.g_nbands.ctypes.data,
            self.grid.ctypes.data, self.ncblks.ctypes.data,
            self.meta.ctypes.data, self.layer_np.ctypes.data,
            self.rates.ctypes.data, self.term.ctypes.data,
            self.pass_stride, self.out_bytes.ctypes.data)
        if rc != 0:
            raise RuntimeError("native tile simulate failed")
        return int(self.out_bytes[:self.ngroups].sum()), self.out_bytes


_lib.grok_t2_decode_tile.restype = ctypes.c_int64
_lib.grok_t2_decode_tile.argtypes = [
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
    ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_int64,
]


def decode_tile_packets(body: bytes, packets, groups, kmaxs_per_band,
                        styles_per_band, sop: bool, eph: bool):
    """Parse a tile's whole packet sequence natively.

    packets: [(group_index, layer), ...] in progression order.
    groups: per group, a list of PrecDec (band-precincts); their CblkDec
    objects are filled (numbps, numpasses, segs).
    Returns bytes consumed, or None if the native parser declined.
    """
    ngroups = len(groups)
    gband_off = np.zeros(ngroups + 1, dtype=np.int32)
    grids = []
    ncblks = []
    kmaxs = []
    styles = []
    cblks = []
    for g, precs in enumerate(groups):
        gband_off[g + 1] = gband_off[g] + len(precs)
        for (pr, kmax, style) in precs:
            grids.append((max(1, pr.geom.cblk_grid_w),
                          max(1, pr.geom.cblk_grid_h)))
            ncblks.append(len(pr.cblks))
            kmaxs.append(kmax)
            styles.append(style)
            cblks.extend(pr.cblks)
    nb = len(grids)
    n = len(cblks)
    grid_arr = np.asarray(grids, dtype=np.int32).reshape(-1)
    if grid_arr.size == 0:
        grid_arr = np.zeros(2, dtype=np.int32)
    ncblk_arr = np.asarray(ncblks or [0], dtype=np.int32)
    kmax_arr = np.asarray(kmaxs or [0], dtype=np.int32)
    style_arr = np.asarray(styles or [0], dtype=np.int32)
    meta = np.zeros(max(1, n * 3), dtype=np.int64)
    for i, cb in enumerate(cblks):
        meta[i * 3] = cb.geom.cx
        meta[i * 3 + 1] = cb.geom.cy
    pkt_group = np.asarray([p[0] for p in packets] or [0], dtype=np.int32)
    pkt_layer = np.asarray([p[1] for p in packets] or [0], dtype=np.int32)
    body_arr = np.frombuffer(body or b"\x00", dtype=np.uint8)
    out_meta = np.zeros(max(1, n * 4), dtype=np.int64)
    seg_cap = max(16, n * 12)
    seg_out = np.zeros(seg_cap * 3, dtype=np.int64)
    rc = _lib.grok_t2_decode_tile(
        body_arr.ctypes.data, len(body), len(packets),
        pkt_group.ctypes.data, pkt_layer.ctypes.data, ngroups,
        gband_off.ctypes.data, grid_arr.ctypes.data, ncblk_arr.ctypes.data,
        kmax_arr.ctypes.data, style_arr.ctypes.data, meta.ctypes.data,
        1 if sop else 0, 1 if eph else 0, out_meta.ctypes.data,
        seg_out.ctypes.data, seg_cap)
    if rc < 0:
        return None
    from ..codestream.t2 import SegDec
    for i, cb in enumerate(cblks):
        cb.numbps = int(out_meta[i * 4])
        cb.numpasses = int(out_meta[i * 4 + 1])
        nchunks = int(out_meta[i * 4 + 2])
        base = int(out_meta[i * 4 + 3])
        segs = {}
        order = []
        for k in range(nchunks):
            off = int(seg_out[(base + k) * 3])
            ln = int(seg_out[(base + k) * 3 + 1])
            si = int(seg_out[(base + k) * 3 + 2])
            if si not in segs:
                segs[si] = SegDec()
                order.append(si)
            segs[si].data += body[off:off + ln]
        cb.segs = [segs[si] for si in order]
    return int(rc)


class TileEnc:
    """Whole-tile packet emission: all precinct groups marshaled once
    (including the compressed block bytes) and encoded by one native call
    with worker threads across groups."""

    def __init__(self, groups, numlayers: int, cblk_style: int, eph: bool):
        """groups: list of (key, comp, [PrecEnc...]) in a fixed order."""
        self.numlayers = numlayers
        self.cblk_style = cblk_style
        self.eph = eph
        self.keys = [g[0] for g in groups]
        self.ngroups = len(groups)
        g_nbands = []
        grid = []
        ncblks = []
        cblks = []
        group_ncb = []
        for (_, _, precs) in groups:
            g_nbands.append(len(precs))
            ncb = 0
            for pr in precs:
                grid.append(max(1, pr.geom.cblk_grid_w))
                grid.append(max(1, pr.geom.cblk_grid_h))
                ncblks.append(len(pr.cblks))
                cblks.extend(pr.cblks)
                ncb += len(pr.cblks)
            group_ncb.append(ncb)
        self.order = cblks
        n = len(cblks)
        pass_stride = max([cb.numpasses for cb in cblks] + [1])
        self.g_nbands = np.asarray(g_nbands, np.int32)
        self.grid = np.asarray(grid, np.int32)
        self.ncblks = np.asarray(ncblks, np.int32)
        meta = np.zeros(max(1, n * 5), dtype=np.int64)
        rates = np.zeros(max(1, n * pass_stride), dtype=np.int32)
        term = np.zeros(max(1, n * pass_stride), dtype=np.uint8)
        datas = []
        off = 0
        group_body = [0] * self.ngroups
        gi = 0
        seen = 0
        for i, cb in enumerate(cblks):
            while gi < self.ngroups - 1 and i >= seen + group_ncb[gi]:
                seen += group_ncb[gi]
                gi += 1
            meta[i * 5] = cb.geom.cx
            meta[i * 5 + 1] = cb.geom.cy
            meta[i * 5 + 2] = cb.imsb
            meta[i * 5 + 3] = cb.numpasses
            meta[i * 5 + 4] = off
            for j, pss in enumerate(cb.passes):
                rates[i * pass_stride + j] = pss.rate
                term[i * pass_stride + j] = 1 if pss.terminated else 0
            datas.append(cb.data)
            group_body[gi] += len(cb.data)
            off += len(cb.data)
        self.meta = meta
        self.rates = rates
        self.term = term
        self.pass_stride = pass_stride
        self.data_flat = np.frombuffer(b"".join(datas) or b"\x00",
                                       dtype=np.uint8)
        self.layer_np = np.zeros(max(1, n * numlayers), dtype=np.int32)
        go = np.zeros(self.ngroups + 1, dtype=np.int64)
        for g in range(self.ngroups):
            go[g + 1] = go[g] + group_body[g] + 4096 * numlayers \
                + 64 * max(1, group_ncb[g])
        self.group_off = go
        self.out = np.empty(max(1, int(go[-1])), dtype=np.uint8)
        self.frag_off = np.zeros(self.ngroups * (numlayers + 1),
                                 dtype=np.int64)

    def encode_all(self, max_layer: int, nthreads: int):
        """Encode layers 0..max_layer for every group. Returns
        {key: [layer fragments as memoryview]}."""
        nl = self.numlayers
        lp = self.layer_np
        for i, cb in enumerate(self.order):
            lp[i * nl:(i + 1) * nl] = cb.layer_npasses
        rc = _lib.grok_t2_encode_tile(
            self.ngroups, nl, max_layer, 1 if self.eph else 0,
            self.g_nbands.ctypes.data, self.grid.ctypes.data,
            self.ncblks.ctypes.data, self.meta.ctypes.data,
            lp.ctypes.data, self.rates.ctypes.data, self.term.ctypes.data,
            self.pass_stride, self.data_flat.ctypes.data,
            self.out.ctypes.data, self.group_off.ctypes.data,
            self.frag_off.ctypes.data, nthreads)
        if rc != 0:
            raise RuntimeError("native tile T2 encode overflow")
        mv = memoryview(self.out)
        frags = {}
        fo = self.frag_off
        for g, key in enumerate(self.keys):
            base = int(self.group_off[g])
            row = fo[g * (nl + 1):(g + 1) * (nl + 1)]
            frags[key] = [mv[base + int(row[l]):base + int(row[l + 1])]
                          for l in range(max_layer + 1)]
        return frags
