"""J2K codestream marker segments (ISO/IEC 15444-1 Annex A).

Writer/parser for the main- and tile-header markers. Analog of the marker
handler table in the reference state machine (reference:
src/lib/jp2/codestream/j2k.cpp:87-108, marker constants j2k.h:103-129),
restructured as pure functions over immutable info records.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional, Tuple

from ..core.params import Progression, QuantStyle, Transform

# Marker codes (Table A.2).
SOC = 0xFF4F
SIZ = 0xFF51
COD = 0xFF52
COC = 0xFF53
TLM = 0xFF55
PLM = 0xFF57
PLT = 0xFF58
QCD = 0xFF5C
QCC = 0xFF5D
RGN = 0xFF5E
POC = 0xFF5F
PPM = 0xFF60
PPT = 0xFF61
CRG = 0xFF63
COM = 0xFF64
CBD = 0xFF78
CAP = 0xFF50
SOT = 0xFF90
SOP = 0xFF91
EPH = 0xFF92
SOD = 0xFF93
EOC = 0xFFD9


@dataclasses.dataclass
class ComponentSiz:
    prec: int
    signed: bool
    dx: int
    dy: int


@dataclasses.dataclass
class SizInfo:
    xsiz: int
    ysiz: int
    xosiz: int
    yosiz: int
    xtsiz: int
    ytsiz: int
    xtosiz: int
    ytosiz: int
    comps: List[ComponentSiz]
    rsiz: int = 0


@dataclasses.dataclass
class CodInfo:
    """COD/COC contents."""

    progression: Progression = Progression.LRCP
    numlayers: int = 1
    mct: int = 0
    numresolutions: int = 6
    cblk_w_exp: int = 6   # actual exponent (codestream stores exp-2)
    cblk_h_exp: int = 6
    cblk_style: int = 0
    transform: Transform = Transform.DWT_53
    # Per-resolution (PPx, PPy), r = 0..NL; None = defaults (15,15).
    precincts: Optional[Tuple[Tuple[int, int], ...]] = None
    sop: bool = False
    eph: bool = False


@dataclasses.dataclass
class QcdInfo:
    style: QuantStyle = QuantStyle.NONE
    num_guard_bits: int = 2
    # style NONE: per-band exponents; SCALAR_*: (expn, mant) pairs.
    exponents: Tuple[int, ...] = ()
    steps: Tuple[Tuple[int, int], ...] = ()


@dataclasses.dataclass
class SotInfo:
    tile_index: int
    psot: int
    tpsot: int = 0
    tnsot: int = 1


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def write_soc() -> bytes:
    return struct.pack(">H", SOC)


def write_siz(s: SizInfo) -> bytes:
    payload = struct.pack(
        ">HIIIIIIIIH",
        s.rsiz, s.xsiz, s.ysiz, s.xosiz, s.yosiz,
        s.xtsiz, s.ytsiz, s.xtosiz, s.ytosiz, len(s.comps),
    )
    for c in s.comps:
        ssiz = (c.prec - 1) | (0x80 if c.signed else 0)
        payload += struct.pack(">BBB", ssiz, c.dx, c.dy)
    return _seg(SIZ, payload)


def parse_siz(payload: bytes) -> SizInfo:
    (rsiz, xsiz, ysiz, xosiz, yosiz, xtsiz, ytsiz, xtosiz, ytosiz,
     ncomp) = struct.unpack(">HIIIIIIIIH", payload[:36])
    comps = []
    off = 36
    for _ in range(ncomp):
        ssiz, dx, dy = struct.unpack(">BBB", payload[off:off + 3])
        comps.append(ComponentSiz(prec=(ssiz & 0x7F) + 1,
                                  signed=bool(ssiz & 0x80), dx=dx, dy=dy))
        off += 3
    return SizInfo(xsiz, ysiz, xosiz, yosiz, xtsiz, ytsiz, xtosiz, ytosiz,
                   comps, rsiz)


def _spcod_tail(c: CodInfo) -> bytes:
    out = struct.pack(
        ">BBBBB",
        c.numresolutions - 1,
        c.cblk_w_exp - 2,
        c.cblk_h_exp - 2,
        c.cblk_style,
        int(c.transform),
    )
    if c.precincts is not None:
        for (ppx, ppy) in c.precincts:
            out += struct.pack(">B", (ppy << 4) | ppx)
    return out


def write_cod(c: CodInfo) -> bytes:
    scod = 0
    if c.precincts is not None:
        scod |= 0x01
    if c.sop:
        scod |= 0x02
    if c.eph:
        scod |= 0x04
    payload = struct.pack(">BBHB", scod, int(c.progression), c.numlayers,
                          c.mct)
    payload += _spcod_tail(c)
    return _seg(COD, payload)


def parse_cod(payload: bytes) -> CodInfo:
    scod, prog, layers, mct = struct.unpack(">BBHB", payload[:5])
    nl, cbw, cbh, cbsty, tr = struct.unpack(">BBBBB", payload[5:10])
    numres = nl + 1
    precincts = None
    if scod & 0x01:
        precincts = []
        for i in range(numres):
            b = payload[10 + i]
            precincts.append((b & 0x0F, b >> 4))
        precincts = tuple(precincts)
    return CodInfo(
        progression=Progression(prog),
        numlayers=layers,
        mct=mct,
        numresolutions=numres,
        cblk_w_exp=cbw + 2,
        cblk_h_exp=cbh + 2,
        cblk_style=cbsty,
        transform=Transform(tr),
        precincts=precincts,
        sop=bool(scod & 0x02),
        eph=bool(scod & 0x04),
    )


def write_qcd(q: QcdInfo) -> bytes:
    sqcd = int(q.style) | (q.num_guard_bits << 5)
    payload = struct.pack(">B", sqcd)
    if q.style == QuantStyle.NONE:
        for e in q.exponents:
            payload += struct.pack(">B", e << 3)
    else:
        for (expn, mant) in q.steps:
            payload += struct.pack(">H", (expn << 11) | mant)
    return _seg(QCD, payload)


def parse_qcd(payload: bytes) -> QcdInfo:
    sqcd = payload[0]
    style = QuantStyle(sqcd & 0x1F)
    guard = sqcd >> 5
    exponents: List[int] = []
    steps: List[Tuple[int, int]] = []
    body = payload[1:]
    if style == QuantStyle.NONE:
        exponents = [b >> 3 for b in body]
    else:
        for i in range(0, len(body), 2):
            v = struct.unpack(">H", body[i:i + 2])[0]
            steps.append((v >> 11, v & 0x7FF))
    return QcdInfo(style=style, num_guard_bits=guard,
                   exponents=tuple(exponents), steps=tuple(steps))


def write_com(text: str) -> bytes:
    return _seg(COM, struct.pack(">H", 1) + text.encode("latin-1"))


def write_sot(s: SotInfo) -> bytes:
    return struct.pack(">HHHIBB", SOT, 10, s.tile_index, s.psot, s.tpsot,
                       s.tnsot)


def parse_sot(payload: bytes) -> SotInfo:
    tile_index, psot, tpsot, tnsot = struct.unpack(">HIBB", payload[:8])
    return SotInfo(tile_index=tile_index, psot=psot, tpsot=tpsot, tnsot=tnsot)


def write_sod() -> bytes:
    return struct.pack(">H", SOD)


def write_eoc() -> bytes:
    return struct.pack(">H", EOC)


def write_cap(reversible: bool, max_Mb: int) -> bytes:
    """CAP marker for HTJ2K (Part 15): Pcap bit 15 set, Ccap15 per
    reference j2k_write_cap (reference: src/lib/jp2/codestream/
    j2k.cpp:3298): Bp derived from the maximum magnitude bits."""
    pcap = 0x00020000
    ccap = 0 if reversible else 0x0020
    b = max_Mb
    if b <= 8:
        bp = 0
    elif b < 28:
        bp = b - 8
    elif b < 48:
        bp = 13 + (b >> 2)
    else:
        bp = 31
    ccap |= bp
    payload = struct.pack(">IH", pcap, ccap)
    return struct.pack(">HH", CAP, 2 + len(payload)) + payload


JPH_RSIZ_FLAG = 0x4000
