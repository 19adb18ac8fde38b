"""JP2 container (ISO/IEC 15444-1 Annex I): box read/write around the raw
J2K codestream.

Analog of the reference container layer (reference:
src/lib/jp2/codestream/jp2.cpp box handler tables jp2.cpp:433-453,
jp2_read_header:2970, jp2_encode:2389). Boxes supported this round:
jP (signature), ftyp, jp2h { ihdr, bpcc, colr }, jp2c; unknown boxes are
skipped by length on read.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional, Tuple

JP2_SIGNATURE = b"\x00\x00\x00\x0cjP  \r\n\x87\n"

# Box types
T_FTYP = b"ftyp"
T_JP2H = b"jp2h"
T_IHDR = b"ihdr"
T_BPCC = b"bpcc"
T_COLR = b"colr"
T_JP2C = b"jp2c"

# colr enumerated colourspaces (I.5.3.3)
CS_SRGB = 16
CS_GREYSCALE = 17
CS_SYCC = 18


@dataclasses.dataclass
class JP2Header:
    width: int
    height: int
    numcomps: int
    bpc: int                      # ihdr BPC field (prec-1 | sign<<7), 255=varies
    bpc_per_comp: Optional[List[int]]  # from bpcc when bpc == 255
    colourspace: Optional[int]
    icc_profile: Optional[bytes]


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def wrap_codestream(codestream: bytes, width: int, height: int,
                    comps: List[Tuple[int, bool]],
                    colourspace: Optional[int] = None) -> bytes:
    """Wrap a raw J2K codestream in a JP2 file.

    `comps` is [(prec, signed), ...]; colourspace defaults to sRGB for 3+
    components, greyscale otherwise.
    """
    if colourspace is None:
        colourspace = CS_SRGB if len(comps) >= 3 else CS_GREYSCALE
    same = all(c == comps[0] for c in comps)
    if same:
        prec, signed = comps[0]
        bpc = (prec - 1) | (0x80 if signed else 0)
    else:
        bpc = 255
    ihdr = struct.pack(">IIHBBBB", height, width, len(comps), bpc,
                       7,  # compression type: jp2c codestream
                       0,  # colourspace unknown flag
                       0)  # no intellectual property
    jp2h = _box(T_IHDR, ihdr)
    if not same:
        jp2h += _box(T_BPCC, bytes((p - 1) | (0x80 if s else 0)
                                   for (p, s) in comps))
    jp2h += _box(T_COLR, struct.pack(">BBBI", 1, 0, 0, colourspace))
    out = bytearray()
    out += JP2_SIGNATURE
    out += _box(T_FTYP, b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    out += _box(T_JP2H, jp2h)
    out += _box(T_JP2C, codestream)
    return bytes(out)


def _iter_boxes(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        length = struct.unpack(">I", data[pos:pos + 4])[0]
        btype = data[pos + 4:pos + 8]
        payload_start = pos + 8
        if length == 1:  # extended length
            if pos + 16 > end:
                return
            length = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            payload_start = pos + 16
        if length == 0:  # box runs to end of file
            yield btype, payload_start, end
            return
        box_end = pos + length
        if box_end > end:
            box_end = end
        yield btype, payload_start, box_end
        pos += length


def is_jp2(data: bytes) -> bool:
    return data[:12] == JP2_SIGNATURE


def read_jp2(data: bytes) -> Tuple[JP2Header, bytes]:
    """Parse a JP2 file: returns (header info, raw codestream bytes)."""
    if not is_jp2(data):
        raise ValueError("not a JP2 file (bad signature box)")
    hdr: Optional[JP2Header] = None
    codestream: Optional[bytes] = None
    for btype, start, end in _iter_boxes(data, 12, len(data)):
        if btype == T_JP2H:
            width = height = numcomps = bpc = 0
            bpcc = None
            colourspace = None
            icc = None
            for ib, istart, iend in _iter_boxes(data, start, end):
                p = data[istart:iend]
                if ib == T_IHDR and len(p) >= 14:
                    height, width, numcomps, bpc = struct.unpack(
                        ">IIHB", p[:11])
                elif ib == T_BPCC:
                    bpcc = list(p)
                elif ib == T_COLR and len(p) >= 3:
                    meth = p[0]
                    if meth == 1 and len(p) >= 7:
                        colourspace = struct.unpack(">I", p[3:7])[0]
                    elif meth == 2:
                        icc = bytes(p[3:])
            hdr = JP2Header(width=width, height=height, numcomps=numcomps,
                            bpc=bpc, bpc_per_comp=bpcc,
                            colourspace=colourspace, icc_profile=icc)
        elif btype == T_JP2C:
            codestream = data[start:end]
            break
    if codestream is None:
        raise ValueError("JP2 file has no jp2c codestream box")
    if hdr is None:
        raise ValueError("JP2 file has no jp2h header box")
    return hdr, codestream


def extract_codestream(data: bytes) -> bytes:
    return read_jp2(data)[1]
