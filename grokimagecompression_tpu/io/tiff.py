"""TIFF reader/writer, pure Python (no libtiff), the analog of the
reference TIFF codec (reference: src/bin/jp2/TIFFFormat.cpp).

Read: baseline uncompressed (compression 1) and PackBits (32773),
little/big endian, 8/16-bit, gray/RGB(A), chunky or planar config,
strips or a single tile-less image. Write: uncompressed, chunky,
little-endian, one strip per image.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from ..core.image import Component, Image

# tag ids
_W, _H = 256, 257
_BPS, _COMPRESSION, _PHOTO = 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR, _SAMPLE_FMT = 284, 339

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def _read_ifd(data: bytes, off: int, e: str) -> Dict[int, List[int]]:
    count = struct.unpack(e + "H", data[off:off + 2])[0]
    tags: Dict[int, List[int]] = {}
    for i in range(count):
        p = off + 2 + i * 12
        tag, typ, n = struct.unpack(e + "HHI", data[p:p + 8])
        size = _TYPE_SIZE.get(typ, 1) * n
        if size <= 4:
            payload = data[p + 8:p + 8 + size]
        else:
            voff = struct.unpack(e + "I", data[p + 8:p + 12])[0]
            payload = data[voff:voff + size]
        if typ in (1, 6, 7, 2):
            vals = list(payload)
        elif typ in (3, 8):
            vals = list(struct.unpack(e + f"{n}H", payload[:2 * n]))
        elif typ in (4, 9):
            vals = list(struct.unpack(e + f"{n}I", payload[:4 * n]))
        elif typ == 5:
            raw = struct.unpack(e + f"{2 * n}I", payload[:8 * n])
            vals = [raw[2 * k] // max(1, raw[2 * k + 1]) for k in range(n)]
        else:
            vals = []
        tags[tag] = vals
    return tags


def _packbits(data: bytes, want: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < want and pos < len(data):
        nv = data[pos]
        n = nv - 256 if nv > 127 else nv
        pos += 1
        if n >= 0:
            out += data[pos:pos + n + 1]
            pos += n + 1
        elif n != -128:
            out += data[pos:pos + 1] * (1 - n)
            pos += 1
    return bytes(out[:want])


def read_tiff(path: str) -> Image:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF file")
    magic, ifd_off = struct.unpack(e + "HI", data[2:8])
    if magic != 42:
        raise ValueError("not a TIFF file")
    tags = _read_ifd(data, ifd_off, e)
    w = tags[_W][0]
    h = tags[_H][0]
    spp = tags.get(_SPP, [1])[0]
    bps_list = tags.get(_BPS, [1])
    bps = bps_list[0]
    compression = tags.get(_COMPRESSION, [1])[0]
    planar = tags.get(_PLANAR, [1])[0]
    sample_fmt = tags.get(_SAMPLE_FMT, [1])[0]
    signed = sample_fmt == 2
    if compression not in (1, 8, 32773, 32946):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if bps not in (1, 8, 16):
        raise ValueError(f"unsupported TIFF bit depth {bps}")
    offs = tags[_STRIP_OFF]
    cnts = tags.get(_STRIP_CNT, [len(data) - offs[0]])
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0] or h

    def strip_bytes() -> bytes:
        buf = bytearray()
        for i, o in enumerate(offs):
            chunk = data[o:o + cnts[i]]
            if compression in (8, 32946):
                import zlib
                chunk = zlib.decompress(chunk)
            elif compression == 32773:
                rows = min(rows_per_strip, h - i * rows_per_strip)
                if planar == 2:
                    want = ((w * bps + 7) // 8) * rows
                else:
                    want = ((w * spp * bps + 7) // 8) * rows
                chunk = _packbits(chunk, want)
            buf += chunk
        return bytes(buf)

    raw = strip_bytes()
    if bps == 1:
        rowb = (w + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(raw, np.uint8)[:h * rowb].reshape(h, rowb),
            axis=1)[:, :w]
        photo = tags.get(_PHOTO, [1])[0]
        vals = (1 - bits) if photo == 0 else bits
        return Image(xsiz=w, ysiz=h, components=[
            Component(data=vals.astype(np.int32), prec=1, signed=False,
                      dx=1, dy=1)])
    if bps == 8:
        dt = np.dtype(np.int8 if signed else np.uint8)
    else:
        dt = np.dtype(np.int16 if signed else np.uint16).newbyteorder(e)
    a = np.frombuffer(raw, dt)
    if planar == 2:
        need = w * h * spp
        a = a[:need].reshape(spp, h, w)
        planes = [a[c] for c in range(spp)]
    else:
        need = w * h * spp
        a = a[:need].reshape(h, w, spp)
        planes = [a[:, :, c] for c in range(spp)]
    comps = [Component(data=p.astype(np.int32),
                       prec=bps_list[min(c, len(bps_list) - 1)],
                       signed=signed, dx=1, dy=1)
             for c, p in enumerate(planes)]
    return Image(xsiz=w, ysiz=h, components=comps)


def _tag(e: str, tag: int, typ: int, vals: List[int],
         heap: bytearray, heap_base: int) -> bytes:
    n = len(vals)
    fmt = {3: "H", 4: "I", 1: "B"}[typ]
    payload = struct.pack(e + f"{n}{fmt}", *vals)
    if len(payload) <= 4:
        payload = payload + b"\0" * (4 - len(payload))
        return struct.pack(e + "HHI", tag, typ, n) + payload
    off = heap_base + len(heap)
    heap.extend(payload)
    if len(heap) % 2:
        heap.append(0)
    return struct.pack(e + "HHII", tag, typ, n, off)


def write_tiff(path: str, image: Image, compression: int = 1) -> None:
    """`compression`: 1 = none (default), 8 = zip/deflate (the reference's
    -c 8 COMPRESSION_ADOBE_DEFLATE output option)."""
    e = "<"
    n = len(image.components)
    w, h = image.xsiz, image.ysiz
    prec = max(c.prec for c in image.components)
    bps = 16 if prec > 8 else 8
    signed = any(c.signed for c in image.components)
    planes = []
    for c in image.components:
        a = np.asarray(c.data)
        planes.append(a)
    stack = np.stack(planes, axis=-1)
    if bps == 8:
        body = stack.astype(np.int8 if signed else np.uint8).tobytes()
    else:
        body = stack.astype(
            np.dtype(np.int16 if signed else np.uint16).newbyteorder(e)
        ).tobytes()
    if compression == 8:
        import zlib
        body = zlib.compress(body, 6)
    elif compression != 1:
        raise ValueError(f"unsupported TIFF write compression {compression}")
    photo = 2 if n >= 3 else 1
    ntags = 10
    ifd_off = 8
    strip_off = ifd_off + 2 + ntags * 12 + 4
    heap_base = strip_off  # heap sits right after the IFD, before pixels
    # two passes: first sizes the value heap, second emits the final
    # pixel-data offset
    def build(pixel_off: int) -> Tuple[bytes, bytearray]:
        hp = bytearray()
        ent = b""
        ent += _tag(e, _W, 4, [w], hp, heap_base)
        ent += _tag(e, _H, 4, [h], hp, heap_base)
        ent += _tag(e, _BPS, 3, [bps] * n, hp, heap_base)
        ent += _tag(e, _COMPRESSION, 3, [compression], hp, heap_base)
        ent += _tag(e, _PHOTO, 3, [photo], hp, heap_base)
        ent += _tag(e, _STRIP_OFF, 4, [pixel_off], hp, heap_base)
        ent += _tag(e, _SPP, 3, [n], hp, heap_base)
        ent += _tag(e, _ROWS_PER_STRIP, 4, [h], hp, heap_base)
        ent += _tag(e, _STRIP_CNT, 4, [len(body)], hp, heap_base)
        ent += _tag(e, _SAMPLE_FMT, 3, [2 if signed else 1] * n, hp,
                    heap_base)
        return ent, hp
    _, hp0 = build(0)
    pixel_off = heap_base + len(hp0)
    entries_b, hp = build(pixel_off)
    with open(path, "wb") as f:
        f.write(struct.pack(e + "2sHI", b"II", 42, ifd_off))
        f.write(struct.pack(e + "H", ntags))
        f.write(entries_b)
        f.write(struct.pack(e + "I", 0))  # next IFD
        f.write(bytes(hp))
        f.write(body)
