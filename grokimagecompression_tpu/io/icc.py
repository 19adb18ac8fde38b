"""Minimal ICC profile application — the lcms-free analog of the
reference's color_apply_icc_profile (reference: src/bin/common/
color.cpp:423, which hands embedded profiles to liblcms2).

Scope: the dominant profile class — matrix-shaper RGB (rXYZ/gXYZ/bXYZ
columns + per-channel tone curves) and gray (kTRC) profiles, v2 or v4,
converted to sRGB D65 with Bradford chromatic adaptation from the PCS
D50. Lookup-table (A2B) profiles are left untouched (the profile stays
embedded for downstream tools).
"""

from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np

from ..core.image import Component, Image

# sRGB D65 XYZ -> linear sRGB
_XYZ_TO_SRGB = np.array([
    [3.2406, -1.5372, -0.4986],
    [-0.9689, 1.8758, 0.0415],
    [0.0557, -0.2040, 1.0570]])

# Bradford adaptation D50 -> D65
_BRADFORD_D50_D65 = np.array([
    [0.9555766, -0.0230393, 0.0631636],
    [-0.0282895, 1.0099416, 0.0210077],
    [0.0122982, -0.0204830, 1.3299098]])


def _s15f16(b: bytes) -> float:
    v = struct.unpack(">i", b)[0]
    return v / 65536.0


def parse_profile(data: bytes) -> Optional[dict]:
    """Parse the tag table; returns dict with 'matrix' (3x3 RGB->XYZ) and
    'curves' (list of callables) for matrix-shaper profiles, or
    {'gray': curve} for monochrome, else None."""
    if len(data) < 132:
        return None
    ntags = struct.unpack(">I", data[128:132])[0]
    if ntags > 1024:
        return None
    tags = {}
    for i in range(ntags):
        off = 132 + i * 12
        if off + 12 > len(data):
            return None
        sig, toff, tsize = struct.unpack(">4sII", data[off:off + 12])
        tags[sig] = (toff, tsize)

    def read_xyz(sig):
        if sig not in tags:
            return None
        toff, tsize = tags[sig]
        if tsize < 20 or data[toff:toff + 4] != b"XYZ ":
            return None
        return [_s15f16(data[toff + 8 + 4 * k:toff + 12 + 4 * k])
                for k in range(3)]

    def read_curve(sig):
        if sig not in tags:
            return None
        toff, tsize = tags[sig]
        typ = data[toff:toff + 4]
        if typ == b"curv":
            n = struct.unpack(">I", data[toff + 8:toff + 12])[0]
            if n == 0:
                return lambda x: x           # identity
            if n == 1:
                g = struct.unpack(">H", data[toff + 12:toff + 14])[0] / 256.0
                return lambda x, g=g: np.power(np.clip(x, 0, 1), g)
            pts = np.frombuffer(data[toff + 12:toff + 12 + 2 * n],
                                dtype=">u2").astype(np.float64) / 65535.0
            return lambda x, pts=pts: np.interp(
                np.clip(x, 0, 1), np.linspace(0, 1, len(pts)), pts)
        if typ == b"para":
            fn = struct.unpack(">H", data[toff + 8:toff + 10])[0]
            nparam = {0: 1, 1: 3, 2: 4, 3: 5, 4: 7}.get(fn)
            if nparam is None:
                return None
            ps = [_s15f16(data[toff + 12 + 4 * k:toff + 16 + 4 * k])
                  for k in range(nparam)]

            def para(x, fn=fn, ps=ps):
                x = np.clip(x, 0, 1)
                g = ps[0]
                if fn == 0:
                    return np.power(x, g)
                if fn == 1:
                    a, b = ps[1], ps[2]
                    return np.where(x >= -b / a,
                                    np.power(np.maximum(a * x + b, 0), g), 0)
                if fn == 2:
                    a, b, c = ps[1], ps[2], ps[3]
                    return np.where(x >= -b / a,
                                    np.power(np.maximum(a * x + b, 0), g)
                                    + c, c)
                if fn == 3:
                    a, b, c, d = ps[1], ps[2], ps[3], ps[4]
                    return np.where(x >= d,
                                    np.power(np.maximum(a * x + b, 0), g),
                                    c * x)
                a, b, c, d, e, f = ps[1], ps[2], ps[3], ps[4], ps[5], ps[6]
                return np.where(x >= d,
                                np.power(np.maximum(a * x + b, 0), g) + e,
                                c * x + f)
            return para
        return None

    k_curve = read_curve(b"kTRC")
    if k_curve is not None:
        return {"gray": k_curve}
    cols = [read_xyz(b"rXYZ"), read_xyz(b"gXYZ"), read_xyz(b"bXYZ")]
    curves = [read_curve(b"rTRC"), read_curve(b"gTRC"), read_curve(b"bTRC")]
    if any(c is None for c in cols) or any(c is None for c in curves):
        return None
    matrix = np.array(cols).T  # columns are the RGB primaries in XYZ
    return {"matrix": matrix, "curves": curves}


def _srgb_encode(lin: np.ndarray) -> np.ndarray:
    lin = np.clip(lin, 0.0, 1.0)
    return np.where(lin <= 0.0031308, 12.92 * lin,
                    1.055 * np.power(lin, 1 / 2.4) - 0.055)


def apply_icc(image: Image, profile: bytes) -> Optional[Image]:
    """Convert via an embedded matrix-shaper ICC profile to sRGB.
    Returns a new Image, or None when the profile class is unsupported
    (caller keeps the original samples + embedded profile)."""
    info = parse_profile(profile)
    if info is None:
        return None
    if "gray" in info:
        if len(image.components) < 1:
            return None
        c0 = image.components[0]
        mx = (1 << c0.prec) - 1
        lin = info["gray"](c0.data.astype(np.float64) / mx)
        out = np.clip(np.round(_srgb_encode(lin) * mx), 0,
                      mx).astype(np.int32)
        comps = [Component(data=out, prec=c0.prec, signed=False,
                           dx=c0.dx, dy=c0.dy)]
        comps += image.components[1:]
        return Image(x0=image.x0, y0=image.y0, xsiz=image.xsiz,
                     ysiz=image.ysiz, components=comps)
    if len(image.components) < 3:
        return None
    cs = image.components[:3]
    if not all(c.dx == cs[0].dx and c.dy == cs[0].dy for c in cs):
        return None
    mx = (1 << cs[0].prec) - 1
    lin = np.stack([info["curves"][i](cs[i].data.astype(np.float64) / mx)
                    for i in range(3)], axis=0)
    shape = lin.shape[1:]
    xyz_d50 = info["matrix"] @ lin.reshape(3, -1)
    xyz_d65 = _BRADFORD_D50_D65 @ xyz_d50
    srgb_lin = _XYZ_TO_SRGB @ xyz_d65
    srgb = _srgb_encode(srgb_lin.reshape(3, *shape))
    comps = [Component(data=np.clip(np.round(srgb[i] * mx), 0,
                                    mx).astype(np.int32),
                       prec=cs[0].prec, signed=False, dx=cs[0].dx,
                       dy=cs[0].dy) for i in range(3)]
    comps += image.components[3:]
    return Image(x0=image.x0, y0=image.y0, xsiz=image.xsiz,
                 ysiz=image.ysiz, components=comps)
