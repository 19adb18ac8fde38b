"""ICC profile application (matrix-shaper class), cross-validated
against littlecms via Pillow (reference: color_apply_icc_profile)."""

import io
import struct

import numpy as np
import pytest

from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.io import icc

PIL_CMS = pytest.importorskip("PIL.ImageCms")
from PIL import Image as PILImage  # noqa: E402


def _s15f16(v):
    return struct.pack(">i", int(round(v * 65536)))


def make_profile(prims, gamma):
    tags = [
        (b"wtpt", b"XYZ " + b"\0" * 4
         + b"".join(_s15f16(v) for v in (0.9642, 1.0, 0.8249))),
        (b"rXYZ", b"XYZ " + b"\0" * 4
         + b"".join(_s15f16(v) for v in prims[0])),
        (b"gXYZ", b"XYZ " + b"\0" * 4
         + b"".join(_s15f16(v) for v in prims[1])),
        (b"bXYZ", b"XYZ " + b"\0" * 4
         + b"".join(_s15f16(v) for v in prims[2])),
        (b"rTRC", b"curv" + b"\0" * 4
         + struct.pack(">IH", 1, int(round(gamma * 256)))),
        (b"gTRC", b"curv" + b"\0" * 4
         + struct.pack(">IH", 1, int(round(gamma * 256)))),
        (b"bTRC", b"curv" + b"\0" * 4
         + struct.pack(">IH", 1, int(round(gamma * 256)))),
        (b"desc", b"desc" + b"\0" * 4 + struct.pack(">I", 5)
         + b"test\0" + b"\0" * 78),
    ]
    ntags = len(tags)
    table_size = 4 + ntags * 12
    off = 128 + table_size
    table = struct.pack(">I", ntags)
    body = b""
    for sig, payload in tags:
        pad = (4 - len(payload) % 4) % 4
        table += struct.pack(">4sII", sig, off, len(payload))
        body += payload + b"\0" * pad
        off += len(payload) + pad
    total = 128 + table_size + len(body)
    hdr = struct.pack(">I", total) + b"lcms"
    hdr += struct.pack(">I", 0x02400000)
    hdr += b"mntr" + b"RGB " + b"XYZ "
    hdr += struct.pack(">HHHHHH", 2024, 1, 1, 0, 0, 0)
    hdr += b"acsp" + b"\0" * 4 + struct.pack(">I", 0)
    hdr += b"\0" * 16 + struct.pack(">I", 0)
    hdr += b"".join(_s15f16(v) for v in (0.9642, 1.0, 0.8249))
    hdr += b"\0" * 4
    hdr += b"\0" * (128 - len(hdr))
    return hdr + table + body


ADOBE_LIKE = [(0.6097, 0.3111, 0.0195), (0.2053, 0.6257, 0.0609),
              (0.1492, 0.0632, 0.7446)]


def _rgb_image(arr):
    return Image(xsiz=arr.shape[1], ysiz=arr.shape[0], components=[
        Component(data=arr[:, :, c].astype(np.int32), prec=8,
                  signed=False, dx=1, dy=1) for c in range(3)])


def _lcms_ref(arr, prof_bytes):
    src = PIL_CMS.ImageCmsProfile(io.BytesIO(prof_bytes))
    dst = PIL_CMS.ImageCmsProfile(PIL_CMS.createProfile("sRGB"))
    x = PIL_CMS.buildTransform(src, dst, "RGB", "RGB", renderingIntent=0)
    return np.asarray(PIL_CMS.applyTransform(
        PILImage.fromarray(arr.astype(np.uint8)), x))


def test_srgb_identity_matches_lcms():
    prof = PIL_CMS.ImageCmsProfile(PIL_CMS.createProfile("sRGB")).tobytes()
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    out = icc.apply_icc(_rgb_image(arr), prof)
    got = np.stack([c.data for c in out.components], -1)
    ref = _lcms_ref(arr, prof)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_wide_gamut_matches_lcms():
    prof = make_profile(ADOBE_LIKE, 2.2)
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    out = icc.apply_icc(_rgb_image(arr), prof)
    got = np.stack([c.data for c in out.components], -1)
    ref = _lcms_ref(arr, prof)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_unsupported_profile_passthrough():
    assert icc.apply_icc(_rgb_image(np.zeros((4, 4, 3))), b"junk") is None


def test_jp2_embedded_icc_applied(tmp_path):
    """End to end: JP2 with embedded meth=2 ICC converts on decompress."""
    from grokimagecompression_tpu.cli import decompress as d_cli
    from grokimagecompression_tpu.codestream import encoder, jp2
    from grokimagecompression_tpu.io.pnm import read_pnm
    prof = make_profile(ADOBE_LIKE, 2.2)
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    img = _rgb_image(arr)
    cs = jp2.wrap_codestream(encoder.encode(img), 40, 32,
                             [(8, False)] * 3, icc_profile=prof)
    hdr, _ = jp2.read_jp2(cs)
    assert hdr.icc_profile == prof
    p = str(tmp_path / "i.jp2")
    open(p, "wb").write(cs)
    out = str(tmp_path / "o.ppm")
    assert d_cli.main(["-i", p, "-o", out]) == 0
    rec = read_pnm(out)
    got = np.stack([c.data for c in rec.components], -1)
    ref = _lcms_ref(arr, prof)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


# ---- LUT-based (A2B0) profiles: mft2 / mAB with tetrahedral CLUT ----

_SRGB_D50 = [[0.4360747, 0.3850649, 0.1430804],
             [0.2225045, 0.7168786, 0.0606169],
             [0.0139322, 0.0971045, 0.7141733]]


def _lut_header(pcs, ntags, body_len, table_size):
    total = 128 + table_size + body_len
    hdr = struct.pack(">I", total) + b"none"
    hdr += struct.pack(">I", 0x02400000)
    hdr += b"mntr" + b"RGB " + pcs
    hdr += struct.pack(">HHHHHH", 2024, 1, 1, 0, 0, 0)
    hdr += b"acsp" + b"\0" * 4 + struct.pack(">I", 0)
    hdr += b"\0" * 16 + struct.pack(">I", 0)
    hdr += b"".join(_s15f16(v) for v in (0.9642, 1.0, 0.8249))
    hdr += b"\0" * 4
    hdr += b"\0" * (128 - len(hdr))
    return hdr


def _assemble(pcs, tags):
    ntags = len(tags)
    table_size = 4 + ntags * 12
    off = 128 + table_size
    table = struct.pack(">I", ntags)
    body = b""
    for sig, payload in tags:
        pad = (4 - len(payload) % 4) % 4
        table += struct.pack(">4sII", sig, off, len(payload))
        body += payload + b"\0" * pad
        off += len(payload) + pad
    return _lut_header(pcs, ntags, len(body), table_size) + table + body


def _clut_xyz(grid):
    """grid^3 CLUT for linear RGB -> XYZ D50 (sRGB primaries)."""
    M = np.array(_SRGB_D50)
    g = np.linspace(0, 1, grid)
    R, G, B = np.meshgrid(g, g, g, indexing="ij")
    rgb = np.stack([R.ravel(), G.ravel(), B.ravel()], axis=0)
    return (M @ rgb).T  # (grid^3, 3) XYZ


def _base_tags():
    return [
        (b"desc", b"desc" + b"\0" * 4 + struct.pack(">I", 5)
         + b"test\0" + b"\0" * 78),
        (b"wtpt", b"XYZ " + b"\0" * 4
         + b"".join(_s15f16(v) for v in (0.9642, 1.0, 0.8249))),
        (b"cprt", b"text" + b"\0" * 4 + b"none\0\0\0"),
    ]


def make_mft2_profile(grid=9):
    t = np.linspace(0, 1, 256)
    eotf = np.where(t <= 0.04045, t / 12.92, ((t + 0.055) / 1.055) ** 2.4)
    intab = np.round(eotf * 65535).astype(">u2").tobytes()
    clut = np.round(np.clip(_clut_xyz(grid), 0, 65535 / 32768.)
                    * 32768).astype(">u2").tobytes()
    outtab = np.round(np.linspace(0, 1, 256) * 65535) \
        .astype(">u2").tobytes()
    mft2 = b"mft2" + b"\0" * 4 + bytes([3, 3, grid, 0])
    for r in range(3):
        for c in range(3):
            mft2 += _s15f16(1.0 if r == c else 0.0)
    mft2 += struct.pack(">HH", 256, 256)
    mft2 += intab * 3 + clut + outtab * 3
    return _assemble(b"XYZ ", [(b"A2B0", mft2)] + _base_tags())


def make_mab_profile(grid=9):
    """lutAtoBType: identity A/B curves, 16-bit CLUT RGB->XYZ, gamma-2.2
    input handled inside the CLUT domain for simplicity."""
    ident = b"curv" + b"\0" * 4 + struct.pack(">I", 0)  # 12 bytes
    clut_vals = np.round(np.clip(_clut_xyz(grid), 0, 65535 / 32768.)
                         * 32768).astype(">u2").tobytes()
    clut = bytes([grid, grid, grid] + [0] * 13) + bytes([2, 0, 0, 0]) \
        + clut_vals
    # layout: header(32) | B curves | CLUT | A curves
    off_b = 32
    bcurves = ident * 3
    off_clut = off_b + len(bcurves)
    off_a = off_clut + len(clut) + ((-len(clut)) % 4)
    acurves = ident * 3
    mab = b"mAB " + b"\0" * 4 + bytes([3, 3, 0, 0])
    mab += struct.pack(">IIIII", off_b, 0, 0, off_clut, off_a)
    mab += bcurves + clut + b"\0" * ((-len(clut)) % 4) + acurves
    return _assemble(b"XYZ ", [(b"A2B0", mab)] + _base_tags())


@pytest.mark.parametrize("builder,tol", [(make_mft2_profile, 1),
                                         (make_mab_profile, 1)])
def test_lut_profile_matches_lcms(builder, tol):
    prof = builder()
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    img = _rgb_image(arr)
    out = icc.apply_icc(img, prof)
    assert out is not None, "LUT profile should be applied"
    ref = _lcms_ref(arr, prof)
    got = np.stack([out.components[i].data for i in range(3)], -1)
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= tol, d.max()


def make_mft2_random_profile(grid=7, seed=9):
    """mft2 with a NONLINEAR (random smooth) CLUT. A linear CLUT is
    interpolated identically by every simplex decomposition, so only a
    nonlinear table can catch tetrahedron-region mixups (the m4/m5
    coefficient swap fixed in round 5)."""
    rng = np.random.default_rng(seed)
    base = np.clip(_clut_xyz(grid), 0, 65535 / 32768.)
    jitter = rng.uniform(-0.08, 0.08, base.shape)
    vals = np.clip(base + jitter, 0.0, 65535 / 32768.)
    clut = np.round(vals * 32768).astype(">u2").tobytes()
    ident = np.round(np.linspace(0, 1, 256) * 65535).astype(">u2").tobytes()
    mft2 = b"mft2" + b"\0" * 4 + bytes([3, 3, grid, 0])
    for r in range(3):
        for c in range(3):
            mft2 += _s15f16(1.0 if r == c else 0.0)
    mft2 += struct.pack(">HH", 256, 256)
    mft2 += ident * 3 + clut + ident * 3
    return _assemble(b"XYZ ", [(b"A2B0", mft2)] + _base_tags())


def test_nonlinear_clut_matches_lcms():
    """Exhaustive-ish sweep with a nonlinear CLUT: hits all 6 tetrahedra
    of every grid cell (would have caught the m4/m5 region swap)."""
    prof = make_mft2_random_profile()
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    out = icc.apply_icc(_rgb_image(arr), prof)
    assert out is not None
    # NOOPTIMIZE: lcms otherwise resamples the chain into its own
    # device-link CLUT, adding grid-resampling error >> 1 LSB
    src = PIL_CMS.ImageCmsProfile(io.BytesIO(prof))
    dst = PIL_CMS.ImageCmsProfile(PIL_CMS.createProfile("sRGB"))
    x = PIL_CMS.buildTransform(
        src, dst, "RGB", "RGB", renderingIntent=0,
        flags=PIL_CMS.Flags.NOOPTIMIZE | PIL_CMS.Flags.NOCACHE)
    ref = np.asarray(PIL_CMS.applyTransform(
        PILImage.fromarray(arr.astype(np.uint8)), x))
    got = np.stack([out.components[i].data for i in range(3)], -1)
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= 1, d.max()


def make_gray_lut_profile(grid=33):
    """1-input mft2 gray -> XYZ profile (inch == 1 LUT path)."""
    t = np.linspace(0, 1, 256)
    gamma = t ** 1.8
    intab = np.round(gamma * 65535).astype(">u2").tobytes()
    g = np.linspace(0, 1, grid)
    wp = np.array([0.9642, 1.0, 0.8249])
    vals = np.clip(g[:, None] * wp[None, :], 0, 65535 / 32768.)
    clut = np.round(vals * 32768).astype(">u2").tobytes()
    outtab = np.round(np.linspace(0, 1, 256) * 65535) \
        .astype(">u2").tobytes()
    mft2 = b"mft2" + b"\0" * 4 + bytes([1, 3, grid, 0])
    for r in range(3):
        for c in range(3):
            mft2 += _s15f16(1.0 if r == c else 0.0)
    mft2 += struct.pack(">HH", 256, 256)
    mft2 += intab + clut + outtab * 3
    hdr_tags = [(b"A2B0", mft2)] + _base_tags()
    ntags = len(hdr_tags)
    table_size = 4 + ntags * 12
    off = 128 + table_size
    table = struct.pack(">I", ntags)
    body = b""
    for sig, payload in hdr_tags:
        pad = (4 - len(payload) % 4) % 4
        table += struct.pack(">4sII", sig, off, len(payload))
        body += payload + b"\0" * pad
        off += len(payload) + pad
    total = 128 + table_size + len(body)
    hdr = struct.pack(">I", total) + b"none"
    hdr += struct.pack(">I", 0x02400000)
    hdr += b"mntr" + b"GRAY" + b"XYZ "
    hdr += struct.pack(">HHHHHH", 2024, 1, 1, 0, 0, 0)
    hdr += b"acsp" + b"\0" * 4 + struct.pack(">I", 0)
    hdr += b"\0" * 16 + struct.pack(">I", 0)
    hdr += b"".join(_s15f16(v) for v in (0.9642, 1.0, 0.8249))
    hdr += b"\0" * 4
    hdr += b"\0" * (128 - len(hdr))
    return hdr + table + body


def test_gray_lut_profile_applied():
    """inch==1 LUT profiles must reach the LUT branch for 1-component
    images (previously dead code behind the 3-component guard)."""
    prof = make_gray_lut_profile()
    arr = np.arange(256, dtype=np.int32).reshape(16, 16)
    img = Image(xsiz=16, ysiz=16, components=[
        Component(data=arr, prec=8, signed=False, dx=1, dy=1)])
    out = icc.apply_icc(img, prof)
    assert out is not None, "gray LUT profile should be applied"
    assert len(out.components) == 3
    got = np.stack([out.components[i].data for i in range(3)], -1)
    # gray ramp through gamma-1.8 -> D50 white axis -> sRGB: R=G=B
    # within rounding, monotone nondecreasing
    assert np.abs(got[..., 0] - got[..., 1]).max() <= 2
    assert np.abs(got[..., 0] - got[..., 2]).max() <= 2
    flat = got[..., 1].ravel()
    assert (np.diff(flat.astype(int)) >= -1).all()
    srgb = flat / 255.0
    lin = np.where(srgb <= 0.04045, srgb / 12.92,
                   ((srgb + 0.055) / 1.055) ** 2.4)
    expect = (np.arange(256) / 255.0) ** 1.8
    assert np.abs(lin - expect).max() < 0.02


def test_lut_profile_jp2_end_to_end(tmp_path):
    from grokimagecompression_tpu.cli import decompress as d_cli
    from grokimagecompression_tpu.codestream import encoder, jp2
    from grokimagecompression_tpu.io.pnm import read_pnm
    prof = make_mft2_profile()
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    img = _rgb_image(arr)
    cs = jp2.wrap_codestream(encoder.encode(img), 32, 24,
                             [(8, False)] * 3, icc_profile=prof)
    p = str(tmp_path / "lut.jp2")
    open(p, "wb").write(cs)
    out = str(tmp_path / "o.ppm")
    assert d_cli.main(["-i", p, "-o", out]) == 0
    rec = read_pnm(out)
    got = np.stack([c.data for c in rec.components], -1)
    ref = _lcms_ref(arr, prof)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
