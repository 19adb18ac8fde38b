"""Post-decode color management (reference: src/bin/common/color.cpp,
grk_decompress post_decode)."""

import os
import subprocess

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams
from grokimagecompression_tpu.io import color

BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
GRK_DECOMPRESS = os.path.abspath(os.path.join(BIN, "grk_decompress"))
HAVE_GROK = os.path.exists(GRK_DECOMPRESS)


def _sycc_ref_pixel(y, cb, cr, prec):
    """Scalar port of the reference sycc_to_rgb (color.cpp:131-160)."""
    offset = 1 << (prec - 1)
    upb = (1 << prec) - 1
    cb -= offset
    cr -= offset
    r = y + int(1.402 * cr)
    g = y - int(0.344 * cb + 0.714 * cr)
    b = y + int(1.772 * cb)
    cl = lambda v: max(0, min(upb, v))
    return cl(r), cl(g), cl(b)


def test_sycc444_matches_scalar_reference():
    rng = np.random.default_rng(0)
    h, w = 13, 17
    planes = [rng.integers(0, 256, (h, w)).astype(np.int32)
              for _ in range(3)]
    img = Image(xsiz=w, ysiz=h, components=[
        Component(data=p, prec=8, signed=False, dx=1, dy=1)
        for p in planes])
    out = color.sycc_to_rgb(img)
    for yy in range(h):
        for xx in range(0, w, 5):
            r, g, b = _sycc_ref_pixel(int(planes[0][yy, xx]),
                                      int(planes[1][yy, xx]),
                                      int(planes[2][yy, xx]), 8)
            assert (out.components[0].data[yy, xx],
                    out.components[1].data[yy, xx],
                    out.components[2].data[yy, xx]) == (r, g, b)


def test_sycc420_upsampling_layout():
    # luma 8x8, chroma 4x4; every 2x2 luma block shares one chroma sample
    h = w = 8
    y = np.full((h, w), 128, np.int32)
    cb = np.arange(16, dtype=np.int32).reshape(4, 4) * 8 + 64
    cr = np.full((4, 4), 128, np.int32)
    img = Image(xsiz=w, ysiz=h, components=[
        Component(data=y, prec=8, signed=False, dx=1, dy=1),
        Component(data=cb, prec=8, signed=False, dx=2, dy=2),
        Component(data=cr, prec=8, signed=False, dx=2, dy=2)])
    out = color.sycc_to_rgb(img)
    b = out.components[2].data  # blue tracks cb
    for by in range(4):
        for bx in range(4):
            blk = b[2 * by:2 * by + 2, 2 * bx:2 * bx + 2]
            assert (blk == blk[0, 0]).all()
    assert out.components[0].data.shape == (h, w)


def test_cmyk_to_rgb():
    img = Image(xsiz=2, ysiz=1, components=[
        Component(data=np.array([[0, 255]], np.int32), prec=8,
                  signed=False, dx=1, dy=1) for _ in range(4)])
    out = color.cmyk_to_rgb(img)
    assert len(out.components) == 3
    # C=M=Y=K=0 -> white (255); C=M=Y=K=1 -> 0
    assert out.components[0].data[0, 0] == 255
    assert out.components[0].data[0, 1] == 0


def test_gray_to_rgb_and_upsample():
    g = np.arange(12, dtype=np.int32).reshape(3, 4)
    img = Image(xsiz=4, ysiz=3, components=[
        Component(data=g, prec=8, signed=False, dx=1, dy=1)])
    rgb = color.gray_to_rgb(img)
    assert len(rgb.components) == 3
    np.testing.assert_array_equal(rgb.components[2].data, g)

    sub = Image(xsiz=4, ysiz=4, components=[
        Component(data=np.arange(16, dtype=np.int32).reshape(4, 4),
                  prec=8, signed=False, dx=1, dy=1),
        Component(data=np.arange(4, dtype=np.int32).reshape(2, 2),
                  prec=8, signed=False, dx=2, dy=2)])
    up = color.upsample(sub)
    assert up.components[1].data.shape == (4, 4)
    np.testing.assert_array_equal(up.components[1].data[:2, :2],
                                  [[0, 0], [0, 0]])
    np.testing.assert_array_equal(up.components[1].data[:2, 2:],
                                  [[1, 1], [1, 1]])
    np.testing.assert_array_equal(up.components[1].data[2:, :2],
                                  [[2, 2], [2, 2]])


def test_apply_color_sycc_heuristic():
    """3 comps with subsampled chroma and no colr box => sYCC inferred
    (reference: grk_decompress.cpp:1585)."""
    y = np.full((4, 4), 200, np.int32)
    c = np.full((2, 2), 128, np.int32)
    img = Image(xsiz=4, ysiz=4, components=[
        Component(data=y, prec=8, signed=False, dx=1, dy=1),
        Component(data=c, prec=8, signed=False, dx=2, dy=2),
        Component(data=c.copy(), prec=8, signed=False, dx=2, dy=2)])
    out = color.apply_color(img)
    # neutral chroma -> r == g == b == y
    np.testing.assert_array_equal(out.components[0].data, y)
    np.testing.assert_array_equal(out.components[1].data, y)
    assert out.components[0].dx == 1


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
@pytest.mark.parametrize("sub", [(2, 2), (2, 1)])
def test_sycc_interop_with_reference(tmp_path, sub):
    """Encode a chroma-subsampled YCC image; our decode+color must match
    the reference decoder's PPM output exactly."""
    from grokimagecompression_tpu.io.pnm import read_pnm
    dx, dy = sub
    w, h = 32, 24
    rng = np.random.default_rng(7)
    comps = [
        Component(data=rng.integers(16, 240, (h, w)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1),
        Component(data=rng.integers(64, 192,
                                    ((h + dy - 1) // dy,
                                     (w + dx - 1) // dx)).astype(np.int32),
                  prec=8, signed=False, dx=dx, dy=dy),
        Component(data=rng.integers(64, 192,
                                    ((h + dy - 1) // dy,
                                     (w + dx - 1) // dx)).astype(np.int32),
                  prec=8, signed=False, dx=dx, dy=dy),
    ]
    img = Image(xsiz=w, ysiz=h, components=comps)
    cs = encoder.encode(img, EncoderParams(numresolutions=3, mct=0))
    j2k = tmp_path / "ycc.j2k"
    j2k.write_bytes(cs)
    ref_out = tmp_path / "ref.ppm"
    r = subprocess.run([GRK_DECOMPRESS, "-i", str(j2k), "-o", str(ref_out)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:400]
    ref_img = read_pnm(str(ref_out))

    from grokimagecompression_tpu.codestream import decoder
    ours = decoder.decode(cs)
    ours = color.apply_color(ours)
    assert len(ours.components) == 3
    for c in range(3):
        np.testing.assert_array_equal(ours.components[c].data,
                                      ref_img.components[c].data)


def test_cielab_jp2_to_srgb(tmp_path):
    """JP2 with colr enumcs 14 (CIELab): decompress converts to 16-bit
    sRGB via D50 Lab -> Bradford -> sRGB (reference: color.cpp
    color_cielab_to_rgb:716 via lcms). Neutral L*=50 must land on
    mid-gray; encoded sRGB primaries must roundtrip."""
    import numpy as np
    from grokimagecompression_tpu.cli import decompress
    from grokimagecompression_tpu.codestream import encoder, jp2
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams
    from grokimagecompression_tpu.io import color as colormod
    from grokimagecompression_tpu.io.tiff import read_tiff

    # default Lab space code values for L=50, a=0, b=0 at 8 bits
    img = Image(xsiz=4, ysiz=4, components=[
        Component(data=np.full((4, 4), v, np.int32), prec=8,
                  signed=False, dx=1, dy=1) for v in (128, 128, 96)])
    cs = encoder.encode(img, EncoderParams(mct=0), device=False)
    boxed = jp2.wrap_codestream(cs, 4, 4, [(8, False)] * 3,
                                colourspace=14)
    src = tmp_path / "lab.jp2"
    src.write_bytes(boxed)
    out = tmp_path / "out.tif"
    assert decompress.main(["-i", str(src), "-o", str(out)]) == 0
    rec = read_tiff(str(out))
    got = [int(c.data[0, 0]) >> 8 for c in rec.components]
    assert got == [119, 119, 119], got

    # direct conversion API: gray stays gray at every L level
    for lq, want in ((0, 0), (255, 255)):
        im2 = Image(xsiz=1, ysiz=1, components=[
            Component(data=np.array([[q]], np.int32), prec=8,
                      signed=False, dx=1, dy=1)
            for q in (lq, 128, 96)])
        o = colormod.cielab_to_rgb(im2)
        assert [int(c.data[0, 0]) >> 8 for c in o.components] == [want] * 3
