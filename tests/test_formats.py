"""Image format codecs: PNG, TIFF, TGA, RAW (reference: src/bin/jp2/
{PNG,TIFF,TGA,RAW}Format.cpp)."""

import struct
import zlib

import numpy as np
import pytest

from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.io import png, raw, tga, tiff


def _img(w, h, ncomps=3, prec=8, signed=False, seed=0):
    rng = np.random.default_rng(seed)
    lo, hi = (-(1 << (prec - 1)), (1 << (prec - 1))) if signed else \
        (0, 1 << prec)
    comps = [Component(data=rng.integers(lo, hi, (h, w)).astype(np.int32),
                       prec=prec, signed=signed, dx=1, dy=1)
             for _ in range(ncomps)]
    return Image(xsiz=w, ysiz=h, components=comps)


def _assert_images_equal(a, b):
    assert a.xsiz == b.xsiz and a.ysiz == b.ysiz
    assert len(a.components) == len(b.components)
    for ca, cb in zip(a.components, b.components):
        np.testing.assert_array_equal(ca.data, cb.data)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ncomps", [1, 2, 3, 4])
@pytest.mark.parametrize("prec", [8, 16])
def test_png_roundtrip(tmp_path, ncomps, prec):
    img = _img(37, 23, ncomps, prec, seed=ncomps * prec)
    p = str(tmp_path / "t.png")
    png.write_png(p, img)
    out = png.read_png(p)
    _assert_images_equal(img, out)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_filters(tmp_path, filter_type):
    img = _img(64, 48, 3, 8, seed=filter_type)
    p = str(tmp_path / "f.png")
    png.write_png(p, img, filter_type=filter_type)
    out = png.read_png(p)
    _assert_images_equal(img, out)


def test_png_palette(tmp_path):
    # hand-build a 4x2 palette image
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = bytes([0, 0, 1, 2, 3, 2, 1, 0])
    rows = b"".join(b"\x00" + idx[i * 4:(i + 1) * 4] for i in range(2))
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += png._chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
    out += png._chunk(b"PLTE", pal)
    out += png._chunk(b"IDAT", zlib.compress(rows))
    out += png._chunk(b"IEND", b"")
    p = "/tmp/pal_test.png"
    open(p, "wb").write(bytes(out))
    img = png.read_png(p)
    assert len(img.components) == 3
    assert img.components[0].data[0, 0] == 255   # entry 0 = red
    assert img.components[1].data[0, 2] == 255   # entry 1 = green
    assert img.components[2].data[0, 3] == 255   # entry 2 = blue
    assert img.components[0].data[1, 0] == 10    # entry 3


def test_png_sub_byte_gray(tmp_path):
    # 4-bit grayscale, 5 pixels wide (tests bit unpacking + padding)
    vals = [[1, 15, 7, 2, 9], [0, 3, 8, 12, 5]]
    packed = bytes([0x1F, 0x72, 0x90, 0x03, 0x8C, 0x50])
    rows = b"\x00" + packed[:3] + b"\x00" + packed[3:]
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += png._chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 2, 4, 0, 0, 0, 0))
    out += png._chunk(b"IDAT", zlib.compress(rows))
    out += png._chunk(b"IEND", b"")
    p = str(tmp_path / "g4.png")
    open(p, "wb").write(bytes(out))
    img = png.read_png(p)
    assert img.components[0].prec == 4
    np.testing.assert_array_equal(img.components[0].data, vals)


def test_png_adam7(tmp_path):
    # build an interlaced PNG by hand from a known 8x8 gray image
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 256, (8, 8)).astype(np.int32)
    passes = []
    for (x0, y0, dx, dy) in png._ADAM7:
        sub = ref[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for r in sub:
            passes.append(b"\x00" + bytes(r.astype(np.uint8)))
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += png._chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1))
    out += png._chunk(b"IDAT", zlib.compress(b"".join(passes)))
    out += png._chunk(b"IEND", b"")
    p = str(tmp_path / "i.png")
    open(p, "wb").write(bytes(out))
    img = png.read_png(p)
    np.testing.assert_array_equal(img.components[0].data, ref)


# ---------------------------------------------------------------------------
# TIFF
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ncomps,prec,signed", [
    (1, 8, False), (3, 8, False), (1, 16, False), (3, 16, False),
    (1, 16, True), (4, 8, False),
])
def test_tiff_roundtrip(tmp_path, ncomps, prec, signed):
    img = _img(29, 17, ncomps, prec, signed, seed=ncomps + prec)
    p = str(tmp_path / "t.tif")
    tiff.write_tiff(p, img)
    out = tiff.read_tiff(p)
    _assert_images_equal(img, out)


def test_tiff_big_endian_strips(tmp_path):
    # hand-build: big-endian, 2 strips, 16-bit gray 3x4
    vals = (np.arange(12).reshape(4, 3) * 1000).astype(">u2")
    strip1, strip2 = vals[:2].tobytes(), vals[2:].tobytes()
    # header: II/MM + 42 + ifd at 8
    ntags = 8
    ifd = struct.pack(">H", ntags)
    def tag(t, typ, n, v):
        return struct.pack(">HHII", t, typ, n, v)
    # offsets/counts arrays need a heap; strip offsets at heap
    heap_base = 8 + 2 + ntags * 12 + 4
    off1 = heap_base + 16
    off2 = off1 + len(strip1)
    heap = struct.pack(">II", off1, off2) + struct.pack(">II", len(strip1),
                                                        len(strip2))
    ifd += tag(256, 4, 1, 3) + tag(257, 4, 1, 4)
    ifd += struct.pack(">HHI", 258, 3, 1) + struct.pack(">HH", 16, 0)
    ifd += tag(259, 3, 1, 1 << 16)  # compression=1 (short in upper bytes)
    ifd += tag(262, 3, 1, 1 << 16)
    ifd += tag(273, 4, 2, heap_base)
    ifd += tag(278, 4, 1, 2)
    ifd += tag(279, 4, 2, heap_base + 8)
    data = struct.pack(">2sHI", b"MM", 42, 8) + ifd + \
        struct.pack(">I", 0) + heap + strip1 + strip2
    p = str(tmp_path / "be.tif")
    open(p, "wb").write(data)
    img = tiff.read_tiff(p)
    np.testing.assert_array_equal(img.components[0].data,
                                  vals.astype(np.int32))


def test_tiff_packbits(tmp_path):
    # PackBits: literal run [3 bytes], repeat run (5x 7)
    row = bytes([2, 10, 20, 30]) + bytes([256 - 4, 7])
    decoded = tiff._packbits(row, 8)
    assert decoded == bytes([10, 20, 30, 7, 7, 7, 7, 7])


# ---------------------------------------------------------------------------
# TGA
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ncomps", [1, 3, 4])
def test_tga_roundtrip(tmp_path, ncomps):
    img = _img(31, 19, ncomps, 8, seed=ncomps)
    p = str(tmp_path / "t.tga")
    tga.write_tga(p, img)
    out = tga.read_tga(p)
    _assert_images_equal(img, out)


def test_tga_rle(tmp_path):
    # hand-build RLE gray: 4x1, run of 3 x 200 then literal 50
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 11, 0, 0, 0, 0, 0, 4, 1, 8,
                      0x20)
    body = bytes([0x82, 200, 0x00, 50])
    p = str(tmp_path / "r.tga")
    open(p, "wb").write(hdr + body)
    img = tga.read_tga(p)
    np.testing.assert_array_equal(img.components[0].data, [[200, 200, 200,
                                                            50]])


# ---------------------------------------------------------------------------
# RAW
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("prec,signed,be", [
    (8, False, True), (8, True, False), (12, False, True),
    (16, True, False),
])
def test_raw_roundtrip(tmp_path, prec, signed, be):
    img = _img(21, 13, 3, prec, signed, seed=prec)
    ext = "raw" if be else "rawl"
    p = str(tmp_path / f"t.{ext}")
    raw.write_raw(p, img, big_endian=be)
    desc = raw.RawDesc(width=21, height=13, ncomps=3, prec=prec,
                       signed=signed, subsampling=[(1, 1)] * 3)
    out = raw.read_raw(p, desc, big_endian=be)
    _assert_images_equal(img, out)


def test_raw_desc_parse():
    d = raw.RawDesc.parse("640,480,3,12,s@1x1:2x2:2x2")
    assert (d.width, d.height, d.ncomps, d.prec, d.signed) == \
        (640, 480, 3, 12, True)
    assert d.subsampling == [(1, 1), (2, 2), (2, 2)]


def test_raw_subsampled(tmp_path):
    rng = np.random.default_rng(3)
    comps = [
        Component(data=rng.integers(0, 256, (10, 16)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1),
        Component(data=rng.integers(0, 256, (5, 8)).astype(np.int32),
                  prec=8, signed=False, dx=2, dy=2),
        Component(data=rng.integers(0, 256, (5, 8)).astype(np.int32),
                  prec=8, signed=False, dx=2, dy=2),
    ]
    img = Image(xsiz=16, ysiz=10, components=comps)
    p = "/tmp/sub_test.raw"
    raw.write_raw(p, img)
    d = raw.RawDesc.parse("16,10,3,8,u@1x1:2x2:2x2")
    out = raw.read_raw(p, d)
    _assert_images_equal(img, out)


# ---------------------------------------------------------------------------
# End-to-end: format -> codec -> format via the CLI layer
# ---------------------------------------------------------------------------

PIL = pytest.importorskip("PIL.Image", reason="PIL not installed")


def test_formats_cross_validated_with_pil(tmp_path):
    """Independent oracle: our writers read by PIL, PIL's files read by
    us (PIL's PNGs use optimized per-row filters, exercising all five
    unfilters)."""
    img = _img(30, 20, 3, 8, seed=1)
    ours = np.stack([c.data for c in img.components], -1)
    p = str(tmp_path / "x.png")
    png.write_png(p, img)
    np.testing.assert_array_equal(np.array(PIL.open(p)), ours)
    q = str(tmp_path / "y.png")
    PIL.fromarray(ours.astype(np.uint8)).save(q, optimize=True)
    back = png.read_png(q)
    np.testing.assert_array_equal(
        np.stack([c.data for c in back.components], -1), ours)
    t = str(tmp_path / "x.tif")
    tiff.write_tiff(t, img)
    np.testing.assert_array_equal(np.array(PIL.open(t)), ours)
    t2 = str(tmp_path / "y.tif")
    PIL.fromarray(ours.astype(np.uint8)).save(t2)
    back = tiff.read_tiff(t2)
    np.testing.assert_array_equal(
        np.stack([c.data for c in back.components], -1), ours)
    g = str(tmp_path / "y.tga")
    PIL.fromarray(ours.astype(np.uint8)).save(g)
    back = tga.read_tga(g)
    np.testing.assert_array_equal(
        np.stack([c.data for c in back.components], -1), ours)


def test_png_through_codec(tmp_path):
    from grokimagecompression_tpu.codestream import decoder, encoder
    img = _img(40, 30, 3, 8, seed=9)
    p_in = str(tmp_path / "in.png")
    png.write_png(p_in, img)
    loaded = png.read_png(p_in)
    cs = encoder.encode(loaded)
    out = decoder.decode(cs)
    _assert_images_equal(loaded, out)


def test_jp2_res_xml_boxes(tmp_path):
    """JP2 res (capture/display resolution), xml and uuid boxes
    (reference: jp2.cpp jp2_read_res:804, jp2_read_xml, jp2_read_uuid)."""
    from grokimagecompression_tpu.codestream import encoder, jp2
    img = _img(32, 24, 1, 8, seed=2)
    cs = encoder.encode(img)
    wrapped = jp2.wrap_codestream(
        cs, 32, 24, [(8, False)],
        capture_resolution=(2834.6, 2834.6),
        display_resolution=(1000.0, 500.0),
        xml=b"<meta>hello</meta>")
    hdr, inner = jp2.read_jp2(wrapped)
    assert inner == cs
    assert abs(hdr.capture_resolution[0] - 2834.6) < 0.5
    assert abs(hdr.display_resolution[0] - 1000.0) < 0.5
    assert abs(hdr.display_resolution[1] - 500.0) < 0.5
    assert hdr.xml == [b"<meta>hello</meta>"]


def test_jp2_res_reference_interop(tmp_path):
    """The reference reads our resolution boxes (and vice versa)."""
    import os
    import subprocess
    BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
    dump = os.path.abspath(os.path.join(BIN, "grk_dump"))
    if not os.path.exists(dump):
        pytest.skip("reference not built")
    from grokimagecompression_tpu.codestream import encoder, jp2
    img = _img(32, 24, 1, 8, seed=3)
    cs = encoder.encode(img)
    wrapped = jp2.wrap_codestream(cs, 32, 24, [(8, False)],
                                  capture_resolution=(3000.0, 3000.0))
    p = str(tmp_path / "r.jp2")
    open(p, "wb").write(wrapped)
    r = subprocess.run([dump, "-i", p], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[:300]


def test_tiff_deflate_roundtrip(tmp_path):
    import numpy as np
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.io import tiff

    rng = np.random.default_rng(13)
    d = rng.integers(0, 256, (40, 56, 3)).astype(np.int32)
    img = Image(xsiz=56, ysiz=40, components=[
        Component(data=d[:, :, c], prec=8, signed=False, dx=1, dy=1)
        for c in range(3)])
    f = tmp_path / "z.tif"
    tiff.write_tiff(str(f), img, compression=8)
    back = tiff.read_tiff(str(f))
    for c in range(3):
        assert np.array_equal(back.components[c].data, d[:, :, c])
    # 16-bit too
    d16 = rng.integers(0, 4096, (25, 31)).astype(np.int32)
    img16 = Image(xsiz=31, ysiz=25, components=[
        Component(data=d16, prec=12, signed=False, dx=1, dy=1)])
    f16 = tmp_path / "z16.tif"
    tiff.write_tiff(str(f16), img16, compression=8)
    assert np.array_equal(tiff.read_tiff(str(f16)).components[0].data, d16)


def test_rgba_jp2_cdef_roundtrip(tmp_path):
    """RGBA PNG -> JP2 with a cdef box marking the opacity channel ->
    decode restores all four channels with the alpha flag set
    (reference: jp2.cpp jp2_write_cdef/jp2_read_cdef)."""
    import numpy as np
    from grokimagecompression_tpu.cli import compress, decompress
    from grokimagecompression_tpu.codestream import jp2
    from grokimagecompression_tpu.io import png

    rng = np.random.default_rng(17)
    a = rng.integers(0, 256, (40, 56, 4), dtype=np.uint8)
    src = tmp_path / "in.png"
    try:
        from PIL import Image as P
        P.fromarray(a, "RGBA").save(str(src))
    except ImportError:
        import pytest
        pytest.skip("Pillow unavailable")
    img = png.read_png(str(src))
    assert [c.alpha for c in img.components] == [False, False, False, True]
    out = tmp_path / "x.jp2"
    assert compress.main(["-i", str(src), "-o", str(out)]) == 0
    hdr, _ = jp2.read_jp2(out.read_bytes())
    assert (3, 1, 0) in hdr.channel_defs
    dec = tmp_path / "out.png"
    assert decompress.main(["-i", str(out), "-o", str(dec)]) == 0
    b = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(str(dec)))
    assert np.array_equal(a, b)


def test_palette_jp2_pclr_cmap(tmp_path):
    """JP2 pclr/cmap: a single index component expands through the
    palette into RGB on decode (reference: jp2.cpp jp2_apply_pclr:307)."""
    import struct

    import numpy as np
    from grokimagecompression_tpu.cli import decompress
    from grokimagecompression_tpu.codestream import encoder, jp2
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams
    from grokimagecompression_tpu.io.pnm import read_pnm

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                        [255, 255, 0]], np.int32)
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 4, (16, 16)).astype(np.int32)
    img = Image(xsiz=16, ysiz=16, components=[
        Component(data=idx, prec=8, signed=False, dx=1, dy=1)])
    cs = encoder.encode(img, EncoderParams(), device=False)

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    ihdr = struct.pack(">IIHBBBB", 16, 16, 1, 7, 7, 0, 0)
    pclr = struct.pack(">HB", 4, 3) + bytes([7, 7, 7])
    for e in range(4):
        for k in range(3):
            pclr += bytes([int(palette[e, k])])
    cmap = b"".join(struct.pack(">HBB", 0, 1, k) for k in range(3))
    colr = struct.pack(">BBBI", 1, 0, 0, 16)
    jp2h = box(b"ihdr", ihdr) + box(b"colr", colr) \
        + box(b"pclr", pclr) + box(b"cmap", cmap)
    data = (b"\x00\x00\x00\x0cjP  \r\n\x87\n"
            + box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
            + box(b"jp2h", jp2h) + box(b"jp2c", cs))
    src = tmp_path / "pal.jp2"
    src.write_bytes(data)

    hdr, _ = jp2.read_jp2(data)
    assert hdr.palette is not None and len(hdr.cmap) == 3

    out = tmp_path / "out.ppm"
    assert decompress.main(["-i", str(src), "-o", str(out)]) == 0
    rec = read_pnm(str(out))
    assert len(rec.components) == 3
    expect = palette[idx]
    for c in range(3):
        assert np.array_equal(rec.components[c].data, expect[:, :, c])


def test_tiff_lzw_pillow_cross(tmp_path):
    """LZW (+ horizontal predictor) TIFFs as Pillow/libtiff writes them
    — the compression a real ingest pipeline hits on day one
    (reference reads it via vendored libtiff, TIFFFormat.cpp)."""
    PILImage = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (45, 70, 3), dtype=np.uint8)
    p = str(tmp_path / "lzw.tif")
    PILImage.fromarray(arr).save(p, compression="tiff_lzw")
    img = tiff.read_tiff(p)
    got = np.stack([c.data for c in img.components], axis=-1)
    assert np.array_equal(got, arr)
    # gray + 16-bit LZW
    a16 = rng.integers(0, 65535, (33, 41), dtype=np.uint16)
    p2 = str(tmp_path / "lzw16.tif")
    PILImage.fromarray(a16).save(p2, compression="tiff_lzw")
    img2 = tiff.read_tiff(p2)
    assert np.array_equal(img2.components[0].data, a16)


def test_tiff_lzw_predictor2(tmp_path):
    """Predictor-2 LZW written by Pillow when asked explicitly."""
    PILImage = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "pred.tif")
    try:
        PILImage.fromarray(arr).save(p, compression="tiff_lzw",
                                     tiffinfo={317: 2})
    except Exception:
        pytest.skip("Pillow build cannot write predictor-2 LZW")
    img = tiff.read_tiff(p)
    got = np.stack([c.data for c in img.components], axis=-1)
    assert np.array_equal(got, arr)


def _write_tiled_tiff(path, arr, tw, tl, compression=1):
    """Minimal chunky tiled TIFF writer (test fixture)."""
    import struct as _s
    import zlib
    h, w, spp = arr.shape
    ta, td = -(-w // tw), -(-h // tl)
    tiles = []
    for ty in range(td):
        for tx in range(ta):
            t = np.zeros((tl, tw, spp), arr.dtype)
            ys, xs = ty * tl, tx * tw
            ph, pw = min(tl, h - ys), min(tw, w - xs)
            t[:ph, :pw] = arr[ys:ys + ph, xs:xs + pw]
            body = t.tobytes()
            if compression == 8:
                body = zlib.compress(body)
            tiles.append(body)
    ntags = 11
    ifd_off = 8
    entries = []

    def tag(tid, typ, vals):
        entries.append((tid, typ, vals))

    tag(256, 4, [w]); tag(257, 4, [h])
    tag(258, 3, [8] * spp)
    tag(259, 3, [compression])
    tag(262, 3, [2 if spp >= 3 else 1])
    tag(277, 3, [spp])
    tag(322, 4, [tw]); tag(323, 4, [tl])
    heap_base = ifd_off + 2 + ntags * 12 + 4
    heap = bytearray()

    def emit(tid, typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        pay = _s.pack(f"<{len(vals)}{fmt}", *vals)
        if len(pay) <= 4:
            return _s.pack("<HHI", tid, typ, len(vals)) + pay.ljust(4, b"\0")
        off = heap_base + len(heap)
        heap.extend(pay)
        return _s.pack("<HHII", tid, typ, len(vals), off)

    # two-pass for tile offsets
    for _pass in range(2):
        heap.clear()
        ents = b"".join(emit(t, ty, v) for (t, ty, v) in entries)
        data_base = heap_base + len(heap) + len(_s.pack("<I", 0))
        offs = []
        pos = data_base + 0
        # reserve heap room for offsets/counts arrays (added below)
        toff_entry = emit(324, 4, [0] * len(tiles))
        tcnt_entry = emit(325, 4, [len(t) for t in tiles])
        fmt_entry = emit(339, 3, [1] * spp)
        data_base = heap_base + len(heap)
        pos = data_base
        for t in tiles:
            offs.append(pos)
            pos += len(t)
        # rebuild with real offsets
        heap2 = bytearray()

        def emit2(tid, typ, vals):
            fmt = {3: "H", 4: "I"}[typ]
            pay = _s.pack(f"<{len(vals)}{fmt}", *vals)
            if len(pay) <= 4:
                return _s.pack("<HHI", tid, typ, len(vals)) \
                    + pay.ljust(4, b"\0")
            off = heap_base + len(heap2)
            heap2.extend(pay)
            return _s.pack("<HHII", tid, typ, len(vals), off)

        ents = b"".join(emit2(t, ty, v) for (t, ty, v) in entries)
        ents += emit2(324, 4, offs)
        ents += emit2(325, 4, [len(t) for t in tiles])
        ents += emit2(339, 3, [1] * spp)
        heap = heap2
    with open(path, "wb") as f:
        f.write(_s.pack("<2sHI", b"II", 42, ifd_off))
        f.write(_s.pack("<H", ntags))
        f.write(ents)
        f.write(_s.pack("<I", 0))
        f.write(bytes(heap))
        for t in tiles:
            f.write(t)


def test_tiff_tiled_read(tmp_path):
    """Tiled TIFF layout (tags 322-325), uncompressed and deflate."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
    for comp in (1, 8):
        p = str(tmp_path / f"tiled{comp}.tif")
        _write_tiled_tiff(p, arr, 32, 16, compression=comp)
        img = tiff.read_tiff(p)
        got = np.stack([c.data for c in img.components], axis=-1)
        assert np.array_equal(got, arr), f"compression {comp}"
        # cross-check Pillow agrees the file is valid
        try:
            from PIL import Image as PILImage
            ref = np.asarray(PILImage.open(p))
            assert np.array_equal(ref, arr)
        except ImportError:
            pass


def test_jpeg_output_roundtrip(tmp_path):
    """grk_decompress-style JPEG output (reference JPEGFormat.cpp is
    bidirectional; input side already rides Pillow)."""
    PILImage = pytest.importorskip("PIL.Image")
    import jax
    from grokimagecompression_tpu.cli import compress as c_cli
    from grokimagecompression_tpu.cli import decompress as d_cli
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:48, 0:64]
    arr = np.stack([((xx * 3 + yy * (c + 1)) % 256) for c in range(3)],
                   axis=-1).astype(np.uint8)
    src = str(tmp_path / "in.ppm")
    with open(src, "wb") as f:
        f.write(b"P6\n64 48\n255\n" + arr.tobytes())
    j2k = str(tmp_path / "x.j2k")
    assert c_cli.main(["-i", src, "-o", j2k]) == 0
    out = str(tmp_path / "out.jpg")
    assert d_cli.main(["-i", j2k, "-o", out]) == 0
    back = np.asarray(PILImage.open(out))
    assert back.shape == arr.shape
    # lossless J2K -> quality-90 JPEG: close but not exact
    assert np.abs(back.astype(int) - arr.astype(int)).mean() < 8
    # gray path
    g = str(tmp_path / "g.pgm")
    with open(g, "wb") as f:
        f.write(b"P5\n64 48\n255\n" + arr[:, :, 0].tobytes())
    j2 = str(tmp_path / "g.j2k")
    assert c_cli.main(["-i", g, "-o", j2]) == 0
    outg = str(tmp_path / "g.jpg")
    assert d_cli.main(["-i", j2, "-o", outg]) == 0
    backg = np.asarray(PILImage.open(outg))
    assert np.abs(backg.astype(int)
                  - arr[:, :, 0].astype(int)).mean() < 8
