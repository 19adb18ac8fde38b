"""CLI apps (compress/decompress/dump), JP2 container, BMP I/O."""

import io
import subprocess
import sys

import numpy as np
import pytest

from grokimagecompression_tpu.cli import compress, decompress, dump
from grokimagecompression_tpu.codestream import decoder, encoder, jp2
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams
from grokimagecompression_tpu.io import bmp
from grokimagecompression_tpu.io.pnm import read_pnm, write_pnm


@pytest.fixture
def gray_pgm(tmp_path):
    rng = np.random.default_rng(0)
    d = rng.integers(0, 256, (90, 130)).astype(np.uint8)
    p = tmp_path / "in.pgm"
    p.write_bytes(b"P5\n130 90\n255\n" + d.tobytes())
    return p, d


def test_cli_roundtrip_lossless(gray_pgm, tmp_path):
    p, d = gray_pgm
    j2k = tmp_path / "out.j2k"
    out = tmp_path / "dec.pgm"
    assert compress.main(["-i", str(p), "-o", str(j2k), "-n", "4"]) == 0
    assert decompress.main(["-i", str(j2k), "-o", str(out)]) == 0
    rec = read_pnm(str(out)).components[0].data
    np.testing.assert_array_equal(rec, d.astype(np.int32))


def test_cli_lossy_rates(gray_pgm, tmp_path):
    p, d = gray_pgm
    j2k = tmp_path / "out.j2k"
    assert compress.main(["-i", str(p), "-o", str(j2k), "-I",
                          "-r", "20,5", "-p", "RPCL", "-n", "4"]) == 0
    sz = j2k.stat().st_size
    assert sz <= 90 * 130 / 5 + 400
    out = tmp_path / "dec.pgm"
    assert decompress.main(["-i", str(j2k), "-o", str(out), "-l", "1"]) == 0


def test_cli_reduce(gray_pgm, tmp_path):
    p, d = gray_pgm
    j2k = tmp_path / "out.j2k"
    out = tmp_path / "dec.pgm"
    compress.main(["-i", str(p), "-o", str(j2k), "-n", "4"])
    decompress.main(["-i", str(j2k), "-o", str(out), "-r", "1"])
    rec = read_pnm(str(out)).components[0].data
    assert rec.shape == (45, 65)


def test_cli_dump(gray_pgm, tmp_path, capsys):
    p, _ = gray_pgm
    j2k = tmp_path / "out.j2k"
    compress.main(["-i", str(p), "-o", str(j2k), "-n", "3",
                   "-t", "64,64", "-S", "-E"])
    assert dump.main(["-i", str(j2k)]) == 0
    txt = capsys.readouterr().out
    assert "x1=130, y1=90" in txt
    assert "numresolutions=3" in txt
    assert "tw=3, th=2" in txt
    assert "tile-part" in txt


def test_jp2_container_roundtrip(gray_pgm, tmp_path):
    p, d = gray_pgm
    jp2f = tmp_path / "out.jp2"
    out = tmp_path / "dec.pgm"
    compress.main(["-i", str(p), "-o", str(jp2f)])
    raw = jp2f.read_bytes()
    assert jp2.is_jp2(raw)
    hdr, cs = jp2.read_jp2(raw)
    assert (hdr.width, hdr.height, hdr.numcomps) == (130, 90, 1)
    assert hdr.colourspace == jp2.CS_GREYSCALE
    decompress.main(["-i", str(jp2f), "-o", str(out)])
    rec = read_pnm(str(out)).components[0].data
    np.testing.assert_array_equal(rec, d.astype(np.int32))


def test_bmp_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    comps = [Component(data=rng.integers(0, 256, (33, 47)).astype(np.int32),
                       prec=8, signed=False, dx=1, dy=1) for _ in range(3)]
    img = Image(xsiz=47, ysiz=33, components=comps)
    f = tmp_path / "x.bmp"
    bmp.write_bmp(str(f), img)
    back = bmp.read_bmp(str(f))
    for c in range(3):
        np.testing.assert_array_equal(back.components[c].data,
                                      comps[c].data)


def test_bmp_cli_pipeline(tmp_path):
    rng = np.random.default_rng(2)
    comps = [Component(data=rng.integers(0, 256, (40, 50)).astype(np.int32),
                       prec=8, signed=False, dx=1, dy=1) for _ in range(3)]
    img = Image(xsiz=50, ysiz=40, components=comps)
    src = tmp_path / "in.bmp"
    bmp.write_bmp(str(src), img)
    j2k = tmp_path / "o.j2k"
    out = tmp_path / "o.bmp"
    compress.main(["-i", str(src), "-o", str(j2k), "-n", "3"])
    decompress.main(["-i", str(j2k), "-o", str(out)])
    back = bmp.read_bmp(str(out))
    for c in range(3):
        np.testing.assert_array_equal(back.components[c].data,
                                      comps[c].data)


def test_dump_packet_index_matches_plt(tmp_path):
    """-p packet index boundaries agree with the PLT marker lengths."""
    import numpy as np
    from grokimagecompression_tpu.codestream import decoder as _dec
    from grokimagecompression_tpu.codestream import encoder as _enc
    from grokimagecompression_tpu.codestream.tile import index_tile_packets
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams

    rng = np.random.default_rng(0)
    img = Image(xsiz=96, ysiz=96, components=[
        Component(data=rng.integers(0, 256, (96, 96)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)])
    cs = _enc.encode(img, EncoderParams(numresolutions=4, plt_markers=True))
    hdr = _dec.read_header(cs)
    tp = next(_dec.iter_tile_parts(cs, hdr.main_header_end))
    pkts = index_tile_packets(tp.body, hdr, 0)
    assert [ln for (*_, ln) in pkts] == tp.plt_lengths
    assert sum(tp.plt_lengths) == len(tp.body)


def test_dump_modes_run(tmp_path, capsys):
    import numpy as np
    from grokimagecompression_tpu.cli import dump as dump_cli
    from grokimagecompression_tpu.codestream import encoder as _enc
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams

    rng = np.random.default_rng(1)
    img = Image(xsiz=64, ysiz=64, components=[
        Component(data=rng.integers(0, 256, (64, 64)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)])
    p = str(tmp_path / "d.j2k")
    open(p, "wb").write(_enc.encode(img, EncoderParams(numresolutions=3)))
    assert dump_cli.main(["-i", p, "-m", "-p"]) == 0
    out = capsys.readouterr().out
    assert "Marker index" in out and "Packet index" in out
    assert "SIZ" in out and "SOT" in out


def test_compare_tool(tmp_path, capsys):
    import numpy as np
    from grokimagecompression_tpu.cli import compare as cmp_cli
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.io.pnm import write_pnm
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (20, 30)).astype(np.int32)
    b = np.clip(a + rng.integers(-2, 3, a.shape), 0, 255).astype(np.int32)
    pa, pb = str(tmp_path / "a.pgm"), str(tmp_path / "b.pgm")
    write_pnm(pa, Image(xsiz=30, ysiz=20, components=[
        Component(data=a, prec=8, signed=False, dx=1, dy=1)]))
    write_pnm(pb, Image(xsiz=30, ysiz=20, components=[
        Component(data=b, prec=8, signed=False, dx=1, dy=1)]))
    assert cmp_cli.main(["-b", pa, "-t", pb, "-p", "4", "-m", "10"]) == 0
    assert cmp_cli.main(["-b", pa, "-t", pb, "-p", "0.5", "-m", "0.1"]) == 1
    assert cmp_cli.main(["-b", pa, "-t", pa, "-p", "0", "-m", "0"]) == 0


def test_decompress_split_pnm(tmp_path):
    import numpy as np
    from grokimagecompression_tpu.cli import compress as c_cli
    from grokimagecompression_tpu.cli import decompress as d_cli
    from grokimagecompression_tpu.codestream import encoder as _enc
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.io.pnm import read_pnm, write_pnm

    rng = np.random.default_rng(2)
    comps = [Component(data=rng.integers(0, 256, (20, 30)).astype(np.int32),
                       prec=8, signed=False, dx=1, dy=1) for _ in range(3)]
    img = Image(xsiz=30, ysiz=20, components=comps)
    src = str(tmp_path / "s.ppm")
    write_pnm(src, img)
    j2k = str(tmp_path / "s.j2k")
    assert c_cli.main(["-i", src, "-o", j2k]) == 0
    out = str(tmp_path / "o.ppm")
    assert d_cli.main(["-i", j2k, "-o", out, "--split-pnm"]) == 0
    for c in range(3):
        rec = read_pnm(str(tmp_path / f"o_{c}.pgm"))
        np.testing.assert_array_equal(rec.components[0].data,
                                      comps[c].data)


def test_compress_cli_poc_tp_roi_flags(tmp_path):
    """New reference-parity flags: -P (POC), -u (tile-parts), -R (ROI),
    -Y (MCT select), -y/-O/-a (directory mode)."""
    import numpy as np
    from grokimagecompression_tpu.cli import compress, decompress
    from grokimagecompression_tpu.io.pnm import read_pnm

    rng = np.random.default_rng(5)
    d = rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
    src = tmp_path / "in.ppm"
    src.write_bytes(b"P6\n80 64\n255\n" + d.tobytes())

    out = tmp_path / "out.j2k"
    rc = compress.main(["-i", str(src), "-o", str(out), "-n", "4",
                        "-P", "T0=0,0,1,3,3,CPRL/T0=3,0,1,4,3,LRCP",
                        "-u", "R", "-R", "c=0,U=4", "-Y", "0"])
    assert rc == 0
    dec = tmp_path / "dec.ppm"
    assert decompress.main(["-i", str(out), "-o", str(dec)]) == 0
    got = read_pnm(str(dec))
    for c in range(3):
        assert np.array_equal(got.components[c].data, d[:, :, c])

    # directory batch mode
    imgs = tmp_path / "imgs"
    outs = tmp_path / "outs"
    imgs.mkdir()
    for n in ("a", "b"):
        (imgs / f"{n}.ppm").write_bytes(b"P6\n80 64\n255\n" + d.tobytes())
    rc = compress.main(["-y", str(imgs), "-O", "J2K", "-a", str(outs)])
    assert rc == 0
    assert sorted(p.name for p in outs.iterdir()) == ["a.j2k", "b.j2k"]


def test_decompress_cli_precision_and_dir(tmp_path):
    """-p precision forcing (clip/scale) and -y directory decode."""
    import numpy as np
    from grokimagecompression_tpu.cli import compress, decompress
    from grokimagecompression_tpu.io.pnm import read_pnm

    rng = np.random.default_rng(9)
    d = rng.integers(0, 256, (48, 60)).astype(np.uint8)
    src = tmp_path / "in.pgm"
    src.write_bytes(b"P5\n60 48\n255\n" + d.tobytes())
    j2k = tmp_path / "x.j2k"
    assert compress.main(["-i", str(src), "-o", str(j2k)]) == 0

    # scale to 10 bits: v << 2
    out10 = tmp_path / "p10.pgm"
    assert decompress.main(["-i", str(j2k), "-o", str(out10),
                            "-p", "10S"]) == 0
    got = read_pnm(str(out10))
    assert got.components[0].prec == 10
    assert np.array_equal(got.components[0].data,
                          d.astype(np.int32) << 2)

    # clip to 6 bits
    out6 = tmp_path / "p6.pgm"
    assert decompress.main(["-i", str(j2k), "-o", str(out6),
                            "-p", "6C"]) == 0
    got6 = read_pnm(str(out6))
    assert int(got6.components[0].data.max()) <= 63

    # directory mode
    outs = tmp_path / "outs"
    assert decompress.main(["-y", str(tmp_path), "-a", str(outs),
                            "-O", "pgm"]) == 0
    rec = read_pnm(str(outs / "x.pgm"))
    assert np.array_equal(rec.components[0].data, d.astype(np.int32))
