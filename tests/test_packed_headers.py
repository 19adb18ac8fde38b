"""PPM/PPT packed packet headers + PLT packet lengths (reference:
j2k.cpp j2k_read_ppm:4693, j2k_read_ppt, j2k_read_plt:4632)."""

import os
import struct
import subprocess

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder, markers
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import (
    EncoderParams,
    Progression,
    Transform,
)

BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
GRK_DECOMPRESS = os.path.abspath(os.path.join(BIN, "grk_decompress"))
HAVE_GROK = os.path.exists(GRK_DECOMPRESS)


def _image(w, h, ncomps=1, seed=0):
    rng = np.random.default_rng(seed)
    comps = [Component(data=rng.integers(0, 256, (h, w)).astype(np.int32),
                       prec=8, signed=False, dx=1, dy=1)
             for _ in range(ncomps)]
    return Image(xsiz=w, ysiz=h, components=comps)


def _markers_present(cs, code):
    found = []
    pos = 2
    while pos + 4 <= len(cs):
        m = struct.unpack(">H", cs[pos:pos + 2])[0]
        if m == markers.SOD:
            # skip into next SOT via Psot — simplified: stop scan
            break
        ln = struct.unpack(">H", cs[pos + 2:pos + 4])[0]
        if m == code:
            found.append(cs[pos + 4:pos + 2 + ln])
        pos += 2 + ln
    return found


@pytest.mark.parametrize("flag", ["ppt", "ppm"])
@pytest.mark.parametrize("tiles", [None, (64, 64)])
def test_packed_headers_roundtrip(flag, tiles):
    img = _image(150, 130, ncomps=3, seed=1)
    kw = dict(numresolutions=4, numlayers=2, rates=(8.0, 0.0),
              progression=Progression.RPCL)
    if tiles:
        kw["tile_size"] = tiles
    base = encoder.encode(img, EncoderParams(**kw))
    kw["ppt_markers" if flag == "ppt" else "ppm_markers"] = True
    cs = encoder.encode(img, EncoderParams(**kw))
    ref = decoder.decode(base)
    out = decoder.decode(cs)
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data,
                                      ref.components[c].data)


def test_ppt_with_sop_eph():
    img = _image(100, 80, seed=2)
    cs = encoder.encode(img, EncoderParams(
        numresolutions=4, ppt_markers=True, sop_markers=True,
        eph_markers=True))
    out = decoder.decode(cs)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


def test_plt_lengths_match_packets(tmp_path):
    img = _image(120, 90, seed=3)
    cs = encoder.encode(img, EncoderParams(numresolutions=4,
                                           plt_markers=True))
    # decode still works and PLT lengths sum to the tile body size
    out = decoder.decode(cs)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)
    hdr = decoder.read_header(cs)
    tps = list(decoder.iter_tile_parts(cs, hdr.main_header_end))
    assert tps and tps[0].plt_lengths
    assert sum(tps[0].plt_lengths) == len(tps[0].body)


def test_plt_varlen_encoding():
    for v in (0, 1, 127, 128, 300, 16383, 16384, 2097151):
        seg = markers._plt_varlen(v)
        _, lens, rem = markers.parse_plt(b"\x00" + seg)
        assert lens == [v] and rem == 0


def test_crg_marker_roundtrip():
    seg = markers.write_crg([(100, 200), (300, 400)], 2)
    assert struct.unpack(">H", seg[:2])[0] == markers.CRG
    out = markers.parse_crg(seg[4:], 2)
    assert out == [(100, 200), (300, 400)]


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
@pytest.mark.parametrize("flag", ["ppt", "ppm"])
def test_reference_decodes_our_packed_headers(tmp_path, flag):
    from grokimagecompression_tpu.io.pnm import read_pnm
    img = _image(96, 64, ncomps=3, seed=4)
    kw = dict(numresolutions=4, tile_size=(48, 48))
    kw["ppt_markers" if flag == "ppt" else "ppm_markers"] = True
    cs = encoder.encode(img, EncoderParams(**kw))
    j2k = tmp_path / "p.j2k"
    j2k.write_bytes(cs)
    out = tmp_path / "p.ppm"
    r = subprocess.run([GRK_DECOMPRESS, "-i", str(j2k), "-o", str(out)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:500]
    rec = read_pnm(str(out))
    for c in range(3):
        np.testing.assert_array_equal(rec.components[c].data,
                                      img.components[c].data)


@pytest.mark.parametrize("flag,prog", [("R", Progression.RPCL),
                                       ("C", Progression.CPRL),
                                       ("L", Progression.LRCP)])
def test_tile_parts_roundtrip(flag, prog):
    """tp_flag splits tiles into multiple tile-parts at progression
    boundaries (reference tp_on/tp_flag, grok.h:532-534)."""
    img = _image(130, 110, ncomps=3, seed=8)
    kw = dict(numresolutions=4, progression=prog, tile_size=(64, 64))
    if flag == "L":
        kw.update(numlayers=2, rates=(8.0, 0.0),
                  transform=Transform.DWT_97)
    base = encoder.encode(img, EncoderParams(**kw))
    cs = encoder.encode(img, EncoderParams(tp_flag=flag, **kw))
    hdr = decoder.read_header(cs)
    tps = list(decoder.iter_tile_parts(cs, hdr.main_header_end))
    per_tile = {}
    for tp in tps:
        per_tile.setdefault(tp.tile_index, []).append(tp)
    assert all(len(v) > 1 for v in per_tile.values()), \
        {t: len(v) for t, v in per_tile.items()}
    out = decoder.decode(cs)
    ref = decoder.decode(base)
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data,
                                      ref.components[c].data)


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
def test_reference_decodes_our_tile_parts(tmp_path):
    from grokimagecompression_tpu.io.pnm import read_pnm
    img = _image(96, 96, ncomps=3, seed=9)
    cs = encoder.encode(img, EncoderParams(
        numresolutions=4, progression=Progression.RPCL, tp_flag="R",
        tile_size=(48, 48)))
    j2k = tmp_path / "tp.j2k"
    j2k.write_bytes(cs)
    out = tmp_path / "tp.ppm"
    r = subprocess.run([GRK_DECOMPRESS, "-i", str(j2k), "-o", str(out)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:400]
    rec = read_pnm(str(out))
    for c in range(3):
        np.testing.assert_array_equal(rec.components[c].data,
                                      img.components[c].data)
