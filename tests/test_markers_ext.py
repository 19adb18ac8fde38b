"""COC/QCC per-component overrides, POC progression changes, TLM."""

import os
import subprocess

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder, markers
from grokimagecompression_tpu.codestream.markers import PocEntry
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import (
    EncoderParams,
    Progression,
    QuantStyle,
)

BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
GRK_COMPRESS = os.path.abspath(os.path.join(BIN, "grk_compress"))
GRK_DECOMPRESS = os.path.abspath(os.path.join(BIN, "grk_decompress"))
HAVE_GROK = os.path.exists(GRK_COMPRESS) and os.path.exists(GRK_DECOMPRESS)


def _image(w, h, ncomps=3, seed=0):
    rng = np.random.default_rng(seed)
    comps = [
        Component(data=rng.integers(0, 256, (h, w)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)
        for _ in range(ncomps)
    ]
    return Image(xsiz=w, ysiz=h, components=comps)


def test_poc_marker_roundtrip():
    entries = [PocEntry(rs=0, cs=0, lye=1, re=4, ce=3,
                        prog=Progression.CPRL),
               PocEntry(rs=4, cs=0, lye=1, re=5, ce=3,
                        prog=Progression.CPRL)]
    seg = markers.write_poc(entries, 3)
    assert seg[:2] == b"\xff\x5f"
    back = markers.parse_poc(seg[4:], 3)
    assert back == entries


def test_tlm_marker_roundtrip():
    lens = [(0, 12345), (1, 99), (2, 70000)]
    seg = markers.write_tlm(lens)
    back = markers.parse_tlm(seg[4:])
    assert back == lens


def test_coc_marker_roundtrip():
    from grokimagecompression_tpu.codestream.markers import CodInfo
    base = CodInfo()
    import dataclasses
    cc = dataclasses.replace(base, cblk_w_exp=5, cblk_h_exp=4)
    seg = markers.write_coc(2, cc, 3)
    compno, back = markers.parse_coc(seg[4:], 3, base)
    assert compno == 2
    assert back.cblk_w_exp == 5 and back.cblk_h_exp == 4


def test_encode_decode_with_poc():
    img = _image(160, 128, seed=1)
    numres = 4
    pocs = (PocEntry(rs=0, cs=0, lye=1, re=numres - 1, ce=3,
                     prog=Progression.CPRL),
            PocEntry(rs=numres - 1, cs=0, lye=1, re=numres, ce=3,
                     prog=Progression.CPRL))
    cs = encoder.encode(img, EncoderParams(numresolutions=numres,
                                           pocs=pocs))
    hdr = decoder.read_header(cs)
    assert hdr.pocs == list(pocs)
    out = decoder.decode(cs)
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data,
                                      img.components[c].data)


def test_encode_decode_with_coc():
    img = _image(140, 100, seed=2)
    cs = encoder.encode(img, EncoderParams(
        numresolutions=4, comp_cblk_exps={1: (5, 5), 2: (4, 6)}))
    hdr = decoder.read_header(cs)
    assert hdr.cod_comp is not None
    assert hdr.cod_comp[1].cblk_w_exp == 5
    assert hdr.cod_comp[2].cblk_h_exp == 6
    out = decoder.decode(cs)
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data,
                                      img.components[c].data)


def test_tlm_written_and_parsed():
    img = _image(160, 128, seed=3)
    cs = encoder.encode(img, EncoderParams(numresolutions=3,
                                           tile_size=(64, 64),
                                           tlm_markers=True))
    hdr = decoder.read_header(cs)
    assert hdr.tlm is not None and len(hdr.tlm) == 6
    # TLM entries must match the actual tile-part spans.
    tps = list(decoder.iter_tile_parts(cs, hdr.main_header_end))
    assert len(tps) == 6
    out = decoder.decode(cs)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
def test_grok_decodes_our_poc_stream(tmp_path):
    from grokimagecompression_tpu.io.pnm import read_pnm, write_pnm
    img = _image(160, 128, seed=4)
    numres = 4
    pocs = (PocEntry(rs=0, cs=0, lye=1, re=numres - 1, ce=3,
                     prog=Progression.CPRL),
            PocEntry(rs=numres - 1, cs=0, lye=1, re=numres, ce=3,
                     prog=Progression.CPRL))
    cs = encoder.encode(img, EncoderParams(numresolutions=numres,
                                           pocs=pocs))
    j2k = tmp_path / "poc.j2k"
    j2k.write_bytes(cs)
    out = tmp_path / "poc.ppm"
    subprocess.run([GRK_DECOMPRESS, "-i", str(j2k), "-o", str(out)],
                   check=True, capture_output=True)
    rec = read_pnm(str(out))
    for c in range(3):
        np.testing.assert_array_equal(rec.components[c].data,
                                      img.components[c].data)


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
def test_we_decode_grok_poc_stream(tmp_path):
    from grokimagecompression_tpu.io.pnm import read_pnm, write_pnm
    img = _image(160, 128, seed=5)
    src = tmp_path / "in.ppm"
    write_pnm(str(src), img)
    j2k = tmp_path / "poc.j2k"
    subprocess.run([GRK_COMPRESS, "-i", str(src), "-o", str(j2k),
                    "-n", "4", "-P", "T1=0,0,1,3,3,CPRL/T1=3,0,1,4,3,CPRL"],
                   check=True, capture_output=True)
    out = decoder.decode(j2k.read_bytes())
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data,
                                      img.components[c].data)


def test_roi_component_upshift():
    img = _image(128, 96, ncomps=3, seed=7)
    from grokimagecompression_tpu.core.params import Transform
    for transform in (Transform.DWT_53, Transform.DWT_97):
        cs = encoder.encode(img, EncoderParams(
            numresolutions=4, transform=transform, roi_comp=1, roi_shift=4,
            mct=0))
        hdr = decoder.read_header(cs)
        assert hdr.roishifts == [0, 4, 0]
        out = decoder.decode(cs)
        if transform == Transform.DWT_53:
            for c in range(3):
                np.testing.assert_array_equal(out.components[c].data,
                                              img.components[c].data)
        else:
            for c in range(3):
                err = (out.components[c].data.astype(np.float64)
                       - img.components[c].data)
                assert np.sqrt((err ** 2).mean()) < 2.5, c


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
def test_roi_interop(tmp_path):
    from grokimagecompression_tpu.io.pnm import read_pnm, write_pnm
    img = _image(120, 90, ncomps=3, seed=8)
    # grok encodes with component-of-interest upshift; we decode.
    src = tmp_path / "in.ppm"
    write_pnm(str(src), img)
    j2k = tmp_path / "roi.j2k"
    subprocess.run([GRK_COMPRESS, "-i", str(src), "-o", str(j2k),
                    "-R", "c=1,U=4"], check=True, capture_output=True)
    # Our decode reads the actual coded planes and recovers the input
    # exactly (the reference's own ROI decode is only near-exact: it
    # shifts planes up then down, losing half-bin precision).
    out = decoder.decode(j2k.read_bytes())
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data,
                                      img.components[c].data)
    # ours -> grok: the reference's ROI decode shifts planes up then down
    # and loses half-bin precision BY DESIGN (its own self-roundtrip has
    # the same error); require our stream to decode no worse than the
    # reference's own encode does.
    cs = encoder.encode(img, EncoderParams(numresolutions=6, roi_comp=1,
                                           roi_shift=4))
    ours = tmp_path / "ours.j2k"
    ours.write_bytes(cs)
    dec = tmp_path / "ours.ppm"
    subprocess.run([GRK_DECOMPRESS, "-i", str(ours), "-o", str(dec)],
                   check=True, capture_output=True)
    grk_self = tmp_path / "self.ppm"
    subprocess.run([GRK_DECOMPRESS, "-i", str(j2k), "-o", str(grk_self)],
                   check=True, capture_output=True)
    rec = read_pnm(str(dec))
    ref_rec = read_pnm(str(grk_self))
    for c in range(3):
        e_ours = np.sqrt(((rec.components[c].data.astype(np.float64)
                           - img.components[c].data) ** 2).mean())
        e_ref = np.sqrt(((ref_rec.components[c].data.astype(np.float64)
                          - img.components[c].data) ** 2).mean())
        assert e_ours <= e_ref + 1.0, (c, e_ours, e_ref)


def test_custom_mct_roundtrip():
    from grokimagecompression_tpu.core.params import Transform
    img = _image(96, 80, ncomps=3, seed=11)
    # A decorrelation-ish decoding matrix (well-conditioned, not RCT/ICT).
    dec_m = np.array([[1.0, 0.2, 1.5], [1.0, -0.3, -0.6], [1.0, 1.9, 0.1]],
                     dtype=np.float32)
    cs = encoder.encode(img, EncoderParams(
        numresolutions=4, transform=Transform.DWT_97, custom_mct=dec_m))
    hdr = decoder.read_header(cs)
    assert hdr.cod.mct == 2
    assert hdr.custom_mct is not None
    np.testing.assert_allclose(hdr.custom_mct[0], dec_m, atol=1e-6)
    assert hdr.siz.rsiz & 0x8100 == 0x8100
    out = decoder.decode(cs)
    for c in range(3):
        err = (out.components[c].data.astype(np.float64)
               - img.components[c].data)
        assert np.sqrt((err ** 2).mean()) < 3.0, c


REF_SRC = "/root/reference/src/lib/jp2"
REF_BUILD = os.path.abspath(os.path.join(BIN, "..", "src", "lib", "jp2"))


@pytest.fixture(scope="module")
def ref_mct_encoder(tmp_path_factory):
    """Build the C harness that encodes via the reference LIBRARY with
    grk_set_MCT. The reference CLI -m path is unusable (grk_compress.cpp
    `cleanup: if (!lFile) fclose(lFile)` segfaults on success) and the
    reference DECODER rejects SGcod mct=2 (j2k.cpp:3869), so decode-our-
    stream interop is impossible; encode-side library interop is the
    real oracle."""
    if not HAVE_GROK or not os.path.isdir(REF_SRC):
        pytest.skip("Grok reference build not available")
    exe = str(tmp_path_factory.mktemp("tools") / "ref_mct_encode")
    src = os.path.join(os.path.dirname(__file__), "tools",
                       "ref_mct_encode.c")
    r = subprocess.run(
        ["g++", "-O2", "-x", "c++", "-o", exe, src,
         f"-I{REF_SRC}", f"-I{REF_BUILD}", f"-L{BIN}", "-lgrok",
         f"-Wl,-rpath,{os.path.abspath(BIN)}"],
        capture_output=True)
    if r.returncode != 0:
        pytest.skip("cannot build interop helper: "
                    + r.stderr.decode()[:300])
    return exe


def test_our_decoder_reads_grok_custom_mct(ref_mct_encoder, tmp_path):
    w, h = 96, 80
    rng = np.random.default_rng(12)
    src = rng.integers(0, 256, (3, h, w)).astype(np.uint8)
    raw = tmp_path / "src.raw"
    src.tofile(raw)
    coding_m = [1.0, 0.25, 0.5, -0.2, 1.0, 0.1, 0.3, -0.4, 1.0]
    mct_txt = tmp_path / "mct.txt"
    mct_txt.write_text(" ".join(map(str, coding_m)) + " 128 128 128")
    j2k = tmp_path / "ref.j2k"
    r = subprocess.run([ref_mct_encoder, str(raw), str(w), str(h), "3",
                        str(mct_txt), str(j2k)], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:500]
    data = j2k.read_bytes()
    hdr = decoder.read_header(data)
    assert hdr.cod.mct == 2
    assert hdr.custom_mct is not None
    # The MCT record carries the inverse of the coding matrix.
    prod = np.asarray(coding_m, np.float64).reshape(3, 3) @ \
        hdr.custom_mct[0].astype(np.float64)
    np.testing.assert_allclose(prod, np.eye(3), atol=1e-5)
    out = decoder.decode(data)
    for c in range(3):
        err = (out.components[c].data.astype(np.float64) - src[c])
        assert np.sqrt((err ** 2).mean()) < 1.0, c
