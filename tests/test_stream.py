"""Streaming encode/decode: tile-by-tile writing, TLM-patched seeking,
random tile access from a file (reference: BufferedStream/mem_stream +
grk_write_tile / grk_get_decoded_tile)."""

import io
import os
import subprocess

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.codestream.stream import (
    StreamDecoder,
    StreamEncoder,
)
from grokimagecompression_tpu.core.geometry import tile_rect
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import DecoderParams, EncoderParams

BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
GRK_DECOMPRESS = os.path.abspath(os.path.join(BIN, "grk_decompress"))
HAVE_GROK = os.path.exists(GRK_DECOMPRESS)


def _image(w, h, ncomps=1, seed=0):
    rng = np.random.default_rng(seed)
    comps = [Component(data=rng.integers(0, 256, (h, w)).astype(np.int32),
                       prec=8, signed=False, dx=1, dy=1)
             for _ in range(ncomps)]
    return Image(xsiz=w, ysiz=h, components=comps)


def test_stream_encode_matches_whole_image(tmp_path):
    img = _image(200, 150, ncomps=3, seed=1)
    params = EncoderParams(numresolutions=4, tile_size=(64, 64))
    path = str(tmp_path / "s.j2k")
    with StreamEncoder(path, img, params) as se:
        for t in range(se.numtiles):
            se.write_image_tile(t, img)
    data = open(path, "rb").read()
    out = decoder.decode(data)
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data,
                                      img.components[c].data)
    # TLM was patched with real lengths
    hdr = decoder.read_header(data)
    assert hdr.tlm and all(ln > 0 for (_, ln) in hdr.tlm)
    assert len(hdr.tlm) == se.numtiles


def test_stream_decoder_random_access(tmp_path):
    img = _image(256, 192, seed=2)
    params = EncoderParams(numresolutions=4, tile_size=(64, 64))
    path = str(tmp_path / "r.j2k")
    with StreamEncoder(path, img, params) as se:
        n = se.numtiles
        for t in range(n):
            se.write_image_tile(t, img)
    full = decoder.decode(open(path, "rb").read())
    with StreamDecoder(path) as sd:
        assert sd.numtiles == n
        rng = np.random.default_rng(0)
        for t in rng.permutation(n)[:6]:
            t = int(t)
            part = sd.decode_tile(t)
            tr = tile_rect(t, 256, 192, 0, 0, 64, 64, 0, 0)
            np.testing.assert_array_equal(
                part.components[0].data,
                full.components[0].data[tr.y0:tr.y1, tr.x0:tr.x1])


def test_stream_decoder_no_tlm_scan(tmp_path):
    """Index falls back to an SOT-hopping scan for streams without TLM."""
    img = _image(128, 128, seed=3)
    cs = encoder.encode(img, EncoderParams(numresolutions=4,
                                           tile_size=(64, 64)))
    path = str(tmp_path / "n.j2k")
    open(path, "wb").write(cs)
    full = decoder.decode(cs)
    with StreamDecoder(path) as sd:
        assert sd.numtiles == 4
        for t in range(4):
            part = sd.decode_tile(t)
            tr = tile_rect(t, 128, 128, 0, 0, 64, 64, 0, 0)
            np.testing.assert_array_equal(
                part.components[0].data,
                full.components[0].data[tr.y0:tr.y1, tr.x0:tr.x1])


def test_stream_decoder_window_within_tile(tmp_path):
    img = _image(128, 128, seed=4)
    path = str(tmp_path / "w.j2k")
    with StreamEncoder(path, img, EncoderParams(numresolutions=4,
                                                tile_size=(64, 64))) as se:
        for t in range(se.numtiles):
            se.write_image_tile(t, img)
    full = decoder.decode(open(path, "rb").read())
    with StreamDecoder(path) as sd:
        part = sd.decode_tile(3, DecoderParams(window=(80, 90, 110, 120)))
        np.testing.assert_array_equal(
            part.components[0].data,
            full.components[0].data[90:120, 80:110])


def test_stream_encoder_order_and_completion(tmp_path):
    img = _image(128, 64, seed=5)
    se = StreamEncoder(str(tmp_path / "o.j2k"), img,
                       EncoderParams(tile_size=(64, 64)))
    with pytest.raises(ValueError):
        se.write_image_tile(1, img)       # out of order
    se.write_image_tile(0, img)
    with pytest.raises(ValueError):
        se.close()                        # incomplete
    se.write_image_tile(1, img)
    se.close()


def test_stream_file_object_and_ht(tmp_path):
    img = _image(96, 96, seed=6)
    buf = io.BytesIO()
    with StreamEncoder(buf, img, EncoderParams(tile_size=(48, 48),
                                               cblk_style=0x40)) as se:
        for t in range(se.numtiles):
            se.write_image_tile(t, img)
    data = buf.getvalue()
    out = decoder.decode(data)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
def test_reference_decodes_streamed_file(tmp_path):
    from grokimagecompression_tpu.io.pnm import read_pnm
    img = _image(100, 100, ncomps=3, seed=7)
    path = str(tmp_path / "g.j2k")
    with StreamEncoder(path, img, EncoderParams(numresolutions=4,
                                                tile_size=(50, 50))) as se:
        for t in range(se.numtiles):
            se.write_image_tile(t, img)
    out = str(tmp_path / "g.ppm")
    r = subprocess.run([GRK_DECOMPRESS, "-i", path, "-o", out],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:500]
    rec = read_pnm(out)
    for c in range(3):
        np.testing.assert_array_equal(rec.components[c].data,
                                      img.components[c].data)


def test_random_tile_access():
    """Decode arbitrary single tiles by index and via StreamDecoder;
    every access must reproduce the full decode's pixels for that tile
    (the analog of the reference's j2k_random_tile_access test,
    reference: tests/j2k_random_tile_access.cpp)."""
    import numpy as np
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import (DecoderParams,
                                                      EncoderParams)

    rng = np.random.default_rng(31)
    w = h = 256
    d = rng.integers(0, 256, (h, w, 3)).astype(np.int32)
    img = Image(xsiz=w, ysiz=h, components=[
        Component(data=d[:, :, c], prec=8, signed=False, dx=1, dy=1)
        for c in range(3)])
    cs = encoder.encode(img, EncoderParams(tile_size=(64, 64),
                                           numresolutions=3,
                                           tlm_markers=True), device=False)
    ntx = nty = 4
    for t in rng.permutation(ntx * nty)[:6]:
        t = int(t)
        out = decoder.decode(cs, DecoderParams(tile_index=t))
        ty, tx = divmod(t, ntx)
        ref = d[ty * 64:(ty + 1) * 64, tx * 64:(tx + 1) * 64]
        for c in range(3):
            got = out.components[c].data
            assert got.shape == (64, 64)
            assert np.array_equal(got, ref[:, :, c]), (t, c)
