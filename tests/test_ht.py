"""HTJ2K (Part 15) block coder: self round-trips, codestream integration,
and interop with the reference binaries."""

import os
import subprocess

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams, Progression

t1_native = pytest.importorskip(
    "grokimagecompression_tpu.native.t1_native",
    reason="native library unavailable")

BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
GRK_COMPRESS = os.path.abspath(os.path.join(BIN, "grk_compress"))
GRK_DECOMPRESS = os.path.abspath(os.path.join(BIN, "grk_decompress"))
HAVE_GROK = os.path.exists(GRK_COMPRESS) and os.path.exists(GRK_DECOMPRESS)

HT = 0x40


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 16), (33, 39),
                                   (64, 64), (5, 64)])
@pytest.mark.parametrize("bits", [1, 5, 10])
def test_ht_block_roundtrip(shape, bits):
    rng = np.random.default_rng(shape[0] * 100 + bits)
    h, w = shape
    for sparse in (False, True):
        mag = rng.integers(0, 1 << bits, (h, w)).astype(np.uint32)
        if sparse:
            mag[rng.random((h, w)) < 0.85] = 0
        neg = rng.integers(0, 2, (h, w)).astype(np.uint8)
        Mb = bits + 1
        data = t1_native.ht_encode_cblk(mag, neg, Mb)
        m2, n2 = t1_native.ht_decode_cblk(data, w, h, Mb - 1)
        np.testing.assert_array_equal(m2, mag)
        nz = mag > 0
        np.testing.assert_array_equal(n2[nz], neg[nz])


def test_ht_zero_block():
    mag = np.zeros((32, 32), dtype=np.uint32)
    neg = np.zeros((32, 32), dtype=np.uint8)
    data = t1_native.ht_encode_cblk(mag, neg, 9)
    m2, _ = t1_native.ht_decode_cblk(data, 32, 32, 8)
    assert not m2.any()


def _image(w, h, ncomps=1, prec=8, seed=0):
    rng = np.random.default_rng(seed)
    comps = [
        Component(data=rng.integers(0, 1 << prec, (h, w)).astype(np.int32),
                  prec=prec, signed=False, dx=1, dy=1)
        for _ in range(ncomps)
    ]
    return Image(xsiz=w, ysiz=h, components=comps)


@pytest.mark.parametrize("ncomps", [1, 3])
def test_ht_codestream_roundtrip(ncomps):
    img = _image(130, 90, ncomps, seed=1)
    cs = encoder.encode(img, EncoderParams(numresolutions=4, cblk_style=HT))
    out = decoder.decode(cs)
    for c in range(ncomps):
        np.testing.assert_array_equal(out.components[c].data,
                                      img.components[c].data)


def test_ht_tiled_16bit():
    img = _image(200, 150, 1, prec=16, seed=2)
    cs = encoder.encode(img, EncoderParams(numresolutions=3,
                                           tile_size=(96, 96),
                                           progression=Progression.RPCL,
                                           cblk_style=HT))
    out = decoder.decode(cs)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


def test_ht_rejects_rate_control():
    img = _image(64, 64)
    with pytest.raises(ValueError):
        encoder.encode(img, EncoderParams(cblk_style=HT, rates=(10.0,)))


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
def test_grok_decodes_our_ht(tmp_path):
    from grokimagecompression_tpu.io.pnm import read_pnm
    img = _image(170, 110, 1, seed=3)
    cs = encoder.encode(img, EncoderParams(numresolutions=5, cblk_style=HT))
    j2k = tmp_path / "ht.j2k"
    j2k.write_bytes(cs)
    out = tmp_path / "ht.pgm"
    subprocess.run([GRK_DECOMPRESS, "-i", str(j2k), "-o", str(out)],
                   check=True, capture_output=True)
    rec = read_pnm(str(out)).components[0].data
    np.testing.assert_array_equal(rec, img.components[0].data)


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
def test_we_decode_grok_ht(tmp_path):
    from grokimagecompression_tpu.io.pnm import write_pnm
    img = _image(170, 110, 1, seed=4)
    src = tmp_path / "in.pgm"
    write_pnm(str(src), img)
    j2k = tmp_path / "ht.j2k"
    subprocess.run([GRK_COMPRESS, "-i", str(src), "-o", str(j2k), "-M", "64"],
                   check=True, capture_output=True)
    out = decoder.decode(j2k.read_bytes())
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


@pytest.mark.skipif(not HAVE_GROK, reason="Grok reference binaries not built")
def test_grok_decodes_our_ht_rgb_tiled(tmp_path):
    from grokimagecompression_tpu.io.pnm import read_pnm
    img = _image(150, 120, 3, seed=5)
    cs = encoder.encode(img, EncoderParams(numresolutions=3,
                                           tile_size=(64, 64),
                                           cblk_style=HT))
    j2k = tmp_path / "ht3.j2k"
    j2k.write_bytes(cs)
    out = tmp_path / "ht3.ppm"
    subprocess.run([GRK_DECOMPRESS, "-i", str(j2k), "-o", str(out)],
                   check=True, capture_output=True)
    rec = read_pnm(str(out))
    for c in range(3):
        np.testing.assert_array_equal(rec.components[c].data,
                                      img.components[c].data)


def test_ht_rate_control():
    """HT byte-rate targeting via quantizer-step search (a capability
    the reference disables for HT)."""
    from grokimagecompression_tpu.core.params import Transform
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:512, 0:512]
    data = (128 + 60 * np.sin(yy / 37.0) * np.cos(xx / 29.0)
            + rng.normal(0, 12, (512, 512))).clip(0, 255).astype(np.int32)
    img = Image(xsiz=512, ysiz=512, components=[
        Component(data=data, prec=8, signed=False, dx=1, dy=1)])
    for ratio in (8.0, 24.0):
        cs = encoder.encode(img, EncoderParams(
            numresolutions=6, cblk_style=HT, transform=Transform.DWT_97,
            rates=(ratio,)))
        target = 512 * 512 // ratio
        assert len(cs) <= target * 1.01, (ratio, len(cs), target)
        assert len(cs) >= target * 0.5, (ratio, len(cs), target)
        out = decoder.decode(cs)
        err = np.sqrt(np.mean((out.components[0].data.astype(np.float64)
                               - data) ** 2))
        psnr = 20 * np.log10(255 / err)
        assert psnr > 25, (ratio, psnr)
