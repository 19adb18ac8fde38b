"""End-to-end encode/decode round-trip tests (our encoder <-> our decoder)."""

import numpy as np
import pytest

from grokimagecompression_tpu.codestream.decoder import decode, read_header
from grokimagecompression_tpu.codestream.encoder import encode
from grokimagecompression_tpu.core.image import make_image
from grokimagecompression_tpu.core.params import (
    DecoderParams,
    EncoderParams,
    Progression,
    Transform,
)


def synth_gray(w, h, seed=0):
    """Smooth-ish synthetic image (wavelet-friendly but nontrivial)."""
    yy, xx = np.mgrid[0:h, 0:w]
    a = (128 + 100 * np.sin(xx / 7.0) * np.cos(yy / 9.0)).astype(np.int32)
    rng = np.random.default_rng(seed)
    a = np.clip(a + rng.integers(-8, 8, size=(h, w)), 0, 255)
    return a.astype(np.int32)


def psnr(a, b, peak):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(peak * peak / mse)


@pytest.mark.parametrize("w,h,numres", [(64, 64, 3), (64, 64, 6),
                                        (67, 41, 3), (13, 9, 2), (1, 1, 1),
                                        (128, 128, 6)])
def test_lossless_gray_roundtrip(w, h, numres):
    img = make_image([synth_gray(w, h)])
    params = EncoderParams(numresolutions=numres)
    data = encode(img, params)
    out = decode(data)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


def test_lossless_rgb_rct_roundtrip():
    comps = [synth_gray(64, 48, s) for s in range(3)]
    img = make_image(comps)
    data = encode(img, EncoderParams(numresolutions=4))
    out = decode(data)
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data, comps[c])


def test_lossless_random_noise_roundtrip():
    """Worst-case content must still round-trip exactly."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(40, 56)).astype(np.int32)
    img = make_image([a])
    data = encode(img, EncoderParams(numresolutions=3))
    out = decode(data)
    np.testing.assert_array_equal(out.components[0].data, a)


def test_lossless_16bit_roundtrip():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 2 ** 16, size=(32, 32)).astype(np.int32)
    img = make_image([a], prec=16)
    data = encode(img, EncoderParams(numresolutions=4))
    out = decode(data)
    np.testing.assert_array_equal(out.components[0].data, a)


def test_lossless_signed_roundtrip():
    rng = np.random.default_rng(5)
    a = rng.integers(-128, 128, size=(32, 32)).astype(np.int32)
    img = make_image([a], prec=8, signed=True)
    data = encode(img, EncoderParams(numresolutions=3))
    out = decode(data)
    np.testing.assert_array_equal(out.components[0].data, a)


@pytest.mark.parametrize("prog", [Progression.LRCP, Progression.RLCP,
                                  Progression.RPCL, Progression.PCRL,
                                  Progression.CPRL])
def test_progressions_roundtrip(prog):
    img = make_image([synth_gray(48, 48, s) for s in range(3)])
    data = encode(img, EncoderParams(numresolutions=3, progression=prog))
    out = decode(data)
    for c in range(3):
        np.testing.assert_array_equal(out.components[c].data,
                                      img.components[c].data)


def test_multitile_roundtrip():
    img = make_image([synth_gray(100, 80)])
    params = EncoderParams(numresolutions=3, tile_size=(32, 32))
    data = encode(img, params)
    out = decode(data)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


def test_precincts_roundtrip():
    img = make_image([synth_gray(64, 64)])
    params = EncoderParams(numresolutions=3, cblk_w_exp=4, cblk_h_exp=4,
                           precincts=[(6, 6)])
    data = encode(img, params)
    out = decode(data)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


def test_sop_eph_roundtrip():
    img = make_image([synth_gray(48, 32)])
    params = EncoderParams(numresolutions=3, sop_markers=True,
                           eph_markers=True)
    data = encode(img, params)
    out = decode(data)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


def test_lossy_97_psnr():
    a = synth_gray(64, 64)
    img = make_image([a])
    params = EncoderParams(numresolutions=4, transform=Transform.DWT_97)
    data = encode(img, params)
    out = decode(data)
    p = psnr(out.components[0].data, a, 255)
    assert p > 45.0, f"9/7 near-lossless PSNR too low: {p:.2f} dB"


def test_lossy_97_rgb_ict():
    comps = [synth_gray(64, 64, s) for s in range(3)]
    img = make_image(comps)
    params = EncoderParams(numresolutions=4, transform=Transform.DWT_97)
    data = encode(img, params)
    out = decode(data)
    for c in range(3):
        p = psnr(out.components[c].data, comps[c], 255)
        assert p > 40.0, f"comp {c} PSNR {p:.2f}"


def test_reduce_resolution_decode():
    a = synth_gray(64, 64)
    img = make_image([a])
    data = encode(img, EncoderParams(numresolutions=4))
    out = decode(data, DecoderParams(reduce=2))
    assert out.components[0].data.shape == (16, 16)


def test_header_parse():
    img = make_image([synth_gray(32, 32)])
    data = encode(img, EncoderParams(numresolutions=3,
                                     comment="hello world"))
    hdr = read_header(data)
    assert hdr.siz.xsiz == 32
    assert hdr.cod.numresolutions == 3
    assert "hello world" in hdr.comments


def test_truncated_stream_degrades():
    """A truncated codestream must not crash the decoder."""
    img = make_image([synth_gray(64, 64)])
    data = encode(img, EncoderParams(numresolutions=3))
    decode(data[: len(data) * 2 // 3])
