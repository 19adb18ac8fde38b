"""Native C++ T1/MQ coder vs the Python bit-exactness oracle."""

import numpy as np
import pytest

from grokimagecompression_tpu.t1 import t1_np

t1_native = pytest.importorskip(
    "grokimagecompression_tpu.native.t1_native",
    reason="native T1 library unavailable (g++ build failed?)")

STYLES = [0, t1_np.CBLKSTY_LAZY, t1_np.CBLKSTY_RESET, t1_np.CBLKSTY_TERMALL,
          t1_np.CBLKSTY_SEGSYM,
          t1_np.CBLKSTY_LAZY | t1_np.CBLKSTY_TERMALL,
          t1_np.CBLKSTY_LAZY | t1_np.CBLKSTY_SEGSYM]


def _seg_lengths(passes):
    segs, last = [], 0
    for p in passes:
        if p.terminated:
            segs.append(p.rate - last)
            last = p.rate
    return segs


@pytest.mark.parametrize("style", STYLES)
def test_native_encode_matches_python(style):
    rng = np.random.default_rng(style)
    for trial in range(6):
        h, w = rng.integers(1, 65, 2)
        orient = int(rng.integers(0, 4))
        bits = int(rng.integers(1, 14))
        mag = rng.integers(0, 1 << bits, (h, w)).astype(np.uint32)
        if trial == 0:
            mag[:] = 0
        neg = rng.integers(0, 2, (h, w)).astype(np.uint8)
        ref = t1_np.encode_cblk(mag, neg, orient, style)
        nat = t1_native.encode_cblk(mag, neg, orient, style)
        assert ref[0] == nat[0]
        assert ref[1] == nat[1] and ref[2] == nat[2]
        for p, q in zip(ref[3], nat[3]):
            assert p.rate == q.rate
            assert p.terminated == q.terminated
            assert abs(p.distortion - q.distortion) < 1e-6


@pytest.mark.parametrize("style", STYLES)
def test_native_decode_roundtrip(style):
    rng = np.random.default_rng(100 + style)
    for _ in range(4):
        h, w = rng.integers(1, 65, 2)
        orient = int(rng.integers(0, 4))
        mag = rng.integers(0, 1 << 11, (h, w)).astype(np.uint32)
        neg = rng.integers(0, 2, (h, w)).astype(np.uint8)
        data, numbps, npasses, passes = t1_native.encode_cblk(
            mag, neg, orient, style)
        segs = _seg_lengths(passes) if style else None
        m2, n2 = t1_native.decode_cblk(data, segs, w, h, orient, numbps,
                                       npasses, style)
        np.testing.assert_array_equal(m2, mag)
        nz = mag > 0
        np.testing.assert_array_equal(n2[nz], neg[nz])


def test_native_batch_matches_single():
    rng = np.random.default_rng(5)
    blocks = []
    for _ in range(40):
        h, w = rng.integers(1, 65, 2)
        mag = rng.integers(0, 1 << 10, (h, w)).astype(np.uint32)
        neg = rng.integers(0, 2, (h, w)).astype(np.uint8)
        blocks.append((mag, neg, int(rng.integers(0, 4))))
    batch = t1_native.encode_cblk_batch(blocks, 0, nthreads=4)
    for (mag, neg, orient), (dat, numbps, npasses, passes) in zip(
            blocks, batch):
        d2, nb2, np2, p2 = t1_native.encode_cblk(mag, neg, orient, 0)
        assert dat == d2 and numbps == nb2 and npasses == np2
        assert [p.rate for p in passes] == [p.rate for p in p2]
    # batch decode
    jobs = [(dat, None, m.shape[1], m.shape[0], o, nb, npp)
            for (m, g, o), (dat, nb, npp, _) in zip(blocks, batch)]
    dec = t1_native.decode_cblk_batch(jobs, 0, nthreads=4)
    for (mag, neg, orient), (m2, n2) in zip(blocks, dec):
        np.testing.assert_array_equal(m2, mag)


def test_python_decode_of_native_stream():
    rng = np.random.default_rng(9)
    mag = rng.integers(0, 1 << 9, (33, 17)).astype(np.uint32)
    neg = rng.integers(0, 2, (33, 17)).astype(np.uint8)
    data, numbps, npasses, _ = t1_native.encode_cblk(mag, neg, 2, 0)
    m2, n2 = t1_np.decode_cblk(data, None, 17, 33, 2, numbps, npasses, 0)
    np.testing.assert_array_equal(m2, mag)


@pytest.mark.parametrize("style", [0x08, 0x09, 0x10, 0x18, 0x2D, 0x3F])
def test_vsc_pterm_styles(style):
    rng = np.random.default_rng(style + 77)
    for _ in range(3):
        h, w = [int(v) for v in rng.integers(1, 65, 2)]
        orient = int(rng.integers(0, 4))
        mag = rng.integers(0, 1 << 10, (h, w)).astype(np.uint32)
        neg = rng.integers(0, 2, (h, w)).astype(np.uint8)
        ref = t1_np.encode_cblk(mag, neg, orient, style)
        nat = t1_native.encode_cblk(mag, neg, orient, style)
        assert ref[0] == nat[0]
        segs = _seg_lengths(ref[3])
        m2, n2 = t1_native.decode_cblk(
            ref[0], segs if len(segs) > 1 else None, w, h, orient,
            ref[1], ref[2], style)
        np.testing.assert_array_equal(m2, mag)


def test_fused_decode_matches_fallback(monkeypatch):
    """GROK_TPU_FUSED_DEC=0 (per-block decode + Python placement) must
    reproduce the fused band-scatter decode exactly, lossless and lossy."""
    import numpy as np
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams, Transform

    rng = np.random.default_rng(11)
    d = rng.integers(0, 256, (96, 130, 3)).astype(np.int32)
    img = Image(xsiz=130, ysiz=96, components=[
        Component(data=d[:, :, c], prec=8, signed=False, dx=1, dy=1)
        for c in range(3)])
    for params in (EncoderParams(),                      # 5/3 MQ
                   EncoderParams(cblk_style=0x40),       # 5/3 HT
                   EncoderParams(transform=Transform.DWT_97)):  # 9/7 MQ
        cs = encoder.encode(img, params, device=False)
        fused = decoder.decode(cs)
        monkeypatch.setenv("GROK_TPU_FUSED_DEC", "0")
        plain = decoder.decode(cs)
        monkeypatch.delenv("GROK_TPU_FUSED_DEC")
        for c in range(3):
            assert np.array_equal(fused.components[c].data,
                                  plain.components[c].data)
