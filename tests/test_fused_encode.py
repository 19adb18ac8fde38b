"""Fused on-device HT encode (models/fused_encode.py): the whole encode
pipeline (DC shift -> MCT -> DWT -> block gather -> HT coding -> packed
segments) as one jitted program must be byte-identical to the staged
host path, including multi-tile, multi-component and edge geometries.
"""

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams

rng = np.random.default_rng(7)


def mk(w, h, ncomp=1, prec=8):
    comps = [
        Component(data=rng.integers(0, 2 ** prec, (h, w)).astype(np.int32),
                  prec=prec, signed=False, dx=1, dy=1)
        for _ in range(ncomp)
    ]
    return Image(xsiz=w, ysiz=h, components=comps)


CASES = [
    ("gray_512", lambda: mk(512, 512),
     EncoderParams(numresolutions=6, cblk_style=0x40)),
    ("rgb_odd", lambda: mk(333, 217, 3),
     EncoderParams(numresolutions=5, cblk_style=0x40)),
    ("tiled", lambda: mk(256, 256, 3),
     EncoderParams(numresolutions=6, cblk_style=0x40,
                   tile_size=(128, 128))),
    ("small_32cblk", lambda: mk(65, 40),
     EncoderParams(numresolutions=3, cblk_style=0x40,
                   cblk_w_exp=5, cblk_h_exp=5)),
    ("prec12", lambda: mk(128, 96, 1, prec=12),
     EncoderParams(numresolutions=4, cblk_style=0x40)),
]


@pytest.mark.parametrize("name,mkimg,params",
                         CASES, ids=[c[0] for c in CASES])
def test_fused_matches_host(name, mkimg, params):
    img = mkimg()
    fused = encoder.encode(img, params, device=True)
    host = encoder.encode(img, params, device=False)
    assert fused == host
    dec = decoder.decode(fused)
    for c in range(img.numcomps):
        assert np.array_equal(dec.components[c].data,
                              img.components[c].data)


def test_encode_batch_matches_sequential():
    imgs = [mk(160, 128) for _ in range(5)]
    params = EncoderParams(numresolutions=4, cblk_style=0x40)
    outs = encoder.encode_batch(imgs, params, device=True, chunk=2)
    for im, cs in zip(imgs, outs):
        assert cs == encoder.encode(im, params, device=False)


def test_encode_batch_fallback_heterogeneous():
    imgs = [mk(96, 64), mk(64, 96)]
    params = EncoderParams(numresolutions=3, cblk_style=0x40)
    outs = encoder.encode_batch(imgs, params, device=True)
    for im, cs in zip(imgs, outs):
        assert cs == encoder.encode(im, params, device=False)


@pytest.fixture
def force_device_mq(monkeypatch):
    """Route plain-MQ block coding through the fused device path (the
    lax.scan fallback services it on the CPU test mesh)."""
    monkeypatch.setenv("GROK_TPU_T1", "device")


MQ_CASES = [
    ("mq_gray", lambda: mk(96, 64),
     EncoderParams(numresolutions=3, cblk_w_exp=5, cblk_h_exp=5)),
    ("mq_rgb_odd", lambda: mk(67, 45, 3),
     EncoderParams(numresolutions=3, cblk_w_exp=5, cblk_h_exp=5)),
    ("mq_tiled", lambda: mk(96, 96),
     EncoderParams(numresolutions=3, cblk_w_exp=5, cblk_h_exp=5,
                   tile_size=(48, 48))),
]


@pytest.mark.parametrize("name,mkimg,params",
                         MQ_CASES, ids=[c[0] for c in MQ_CASES])
def test_fused_mq_matches_host(name, mkimg, params, force_device_mq):
    img = mkimg()
    fused = encoder.encode(img, params, device=True)
    import os
    os.environ["GROK_TPU_T1"] = "native"
    host = encoder.encode(img, params, device=False)
    assert fused == host
    dec = decoder.decode(fused)
    for c in range(img.numcomps):
        assert np.array_equal(dec.components[c].data,
                              img.components[c].data)


def test_encode_batch_mq_matches_sequential(force_device_mq):
    imgs = [mk(64, 48) for _ in range(3)]
    params = EncoderParams(numresolutions=3, cblk_w_exp=5, cblk_h_exp=5)
    outs = encoder.encode_batch(imgs, params, device=True, chunk=2)
    import os
    os.environ["GROK_TPU_T1"] = "native"
    for im, cs in zip(imgs, outs):
        assert cs == encoder.encode(im, params, device=False)


from conftest import natural_image as mk_natural
from conftest import psnr as _psnr


def _decode_psnrs(cs, img):
    dec = decoder.decode(cs)
    return [_psnr(dec.components[c].data, img.components[c].data, 255.0)
            for c in range(img.numcomps)]


def test_fused_irreversible_quality_parity():
    """Device 9/7 encodes quantize in float32 (no float64 on TPU), so
    the bytes can differ from the host's float64 deadzone at boundary
    coefficients — quality and size must still match."""
    from grokimagecompression_tpu.core.params import Transform
    img = mk_natural(128, 96, 3)
    params = EncoderParams(numresolutions=4, transform=Transform.DWT_97,
                           mct=True, cblk_style=0x40)
    fused = encoder.encode(img, params, device=True)
    host = encoder.encode(img, params, device=False)
    assert abs(len(fused) - len(host)) <= max(64, len(host) // 50)
    pf = _decode_psnrs(fused, img)
    ph = _decode_psnrs(host, img)
    for a, b in zip(pf, ph):
        assert abs(a - b) < 0.05, (pf, ph)


def test_fused_mq_pcrd_rate_control(force_device_mq):
    """Fused device MQ encode with PCRD: the device-supplied per-pass
    R-D tables must drive the allocator to the same truncation quality
    as the host path (identical rates; float32 distortion noise only),
    within the byte budget."""
    from grokimagecompression_tpu.core.params import Transform
    img = mk_natural(128, 128)
    params = EncoderParams(numresolutions=4, transform=Transform.DWT_97,
                           rates=(10.0,))
    fused = encoder.encode(img, params, device=True)
    import os
    os.environ["GROK_TPU_T1"] = "native"
    host = encoder.encode(img, params, device=False)
    budget = 128 * 128 // 10
    assert len(fused) <= budget + 512
    assert abs(len(fused) - len(host)) <= max(64, len(host) // 20)
    pf = _decode_psnrs(fused, img)[0]
    ph = _decode_psnrs(host, img)[0]
    assert abs(pf - ph) < 0.15, (pf, ph)


def test_fused_mq_pcrd_lossless_rates_reversible(force_device_mq):
    """Reversible fused PCRD: rates are exact (integers), so the
    device allocation matches the host byte-for-byte except float32
    distortion summation; assert the decoded output is identical and
    sizes agree tightly."""
    img = mk_natural(96, 96)
    params = EncoderParams(numresolutions=3, rates=(8.0, 0.0))
    fused = encoder.encode(img, params, device=True)
    import os
    os.environ["GROK_TPU_T1"] = "native"
    host = encoder.encode(img, params, device=False)
    # final layer is lossless in both: decode must reproduce the input
    dec = decoder.decode(fused)
    assert np.array_equal(dec.components[0].data, img.components[0].data)
    assert abs(len(fused) - len(host)) <= max(64, len(host) // 20)


def test_encode_batch_rate_controlled(force_device_mq):
    """Batched serving with rate control: the fused device programs
    supply per-pass R-D tables per frame; each frame's PCRD runs on the
    host during collect. Outputs must meet budgets and match the
    per-image encode path."""
    from grokimagecompression_tpu.core.params import Transform
    imgs = [mk_natural(96, 64) for _ in range(3)]
    params = EncoderParams(numresolutions=3, transform=Transform.DWT_97,
                           rates=(6.0,))
    outs = encoder.encode_batch(imgs, params, device=True, chunk=2)
    budget = 96 * 64 // 6
    for im, cs in zip(imgs, outs):
        assert len(cs) <= budget + 512
        assert cs == encoder.encode(im, params, device=True)
