"""Device (JAX) decode path: inverse DWT + MCT + DC unshift on device.

Reversible decode must be bit-exact with the host path; irreversible is
allowed float op-order differences within the conformance tolerance
(reference anchors: dwt.cpp:1208/2154, TileProcessor.cpp:1303).
"""

import numpy as np

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams, Transform


def _img(w, h, ncomps=1, seed=0):
    rng = np.random.default_rng(seed)
    comps = [Component(data=rng.integers(0, 256, (h, w)).astype(np.int32),
                       prec=8, signed=False, dx=1, dy=1)
             for _ in range(ncomps)]
    return Image(xsiz=w, ysiz=h, components=comps)


def test_device_decode_reversible_bit_exact():
    img = _img(250, 180, 3, seed=1)
    cs = encoder.encode(img, EncoderParams(numresolutions=4,
                                           tile_size=(128, 128)))
    host = decoder.decode(cs, device=False)
    dev = decoder.decode(cs, device=True)
    for c in range(3):
        np.testing.assert_array_equal(host.components[c].data,
                                      dev.components[c].data)
        np.testing.assert_array_equal(dev.components[c].data,
                                      img.components[c].data)


def test_device_decode_irreversible_tolerance():
    img = _img(192, 160, 3, seed=2)
    cs = encoder.encode(img, EncoderParams(numresolutions=4,
                                           transform=Transform.DWT_97))
    host = decoder.decode(cs, device=False)
    dev = decoder.decode(cs, device=True)
    for c in range(3):
        d = np.abs(host.components[c].data.astype(np.int64)
                   - dev.components[c].data)
        assert d.max() <= 1


def test_device_decode_ht():
    img = _img(200, 120, seed=3)
    cs = encoder.encode(img, EncoderParams(cblk_style=0x40))
    dev = decoder.decode(cs, device=True)
    np.testing.assert_array_equal(dev.components[0].data,
                                  img.components[0].data)


def test_device_decode_falls_back_for_window_and_reduce():
    from grokimagecompression_tpu.core.params import DecoderParams
    img = _img(256, 256, seed=4)
    cs = encoder.encode(img, EncoderParams(numresolutions=5))
    red = decoder.decode(cs, DecoderParams(reduce=1), device=True)
    assert red.components[0].data.shape == (128, 128)
    win = decoder.decode(cs, DecoderParams(window=(32, 32, 96, 96)),
                         device=True)
    np.testing.assert_array_equal(
        win.components[0].data, img.components[0].data[32:96, 32:96])


def test_fused_device_decode_pixel_identical(monkeypatch):
    """Fully-fused device decode (entropy + inverse in one program,
    GROK_TPU_T1=device + device=True): pixel-identical for lossless HT;
    <= 1 LSB for 9/7 (device float DWT, same tolerance as the
    device_inv_comps path)."""
    import numpy as np

    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import (EncoderParams,
                                                      Transform)
    rng = np.random.default_rng(17)
    d = rng.integers(0, 256, (96, 160)).astype(np.int32)
    img = Image(xsiz=160, ysiz=96, components=[
        Component(data=d, prec=8, signed=False, dx=1, dy=1)])
    monkeypatch.setenv("GROK_TPU_T1", "device")
    p = EncoderParams(numresolutions=3, cblk_style=0x40)
    cs = encoder.encode(img, p, device=False)
    monkeypatch.delenv("GROK_TPU_T1")
    host = decoder.decode(cs, device=False)
    monkeypatch.setenv("GROK_TPU_T1", "device")
    dev = decoder.decode(cs, device=True)
    monkeypatch.delenv("GROK_TPU_T1")
    np.testing.assert_array_equal(dev.components[0].data,
                                  host.components[0].data)
    np.testing.assert_array_equal(dev.components[0].data, d)

    p2 = EncoderParams(numresolutions=3, cblk_style=0x40,
                       transform=Transform.DWT_97)
    cs2 = encoder.encode(img, p2, device=False)
    h2 = decoder.decode(cs2, device=False)
    monkeypatch.setenv("GROK_TPU_T1", "device")
    d2 = decoder.decode(cs2, device=True)
    monkeypatch.delenv("GROK_TPU_T1")
    diff = np.abs(h2.components[0].data.astype(np.int64)
                  - d2.components[0].data)
    assert diff.max() <= 1


def test_decode_batch_device_pixel_identical():
    """decode_batch through the fused Pallas program == per-frame host
    decode, including a frame with all-empty blocks."""
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import (EncoderParams,
                                                      Transform)
    rng = np.random.default_rng(5)
    frames = []
    for i in range(5):
        if i == 2:
            d = np.zeros((96, 128), np.int32)
            d[10, 10] = 200
        else:
            d = rng.integers(0, 256, (96, 128)).astype(np.int32)
        frames.append(Image(xsiz=128, ysiz=96, components=[
            Component(data=d, prec=8, signed=False, dx=1, dy=1)]))
    for tf in (Transform.DWT_53, Transform.DWT_97):
        p = EncoderParams(numresolutions=4, cblk_style=0x40, transform=tf)
        css = [encoder.encode(f, p, device=False) for f in frames]
        ref = [decoder.decode(cs) for cs in css]
        got = decoder.decode_batch(css, device=True, chunk=3)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r.components[0].data,
                                          g.components[0].data)


def test_decode_batch_widened_gate_tiled_coc_poc_ppm():
    """Round-5 widened decode_batch gate: multi-tile streams, QCC/COC,
    POC, and PPM streams must run the fused batch path (or an exact
    fallback) pixel-identical to per-frame host decode (reference decode
    generality: src/lib/jp2/t2/T2.cpp:194-268)."""
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import (EncoderParams,
                                                      Progression)
    rng = np.random.default_rng(9)
    frames = []
    for i in range(3):
        comps = [Component(data=rng.integers(0, 256, (64, 96))
                           .astype(np.int32), prec=8, signed=False,
                           dx=1, dy=1) for _ in range(3)]
        frames.append(Image(xsiz=96, ysiz=64, components=comps))
    configs = [
        ("tiled", EncoderParams(numresolutions=3, cblk_style=0x40,
                                tile_size=(32, 32))),
        ("tiled RPCL", EncoderParams(numresolutions=3, cblk_style=0x40,
                                     tile_size=(32, 32),
                                     progression=Progression.RPCL)),
        ("PPM", EncoderParams(numresolutions=3, cblk_style=0x40,
                              tile_size=(32, 32), ppm_markers=True)),
        ("POC", None),  # filled below with PocEntry tuples
    ]
    from grokimagecompression_tpu.codestream.markers import PocEntry
    configs[-1] = ("POC", EncoderParams(
        numresolutions=3, cblk_style=0x40,
        pocs=(PocEntry(rs=0, cs=0, lye=1, re=2, ce=3,
                       prog=Progression.RLCP),
              PocEntry(rs=2, cs=0, lye=1, re=3, ce=3,
                       prog=Progression.CPRL))))
    for name, p in configs:
        css = [encoder.encode(f, p, device=False) for f in frames]
        ref = [decoder.decode(cs) for cs in css]
        got = decoder.decode_batch(css, device=True, chunk=2)
        for r, g in zip(ref, got):
            for c in range(3):
                np.testing.assert_array_equal(
                    r.components[c].data, g.components[c].data,
                    err_msg=f"{name} comp {c}")


def test_decode_batch_truncated_tiled_matches_single_decode():
    """Truncated tiled streams through decode_batch must match the
    single-stream decode() exactly: tiles with NO tile-parts stay zero
    in the canvas (not DC-midline), partially-present tiles degrade the
    same way. (The reference segfaults on such streams; we must not.)"""
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams
    rng = np.random.default_rng(5)
    img = Image(xsiz=128, ysiz=96, components=[
        Component(data=rng.integers(0, 256, (96, 128)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)])
    p = EncoderParams(numresolutions=3, cblk_style=0x40,
                      tile_size=(64, 64))
    cs = encoder.encode(img, p, device=False)
    for frac in (0.35, 0.6, 0.95):
        t1 = cs[: int(len(cs) * frac)]
        ref = decoder.decode(t1, device=False)
        got = decoder.decode_batch([t1, t1], device=True, chunk=3)
        for g in got:
            np.testing.assert_array_equal(
                g.components[0].data, ref.components[0].data,
                err_msg=f"truncation {frac}")
