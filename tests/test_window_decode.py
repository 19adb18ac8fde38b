"""Windowed (region) decode: window output must equal the corresponding
crop of the full decode — the reference's invariance oracle (SURVEY.md §4:
windowed/tiled decode vs whole-image decode)."""

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import (
    DecoderParams,
    EncoderParams,
    Progression,
    Transform,
)


def _image(w, h, ncomps=1, seed=0):
    rng = np.random.default_rng(seed)
    comps = [
        Component(data=rng.integers(0, 256, (h, w)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)
        for _ in range(ncomps)
    ]
    return Image(xsiz=w, ysiz=h, components=comps)


WINDOWS = [(0, 0, 64, 64), (37, 21, 150, 101), (100, 80, 200, 160),
           (199, 159, 200, 160)]


@pytest.mark.parametrize("window", WINDOWS)
@pytest.mark.parametrize("transform", [Transform.DWT_53, Transform.DWT_97])
def test_window_matches_full_crop(window, transform):
    img = _image(200, 160, seed=1)
    cs = encoder.encode(img, EncoderParams(numresolutions=4,
                                           transform=transform,
                                           tile_size=(96, 96)))
    full = decoder.decode(cs).components[0].data
    win = decoder.decode(cs, DecoderParams(window=window))
    x0, y0, x1, y1 = window
    np.testing.assert_array_equal(win.components[0].data,
                                  full[y0:y1, x0:x1])
    assert win.x0 == x0 and win.y0 == y0


def test_window_with_reduce():
    img = _image(256, 256, seed=2)
    cs = encoder.encode(img, EncoderParams(numresolutions=5))
    full = decoder.decode(cs, DecoderParams(reduce=2)).components[0].data
    win = decoder.decode(cs, DecoderParams(reduce=2,
                                           window=(64, 32, 192, 160)))
    np.testing.assert_array_equal(win.components[0].data,
                                  full[8:40, 16:48])


def test_window_rgb_tiled_rpcl():
    img = _image(180, 140, ncomps=3, seed=3)
    cs = encoder.encode(img, EncoderParams(numresolutions=3,
                                           tile_size=(64, 64),
                                           progression=Progression.RPCL))
    full = decoder.decode(cs)
    win = decoder.decode(cs, DecoderParams(window=(50, 40, 130, 100)))
    for c in range(3):
        np.testing.assert_array_equal(
            win.components[c].data,
            full.components[c].data[40:100, 50:130])


def test_empty_window_rejected():
    img = _image(64, 64)
    cs = encoder.encode(img, EncoderParams(numresolutions=3))
    with pytest.raises(ValueError):
        decoder.decode(cs, DecoderParams(window=(70, 0, 80, 10)))


def test_window_skips_blocks():
    """A small window on a large tiled image must skip most T1 work."""
    img = _image(512, 512, seed=4)
    cs = encoder.encode(img, EncoderParams(numresolutions=5,
                                           tile_size=(128, 128)))
    import time
    t0 = time.perf_counter()
    full = decoder.decode(cs)
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    win = decoder.decode(cs, DecoderParams(window=(0, 0, 64, 64)))
    t_win = time.perf_counter() - t0
    np.testing.assert_array_equal(win.components[0].data,
                                  full.components[0].data[:64, :64])
    assert t_win < t_full * 0.6, (t_win, t_full)


def test_window_uses_native_banded_scatter(monkeypatch):
    """The window path must ride the native banded scatter (per-band
    bounding-box arrays), not silently fall back to the per-block
    Python placement — the SparseArray path stays for mixed styles."""
    import numpy as np

    from grokimagecompression_tpu.codestream import decoder, encoder
    import grokimagecompression_tpu.core.sparse as sparse_mod
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import (DecoderParams,
                                                      EncoderParams)

    calls = {"n": 0}
    orig = sparse_mod.SparseArray.__init__

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(sparse_mod.SparseArray, "__init__", counting)
    rng = np.random.default_rng(8)
    d = rng.integers(0, 256, (256, 256)).astype(np.int32)
    img = Image(xsiz=256, ysiz=256, components=[
        Component(data=d, prec=8, signed=False, dx=1, dy=1)])
    cs = encoder.encode(img, EncoderParams(numresolutions=4,
                                           cblk_style=0x40), device=False)
    out = decoder.decode(cs, DecoderParams(window=(50, 60, 150, 170)))
    assert calls["n"] == 0, "window decode fell back to SparseArray"
    full = decoder.decode(cs)
    assert np.array_equal(out.components[0].data,
                          full.components[0].data[60:170, 50:150])
