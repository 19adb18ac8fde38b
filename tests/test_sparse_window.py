"""Sparse-array backed windowed decode (reference:
src/lib/jp2/transform/sparse_array.h + dwt.cpp decode_partial_tile)."""

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import (
    DecoderParams,
    EncoderParams,
    Transform,
)
from grokimagecompression_tpu.core.sparse import SparseArray


def test_sparse_array_basic():
    sa = SparseArray(200, 100, dtype=np.int32, chunk=64)
    assert sa.allocated_chunks == 0
    data = np.arange(20 * 30, dtype=np.int32).reshape(20, 30)
    sa.write(50, 40, data)
    np.testing.assert_array_equal(sa.read(50, 40, 80, 60), data)
    # untouched regions read as zeros; reads may overrun the bounds
    assert (sa.read(0, 0, 10, 10) == 0).all()
    out = sa.read(190, 90, 210, 110)
    assert out.shape == (20, 20)
    assert (out == 0).all()
    # only the chunks under the write are allocated
    assert sa.allocated_chunks <= 4


def test_sparse_array_chunk_straddle():
    sa = SparseArray(300, 300, chunk=64)
    rng = np.random.default_rng(0)
    a = rng.integers(-100, 100, (130, 130)).astype(np.int32)
    sa.write(60, 60, a)  # straddles multiple chunk boundaries
    np.testing.assert_array_equal(sa.read(60, 60, 190, 190), a)
    np.testing.assert_array_equal(sa.read(0, 0, 300, 300)[60:190, 60:190], a)


def _image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    data = (128 + 60 * np.sin(yy / 17.0) * np.cos(xx / 23.0)
            + rng.normal(0, 10, (h, w))).clip(0, 255).astype(np.int32)
    return Image(xsiz=w, ysiz=h, components=[
        Component(data=data, prec=8, signed=False, dx=1, dy=1)])


@pytest.mark.parametrize("transform", [Transform.DWT_53, Transform.DWT_97])
def test_window_decode_single_big_tile(transform):
    """Window decode of a large single-tile image equals the crop of the
    full decode (the sparse + partial-DWT path)."""
    img = _image(1024, 768, seed=3)
    cs = encoder.encode(img, EncoderParams(numresolutions=6,
                                           transform=transform))
    full = decoder.decode(cs)
    for win in [(100, 50, 260, 220), (0, 0, 64, 64), (900, 700, 1024, 768),
                (511, 383, 513, 385)]:
        part = decoder.decode(cs, DecoderParams(window=win))
        x0, y0, x1, y1 = win
        np.testing.assert_array_equal(
            part.components[0].data,
            full.components[0].data[y0:y1, x0:x1])


def test_window_decode_with_reduce():
    img = _image(512, 512, seed=4)
    cs = encoder.encode(img, EncoderParams(numresolutions=6))
    for reduce in (1, 2):
        full = decoder.decode(cs, DecoderParams(reduce=reduce))
        win = (40, 60, 200, 300)
        part = decoder.decode(cs, DecoderParams(window=win, reduce=reduce))
        s = 1 << reduce
        x0 = -(-win[0] // s)
        y0 = -(-win[1] // s)
        x1 = -(-win[2] // s)
        y1 = -(-win[3] // s)
        np.testing.assert_array_equal(part.components[0].data,
                                      full.components[0].data[y0:y1, x0:x1])


def test_window_decode_memory_is_o_window(monkeypatch):
    """Decoding a small window of a big single-tile image must allocate
    band storage proportional to the window, not the tile."""
    from grokimagecompression_tpu.core import sparse as sparse_mod

    allocated = []
    orig_write = sparse_mod.SparseArray.write

    def tracking_write(self, x0, y0, data):
        orig_write(self, x0, y0, data)
        allocated.append(self.allocated_bytes)

    monkeypatch.setattr(sparse_mod.SparseArray, "write", tracking_write)

    img = _image(2048, 2048, seed=5)
    cs = encoder.encode(img, EncoderParams(numresolutions=6))
    full = decoder.decode(cs)
    allocated.clear()
    win = (512, 512, 640, 640)
    part = decoder.decode(cs, DecoderParams(window=win))
    np.testing.assert_array_equal(
        part.components[0].data,
        full.components[0].data[512:640, 512:640])
    total_sparse = sum(allocated[-1:]) if allocated else 0
    # all sparse band stores together must be far below the full-tile
    # coefficient footprint (2048*2048*4 = 16 MB)
    peak = max(allocated) if allocated else 0
    assert peak < 2 * 1024 * 1024, peak
