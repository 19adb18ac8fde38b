"""High-level codec API."""

import numpy as np
import pytest

from grokimagecompression_tpu import codec


def test_compress_roundtrip_gray():
    img = np.random.default_rng(0).integers(0, 256, (64, 80))
    data = codec.compress(img, lossless=True)
    out = codec.decompress(data)
    np.testing.assert_array_equal(out, img)


def test_compress_roundtrip_rgb_ht():
    img = np.random.default_rng(1).integers(0, 256, (60, 72, 3))
    data = codec.compress(img, lossless=True, ht=True)
    out = codec.decompress(data)
    np.testing.assert_array_equal(out, img)


def test_compress_ratio_and_layers():
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:128, 0:128]
    img = (128 + 60 * np.sin(yy / 11.0) * np.cos(xx / 13.0)
           + rng.normal(0, 5, (128, 128))).clip(0, 255).astype(np.int64)
    data = codec.compress(img, ratio=[32, 8])
    assert len(data) <= 128 * 128 / 8 + 500
    full = codec.decompress(data)
    first = codec.decompress(data, layers=1)
    e_full = np.mean((full - img) ** 2.0)
    e_first = np.mean((first - img) ** 2.0)
    assert e_full < e_first


def test_decompress_reduce_window():
    img = np.random.default_rng(3).integers(0, 256, (128, 128))
    data = codec.compress(img)
    half = codec.decompress(data, reduce=1)
    assert half.shape == (64, 64)
    win = codec.decompress(data, window=(10, 20, 74, 84))
    np.testing.assert_array_equal(win, img[20:84, 10:74])


def test_presets_and_jp2():
    img = np.random.default_rng(4).integers(0, 256, (48, 48, 3))
    for preset in codec.PRESETS:
        c = codec.Codec(preset=preset, container="jp2")
        data = c.compress_image(codec.to_image(img))
        out = codec.from_image(c.decompress_image(data))
        assert out.shape == img.shape


def test_psnr_target():
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:128, 0:128]
    img = (128 + 60 * np.sin(yy / 11.0) * np.cos(xx / 13.0)
           + rng.normal(0, 5, (128, 128))).clip(0, 255).astype(np.int64)
    data = codec.compress(img, psnr=38.0)
    out = codec.decompress(data)
    mse = np.mean((out - img) ** 2.0)
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 35.0
