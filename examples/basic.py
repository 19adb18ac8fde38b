"""Basic usage: compress/decompress numpy arrays.

Run: PYTHONPATH=.. python basic.py
"""
import numpy as np

from grokimagecompression_tpu import codec

# Natural-image-like content (smooth structure + grain).
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:512, 0:512]
base = 128 + 60 * np.sin(yy / 37.0) * np.cos(xx / 29.0)
image = np.stack([(base + rng.normal(0, 10, (512, 512))).clip(0, 255)
                  for _ in range(3)], axis=-1).astype(np.uint8)

# Lossless (bit-exact) with the HT block coder - the fastest mode.
data = codec.compress(image, lossless=True, ht=True)
restored = codec.decompress(data)
assert np.array_equal(restored, image.astype(np.int32))
print(f"lossless: {image.nbytes} -> {len(data)} bytes")

# Lossy at a 20:1 target ratio (9/7 + PCRD rate control).
data = codec.compress(image, ratio=20.0)
approx = codec.decompress(data)
rmse = np.sqrt(np.mean((approx.astype(float) - image) ** 2))
print(f"20:1 lossy: {len(data)} bytes, RMSE {rmse:.2f}")

# Quality layers: decode a fast preview from the same codestream.
data = codec.compress(image, ratio=[50.0, 10.0, 2.0])
preview = codec.decompress(data, layers=1)     # coarsest layer only
thumb = codec.decompress(data, reduce=3)       # 1/8 resolution
print(f"progressive: preview RMSE "
      f"{np.sqrt(np.mean((preview.astype(float) - image) ** 2)):.2f}, "
      f"thumb {thumb.shape}")
