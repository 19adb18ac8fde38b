"""Large-image workflows: tiles, region decode, streaming IO.

Run: PYTHONPATH=.. python tiled_streaming.py
"""
import numpy as np

from grokimagecompression_tpu import codec
from grokimagecompression_tpu.codestream import decoder
from grokimagecompression_tpu.core.params import DecoderParams

rng = np.random.default_rng(1)
big = rng.integers(0, 256, (2048, 2048), dtype=np.int32).astype(np.uint8)

# Tiled codestream: enables parallel coding and random access.
data = codec.compress(big, ht=True, tile_size=(512, 512))

# Decode only a 200x300 region - O(window) work and memory.
img = decoder.decode(data, DecoderParams(window=(800, 900, 1100, 1100)))
region = img.components[0].data
assert np.array_equal(region, big[900:1100, 800:1100].astype(np.int32))
print("region decode OK", region.shape)

# Decode one tile by index (tile-sized output, like grk_decompress -t).
tile = decoder.decode(data, DecoderParams(tile_index=5))
print("tile 5:", tile.components[0].data.shape)

# Batched serving: many images, one call.
frames = [rng.integers(0, 256, (256, 256), dtype=np.int32).astype(np.uint8)
          for _ in range(8)]
streams = codec.compress_batch(frames, ht=True)
outs = codec.decompress_batch(streams)
assert all(np.array_equal(o, f.astype(np.int32))
           for o, f in zip(outs, frames))
print("batch of", len(frames), "OK")
