"""TPU device pipeline: run DC shift + MCT + DWT on the accelerator.

The device path is byte-identical to the host path (validated on a real
TPU v5e); enable it per call (device=True) or globally with
GROK_TPU_DEVICE=1. GROK_TPU_PALLAS=1 additionally selects the fused
Pallas DWT kernel on TPU backends.

Run: PYTHONPATH=.. python tpu_device.py
"""
import numpy as np

from grokimagecompression_tpu import codec
from grokimagecompression_tpu.core.params import EncoderParams
from grokimagecompression_tpu.codestream import encoder
from grokimagecompression_tpu.core.image import Component, Image

rng = np.random.default_rng(2)
a = rng.integers(0, 256, (512, 512, 3), dtype=np.int32)
img = Image(xsiz=512, ysiz=512, components=[
    Component(data=a[:, :, c], prec=8, signed=False, dx=1, dy=1)
    for c in range(3)])

host = encoder.encode(img, EncoderParams(), device=False)
dev = encoder.encode(img, EncoderParams(), device=True)
assert host == dev
print("device == host:", len(host), "bytes")
