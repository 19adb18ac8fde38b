"""End-to-end benchmark: BASELINE config 1 (512x512 8-bit gray, lossless
5/3, 5 levels, 1 layer, LRCP, 64x64 cblks) encode throughput.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured MP/s over the reference's single-core CPU encode
MP/s for the same config (BASELINE.md; reference publishes no figures, the
denominator below was measured by building /root/reference's grk_compress
with -H 1 on this machine class — see BASELINE.md procedure).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Measured on this host (2026-08-17), best of 4 minus the 6.4 ms process
# floor (16x16 input), .refbuild/bin/grk_compress on the exact config-1
# input: Part-1 MQ coder (-H 1): 4.8 MP/s; HT coder (-H 1 -M 64):
# 16.3 MP/s. The benchmark below encodes losslessly with the HT coder
# (both codecs' fastest standards-compliant lossless mode), so the
# denominator is the reference's HT single-core number.
GROK_SINGLE_CORE_MPS = 16.3
GROK_SINGLE_CORE_MQ_MPS = 4.8


def main():
    from grokimagecompression_tpu.codestream import encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams

    rng = np.random.default_rng(42)
    size = 512
    # Natural-image-like content: smooth gradient + noise, so T1 workload
    # is realistic rather than max-entropy.
    yy, xx = np.mgrid[0:size, 0:size]
    data = (128 + 60 * np.sin(yy / 37.0) * np.cos(xx / 29.0)
            + rng.normal(0, 12, (size, size))).clip(0, 255).astype(np.int32)
    img = Image(xsiz=size, ysiz=size, components=[
        Component(data=data, prec=8, signed=False, dx=1, dy=1)])
    # HT (Part 15) block coding: the framework's fastest lossless mode
    # (set GROK_TPU_BENCH_MQ=1 to bench the Part-1 MQ coder instead).
    ht = os.environ.get("GROK_TPU_BENCH_MQ", "") != "1"
    params = EncoderParams(numresolutions=6, cblk_style=0x40 if ht else 0)

    # Device DWT helps batched multi-tile loads; for this single small tile
    # the host path avoids per-call transfer overhead (set
    # GROK_TPU_DEVICE=1 to force the device pipeline).
    use_device = os.environ.get("GROK_TPU_DEVICE", "0") == "1"
    # Warmup (jit compile).
    encoder.encode(img, params, device=use_device)

    # Best-of-N: the machine shares cores with harness processes, so the
    # minimum is the faithful throughput estimate.
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        cs = encoder.encode(img, params, device=use_device)
        best = min(best, time.perf_counter() - t0)
    mps = (size * size) / best / 1e6

    print(json.dumps({
        "metric": "encode_throughput_lossless_512",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / GROK_SINGLE_CORE_MPS, 3),
    }))


if __name__ == "__main__":
    main()
