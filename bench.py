"""End-to-end benchmark: BASELINE config 1 (512x512 8-bit gray, lossless
5/3, 5+ levels, 1 layer, LRCP, 64x64 cblks) encode throughput.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured MP/s over the reference's single-core CPU
encode MP/s for the same config (BASELINE.md; the reference publishes
no figures — the denominator was measured by building /root/reference's
grk_compress with -H 1 on this machine class, see BASELINE.md).

Default mode benches the TPU serving path: a 64-frame batch through
encoder.encode_batch with the fused on-device pipeline (DC shift ->
MCT -> DWT -> HT cleanup coding -> packed segments as ONE XLA program
per chunk; device coding overlaps host packetization). This measures
the chip IN the loop — upload, device exec and compressed-bytes
download are all on the clock. NOTE: on this harness the chip sits
behind a tunnel (~30 ms round trip, ~45-65 MB/s each way), which is
the binding constraint; the same path on a locally-attached TPU is
bounded by PCIe/DMA instead.

Modes (env GROK_TPU_BENCH): "device" (default) serving batch;
"host" single-image host/native path; "mq" Part-1 MQ coder;
"decode" host decode throughput.
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
# 16.3 MP/s. Decode (grk_decompress, -H 1, HT stream): 19.5 MP/s.
GROK_SINGLE_CORE_MPS = 16.3
GROK_SINGLE_CORE_MQ_MPS = 4.8
GROK_SINGLE_CORE_DEC_MPS = 19.5


def _config1_image(seed=42, size=512, shift=0):
    from grokimagecompression_tpu.core.image import Component, Image

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    # Natural-image-like content: smooth gradient + noise, so the T1
    # workload is realistic rather than max-entropy.
    data = ((128 + 60 * np.sin(yy / 37.0) * np.cos(xx / 29.0)
             + rng.normal(0, 12, (size, size))).clip(0, 255)
            .astype(np.int32) + shift) % 256
    return Image(xsiz=size, ysiz=size, components=[
        Component(data=data, prec=8, signed=False, dx=1, dy=1)])


def bench_device_batch(mq: bool = False):
    """Serving-path throughput: 64 frames, fused device pipeline."""
    from grokimagecompression_tpu.codestream import encoder
    from grokimagecompression_tpu.core.params import EncoderParams

    params = EncoderParams(numresolutions=6,
                           cblk_style=0 if mq else 0x40)
    n = int(os.environ.get("BENCH_FRAMES", "64"))
    chunk = int(os.environ.get("BENCH_CHUNK", "32"))
    imgs = [_config1_image(shift=i) for i in range(n)]
    # Warmup compiles the chunked program shapes.
    encoder.encode_batch(imgs[:chunk], params, device=True, chunk=chunk)
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = encoder.encode_batch(imgs, params, device=True, chunk=chunk)
        best = min(best, time.perf_counter() - t0)
    assert len(out) == n and all(o for o in out)
    mps = n * 512 * 512 / best / 1e6
    if mq:
        return ("encode_throughput_mq_device_batch_512", mps,
                GROK_SINGLE_CORE_MQ_MPS)
    return ("encode_throughput_device_batch_512", mps, GROK_SINGLE_CORE_MPS)


def bench_single(ht: bool, device: bool, device_t1: bool = False):
    from grokimagecompression_tpu.codestream import encoder
    from grokimagecompression_tpu.core.params import EncoderParams

    if device_t1:
        os.environ["GROK_TPU_T1"] = "device"
    img = _config1_image()
    params = EncoderParams(numresolutions=6,
                           cblk_style=0x40 if ht else 0)
    encoder.encode(img, params, device=device)
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        encoder.encode(img, params, device=device)
        best = min(best, time.perf_counter() - t0)
    mps = 512 * 512 / best / 1e6
    name = ("encode_throughput_lossless_512" if ht
            else ("encode_throughput_mq_device_512" if device_t1
                  else "encode_throughput_mq_512"))
    return (name, mps, GROK_SINGLE_CORE_MPS if ht
            else GROK_SINGLE_CORE_MQ_MPS)


def bench_decode():
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.params import EncoderParams

    img = _config1_image()
    cs = encoder.encode(img, EncoderParams(numresolutions=6,
                                           cblk_style=0x40),
                        device=False)
    decoder.decode(cs)
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        decoder.decode(cs)
        best = min(best, time.perf_counter() - t0)
    mps = 512 * 512 / best / 1e6
    return ("decode_throughput_lossless_512", mps,
            GROK_SINGLE_CORE_DEC_MPS)


def main():
    mode = os.environ.get("GROK_TPU_BENCH", "device")
    if os.environ.get("GROK_TPU_BENCH_MQ", "") == "1":  # legacy switch
        mode = "mq"
    if mode == "device":
        name, mps, denom = bench_device_batch()
    elif mode == "host":
        name, mps, denom = bench_single(ht=True, device=False)
    elif mode == "mq":
        name, mps, denom = bench_single(ht=False, device=False)
    elif mode == "mq-device":
        name, mps, denom = bench_device_batch(mq=True)
    elif mode == "mq-device-single":
        name, mps, denom = bench_single(ht=False, device=True,
                                        device_t1=True)
    elif mode == "decode":
        name, mps, denom = bench_decode()
    else:
        raise SystemExit(f"unknown GROK_TPU_BENCH mode {mode!r}")
    print(json.dumps({
        "metric": name,
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / denom, 3),
    }))


if __name__ == "__main__":
    main()
