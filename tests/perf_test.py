#!/usr/bin/env python
"""Performance harness over the five BASELINE benchmark configurations —
the analog of the reference's perf suite (reference:
tests/performance/perf_test.py: wall-clock per file x iterations x
threads, optional side-by-side comparison binary; perf_test_filelist.csv
drives file x iterations x threads).

Configs (BASELINE.json):
  1  512x512 8-bit gray, single tile, lossless 5/3, 5+ levels, 1 layer
  2  2048x2048 RGB, 9/7 + ICT at 1.0/0.5/0.25 bpp, multi-layer PCRD
  3  8192x8192 16-bit multi-component, 1024x1024 tiles, LRCP and RPCL
  4  digital-cinema 2K (and 4K layout) profile encode with rate caps
  5  random tile-access + ROI decode on a 16Kx16K tiled codestream

Usage: python tests/perf_test.py [--quick] [--grok] [--device]
                                 [--json PATH]
  --quick   smaller sizes (CI smoke; divides large dims by 4)
  --grok    also time the reference binaries on the same inputs
  --device  also time device (TPU) encode where the fused path applies
  --json P  write machine-readable results to P (the per-round record:
            PERF_r{N}.json)
Prints a table of MP/s per config; exit 0 always (informational).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

try:  # persistent XLA compile cache: device configs compile in minutes
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
except Exception:
    pass

from grokimagecompression_tpu.codestream import decoder, encoder  # noqa
from grokimagecompression_tpu.core.image import Component, Image  # noqa
from grokimagecompression_tpu.core.params import (  # noqa
    DecoderParams,
    EncoderParams,
    Progression,
    Transform,
)

BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
GRK_COMPRESS = os.path.abspath(os.path.join(BIN, "grk_compress"))
GRK_DECOMPRESS = os.path.abspath(os.path.join(BIN, "grk_decompress"))


def synth(w, h, ncomps=1, prec=8, seed=0):
    rng = np.random.default_rng(seed)
    # broadcast 1-D ramps, not np.mgrid: two h x w int64 grids are 4 GB
    # at 16K^2 and the mgrid fill has been observed wedging on an
    # allocator futex under a live accelerator backend
    yy = np.arange(h, dtype=np.float64)[:, None]
    xx = np.arange(w, dtype=np.float64)[None, :]
    mx = (1 << prec) - 1
    base = (mx / 2 + mx / 4 * np.sin(yy / 37.0) * np.cos(xx / 29.0)
            + rng.normal(0, mx / 20, (h, w))).clip(0, mx)
    return Image(xsiz=w, ysiz=h, components=[
        Component(data=base.astype(np.int32), prec=prec, signed=False,
                  dx=1, dy=1) for _ in range(ncomps)])


def best_of(fn, iters):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def run_config(name, img, params, results, iters=3, device=False,
               decode_params=None, grok=False, grok_args=None):
    px = (img.xsiz - img.x0) * (img.ysiz - img.y0)
    cs = encoder.encode(img, params)
    enc_t = best_of(lambda: encoder.encode(img, params), iters)
    dp = decode_params or DecoderParams()
    dec_t = best_of(lambda: decoder.decode(cs, dp), iters)
    row = {"config": name, "pixels": px, "bytes": len(cs),
           "encode_mps": round(px / enc_t / 1e6, 2),
           "decode_mps": round(px / dec_t / 1e6, 2)}
    if device:
        try:
            encoder.encode(img, params, device=True)
            dev_t = best_of(
                lambda: encoder.encode(img, params, device=True), iters)
            row["encode_device_mps"] = round(px / dev_t / 1e6, 2)
        except Exception as e:  # pragma: no cover - device optional
            row["encode_device_mps"] = None
            row["device_error"] = str(e)[:200]
    if grok and os.path.exists(GRK_COMPRESS):
        row.update(_grok_times(img, params, grok_args or [], iters))
    results.append(row)
    print(f"{name:<44}{row['encode_mps']:>9.1f}{row['decode_mps']:>9.1f}"
          f"{row.get('encode_device_mps') or '':>9}{len(cs):>12}")
    return cs


def _grok_times(img, params, extra, iters):
    """Single-core reference encode+decode MP/s on the same input."""
    from grokimagecompression_tpu.io.pnm import write_pnm
    px = (img.xsiz - img.x0) * (img.ysiz - img.y0)
    out = {}
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "s.ppm" if img.numcomps == 3 else "s.pgm")
        try:
            write_pnm(src, img)
        except Exception:
            return out
        j2k = os.path.join(td, "o.j2k")
        cmd = [GRK_COMPRESS, "-i", src, "-o", j2k, "-H", "1"]
        if params.cblk_style & 0x40:
            cmd += ["-M", "64"]
        if params.transform == Transform.DWT_97:
            cmd += ["-I"]
        if params.rates:
            # the reference requires descending ratio order (most
            # compressed layer first); ours lists layers first-to-last
            cmd += ["-r", ",".join(str(r) for r in
                                   sorted(params.rates, reverse=True))]
        if params.tile_size:
            cmd += ["-t", f"{params.tile_size[0]},{params.tile_size[1]}"]
        cmd += extra
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            r = subprocess.run(cmd, capture_output=True)
            best = min(best, time.perf_counter() - t0)
        if r.returncode == 0:
            out["grok_encode_mps"] = round(px / best / 1e6, 2)
            dst = os.path.join(td, "d.pgm")
            dcmd = [GRK_DECOMPRESS, "-i", j2k, "-o", dst, "-H", "1"]
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                r = subprocess.run(dcmd, capture_output=True)
                best = min(best, time.perf_counter() - t0)
            if r.returncode == 0:
                out["grok_decode_mps"] = round(px / best / 1e6, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--grok", action="store_true",
                    help="time the reference binaries side by side")
    ap.add_argument("--device", action="store_true",
                    help="also time device (TPU) encode")
    ap.add_argument("--json", default=None,
                    help="write results JSON to this path")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    s = 4 if args.quick else 1
    results = []
    # Build config 5's 16K^2 input BEFORE any device measurement: giant
    # host allocations crawl (observed: minutes inside one np fill,
    # sleeping on an allocator futex) once the accelerator backend's
    # tunnel client is live in-process.
    n5 = 16384 // s
    t5 = 1024 // s
    img5 = synth(n5, n5)
    print(f"{'config':<44}{'enc MP/s':>9}{'dec MP/s':>9}"
          f"{'dev MP/s':>9}{'bytes':>12}")

    # -- config 1: 512^2 gray lossless (MQ and HT block coders) --------
    run_config("1: 512^2 gray lossless 5/3 (MQ)", synth(512, 512),
               EncoderParams(numresolutions=6), results,
               iters=args.iters, grok=args.grok)
    run_config("1h: 512^2 gray lossless 5/3 (HT)", synth(512, 512),
               EncoderParams(numresolutions=6, cblk_style=0x40), results,
               iters=args.iters, device=args.device, grok=args.grok,
               grok_args=[])

    # -- config 2: 2048^2 RGB 9/7+ICT multi-layer PCRD ------------------
    # 1.0/0.5/0.25 bpp for 24 bpp source = compression ratios 24/48/96
    run_config("2: 2048^2 RGB 9/7+ICT 1.0/0.5/0.25bpp",
               synth(2048 // s, 2048 // s, 3),
               EncoderParams(numresolutions=6, transform=Transform.DWT_97,
                             rates=(24.0, 48.0, 96.0)), results,
               iters=args.iters, grok=args.grok)

    # -- config 3: 8192^2 16-bit multi-component tiled, LRCP + RPCL ----
    big = 8192 // s
    img3 = synth(big, big, 3, prec=16)
    for prog in (Progression.LRCP, Progression.RPCL):
        run_config(f"3: {big}^2x3 16-bit tiled 1024 HT {prog.name}",
                   img3,
                   EncoderParams(numresolutions=6,
                                 tile_size=(1024 // s, 1024 // s),
                                 cblk_style=0x40, progression=prog),
                   results, iters=max(1, args.iters - 1),
                   grok=args.grok)
    del img3

    # -- config 4: digital cinema 2K profile --------------------------
    from grokimagecompression_tpu.codestream import profiles
    img4 = synth(2048, 1080, 3, prec=12)
    prof4 = profiles.apply_cinema(EncoderParams(), img4, fps=24)
    px4 = 2048 * 1080
    cs4 = profiles.encode_with_profile(img4, prof4)
    enc_t = best_of(lambda: profiles.encode_with_profile(img4, prof4),
                    args.iters)
    dec_t = best_of(lambda: decoder.decode(cs4), args.iters)
    row4 = {"config": "4: cinema-2K 24fps profile",
            "pixels": px4, "bytes": len(cs4),
            "encode_mps": round(px4 / enc_t / 1e6, 2),
            "decode_mps": round(px4 / dec_t / 1e6, 2)}
    if args.device:
        try:
            profiles.encode_with_profile(img4, prof4, device=True)
            dev_t = best_of(lambda: profiles.encode_with_profile(
                img4, prof4, device=True), args.iters)
            row4["encode_device_mps"] = round(px4 / dev_t / 1e6, 2)
        except Exception as e:
            row4["device_error"] = str(e)[:200]
    if args.grok:
        from grokimagecompression_tpu.io.pnm import write_pnm
        import tempfile as _tf
        with _tf.TemporaryDirectory() as td:
            src = os.path.join(td, "c.ppm")
            # the reference's cinema path requires 12-bit TIFF/PPM RGB
            write_pnm(src, img4)
            j2k = os.path.join(td, "c.j2k")
            cmd = [GRK_COMPRESS, "-i", src, "-o", j2k, "-H", "1",
                   "-cinema2K", "24"]
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                r = subprocess.run(cmd, capture_output=True)
                best = min(best, time.perf_counter() - t0)
            if r.returncode == 0:
                row4["grok_encode_mps"] = round(px4 / best / 1e6, 2)
                dst = os.path.join(td, "c.ppm2.ppm")
                best = float("inf")
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    r = subprocess.run([GRK_DECOMPRESS, "-i", j2k, "-o",
                                        dst, "-H", "1"],
                                       capture_output=True)
                    best = min(best, time.perf_counter() - t0)
                if r.returncode == 0:
                    row4["grok_decode_mps"] = round(px4 / best / 1e6, 2)
    results.append(row4)
    print(f"{'4: cinema-2K 24fps profile':<44}"
          f"{px4/enc_t/1e6:>9.1f}{px4/dec_t/1e6:>9.1f}"
          f"{row4.get('encode_device_mps') or '':>9}"
          f"{len(cs4):>12}")

    # -- config 5: random tile access + ROI decode on 16K^2 tiled ------
    # (img5 pre-built before any device work; see top of main)
    cs5 = encoder.encode(
        img5, EncoderParams(numresolutions=6, tile_size=(t5, t5),
                            cblk_style=0x40, tlm_markers=True))
    del img5
    rng = np.random.default_rng(7)
    ntiles = (n5 // t5) ** 2
    tiles = rng.choice(ntiles, size=8, replace=False)

    def tile_access():
        for t in tiles:
            decoder.decode(cs5, DecoderParams(tile_index=int(t)))

    ta = best_of(tile_access, args.iters)
    roi = (n5 // 3, n5 // 3, n5 // 3 + 600, n5 // 3 + 600)

    def roi_decode():
        decoder.decode(cs5, DecoderParams(window=roi))

    tr = best_of(roi_decode, args.iters)
    px_t = 8 * t5 * t5
    px_r = 600 * 600
    row5a = {"config": "5: 16K^2 random tile access (8 tiles)",
             "pixels": px_t, "bytes": len(cs5),
             "decode_mps": round(px_t / ta / 1e6, 2)}
    row5b = {"config": "5: 16K^2 ROI 600^2 decode",
             "pixels": px_r,
             "decode_mps": round(px_r / tr / 1e6, 2)}
    if args.grok:
        import tempfile as _tf
        with _tf.TemporaryDirectory() as td:
            j2k = os.path.join(td, "big.j2k")
            open(j2k, "wb").write(cs5)
            dst = os.path.join(td, "r.pgm")
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                r = subprocess.run(
                    [GRK_DECOMPRESS, "-i", j2k, "-o", dst, "-H", "1",
                     "-d", f"{roi[0]},{roi[1]},{roi[2]},{roi[3]}"],
                    capture_output=True)
                best = min(best, time.perf_counter() - t0)
            if r.returncode == 0:
                row5b["grok_decode_mps"] = round(px_r / best / 1e6, 2)
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                ok = True
                for t in tiles:
                    r = subprocess.run(
                        [GRK_DECOMPRESS, "-i", j2k, "-o", dst, "-H", "1",
                         "-t", str(int(t))], capture_output=True)
                    ok = ok and r.returncode == 0
                best = min(best, time.perf_counter() - t0)
            if ok:
                row5a["grok_decode_mps"] = round(px_t / best / 1e6, 2)
    results.append(row5a)
    results.append(row5b)
    print(f"{'5: 16K^2 random tile access (8 tiles)':<44}"
          f"{'':>9}{px_t/ta/1e6:>9.1f}{'':>9}{len(cs5):>12}")
    print(f"{'5: 16K^2 ROI 600^2 decode':<44}"
          f"{'':>9}{px_r/tr/1e6:>9.1f}{'':>9}{'':>12}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"quick": args.quick, "iters": args.iters,
                       "results": results}, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
