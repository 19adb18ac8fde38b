#!/usr/bin/env python
"""Performance harness over the BASELINE benchmark configurations — the
analog of the reference's perf suite (reference:
tests/performance/perf_test.py: wall-clock per file x iterations x
threads, optional side-by-side comparison binary).

Usage: python tests/perf_test.py [--quick] [--grok]
  --quick  smaller sizes (CI smoke)
  --grok   also time the reference binaries on the same inputs
Prints a table of MP/s per config; exit 0 always (informational).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from grokimagecompression_tpu.codestream import decoder, encoder  # noqa
from grokimagecompression_tpu.core.image import Component, Image  # noqa
from grokimagecompression_tpu.core.params import (  # noqa
    EncoderParams,
    Progression,
    Transform,
)

BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
GRK_COMPRESS = os.path.abspath(os.path.join(BIN, "grk_compress"))


def synth(w, h, ncomps=1, prec=8, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    mx = (1 << prec) - 1
    base = (mx / 2 + mx / 4 * np.sin(yy / 37.0) * np.cos(xx / 29.0)
            + rng.normal(0, mx / 20, (h, w))).clip(0, mx)
    return Image(xsiz=w, ysiz=h, components=[
        Component(data=base.astype(np.int32), prec=prec, signed=False,
                  dx=1, dy=1) for _ in range(ncomps)])


def time_encode(img, params, iters=3):
    cs = encoder.encode(img, params)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        encoder.encode(img, params)
        best = min(best, time.perf_counter() - t0)
    return best, cs


def time_decode(cs, iters=3):
    decoder.decode(cs)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        decoder.decode(cs)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--grok", action="store_true",
                    help="time the reference binaries side by side")
    args = ap.parse_args()
    s = 2 if args.quick else 1

    configs = [
        ("1: 512^2 gray lossless 5/3 (MQ)", synth(512, 512),
         EncoderParams(numresolutions=6)),
        ("1h: 512^2 gray lossless HT", synth(512, 512),
         EncoderParams(numresolutions=6, cblk_style=0x40)),
        ("2: 2048^2 RGB 9/7 PCRD 8:1", synth(2048 // s, 2048 // s, 3),
         EncoderParams(numresolutions=6, transform=Transform.DWT_97,
                       rates=(8.0,))),
        ("3: 4096^2 tiled 1024 HT lossless",
         synth(4096 // s, 4096 // s),
         EncoderParams(numresolutions=6, tile_size=(1024 // s, 1024 // s),
                       cblk_style=0x40, progression=Progression.RPCL)),
    ]
    print(f"{'config':<38}{'enc MP/s':>10}{'dec MP/s':>10}{'bytes':>12}")
    for (name, img, params) in configs:
        px = (img.xsiz - img.x0) * (img.ysiz - img.y0)
        enc_t, cs = time_encode(img, params)
        dec_t = time_decode(cs)
        print(f"{name:<38}{px/enc_t/1e6:>10.1f}{px/dec_t/1e6:>10.1f}"
              f"{len(cs):>12}")
        if args.grok and os.path.exists(GRK_COMPRESS):
            from grokimagecompression_tpu.io.pnm import write_pnm
            with tempfile.TemporaryDirectory() as td:
                src = os.path.join(td, "s.ppm" if img.numcomps == 3
                                   else "s.pgm")
                write_pnm(src, img)
                cmd = [GRK_COMPRESS, "-i", src,
                       "-o", os.path.join(td, "o.j2k"), "-H", "1"]
                if params.cblk_style & 0x40:
                    cmd += ["-M", "64"]
                if params.transform == Transform.DWT_97:
                    cmd += ["-I"]
                if params.rates:
                    cmd += ["-r", ",".join(str(r) for r in params.rates)]
                if params.tile_size:
                    cmd += ["-t", f"{params.tile_size[0]},"
                                  f"{params.tile_size[1]}"]
                t0 = time.perf_counter()
                r = subprocess.run(cmd, capture_output=True)
                dt = time.perf_counter() - t0
                if r.returncode == 0:
                    print(f"{'   grok single-core':<38}"
                          f"{px/dt/1e6:>10.1f}{'':>10}{'':>12}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
