#!/usr/bin/env python
"""Decoder fuzz harness — the analog of the reference's fuzzers
(reference: tests/fuzzers/grk_decompress_fuzzer.cpp: arbitrary bytes
through memory-stream decode, whole-image then tile-by-tile).

Feeds the decoder (1) random mutations of valid codestreams, (2) random
truncations, (3) pure garbage, and (4) structure-aware marker-payload
mutations. The decoder must either produce an image or raise a
controlled error (ValueError/struct.error/etc.) — never crash, hang, or
raise an unexpected exception type.

Run standalone:  python tests/fuzz_decode.py [seconds] [seed]
The pytest wrapper (test_fuzz.py) runs a short budget in CI.
"""

from __future__ import annotations

import struct
import sys
import time

import numpy as np

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import (
    DecoderParams,
    EncoderParams,
    Progression,
    Transform,
)

# Exception types a malformed stream is allowed to raise.
ALLOWED = (ValueError, struct.error, IndexError, KeyError, EOFError,
           OverflowError, ZeroDivisionError, MemoryError,
           NotImplementedError, RuntimeError)

MAX_PIXELS = 1 << 26  # refuse absurd SIZ dims instead of allocating


def _seeds():
    """A few small valid codestreams with varied features."""
    rng = np.random.default_rng(7)
    out = []

    def img(w, h, n):
        return Image(xsiz=w, ysiz=h, components=[
            Component(data=rng.integers(0, 256, (h, w)).astype(np.int32),
                      prec=8, signed=False, dx=1, dy=1)
            for _ in range(n)])

    out.append(encoder.encode(img(64, 48, 1),
                              EncoderParams(numresolutions=3)))
    out.append(encoder.encode(img(80, 80, 3), EncoderParams(
        numresolutions=4, tile_size=(40, 40),
        progression=Progression.RPCL)))
    out.append(encoder.encode(img(48, 48, 1), EncoderParams(
        numresolutions=3, cblk_style=0x40)))
    out.append(encoder.encode(img(64, 64, 3), EncoderParams(
        numresolutions=4, transform=Transform.DWT_97, numlayers=2,
        rates=(10.0, 0.0), sop_markers=True, eph_markers=True)))
    out.append(encoder.encode(img(64, 64, 1), EncoderParams(
        numresolutions=3, ppt_markers=True, plt_markers=True)))
    out.append(encoder.encode(img(96, 96, 3), EncoderParams(
        numresolutions=3, progression=Progression.RPCL, tp_flag="R",
        tile_size=(48, 48), tlm_markers=True)))
    out.append(encoder.encode(img(64, 64, 3), EncoderParams(
        numresolutions=3, ppm_markers=True, tile_size=(32, 32))))
    # HT full mode: refinement segments (SigProp/MagRef raw streams)
    out.append(encoder.encode(img(64, 48, 1), EncoderParams(
        numresolutions=3, cblk_style=0x40, ht_refinement=True)))
    return out


def _guard_decode(data: bytes) -> str:
    """Decode with sanity guards; returns a tag for stats."""
    try:
        hdr = decoder.read_header(bytes(data))
        if hdr.siz.xsiz * hdr.siz.ysiz > MAX_PIXELS or \
                hdr.siz.xsiz <= hdr.siz.xosiz or \
                hdr.siz.ysiz <= hdr.siz.yosiz:
            return "huge"
        decoder.decode(bytes(data))
        return "ok"
    except ALLOWED:
        return "rejected"


def fuzz(budget_s: float = 5.0, seed: int = 0, verbose: bool = False):
    rng = np.random.default_rng(seed)
    seeds = _seeds()
    stats = {"ok": 0, "rejected": 0, "huge": 0}
    iters = 0
    t_end = time.monotonic() + budget_s
    while time.monotonic() < t_end:
        mode = rng.integers(0, 4)
        base = bytearray(seeds[int(rng.integers(0, len(seeds)))])
        if mode == 0:        # byte flips
            for _ in range(int(rng.integers(1, 16))):
                base[int(rng.integers(0, len(base)))] = int(
                    rng.integers(0, 256))
            data = bytes(base)
        elif mode == 1:      # truncation (and tiny prefixes)
            n = int(rng.integers(2, len(base)))
            data = bytes(base[:n])
        elif mode == 2:      # garbage with a plausible SOC prefix
            n = int(rng.integers(4, 4096))
            g = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            data = (b"\xffO" + g) if rng.integers(0, 2) else g
        else:                # marker-payload mutation: corrupt lengths
            pos = 2
            hits = []
            while pos + 4 <= len(base):
                m = struct.unpack(">H", bytes(base[pos:pos + 2]))[0]
                if m in (0xFF90, 0xFF93):
                    break
                hits.append(pos)
                ln = struct.unpack(">H", bytes(base[pos + 2:pos + 4]))[0]
                pos += 2 + ln
            if hits:
                p = hits[int(rng.integers(0, len(hits)))]
                base[p + 2:p + 4] = struct.pack(
                    ">H", int(rng.integers(0, 65536)))
            data = bytes(base)
        stats[_guard_decode(data)] += 1
        iters += 1
    if verbose:
        print(f"fuzz: {iters} inputs in {budget_s:.0f}s — {stats}")
    return iters, stats


if __name__ == "__main__":
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fuzz(budget, seed, verbose=True)
