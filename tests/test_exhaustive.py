"""Exhaustive interop sweeps — run with GROK_TPU_SLOW_TESTS=1.

Broad-matrix analogs of the per-feature interop tests: every mode-switch
combination and a progression x tiling x precinct x depth grid, all
cross-checked against the reference decoder (reference:
tests/nonregression's matrix, generated rather than downloaded). Skipped
by default to keep the suite fast; the full run takes ~2 minutes.
"""

import itertools
import os
import subprocess

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams, Progression

BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
GRK_DECOMPRESS = os.path.abspath(os.path.join(BIN, "grk_decompress"))
GRK_COMPRESS = os.path.abspath(os.path.join(BIN, "grk_compress"))
HAVE_GROK = os.path.exists(GRK_DECOMPRESS)
SLOW = os.environ.get("GROK_TPU_SLOW_TESTS", "") == "1"

slow_only = pytest.mark.skipif(
    not (SLOW and HAVE_GROK),
    reason="set GROK_TPU_SLOW_TESTS=1 (and build .refbuild) to run")
needs_grok = pytest.mark.skipif(
    not HAVE_GROK, reason="build .refbuild to run")


def _gray(bits, signed, seed=3):
    rng = np.random.default_rng(seed)
    hi = 1 << (bits - 1)
    lo = -hi if signed else 0
    hi = hi - 1 if signed else (1 << bits) - 1
    d = rng.integers(lo, hi + 1, (96, 112)).astype(np.int32)
    return d, Image(xsiz=112, ysiz=96, components=[
        Component(data=d, prec=bits, signed=signed, dx=1, dy=1)])


def _ref_decode_pgx(tmp_path, cs):
    from grokimagecompression_tpu.io.pgx import read_pgx
    j2k = tmp_path / "s.j2k"
    j2k.write_bytes(cs)
    out = tmp_path / "r.pgx"
    subprocess.run([GRK_DECOMPRESS, "-i", str(j2k), "-o", str(out)],
                   check=True, capture_output=True)
    return read_pgx(str(tmp_path / "r_0.pgx")).components[0].data


@slow_only
def test_all_mode_switch_combos(tmp_path):
    d, img = _gray(8, False)
    from grokimagecompression_tpu.io.pnm import write_pnm
    src = tmp_path / "in.pgm"
    write_pnm(str(src), img)
    for style in range(64):
        cs = encoder.encode(img, EncoderParams(cblk_style=style),
                            device=False)
        out = decoder.decode(cs)
        assert np.array_equal(out.components[0].data, d), style
        assert np.array_equal(_ref_decode_pgx(tmp_path, cs), d), style
    for style in range(64):
        j2k = tmp_path / "g.j2k"
        r = subprocess.run([GRK_COMPRESS, "-i", str(src), "-o", str(j2k),
                            "-M", str(style)], capture_output=True)
        if r.returncode != 0:
            continue
        out = decoder.decode(j2k.read_bytes())
        assert np.array_equal(out.components[0].data, d), style


@slow_only
def test_config_grid(tmp_path):
    for prog, tiled, prec, (bits, signed), ht in itertools.product(
            list(Progression), (None, (48, 64)),
            (None, [(7, 7), (6, 6)]),
            ((8, False), (12, False), (16, True)), (0, 0x40)):
        d, img = _gray(bits, signed)
        p = EncoderParams(progression=prog, tile_size=tiled,
                          precincts=prec, cblk_style=ht)
        cs = encoder.encode(img, p, device=False)
        out = decoder.decode(cs)
        key = (prog.name, tiled, bool(prec), bits, signed, hex(ht))
        assert np.array_equal(out.components[0].data, d), key
        assert np.array_equal(_ref_decode_pgx(tmp_path, cs), d), key


@needs_grok
def test_sweep_slice_always_on(tmp_path):
    """Slim always-on diagonal of the exhaustive grid (VERDICT r1 item 8):
    one config per progression order, rotating through tiling, precinct,
    depth, and coder choices; ~10 encodes, cross-checked against the
    reference decoder every run."""
    cases = [
        (Progression.LRCP, None, None, (8, False), 0),
        (Progression.RLCP, (48, 64), None, (12, False), 0),
        (Progression.RPCL, None, [(7, 7), (6, 6)], (16, True), 0),
        (Progression.PCRL, (48, 64), [(6, 6)], (8, False), 0x40),
        (Progression.CPRL, None, None, (12, False), 0x40),
        (Progression.LRCP, (48, 64), None, (8, False), 0x01),
        (Progression.RPCL, None, None, (8, False), 0x04 | 0x08),
    ]
    for prog, tiled, prec, (bits, signed), sty in cases:
        d, img = _gray(bits, signed)
        p = EncoderParams(progression=prog, tile_size=tiled,
                          precincts=prec, cblk_style=sty)
        cs = encoder.encode(img, p, device=False)
        out = decoder.decode(cs)
        key = (prog.name, tiled, bool(prec), bits, signed, hex(sty))
        assert np.array_equal(out.components[0].data, d), key
        assert np.array_equal(_ref_decode_pgx(tmp_path, cs), d), key
