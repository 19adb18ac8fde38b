"""Systematic interop sweep: the reference encoder produces streams
across a grid of coding options; our decoder must reproduce the
reference decoder's output exactly (lossless) — a breadth net on top of
the targeted interop tests."""

import itertools
import os
import subprocess

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.io.pnm import read_pnm, write_pnm

BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
GRK_COMPRESS = os.path.abspath(os.path.join(BIN, "grk_compress"))
GRK_DECOMPRESS = os.path.abspath(os.path.join(BIN, "grk_decompress"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(GRK_COMPRESS),
    reason="Grok reference binaries not built")


def _src(tmp_path, ncomps, prec, seed):
    rng = np.random.default_rng(seed)
    comps = [Component(
        data=rng.integers(0, 1 << prec, (90, 110)).astype(np.int32),
        prec=prec, signed=False, dx=1, dy=1) for _ in range(ncomps)]
    img = Image(xsiz=110, ysiz=90, components=comps)
    p = str(tmp_path / ("s.ppm" if ncomps == 3 else "s.pgm"))
    write_pnm(p, img)
    return p, img


GRID = [
    # (extra grk_compress args, ncomps, prec)
    (["-p", "RPCL", "-t", "64,64"], 3, 8),
    (["-p", "PCRL", "-c", "[128,128],[64,64]"], 1, 8),
    (["-p", "CPRL", "-M", "1"], 3, 8),          # LAZY
    (["-p", "RLCP", "-M", "38"], 1, 8),         # RESET|TERMALL|SEGSYM
    (["-b", "32,32", "-n", "4"], 3, 8),
    (["-t", "48,48", "-M", "8"], 1, 8),         # VSC + tiles
    (["-S", "-E"], 3, 8),                       # SOP+EPH
    ([], 1, 12),
    (["-t", "40,40", "-p", "RPCL"], 1, 16),
    (["-M", "64"], 1, 8),                       # HT
    (["-M", "64", "-t", "64,64"], 3, 8),        # HT tiled
]


@pytest.mark.parametrize("case", range(len(GRID)))
def test_sweep_reference_encode_our_decode(tmp_path, case):
    args, ncomps, prec = GRID[case]
    src, img = _src(tmp_path, ncomps, prec, seed=case)
    j2k = str(tmp_path / "o.j2k")
    r = subprocess.run([GRK_COMPRESS, "-i", src, "-o", j2k] + args,
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:400]
    ours = decoder.decode(open(j2k, "rb").read())
    # lossless: must equal the source exactly
    for c in range(ncomps):
        np.testing.assert_array_equal(ours.components[c].data,
                                      img.components[c].data)


OUR_GRID = [
    (dict(progression="RPCL", tile_size=(64, 64)), 3, 8),
    (dict(progression="PCRL", precincts=((7, 7), (6, 6))), 1, 8),
    (dict(cblk_style=0x01), 3, 8),
    (dict(cblk_style=0x26), 1, 8),          # RESET|TERMALL|SEGSYM
    (dict(cblk_w_exp=5, cblk_h_exp=5, numresolutions=4), 3, 8),
    (dict(tile_size=(48, 48), cblk_style=0x08), 1, 8),
    (dict(sop_markers=True, eph_markers=True), 3, 8),
    (dict(), 1, 12),
    (dict(tile_size=(40, 40), progression="RPCL"), 1, 16),
    (dict(cblk_style=0x40), 1, 8),
    (dict(cblk_style=0x40, tile_size=(64, 64)), 3, 8),
    (dict(tp_flag="R", progression="RPCL", tile_size=(64, 64)), 3, 8),
    (dict(ppt_markers=True, tile_size=(64, 64)), 3, 8),
]


@pytest.mark.parametrize("case", range(len(OUR_GRID)))
def test_sweep_our_encode_reference_decode(tmp_path, case):
    from grokimagecompression_tpu.codestream import encoder
    from grokimagecompression_tpu.core.params import (
        EncoderParams,
        Progression,
    )
    kw, ncomps, prec = OUR_GRID[case]
    if "progression" in kw:
        kw = dict(kw, progression=Progression[kw["progression"]])
    src, img = _src(tmp_path, ncomps, prec, seed=100 + case)
    cs = encoder.encode(img, EncoderParams(**kw))
    j2k = str(tmp_path / "o.j2k")
    open(j2k, "wb").write(cs)
    out = str(tmp_path / ("b.ppm" if ncomps == 3 else "b.pgm"))
    r = subprocess.run([GRK_DECOMPRESS, "-i", j2k, "-o", out],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:400]
    rec = read_pnm(out)
    for c in range(ncomps):
        np.testing.assert_array_equal(rec.components[c].data,
                                      img.components[c].data)
