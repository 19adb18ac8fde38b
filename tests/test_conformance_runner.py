"""Validate the conformance runner harness against proxies built with
the reference codec: reference-encoded inputs + reference-decoded PGX
baselines stand in for the (non-redistributable) ISO ETS corpus, so
dropping the real corpus in is zero further work. Also proves the
runner actually fails on out-of-tolerance output."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   ".refbuild", "bin")
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "grk_compress")),
    reason="reference build missing")


def _pgm(path, arr):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.astype(np.uint8).tobytes())


def _ppm(path, arr):
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.astype(np.uint8).tobytes())


def _run(args):
    r = subprocess.run(args, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:500]


@pytest.fixture(scope="module")
def ets_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ets")
    ind = root / "input" / "conformance"
    bas = root / "baseline" / "conformance"
    ind.mkdir(parents=True)
    bas.mkdir(parents=True)
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:128, 0:160]
    gray = ((xx * 2 + yy) % 256).astype(np.uint8)
    _pgm(str(root / "in.pgm"), gray)
    # p0_01 proxy: lossless gray (tolerance 0 = bit-exact)
    _run([os.path.join(REF, "grk_compress"), "-i", str(root / "in.pgm"),
          "-o", str(ind / "p0_01.j2k"), "-H", "1"])
    _run([os.path.join(REF, "grk_decompress"),
          "-i", str(ind / "p0_01.j2k"),
          "-o", str(bas / "c0p0_01.pgx"), "-H", "1"])
    shutil.copy(str(next(bas.glob("c0p0_01*.pgx"))),
                str(bas / "c1p0_01.pgx"))
    # p0_04 proxy: lossy RGB (PEAK 33 / MSE 55.8, reduce 3 for class 0)
    rgb = np.stack([(xx + 40 * c + rng.integers(0, 30, xx.shape)) % 256
                    for c in range(3)], axis=-1).astype(np.uint8)
    _ppm(str(root / "in.ppm"), rgb)
    # Lossy proxy exercises the CLASS-0 machinery (reduced-resolution
    # decode + PEAK/MSE tolerance compare). The class-1 per-component
    # tolerances of the REAL p0_04 are calibrated to that exact file's
    # content/rate, so no c1p0_04 baseline is generated — the runner
    # reports SKIP for it (exactly as it does for absent corpus files).
    _run([os.path.join(REF, "grk_compress"), "-i", str(root / "in.ppm"),
          "-o", str(ind / "p0_04.j2k"), "-r", "2.5", "-I", "-H", "1"])
    _run([os.path.join(REF, "grk_decompress"),
          "-i", str(ind / "p0_04.j2k"),
          "-o", str(bas / "c0p0_04.pgx"), "-r", "3", "-H", "1"])
    # normalize multi-component names to stem_C.pgx if the reference
    # wrote them with a different separator
    for f in bas.glob("c0p0_04*.pgx"):
        n = f.name.replace("c0p0_04", "")
        if n != ".pgx":
            digits = "".join(ch for ch in n if ch.isdigit())
            f.rename(bas / f"c0p0_04_{digits or 0}.pgx")
    # p1_01 proxy: profile-1 JP2 container, lossless gray (tolerance 0)
    _run([os.path.join(REF, "grk_compress"), "-i", str(root / "in.pgm"),
          "-o", str(ind / "p1_01.jp2"), "-H", "1"])
    _run([os.path.join(REF, "grk_decompress"),
          "-i", str(ind / "p1_01.jp2"),
          "-o", str(bas / "c0p1_01.pgx"), "-H", "1"])
    shutil.copy(str(next(bas.glob("c0p1_01*.pgx"))),
                str(bas / "c1p1_01.pgx"))
    return root


def test_runner_passes_on_reference_proxies(ets_root):
    import conformance_runner as cr
    passed, failed, skipped, details = cr.run(str(ets_root),
                                              verbose=False)
    msgs = "\n".join("  ".join(d) for d in details)
    assert failed == 0, msgs
    # p0_01 must run in both classes; p0_04 in at least class 1
    ran = {(d[0], d[1]) for d in details if d[2] == "PASS"}
    assert ("C0P0", "p0_01.j2k") in ran, msgs
    assert ("C1P0", "p0_01.j2k") in ran, msgs
    assert ("C0P0", "p0_04.j2k") in ran, msgs
    assert ("C0P1", "p1_01.j2k") in ran, msgs
    assert ("C1P1", "p1_01.j2k") in ran, msgs


def test_runner_fails_on_corrupt_baseline(ets_root, tmp_path):
    import conformance_runner as cr
    root2 = tmp_path / "ets2"
    shutil.copytree(str(ets_root), str(root2))
    bas = root2 / "baseline" / "conformance"
    from grokimagecompression_tpu.io.pgx import read_pgx, write_pgx
    p = str(bas / "c1p0_01.pgx")
    img = read_pgx(p)
    img.components[0].data[0, 0] ^= 0x7F   # out of tolerance (0)
    write_pgx(p, img)
    _, failed, _, details = cr.run(str(root2), only_classes={"C1P0"},
                                   verbose=False)
    assert failed >= 1, "corrupt baseline must fail"
