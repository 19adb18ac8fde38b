#!/usr/bin/env python
"""ISO/IEC 15444-4 conformance-suite runner.

Ingests an Executable Test Suite corpus directory (the reference's
GROK_DATA_ROOT layout — reference: tests/conformance/CMakeLists.txt:
25-150, compare tool tests/compare_images.cpp):

    <root>/input/conformance/p0_NN.j2k, p1_NN.j2k
    <root>/baseline/conformance/c0p0_NN[rR].pgx, c1p0_NN[_C].pgx, ...

and applies the Table C.1/C.4 (class 0) and C.6/C.8 (class 1)
PEAK/MSE tolerances per decoded component. A tolerance of 0 means
bit-exact. Class-0 tests decode at the table's resolution reduction and
compare the first component; class-1 tests decode at full resolution
and compare every component with per-component tolerances.

Usage:
    python tests/conformance_runner.py <data_root> [--class C1P0 ...]
    GROK_ETS_ROOT=<data_root> python tests/conformance_runner.py

Exit code 0 iff every test with available input+baseline files passes.
Missing files are reported as SKIP (the ISO corpus is not
redistributable; drop it in and the suite runs with zero further work —
tests/test_conformance_runner.py validates the runner itself against
reference-codec-generated proxies).
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# ---- Tolerance tables (reference: tests/conformance/CMakeLists.txt) ----
# Entries: file number -> (resolution_reduction, [PEAK...], [MSE...]).
# Class 0 ("C0") compares the FIRST component at reduced resolution;
# scalar tolerance applies to it. Class 1 ("C1") compares all
# components at full resolution; lists are per-component.

C0P0 = {
    1: (0, [0], [0]), 2: (0, [0], [0]), 3: (0, [0], [0]),
    4: (3, [33], [55.8]), 5: (3, [54], [68]), 6: (3, [109], [743]),
    7: (0, [10], [0.34]), 8: (5, [7], [6.72]), 9: (2, [4], [1.47]),
    10: (0, [10], [2.84]), 11: (0, [0], [0]), 12: (0, [0], [0]),
    13: (0, [0], [0]), 14: (2, [0], [0]), 15: (0, [0], [0]),
    16: (0, [0], [0]),
}
C0P1 = {
    1: (0, [0], [0]), 2: (3, [35], [74]), 3: (3, [28], [18.8]),
    4: (0, [2], [0.550]), 5: (4, [128], [16384]), 6: (1, [128], [16384]),
    7: (0, [0], [0]),
}
C1P0 = {
    1: (0, [0], [0]), 2: (0, [0], [0]), 3: (0, [0], [0]),
    4: (0, [5, 4, 6], [0.776, 0.626, 1.070]),
    5: (0, [2, 2, 2, 0], [0.302, 0.307, 0.269, 0]),
    6: (0, [635, 403, 378, 0], [11287, 6124, 3968, 0]),
    7: (0, [0, 0, 0], [0, 0, 0]), 8: (1, [0, 0, 0], [0, 0, 0]),
    9: (0, [0], [0]), 10: (0, [0, 0, 0], [0, 0, 0]),
    11: (0, [0], [0]), 12: (0, [0], [0]),
    13: (0, [0, 0, 0, 0], [0, 0, 0, 0]),
    14: (0, [0, 0, 0], [0, 0, 0]), 15: (0, [0], [0]), 16: (0, [0], [0]),
}
C1P1 = {
    1: (0, [0], [0]),
    2: (0, [5, 4, 6], [0.765, 0.616, 1.051]),
    3: (0, [2, 2, 1, 0], [0.3, 0.210, 0.200, 0]),
    4: (0, [624], [3080]),
    5: (0, [40, 40, 40], [8.458, 9.816, 10.154]),
    6: (0, [2, 2, 2], [0.6, 0.6, 0.6]),
    7: (0, [0, 0], [0, 0]),
}
# components per input file (reference CMakeLists CP0_nbC_list/CP1_nbC)
P0_NCOMPS = {1: 1, 2: 1, 3: 1, 4: 3, 5: 4, 6: 4, 7: 3, 8: 3, 9: 1,
             10: 3, 11: 1, 12: 1, 13: 4, 14: 3, 15: 1, 16: 1}
P1_NCOMPS = {1: 1, 2: 3, 3: 4, 4: 1, 5: 3, 6: 3, 7: 2}

CLASSES = {
    "C0P0": ("p0", C0P0, "c0p0", True),
    "C0P1": ("p1", C0P1, "c0p1", True),
    "C1P0": ("p0", C1P0, "c1p0", False),
    "C1P1": ("p1", C1P1, "c1p1", False),
}


def _find_baseline(base_dir: str, stem: str, comp: int, nc: int,
                   reduce_suffix: str = ""):
    """Locate the reference PGX for component `comp` under the ETS
    naming variants: stem.pgx (single comp), stem_C.pgx, stemC.pgx,
    stem.C.pgx; class-0 reduced files use stem + 'rR'."""
    cands = []
    if reduce_suffix:
        cands += [f"{stem}{reduce_suffix}.pgx"]
    if nc == 1:
        cands += [f"{stem}.pgx", f"{stem}_0.pgx", f"{stem}0.pgx"]
    cands += [f"{stem}_{comp}.pgx", f"{stem}{comp}.pgx",
              f"{stem}.{comp}.pgx"]
    for c in cands:
        p = os.path.join(base_dir, c)
        if os.path.exists(p):
            return p
    return None


def _compare(dec_data: np.ndarray, ref_data: np.ndarray,
             peak_lim: float, mse_lim: float):
    """compare_images semantics: per-component PEAK (max abs diff) and
    MSE; limit 0 => bit-exact."""
    if dec_data.shape != ref_data.shape:
        return False, f"shape {dec_data.shape} vs ref {ref_data.shape}"
    d = dec_data.astype(np.int64) - ref_data.astype(np.int64)
    peak = int(np.abs(d).max()) if d.size else 0
    mse = float((d.astype(np.float64) ** 2).mean()) if d.size else 0.0
    ok = peak <= peak_lim and mse <= mse_lim
    return ok, f"PEAK {peak} (<= {peak_lim}) MSE {mse:.4g} (<= {mse_lim})"


def run(root: str, only_classes=None, verbose: bool = True):
    """Run every available conformance test; returns
    (passed, failed, skipped, details)."""
    from grokimagecompression_tpu.codestream import decoder
    from grokimagecompression_tpu.core.params import DecoderParams
    from grokimagecompression_tpu.io.pgx import read_pgx

    in_dir = os.path.join(root, "input", "conformance")
    base_dir = os.path.join(root, "baseline", "conformance")
    passed = failed = skipped = 0
    details = []
    for cname, (prefix, table, refpfx, is_class0) in CLASSES.items():
        if only_classes and cname not in only_classes:
            continue
        ncomps_tab = P0_NCOMPS if prefix == "p0" else P1_NCOMPS
        for num, (reduce_, peaks, mses) in sorted(table.items()):
            fn = f"{prefix}_{num:02d}.j2k"
            path = os.path.join(in_dir, fn)
            if not os.path.exists(path):
                # some corpora ship p1 files as .jp2
                alt = path[:-4] + ".jp2"
                if os.path.exists(alt):
                    path = alt
                else:
                    skipped += 1
                    details.append((cname, fn, "SKIP", "input missing"))
                    continue
            stem = f"{refpfx}_{num:02d}"
            try:
                img = decoder.decode(
                    open(path, "rb").read(),
                    DecoderParams(reduce=reduce_) if reduce_
                    else DecoderParams())
            except Exception as e:  # noqa: BLE001
                failed += 1
                details.append((cname, fn, "FAIL", f"decode error: {e}"))
                continue
            ncmp = 1 if is_class0 else min(len(img.components),
                                           ncomps_tab.get(num, 1))
            all_ok, msgs = True, []
            any_ref = False
            for c in range(ncmp):
                lim_p = peaks[c] if c < len(peaks) else peaks[-1]
                lim_m = mses[c] if c < len(mses) else mses[-1]
                rp = _find_baseline(
                    base_dir, stem, c, ncmp,
                    reduce_suffix=f"r{reduce_}" if is_class0 and num in
                    (3, 15) else "")
                if rp is None:
                    msgs.append(f"c{c}: baseline missing")
                    continue
                any_ref = True
                ref = read_pgx(rp)
                ok, msg = _compare(img.components[c].data,
                                   ref.components[0].data, lim_p, lim_m)
                all_ok &= ok
                msgs.append(f"c{c}: {msg}")
            if not any_ref:
                skipped += 1
                details.append((cname, fn, "SKIP", "; ".join(msgs)))
            elif all_ok:
                passed += 1
                details.append((cname, fn, "PASS", "; ".join(msgs)))
            else:
                failed += 1
                details.append((cname, fn, "FAIL", "; ".join(msgs)))
    if verbose:
        for row in details:
            print("  ".join(row))
        print(f"conformance: {passed} passed, {failed} failed, "
              f"{skipped} skipped")
    return passed, failed, skipped, details


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    only = None
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--class":
            only = set((only or set()) | {argv[i + 1]})
            i += 2
        else:
            args.append(argv[i])
            i += 1
    root = args[0] if args else os.environ.get("GROK_ETS_ROOT", "")
    if not root or not os.path.isdir(root):
        print("usage: conformance_runner.py <data_root> "
              "(or GROK_ETS_ROOT=...)", file=sys.stderr)
        return 2
    _, failed, _, _ = run(root, only_classes=only)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
