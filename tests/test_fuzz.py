"""Short fuzz budget in CI; the full harness is tests/fuzz_decode.py
(reference: tests/fuzzers/grk_decompress_fuzzer.cpp)."""

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))

from fuzz_decode import fuzz  # noqa: E402


def test_fuzz_decoder_never_crashes():
    iters, stats = fuzz(budget_s=4.0, seed=1234)
    assert iters > 20
    # most mutated inputs must be rejected gracefully, not "decoded"
    assert stats["rejected"] + stats["huge"] + stats["ok"] == iters


def test_zero_width_tile_component_no_crash():
    """Degenerate (zero-width/height) tile-components must not reach the
    native DWT kernels unguarded (found by fuzzing: corrupt SIZ giving a
    subsampled component an empty tile rect segfaulted grok_dwt53_inv)."""
    import numpy as np
    from grokimagecompression_tpu.core.geometry import Rect
    from grokimagecompression_tpu.ops import dwt_host

    bands = {(0, 0): np.zeros((8, 0), np.int32)}
    for r in (1, 2):
        for o in (1, 2, 3):
            bands[(r, o)] = np.zeros((8 << (r - 1), 0), np.int32)
    a = dwt_host.inv_dwt_2d(bands, Rect(1, 0, 1, 32), 3, reversible=True)
    assert a.shape == (32, 0)
    f = dwt_host.fwd_dwt_2d(np.zeros((32, 0), np.int32), Rect(1, 0, 1, 32),
                            3, reversible=True)
    assert f[(0, 0)].shape[1] == 0
