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
