"""Frozen graceful-rejection corpus: every file in tests/corpus/crashers
must decode to an image or raise a controlled error — never crash, hang,
or raise an unexpected exception type. The reference pins its
fuzzer-found must-not-crash files the same way (reference:
tests/nonregression/CMakeLists.txt:27-80 blacklist); these are the
classes the round-4 fuzzer actually found (SIZ spin loop, zero-size
tile-component segfault) plus marker/truncation stress seeds, frozen so
every suite run re-checks them instead of hoping re-fuzzing rediscovers
them."""

import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fuzz_decode import _guard_decode  # noqa: E402

CRASHER_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "corpus", "crashers")
FILES = sorted(glob.glob(os.path.join(CRASHER_DIR, "*.j2k")))


def test_corpus_present():
    assert len(FILES) >= 10, "crasher corpus missing"


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(f)
                                             for f in FILES])
def test_crasher_handled_gracefully(path):
    data = open(path, "rb").read()
    res = _guard_decode(data)
    assert res in ("ok", "rejected", "huge"), \
        f"{os.path.basename(path)}: decoder {res}"
