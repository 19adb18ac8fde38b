import numpy as np
import pytest

from grokimagecompression_tpu.codestream.bitio import BitReader, BitWriter
from grokimagecompression_tpu.codestream.tagtree import TagTree


def test_bitio_roundtrip_random():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=1000).tolist()
    bw = BitWriter()
    for b in bits:
        bw.write_bit(b)
    data = bw.flush()
    br = BitReader(data)
    assert [br.read_bit() for _ in bits] == bits


def test_bitio_stuffing():
    bw = BitWriter()
    for _ in range(24):
        bw.write_bit(1)
    data = bw.flush()
    # Must not end with 0xFF, and every 0xFF must be followed by MSB-0 byte.
    assert data[-1] != 0xFF
    for i in range(len(data) - 1):
        if data[i] == 0xFF:
            assert data[i + 1] < 0x80
    br = BitReader(data)
    assert all(br.read_bit() == 1 for _ in range(24))


def test_bitio_numpasses():
    for n in [1, 2, 3, 4, 5, 6, 7, 36, 37, 100, 164]:
        bw = BitWriter()
        bw.write_numpasses(n)
        br = BitReader(bw.flush())
        assert br.read_numpasses() == n


def test_bitio_commacode():
    for n in [0, 1, 5, 12]:
        bw = BitWriter()
        bw.write_commacode(n)
        br = BitReader(bw.flush())
        assert br.read_commacode() == n


@pytest.mark.parametrize("w,h,seed", [(1, 1, 0), (2, 2, 1), (3, 3, 2),
                                      (8, 8, 3), (5, 13, 4), (16, 1, 5)])
def test_tagtree_full_decode(w, h, seed):
    """Encoding each leaf with an 'infinite' threshold lets the decoder learn
    every exact value (the imsb use-case)."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 10, size=(h, w))
    enc = TagTree(w, h)
    for y in range(h):
        for x in range(w):
            enc.set_value(x, y, int(vals[y, x]))
    bw = BitWriter()
    for y in range(h):
        for x in range(w):
            enc.encode(bw, x, y, int(vals[y, x]) + 1)
    data = bw.flush()
    dec = TagTree(w, h)
    br = BitReader(data)
    for y in range(h):
        for x in range(w):
            t = 1
            while not dec.decode(br, x, y, t):
                t += 1
            assert t - 1 == vals[y, x]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tagtree_threshold_queries(seed):
    """Layered queries (the inclusion use-case): encode with increasing
    thresholds; decoder must agree on value<threshold at each step."""
    rng = np.random.default_rng(seed)
    w, h = 6, 4
    vals = rng.integers(0, 5, size=(h, w))
    enc = TagTree(w, h)
    for y in range(h):
        for x in range(w):
            enc.set_value(x, y, int(vals[y, x]))
    bw = BitWriter()
    queries = []
    for t in range(1, 6):
        for y in range(h):
            for x in range(w):
                enc.encode(bw, x, y, t)
                queries.append((x, y, t, vals[y, x] < t))
    data = bw.flush()
    dec = TagTree(w, h)
    br = BitReader(data)
    for x, y, t, expected in queries:
        assert dec.decode(br, x, y, t) == expected, (x, y, t)
