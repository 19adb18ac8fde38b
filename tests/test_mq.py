import numpy as np
import pytest

from grokimagecompression_tpu.t1.mq import (
    MQDecoder,
    MQEncoder,
    RawDecoder,
    RawEncoder,
    NUM_CTXS,
)


@pytest.mark.parametrize("seed,n", [(0, 10), (1, 100), (2, 1000), (3, 20000)])
def test_mq_roundtrip_random(seed, n):
    rng = np.random.default_rng(seed)
    decisions = rng.integers(0, 2, size=n).tolist()
    ctxs = rng.integers(0, NUM_CTXS, size=n).tolist()
    enc = MQEncoder()
    for d, cx in zip(decisions, ctxs):
        enc.encode(d, cx)
    data = enc.flush()
    dec = MQDecoder(data)
    out = [dec.decode(cx) for cx in ctxs]
    assert out == decisions


def test_mq_roundtrip_skewed():
    """Highly skewed input (mostly 0s) — exercises MPS fast path + carry."""
    rng = np.random.default_rng(9)
    decisions = (rng.random(50000) < 0.02).astype(int).tolist()
    enc = MQEncoder()
    for d in decisions:
        enc.encode(d, 0)
    data = enc.flush()
    # Skewed stream must compress well below 1 bit/decision.
    assert len(data) < 50000 / 10
    dec = MQDecoder(data)
    assert [dec.decode(0) for _ in decisions] == decisions


def test_mq_empty_and_tiny():
    enc = MQEncoder()
    data = enc.flush()
    dec = MQDecoder(data)
    # Decoding from a flushed-empty stream must not crash.
    dec.decode(0)

    enc = MQEncoder()
    enc.encode(1, 18)
    data = enc.flush()
    dec = MQDecoder(data)
    assert dec.decode(18) == 1


def test_mq_no_forbidden_sequences():
    """Output must never contain 0xFF followed by a byte > 0x8F."""
    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(10, 5000))
        decisions = rng.integers(0, 2, size=n).tolist()
        ctxs = rng.integers(0, NUM_CTXS, size=n).tolist()
        enc = MQEncoder()
        for d, cx in zip(decisions, ctxs):
            enc.encode(d, cx)
        data = enc.flush()
        for i in range(len(data) - 1):
            if data[i] == 0xFF:
                assert data[i + 1] <= 0x8F


@pytest.mark.parametrize("n", [1, 7, 8, 9, 1000])
def test_raw_roundtrip(n):
    rng = np.random.default_rng(n)
    bits = rng.integers(0, 2, size=n).tolist()
    enc = RawEncoder()
    for b in bits:
        enc.encode(b)
    data = enc.flush()
    dec = RawDecoder(data)
    assert [dec.decode() for _ in bits] == bits


def test_raw_stuffing():
    """A run of 1s must trigger the 7-bit post-0xFF rule and still round-trip."""
    bits = [1] * 64 + [0, 1] * 16
    enc = RawEncoder()
    for b in bits:
        enc.encode(b)
    data = enc.flush()
    for i in range(len(data) - 1):
        if data[i] == 0xFF:
            assert data[i + 1] < 0x80
    dec = RawDecoder(data)
    assert [dec.decode() for _ in bits] == bits
