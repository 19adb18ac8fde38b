import numpy as np
import pytest

from grokimagecompression_tpu.t1 import t1_np
from grokimagecompression_tpu.t1.t1_np import (
    CBLKSTY_RESET,
    CBLKSTY_SEGSYM,
    CBLKSTY_TERMALL,
    decode_cblk,
    encode_cblk,
)


def roundtrip(mag, neg, orient=0, style=0):
    data, numbps, npasses, passes = encode_cblk(mag, neg, orient, style)
    h, w = mag.shape
    mag2, neg2 = decode_cblk(data, None, w, h, orient, numbps, npasses, style)
    np.testing.assert_array_equal(mag2, mag)
    # Signs only matter where magnitude is nonzero.
    np.testing.assert_array_equal(neg2[mag > 0], neg[mag > 0])
    return data, passes


@pytest.mark.parametrize("w,h,orient,seed", [
    (8, 8, 0, 0), (8, 8, 1, 1), (8, 8, 2, 2), (8, 8, 3, 3),
    (16, 16, 0, 4), (32, 32, 3, 5),
    (5, 7, 0, 6),       # non-multiple-of-4 height
    (1, 1, 0, 7),
    (3, 9, 1, 8),
    (64, 13, 2, 9),
])
def test_t1_roundtrip_random(w, h, orient, seed):
    rng = np.random.default_rng(seed)
    mag = rng.integers(0, 2 ** 10, size=(h, w)).astype(np.uint32)
    # Make it sparse-ish like real wavelet data.
    mask = rng.random((h, w)) < 0.5
    mag = np.where(mask, mag, 0).astype(np.uint32)
    neg = rng.integers(0, 2, size=(h, w)).astype(np.uint8)
    roundtrip(mag, neg, orient)


def test_t1_all_zero():
    mag = np.zeros((16, 16), dtype=np.uint32)
    neg = np.zeros((16, 16), dtype=np.uint8)
    data, numbps, npasses, passes = encode_cblk(mag, neg, 0, 0)
    assert data == b"" and numbps == 0 and npasses == 0


def test_t1_single_coefficient():
    mag = np.zeros((8, 8), dtype=np.uint32)
    neg = np.zeros((8, 8), dtype=np.uint8)
    mag[3, 5] = 77
    neg[3, 5] = 1
    roundtrip(mag, neg, 0)


def test_t1_dense_high_magnitude():
    rng = np.random.default_rng(11)
    mag = rng.integers(2 ** 14, 2 ** 16, size=(16, 16)).astype(np.uint32)
    neg = rng.integers(0, 2, size=(16, 16)).astype(np.uint8)
    roundtrip(mag, neg, 3)


@pytest.mark.parametrize("style", [CBLKSTY_SEGSYM, CBLKSTY_TERMALL,
                                   CBLKSTY_TERMALL | CBLKSTY_RESET])
def test_t1_styles(style):
    rng = np.random.default_rng(21)
    mag = rng.integers(0, 2 ** 8, size=(12, 12)).astype(np.uint32)
    neg = rng.integers(0, 2, size=(12, 12)).astype(np.uint8)
    if style & CBLKSTY_TERMALL:
        # TERMALL produces one segment per pass; decoder needs lengths.
        data, numbps, npasses, passes = encode_cblk(mag, neg, 0, style)
        seg_lengths = []
        prev = 0
        for p in passes:
            seg_lengths.append(p.rate - prev)
            prev = p.rate
        mag2, neg2 = decode_cblk(data, seg_lengths, 12, 12, 0, numbps,
                                 npasses, style)
        np.testing.assert_array_equal(mag2, mag)
        np.testing.assert_array_equal(neg2[mag > 0], neg[mag > 0])
    else:
        roundtrip(mag, neg, 0, style)


def test_t1_truncated_passes_prefix_decode():
    """Decoding fewer passes must give a valid partial reconstruction:
    every decoded magnitude matches the true value in its decoded planes."""
    rng = np.random.default_rng(31)
    mag = rng.integers(0, 2 ** 9, size=(16, 16)).astype(np.uint32)
    neg = rng.integers(0, 2, size=(16, 16)).astype(np.uint8)
    data, numbps, npasses, passes = encode_cblk(mag, neg, 0, 0)
    # Decode with only the passes covered by a terminated prefix: since the
    # default style has a single terminated segment, decode all passes but
    # claim fewer — decoder must stop cleanly after numpasses passes.
    for keep in [1, npasses // 2, npasses]:
        mag2, neg2 = decode_cblk(data, None, 16, 16, 0, numbps, keep, 0)
        # Completed planes must agree on already-significant samples.
        planes_done = max(0, (keep + 2) // 3)
        if planes_done > 0 and keep == npasses:
            np.testing.assert_array_equal(mag2, mag)


def test_t1_pass_rates_monotone():
    rng = np.random.default_rng(41)
    mag = rng.integers(0, 2 ** 12, size=(32, 32)).astype(np.uint32)
    neg = rng.integers(0, 2, size=(32, 32)).astype(np.uint8)
    data, numbps, npasses, passes = encode_cblk(mag, neg, 0, 0)
    assert npasses == 3 * numbps - 2
    assert len(passes) == npasses
    rates = [p.rate for p in passes]
    assert rates == sorted(rates)
    assert rates[-1] == len(data)
    dists = [p.distortion for p in passes]
    assert all(b >= a for a, b in zip(dists, dists[1:]))
