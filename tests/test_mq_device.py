"""Device (JAX) EBCOT Part-1 MQ encoder: byte-exact vs the Annex-D
oracle (t1/t1_np.py) for the default code-block style."""

import numpy as np
import pytest

from grokimagecompression_tpu.ops import mq_jax
from grokimagecompression_tpu.t1 import t1_np


def _rand_block(rng, h, w, dens, mb, hi, orient):
    mag = rng.integers(0, hi, (h, w)).astype(np.uint32)
    mag = np.where(rng.random((h, w)) < 1 - dens, 0, mag).astype(np.uint32)
    mag = np.minimum(mag, (1 << mb) - 1)
    neg = rng.integers(0, 2, (h, w)).astype(np.uint8)
    return mag, neg, orient


def _check(blocks):
    got = mq_jax.mq_encode_blocks(blocks)
    for i, (mag, neg, orient) in enumerate(blocks):
        data, numbps, numpasses, _ = t1_np.encode_cblk(mag, neg, orient)
        gdata, gbps, gpasses = got[i]
        assert gbps == numbps, f"block {i}: bps {gbps} != {numbps}"
        assert gpasses == numpasses, f"block {i}: passes"
        assert gdata == data, (
            f"block {i} shape {mag.shape} orient {orient}: "
            f"{gdata[:16].hex()}... != {data[:16].hex()}... "
            f"(lens {len(gdata)} vs {len(data)})")


def test_single_tiny():
    mag = np.zeros((4, 4), np.uint32)
    mag[1, 2] = 5
    mag[3, 0] = 2
    neg = np.zeros((4, 4), np.uint8)
    neg[1, 2] = 1
    _check([(mag, neg, 0)])


def test_small_blocks_all_orients():
    rng = np.random.default_rng(7)
    blocks = []
    for orient in (0, 1, 2, 3):
        for dens, mb, hi in [(0.5, 6, 60), (0.1, 6, 60), (1.0, 4, 15),
                             (0.02, 8, 250)]:
            blocks.append(_rand_block(rng, 8, 8, dens, mb, hi, orient))
    _check(blocks)


def test_edge_shapes():
    rng = np.random.default_rng(8)
    blocks = []
    for (h, w) in [(1, 1), (1, 8), (8, 1), (3, 5), (5, 3), (6, 6),
                   (7, 9), (4, 12)]:
        blocks.append(_rand_block(rng, h, w, 0.5, 5, 30, 2))
    _check(blocks)


def test_zero_and_dense():
    rng = np.random.default_rng(9)
    z = (np.zeros((8, 8), np.uint32), np.zeros((8, 8), np.uint8), 0)
    d = _rand_block(rng, 8, 8, 1.0, 8, 255, 3)
    one = np.zeros((8, 8), np.uint32)
    one[0, 0] = 1
    _check([z, d, (one, np.zeros((8, 8), np.uint8), 1)])


def test_16x16_deeper_planes():
    rng = np.random.default_rng(10)
    blocks = [_rand_block(rng, 16, 16, 0.4, 10, 1000, o)
              for o in (0, 1, 2, 3)]
    _check(blocks)


def test_64x64_natural_content():
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:64, 0:64]
    v = (40 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
         + rng.normal(0, 6, (64, 64)))
    mag = np.abs(v).astype(np.uint32)
    neg = (v < 0).astype(np.uint8)
    sparse = np.where(rng.random((64, 64)) < 0.9, 0, mag).astype(np.uint32)
    _check([(mag, neg, 0), (sparse, neg, 3)])
