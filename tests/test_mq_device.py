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


def _check_rd(blocks):
    """Device want_rd output: rates byte-identical to the oracle's
    PassInfo rates; distortions equal within float32-summation noise."""
    got = mq_jax.mq_encode_blocks(blocks, want_rd=True)
    for i, (mag, neg, orient) in enumerate(blocks):
        data, numbps, numpasses, passes = t1_np.encode_cblk(mag, neg, orient)
        gdata, gbps, gpasses, gp = got[i]
        assert gdata == data and gbps == numbps and gpasses == numpasses
        assert len(gp) == len(passes)
        for k, (hp, dp) in enumerate(zip(passes, gp)):
            assert dp.rate == hp.rate, (
                f"block {i} pass {k}: rate {dp.rate} != {hp.rate}")
            assert dp.terminated == hp.terminated
            tol = 1e-4 * max(1.0, abs(hp.distortion))
            assert abs(dp.distortion - hp.distortion) <= tol, (
                f"block {i} pass {k}: dist {dp.distortion} "
                f"!= {hp.distortion}")


def test_pass_rates_and_distortion():
    rng = np.random.default_rng(21)
    blocks = []
    for dens, mb, hi in [(0.5, 6, 60), (0.05, 8, 250), (1.0, 4, 15)]:
        for orient in (0, 2):
            blocks.append(_rand_block(rng, 16, 16, dens, mb, hi, orient))
    _check_rd(blocks)


def test_pass_rates_mixed_nbps_lanes():
    # lanes with fewer bitplanes than the group's max: their pass list
    # starts at the CLN of their own MSB plane
    rng = np.random.default_rng(22)
    blocks = [
        _rand_block(rng, 8, 8, 0.4, 3, 7, 0),
        _rand_block(rng, 8, 8, 0.4, 9, 500, 1),
        _rand_block(rng, 8, 8, 0.1, 1, 1, 2),
    ]
    _check_rd(blocks)


def test_pass_rates_natural_64():
    rng = np.random.default_rng(23)
    yy, xx = np.mgrid[0:64, 0:64]
    v = (40 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
         + rng.normal(0, 6, (64, 64)))
    mag = np.abs(v).astype(np.uint32)
    neg = (v < 0).astype(np.uint8)
    _check_rd([(mag, neg, 0)])


from conftest import psnr as _psnr


def test_pcrd_encode_via_device_backend(monkeypatch):
    """End-to-end rate-controlled encode with the device MQ coder
    supplying per-pass R-D tables: meets the byte budget, decodes, and
    matches the host allocation's quality (identical truncation rates;
    distortions differ only by float32 summation noise)."""
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams

    rng = np.random.default_rng(31)
    yy, xx = np.mgrid[0:128, 0:128]
    data = ((128 + 60 * np.sin(yy / 17.0) * np.cos(xx / 11.0)
             + rng.normal(0, 10, (128, 128))).clip(0, 255)).astype(np.int32)
    img = Image(xsiz=128, ysiz=128, components=[
        Component(data=data, prec=8, signed=False, dx=1, dy=1)])
    params = EncoderParams(numresolutions=4, rates=(12.0, 4.0))

    cs_host = encoder.encode(img, params)
    monkeypatch.setenv("GROK_TPU_T1", "device")
    cs_dev = encoder.encode(img, params)
    monkeypatch.delenv("GROK_TPU_T1")

    budget = 128 * 128 // 4
    assert len(cs_dev) <= budget + 512
    assert abs(len(cs_dev) - len(cs_host)) <= max(64, len(cs_host) // 20)
    out_h = decoder.decode(cs_host)
    out_d = decoder.decode(cs_dev)
    ph = _psnr(out_h.components[0].data, data)
    pd = _psnr(out_d.components[0].data, data)
    assert abs(ph - pd) < 0.1, (ph, pd)
