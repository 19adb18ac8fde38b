"""Pallas MQ decode kernel (ops/mq_dec_pallas.py) vs the Annex-D
oracle. The kernel only runs on real TPU hardware; these tests skip on
the CPU backend (scan-core coverage runs everywhere via
test_mq_dec_device.py).

Interpret mode exists (decode_blocks(..., interpret=True)) but the
kernel's HLO discharge compiles for 10+ MINUTES on XLA:CPU even for a
4x4 block (the column-step walk fully unrolls), so the CPU-side
interpret check is opt-in: GROK_TPU_SLOW_INTERPRET=1 runs one tiny
case; routine CPU CI relies on the scan core's full coverage instead.
"""

import os

import numpy as np
import pytest

from grokimagecompression_tpu.t1 import t1_np

rng = np.random.default_rng(117)


def _tpu():
    import jax
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


tpu_only = pytest.mark.skipif(
    not _tpu(), reason="Pallas kernel needs real TPU hardware")


@pytest.mark.skipif(
    _tpu() or os.environ.get("GROK_TPU_SLOW_INTERPRET") != "1",
    reason="opt-in: GROK_TPU_SLOW_INTERPRET=1 (10+ min XLA:CPU compile)")
def test_interpret_mode_tiny_block_opt_in():
    from grokimagecompression_tpu.ops import mq_dec_pallas
    mag = np.array([[0, 1, 0, 2], [3, 0, 1, 0],
                    [0, 2, 0, 1], [1, 0, 2, 0]], np.uint32)
    neg = np.zeros((4, 4), np.uint8)
    data, nb, npas, _ = t1_np.encode_cblk(mag, neg, 0)
    got = mq_dec_pallas.decode_blocks([(data, 4, 4, 0, nb, npas)],
                                      interpret=True)
    em, en = t1_np.decode_cblk(data, None, 4, 4, 0, nb, npas)
    assert np.array_equal(got[0][0], em)


def _mk(h, w, dens, hi, orient):
    mag = rng.integers(0, hi, (h, w)).astype(np.uint32)
    mag = np.where(rng.random((h, w)) < 1 - dens, 0, mag).astype(np.uint32)
    neg = rng.integers(0, 2, (h, w)).astype(np.uint8)
    return mag, neg, orient


def _check(cases, trunc=None):
    from grokimagecompression_tpu.ops import mq_dec_pallas

    blocks = []
    for (mag, neg, o) in cases:
        data, nb, npas, passes = t1_np.encode_cblk(mag, neg, o)
        h, w = mag.shape
        if trunc is not None and passes:
            k = min(trunc, npas)
            data = data[:passes[k - 1].rate]
            npas = k
        blocks.append((data, w, h, o, nb, npas))
    got = mq_dec_pallas.decode_blocks(blocks)
    for i, (gm, gn) in enumerate(got):
        d, w, h, o, nb, npas = blocks[i]
        em, en = t1_np.decode_cblk(d, None, w, h, o, nb, npas)
        assert np.array_equal(gm, em), f"case {i}: magnitudes differ"
        live = em != 0
        assert np.array_equal(gn[live], en[live]), f"case {i}: signs"


@tpu_only
def test_small_blocks_all_orients():
    cases = []
    for orient in (0, 1, 2, 3):
        for dens, hi in [(0.5, 60), (0.06, 250), (1.0, 15)]:
            cases.append(_mk(8, 8, dens, hi, orient))
    _check(cases)


@tpu_only
def test_edge_shapes():
    cases = [_mk(h, w, 0.5, 30, 2)
             for (h, w) in [(1, 1), (1, 8), (8, 1), (3, 5), (5, 3),
                            (4, 4), (7, 7), (9, 2), (2, 9), (13, 11)]]
    _check(cases)


@tpu_only
def test_partial_stripes_and_runs():
    # tall blocks exercise the RL aggregation + partial bottom stripes
    cases = [_mk(h, w, d, hi, o)
             for (h, w, d, hi, o) in [(17, 16, 0.02, 400, 0),
                                      (18, 16, 0.01, 80, 1),
                                      (19, 8, 0.3, 20, 2),
                                      (21, 4, 0.6, 10, 3)]]
    _check(cases)


@tpu_only
def test_32x32_dense_and_sparse():
    cases = [_mk(32, 32, d, hi, o)
             for (d, hi, o) in [(0.5, 300, 0), (0.02, 1000, 1),
                                (0.9, 7, 2), (0.15, 64, 3)]]
    _check(cases)


@tpu_only
def test_64x64():
    cases = [_mk(64, 64, d, hi, o)
             for (d, hi, o) in [(0.3, 120, 0), (0.01, 2000, 2)]]
    _check(cases)


@tpu_only
def test_truncated_streams():
    cases = [_mk(16, 16, 0.4, 120, o) for o in (0, 1, 2, 3)]
    for k in (1, 2, 5, 8):
        _check(cases, trunc=k)


@tpu_only
def test_mixed_length_buckets():
    # one long segment + many short ones: exercises the per-bucket
    # grouping (short segments must not ride the long bucket)
    cases = [_mk(16, 16, 0.95, 4000, 0)]
    cases += [_mk(16, 16, 0.01, 4, o % 4) for o in range(9)]
    _check(cases)


@tpu_only
def test_vs_scan_core_batch():
    # large batch: pallas output == scan-core output lane for lane
    from grokimagecompression_tpu.ops import mq_dec_jax, mq_dec_pallas

    blocks = []
    for i in range(40):
        mag, neg, o = _mk(8, 8, 0.4, 90, i % 4)
        data, nb, npas, _ = t1_np.encode_cblk(mag, neg, o)
        blocks.append((data, 8, 8, o, nb, npas))
    ref = mq_dec_jax.decode_blocks(blocks)
    got = mq_dec_pallas.decode_blocks(blocks)
    for i, ((rm, rn), (gm, gn)) in enumerate(zip(ref, got)):
        assert np.array_equal(rm.astype(np.uint32), gm), f"lane {i} mag"
        live = rm != 0
        assert np.array_equal(gn[live].astype(np.int32),
                              rn[live].astype(np.int32)), f"lane {i} sign"


@tpu_only
def test_decode_batch_mq_e2e_vs_host():
    """decoder.decode_batch with Part-1 MQ streams (cblk_style 0) rides
    the fused batched device decode (decode_tiles_device_submit with
    coder='mq') and must match the host decoder pixel for pixel —
    including mixed content densities (idle lanes, varying numbps)."""
    import numpy as np

    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams

    r = np.random.default_rng(21)
    yy, xx = np.mgrid[0:128, 0:160]
    imgs = []
    for k in range(5):
        base = ((xx * (k + 1) + yy) // 3) % 256
        noise = r.integers(0, 8 << k, (128, 160))
        d = np.clip(base + noise, 0, 255).astype(np.int32)
        imgs.append(Image(xsiz=160, ysiz=128, components=[
            Component(data=d, prec=8, signed=False, dx=1, dy=1)]))
    p = EncoderParams(numresolutions=4)
    css = [encoder.encode(im, p, device=False) for im in imgs]
    got = decoder.decode_batch(css, device=True)
    for im, g, cs in zip(imgs, got, css):
        ref = decoder.decode(cs, device=False)
        assert np.array_equal(g.components[0].data,
                              ref.components[0].data)
        assert np.array_equal(ref.components[0].data,
                              im.components[0].data)
