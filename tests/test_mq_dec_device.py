"""Device (JAX) EBCOT Part-1 MQ DECODER (ops/mq_dec_jax.py): bit-exact
vs the Annex-D oracle (t1/t1_np.py) for the default code-block style,
including truncated (PCRD) streams, and end-to-end through the tile
decoder."""

import numpy as np

from conftest import natural_image
from grokimagecompression_tpu.ops import mq_dec_jax
from grokimagecompression_tpu.t1 import t1_np

rng = np.random.default_rng(41)


def _mk(h, w, dens, hi, orient):
    mag = rng.integers(0, hi, (h, w)).astype(np.uint32)
    mag = np.where(rng.random((h, w)) < 1 - dens, 0, mag).astype(np.uint32)
    neg = rng.integers(0, 2, (h, w)).astype(np.uint8)
    return mag, neg, orient


def _check(cases, trunc=None):
    blocks = []
    for (mag, neg, o) in cases:
        data, nb, npas, passes = t1_np.encode_cblk(mag, neg, o)
        h, w = mag.shape
        if trunc is not None and passes:
            k = min(trunc, npas)
            data = data[:passes[k - 1].rate]
            npas = k
        blocks.append((data, w, h, o, nb, npas))
    got = mq_dec_jax.decode_blocks(blocks)
    for i, (gm, gn) in enumerate(got):
        d, w, h, o, nb, npas = blocks[i]
        em, en = t1_np.decode_cblk(d, None, w, h, o, nb, npas)
        assert np.array_equal(gm, em), f"case {i}: magnitudes differ"
        live = em != 0
        assert np.array_equal(gn[live], en[live]), f"case {i}: signs"


def test_small_blocks_all_orients():
    cases = []
    for orient in (0, 1, 2, 3):
        for dens, hi in [(0.5, 60), (0.06, 250), (1.0, 15)]:
            cases.append(_mk(8, 8, dens, hi, orient))
    _check(cases)


def test_edge_shapes():
    cases = [_mk(h, w, 0.5, 30, 2)
             for (h, w) in [(1, 1), (1, 8), (8, 1), (3, 5), (5, 3),
                            (6, 6), (7, 9), (4, 12), (13, 6)]]
    _check(cases)


def test_truncated_pass_streams():
    for trunc in (1, 2, 3, 5, 8, 11):
        _check([_mk(16, 16, 0.4, 200, 1)], trunc=trunc)


def test_natural_64():
    yy, xx = np.mgrid[0:64, 0:64]
    v = (40 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
         + rng.normal(0, 6, (64, 64)))
    mag = np.abs(v).astype(np.uint32)
    neg = (v < 0).astype(np.uint8)
    _check([(mag, neg, 0)])


def test_mixed_depth_lanes():
    _check([_mk(8, 8, 0.4, 7, 0), _mk(8, 8, 0.4, 500, 1),
            _mk(8, 8, 0.05, 1, 2), (np.zeros((8, 8), np.uint32),
                                    np.zeros((8, 8), np.uint8), 3)])


def test_end_to_end_device_mq_decode(monkeypatch):
    """Full-stream decode with the device MQ entropy decoder: output
    identical to the host decode, lossless and lossy-truncated."""
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.params import EncoderParams, Transform

    img = natural_image(96, 80, seed=3)
    for params in (EncoderParams(numresolutions=3),
                   EncoderParams(numresolutions=3,
                                 transform=Transform.DWT_97,
                                 rates=(12.0,))):
        cs = encoder.encode(img, params)
        host = decoder.decode(cs)
        monkeypatch.setenv("GROK_TPU_T1", "device")
        dev = decoder.decode(cs)
        monkeypatch.delenv("GROK_TPU_T1")
        assert np.array_equal(dev.components[0].data,
                              host.components[0].data)


def test_fused_device_decode_mq(monkeypatch):
    """Fused device decode for MQ streams (entropy decode -> inverse
    transform as one program): pixel-identical to the host decoder."""
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.params import EncoderParams, Transform

    for img, params in (
            (natural_image(96, 80, seed=4), EncoderParams(numresolutions=3)),
            (natural_image(80, 64, 3, seed=5),
             EncoderParams(numresolutions=3, transform=Transform.DWT_97,
                           mct=True, rates=(10.0,)))):
        cs = encoder.encode(img, params)
        host = decoder.decode(cs)
        monkeypatch.setenv("GROK_TPU_T1", "device")
        monkeypatch.setenv("GROK_TPU_DEVICE", "1")
        dev = decoder.decode(cs)
        monkeypatch.delenv("GROK_TPU_T1")
        monkeypatch.delenv("GROK_TPU_DEVICE")
        for c in range(img.numcomps):
            assert np.array_equal(dev.components[c].data,
                                  host.components[c].data)


def test_arbitrary_byte_truncation_matches_host():
    """Mid-pass byte truncations (not just pass boundaries): the device
    decoder must degrade exactly like the host oracle (both feed 0xFF
    past the segment end, C.3.3)."""
    trng = np.random.default_rng(57)
    mag = trng.integers(0, 120, (16, 16)).astype(np.uint32)
    mag = np.where(trng.random((16, 16)) < 0.5, 0, mag).astype(np.uint32)
    neg = trng.integers(0, 2, (16, 16)).astype(np.uint8)
    data, nb, npas, _ = t1_np.encode_cblk(mag, neg, 0)
    cuts = sorted({int(v) for v in trng.integers(1, max(2, len(data)),
                                                 8)})
    blocks = [(data[:cut], 16, 16, 0, nb, npas) for cut in cuts]
    got = mq_dec_jax.decode_blocks(blocks)
    for (cut, (gm, gn)) in zip(cuts, got):
        em, en = t1_np.decode_cblk(data[:cut], None, 16, 16, 0, nb, npas)
        assert np.array_equal(gm, em), f"cut {cut}: magnitudes differ"
        live = em != 0
        assert np.array_equal(gn[live], en[live]), f"cut {cut}: signs"
