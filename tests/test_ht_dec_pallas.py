"""Pallas HT decode kernel (ops/ht_dec_pallas.py) vs the lax.scan core.

The kernel only runs on real TPU hardware; these tests skip on the CPU
backend (the full scan-core coverage runs everywhere via
test_ht_device.py). Run on a TPU-attached session to validate.
"""

import numpy as np
import pytest

from grokimagecompression_tpu.native import t1_native


def _tpu():
    import jax
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _tpu(), reason="Pallas kernel needs real TPU hardware")


def test_pallas_group_decoder_bit_exact():
    import jax.numpy as jnp

    from grokimagecompression_tpu.ops import ht_dec_jax, ht_dec_pallas
    rng = np.random.default_rng(7)
    for (h, w, dens, mbits, n) in [(64, 64, 0.3, 9, 24),
                                   (64, 64, 0.01, 9, 8),
                                   (16, 16, 0.5, 8, 10),
                                   (32, 32, 0.4, 10, 7),
                                   (64, 63, 0.3, 8, 5), (5, 7, 0.6, 6, 5),
                                   (1, 64, 0.5, 8, 3), (64, 1, 0.5, 8, 3),
                                   (1, 1, 1.0, 4, 2)]:
        cases = []
        for _ in range(n):
            mag = ((rng.random((h, w)) < dens)
                   * rng.integers(1, 1 << mbits, (h, w))).astype(np.uint32)
            neg = (rng.random((h, w)) < 0.5).astype(np.uint8)
            cases.append((mag, neg, 12))
        segs = [bytes(s) for s in t1_native.ht_encode_cblk_batch(cases)]
        lcups = [len(s) for s in segs]
        scups = [(s[-1] << 4) + (s[-2] & 0xF) for s in segs]
        wm = ht_dec_jax.bucket_words((8 * (max(scups) + 7)) // 32 + 4)
        wm_ms = ht_dec_jax.bucket_words(
            (8 * (max(lc - sc for lc, sc in zip(lcups, scups)) + 8))
            // 32 + 4)
        mel, vlc, ms = ht_dec_jax.prepass_all(segs, lcups, scups,
                                              wm, wm, wm_ms)
        ref = ht_dec_jax.decode_group_core(w, h)(
            jnp.asarray(mel), jnp.asarray(vlc), jnp.asarray(ms))
        got = ht_dec_pallas.decode_group_pallas(w, h)(
            jnp.asarray(mel), jnp.asarray(vlc), jnp.asarray(ms))
        rm, rs = np.asarray(ref[0]), np.asarray(ref[1])
        pm, ps = np.asarray(got[0]), np.asarray(got[1])
        assert np.array_equal(rm, pm), f"{w}x{h} dens={dens} magnitudes"
        sig = rm > 0
        assert np.array_equal(rs[sig], ps[sig]), f"{w}x{h} signs"
