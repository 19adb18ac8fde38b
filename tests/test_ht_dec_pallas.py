"""Pallas HT decode kernel (ops/ht_dec_pallas.py) vs the lax.scan core.

The full-size sweep runs on real TPU hardware; on the CPU backend a
reduced interpret-mode case keeps the kernel's correctness visible in
CI (same pattern as tests/test_dwt_pallas.py — one ~5 s XLA:CPU
compile, cached in .jax_cache afterwards).
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


tpu_only = pytest.mark.skipif(
    not _tpu(), reason="full-size sweep needs real TPU hardware")


def _run_case(h, w, dens, mbits, n, interpret):
    import jax.numpy as jnp

    from grokimagecompression_tpu.ops import ht_dec_jax, ht_dec_pallas
    rng = np.random.default_rng(h * 31 + w)
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
        (8 * (max(lc - sc for lc, sc in zip(lcups, scups)) + 8)) // 32 + 4)
    mel, vlc, ms = ht_dec_jax.prepass_all(segs, lcups, scups, wm, wm, wm_ms)
    ref = ht_dec_jax.decode_group_core(w, h)(
        jnp.asarray(mel), jnp.asarray(vlc), jnp.asarray(ms))
    got = ht_dec_pallas.decode_group_pallas(w, h, interpret=interpret)(
        jnp.asarray(mel), jnp.asarray(vlc), jnp.asarray(ms))
    rm, rs = np.asarray(ref[0]), np.asarray(ref[1])
    pm, ps = np.asarray(got[0]), np.asarray(got[1])
    assert np.array_equal(rm, pm), f"{w}x{h} dens={dens} magnitudes"
    sig = rm > 0
    assert np.array_equal(ps[sig], rs[sig]), f"{w}x{h} dens={dens} signs"


def test_pallas_group_decoder_interpret_cpu():
    """Kernel correctness without a chip: interpret mode on a small
    geometry (regressions surface in CPU CI instead of the next TPU
    session)."""
    _run_case(16, 16, 0.4, 8, 4, interpret=not _tpu())


@tpu_only
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
