"""Interpret-mode CI for the compacting MQ scan kernel.

Runs ops/mq_scan_pallas.mq_scan_compact_blocked with interpret=True on
CPU against the XLA reference reduction (mq_jax._mq_scans_compact_ref),
so kernel regressions surface on CPU CI instead of the next TPU
session (VERDICT r3 weak point: kernel tests skipped off-chip)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from grokimagecompression_tpu.ops import mq_jax, mq_scan_pallas  # noqa: E402


def _slots_for(rng, h, w, lanes, dens=0.5, hi=200):
    geo = mq_jax._geometry(h, w)
    hp = geo["hp"]
    B = lanes * 128
    mags = rng.integers(0, hi, (hp, w, B)).astype(np.uint32)
    mags = np.where(rng.random((hp, w, B)) < 1 - dens, 0,
                    mags).astype(np.uint32)
    mags[h:] = 0
    negs = rng.integers(0, 2, (hp, w, B)).astype(np.int32)
    orients = rng.integers(0, 4, (B,)).astype(np.int32)
    nbps = np.zeros((B,), np.int32)
    for k in range(B):
        nbps[k] = int(mags[:, :, k].max()).bit_length()
    npl = max(int(nbps.max()), 1)
    slots = mq_jax.build_slot_stream(
        jnp, lax, jnp.asarray(mags), jnp.asarray(negs),
        jnp.asarray(orients)[None, None, :],
        jnp.asarray(nbps)[None, None, :], npl, geo)
    return slots.astype(jnp.int8)


def _compare(slots, s):
    ref = mq_jax._mq_scans_compact_ref(jnp, lax, slots)
    ker = mq_scan_pallas.mq_scan_compact_blocked(slots, s, interpret=True)
    for a, b, nm in zip(ref, ker, ("comp1", "counts1", "nboc", "state")):
        assert np.array_equal(np.asarray(a), np.asarray(b)), nm


def test_compact_kernel_single_lane_tile():
    rng = np.random.default_rng(7)
    _compare(_slots_for(rng, 8, 8, 1), 1)


def test_compact_kernel_multi_lane_tiles():
    # s = 2 exercises the lane-tile grid axis and scratch state carry
    rng = np.random.default_rng(8)
    _compare(_slots_for(rng, 8, 8, 2, dens=0.9, hi=60), 2)


def test_compact_kernel_dense_deep_planes():
    # dense content pushes multi-byteout steps and word-cap overflows
    rng = np.random.default_rng(9)
    _compare(_slots_for(rng, 16, 8, 1, dens=1.0, hi=4000), 1)


def test_compact_kernel_empty_lanes():
    # all-zero lanes: no emissions anywhere, counts must stay 0
    slots = jnp.zeros((512, 128), jnp.int8)
    _compare(slots, 1)


def test_compact_lanes_overflow_flag():
    """A lane whose level-2 word total exceeds cap3 must raise the
    overflow flag (host re-encode path), and other lanes must pack
    unaffected."""
    import jax.numpy as jnp
    from jax import lax

    from grokimagecompression_tpu.ops import mq_jax

    ngrp, cap2, S = 3, 4, 1
    comp2 = np.zeros((ngrp, cap2, S, 128), np.int32)
    counts2 = np.zeros((ngrp, S, 128), np.int32)
    # lane 0: 2 words per group (6 total); lane 1: full 4 per group (12)
    for g in range(ngrp):
        for j in range(cap2):
            comp2[g, j, 0, 0] = 100 * g + j + 1
            comp2[g, j, 0, 1] = 1000 + 100 * g + j + 1
        counts2[g, 0, 0] = 2
        counts2[g, 0, 1] = 4
    cap3 = 8
    packed, counts, over = mq_jax._compact_lanes(
        jnp, lax, jnp.asarray(comp2), jnp.asarray(counts2), cap3)
    packed = np.asarray(packed)
    counts = np.asarray(counts)
    over = np.asarray(over)
    assert not over[0, 0] and over[0, 1]
    assert counts[0, 0, 0] == 6 and counts[0, 0, 1] == cap3
    # lane 0 packs its six words in (group, slot) order
    want = [1, 2, 101, 102, 201, 202]
    assert list(packed[0, :6, 0, 0]) == want
    # lane 1 keeps its first cap3 words despite the overflow
    want1 = [1001, 1002, 1003, 1004, 1101, 1102, 1103, 1104]
    assert list(packed[0, :8, 0, 1]) == want1


def test_compact_scan_all_noop_stream():
    """A stream of pure padding slots must produce zero outputs and the
    INITIAL coder state (every activity cell skips; noop slots are
    state passthroughs)."""
    import jax.numpy as jnp
    from jax import lax

    from grokimagecompression_tpu.ops import mq_jax

    T, B = 512, 128
    slots = jnp.zeros((T, B), jnp.int8)
    comp1, counts1, nboc, st = mq_jax.run_mq_scans_compact(
        jnp, lax, slots)
    assert int(np.asarray(counts1).sum()) == 0
    assert int(np.asarray(nboc).sum()) == 0
    assert int(np.asarray(comp1).sum()) == 0
    stn = np.asarray(st).reshape(mq_jax.NSTATE, B)
    for k, v in enumerate(mq_jax.STATE_INIT):
        assert (stn[k] == v).all(), k
