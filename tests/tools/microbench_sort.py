"""Microbenchmark splice primitives on the accelerator: per-lane
(batched) sort along axis 0 vs one global flat sort, at fused-MQ cinema
shapes."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    B = 6784
    nslots = 4416          # nch * ccap for cinema (368 * 12)
    cap3 = 1024

    key = rng.integers(0, 1 << 30, (nslots, B), dtype=np.int32)
    val = rng.integers(0, 1 << 30, (nslots, B), dtype=np.int32)
    kd = jnp.asarray(key)
    vd = jnp.asarray(val)

    @jax.jit
    def lane_sort(k, v):
        sk, sv = lax.sort_key_val(k, v, dimension=0)
        return sv[:cap3].sum() + sk[0].sum()

    @jax.jit
    def lane_sort_k16(k, v):
        # 16-bit keys: per-lane word indices fit 16 bits
        sk, sv = lax.sort_key_val(k.astype(jnp.uint16), v, dimension=0)
        return sv[:cap3].sum() + sk[0].sum().astype(jnp.int32)

    n_flat = 20_000_000
    gk = jnp.asarray(rng.integers(0, 1 << 30, (n_flat,), dtype=np.int32))
    gv = jnp.asarray(rng.integers(0, 1 << 30, (n_flat,), dtype=np.int32))

    @jax.jit
    def global_sort(k, v):
        sk, sv = lax.sort_key_val(k, v)
        return sv[:100].sum() + sk[0]

    n_small = cap3 * B
    sk_ = jnp.asarray(rng.integers(0, 1 << 30, (n_small,), dtype=np.int32))
    sv_ = jnp.asarray(rng.integers(0, 1 << 30, (n_small,), dtype=np.int32))

    # column gather: take 512 lanes out of (cap3, B)
    grid = jnp.asarray(rng.integers(0, 1 << 30, (cap3, B), dtype=np.int32))
    idx = jnp.asarray(np.sort(rng.choice(B, 512, replace=False))
                      .astype(np.int32))

    @jax.jit
    def col_gather(g, i):
        return jnp.take(g, i, axis=1).sum()

    def timeit(name, fn, *args):
        r = fn(*args)
        np.asarray(r)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s} {best * 1e3:9.2f} ms")

    timeit("rtt floor (1-elem fetch)", jax.jit(lambda a: a[0, 0]), kd)
    timeit(f"lane sort ({nslots}, {B}) i32", lane_sort, kd, vd)
    timeit(f"lane sort ({nslots}, {B}) k=u16", lane_sort_k16, kd, vd)
    timeit(f"global sort n={n_flat}", global_sort, gk, gv)
    timeit(f"global sort n={n_small}", global_sort, sk_, sv_)
    timeit(f"column gather 512 of (1024, {B})", col_gather, grid, idx)


if __name__ == "__main__":
    main()
