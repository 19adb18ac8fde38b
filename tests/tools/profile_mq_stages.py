"""Stage-level timing of the fused MQ encode program on the real TPU.

Times, for a chosen geometry (cinema 2K by default):
  1. forward transform only (DC/MCT/DWT)
  2. transform + slot-stream build (scan input production)
  3. transform + build + MQ compacting scan
  4. the full fused program (adds level-2 compaction, metrics, RD, splice)
Each stage is its own jitted program over the same inputs; deltas
between consecutive lines approximate each stage's marginal cost
(XLA may schedule differently per program, so treat as estimates).

Usage: python tests/tools/profile_mq_stages.py [--geom cinema|pcrd2k|cfg1]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="cinema")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=1)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), "..", "..",
                          ".jax_cache"))
    import jax.numpy as jnp
    from jax import lax

    from grokimagecompression_tpu.codestream import profiles
    from grokimagecompression_tpu.codestream.encoder import (build_cod,
                                                             build_siz)
    from grokimagecompression_tpu.codestream.tile import default_qcd
    from grokimagecompression_tpu.core.geometry import tile_rect
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import (EncoderParams,
                                                      Transform)
    from grokimagecompression_tpu.models import fused_encode, pipeline
    from grokimagecompression_tpu.ops import mq_jax

    rng = np.random.default_rng(3)
    if args.geom == "cinema":
        w, h = 2048, 1080
        yy, xx = np.mgrid[0:h, 0:w]
        comps = []
        for c in range(3):
            base = ((xx * (c + 2) + yy * 3) // 2) % 3000
            tex = rng.integers(0, 300, (h, w))
            comps.append(Component(data=(base + tex).astype(np.int32),
                                   prec=12, signed=False, dx=1, dy=1))
        img0 = Image(xsiz=w, ysiz=h, components=comps)
        prof = profiles.apply_cinema(EncoderParams(), img0, fps=24)
        params = prof.params
        dtype = np.int16
    elif args.geom == "pcrd2k":
        w = h = 2048
        yy, xx = np.mgrid[0:h, 0:w]
        comps = []
        for c in range(3):
            base = (128 + 60 * np.sin(yy / 37.0)
                    * np.cos(xx / (29.0 + c))).astype(np.int32)
            tex = rng.integers(0, 24, (h, w))
            comps.append(Component(
                data=np.clip(base + tex, 0, 255).astype(np.int32),
                prec=8, signed=False, dx=1, dy=1))
        img0 = Image(xsiz=w, ysiz=h, components=comps)
        params = EncoderParams(numresolutions=6,
                               transform=Transform.DWT_97,
                               numlayers=3, rates=(24.0, 48.0, 96.0))
        dtype = np.uint8
    else:
        w = h = 512
        yy, xx = np.mgrid[0:h, 0:w]
        data = ((128 + 60 * np.sin(yy / 37.0) * np.cos(xx / 29.0)
                 + rng.normal(0, 12, (h, w))).clip(0, 255).astype(np.int32))
        img0 = Image(xsiz=w, ysiz=h, components=[
            Component(data=data, prec=8, signed=False, dx=1, dy=1)])
        params = EncoderParams(numresolutions=6,
                               transform=Transform.DWT_97)
        dtype = np.uint8

    siz = build_siz(img0, params)
    cod = build_cod(img0, params)
    qcd = default_qcd(siz, cod, params.num_guard_bits, params.base_step)
    tr = tile_rect(0, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                   siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    plan = fused_encode.build_plan(siz, cod, qcd, tr, coder="mq",
                                   want_rd=True)
    assert plan is not None
    nframes = args.chunk
    ncomps = len(img0.components)
    batch = np.stack([np.stack([c.data for c in img0.components])
                      for _ in range(nframes)])
    xs = [jnp.asarray(batch[:, c].astype(dtype)) for c in range(ncomps)]

    tot_samples = nframes * w * h * ncomps
    for (gh, gw, blocks) in plan.groups:
        kmaxg = max(b.kmax for b in blocks)
        print(f"group ({gh}x{gw}): {len(blocks)} blocks kmax={kmaxg} "
              f"T={kmaxg * mq_jax.slots_per_plane(gh, gw)}")

    def stage_groups(upto):
        """upto: 'xf' | 'slots' | 'scan'"""
        def run(*comps):
            bands_list = pipeline._fwd_transform(plan.cfg, comps)
            if upto == "xf":
                return sum(bands_list[c][k].sum()
                           for c in range(len(bands_list))
                           for k in bands_list[c])
            outs = []
            for (gh2, gw2, blocks) in plan.groups:
                hp = -(-gh2 // 4) * 4
                geo = mq_jax._geometry(gh2, gw2)
                mats = []
                for b in blocks:
                    band = bands_list[b.comp][b.key]
                    mats.append(band[..., b.y0:b.y0 + b.h,
                                     b.x0:b.x0 + b.w])
                v = jnp.stack(mats, axis=1)
                B = nframes * len(blocks)
                b_pad = -(-B // 128) * 128
                vt = v.reshape(B, gh2, gw2).transpose(1, 2, 0)
                vt = jnp.pad(vt, ((0, hp - gh2), (0, 0), (0, b_pad - B)))
                if plan.cfg.reversible:
                    mag = jnp.abs(vt).astype(jnp.uint32)
                else:
                    inv = np.zeros((b_pad,), np.float32)
                    inv[:B] = np.tile(np.asarray(
                        [1.0 / b.step for b in blocks], np.float32),
                        nframes)
                    mag = jnp.floor(jnp.abs(vt) * inv).astype(jnp.uint32)
                neg = (vt < 0).astype(jnp.int32)
                orients = jnp.asarray(np.tile(
                    np.array([b.key[1] for b in blocks], np.int32),
                    nframes))
                orients = jnp.pad(orients, (0, b_pad - B))
                mx = jnp.max(mag, axis=(0, 1))
                nbps = jnp.zeros((b_pad,), jnp.int32)
                kmaxg = max(b.kmax for b in blocks)
                for k in range(kmaxg):
                    nbps = jnp.where((mx >> np.uint32(k)) != 0, k + 1,
                                     nbps)
                slots = mq_jax.build_slot_stream(
                    jnp, lax, mag, neg, orients[None, None, :],
                    nbps[None, None, :], kmaxg, geo)
                if upto == "slots":
                    outs.append(slots.astype(jnp.int32).sum())
                    continue
                slots = jax.lax.optimization_barrier(slots)
                comp1, counts1, nboc, st = mq_jax.run_mq_scans_compact(
                    jnp, lax, slots)
                if upto == "scan":
                    outs.append(comp1.sum() + counts1.sum() + nboc.sum()
                                + st.sum())
                    continue
                comp2, counts2, nbytes, overflow = mq_jax._compact_level2(
                    jnp, comp1, counts1, st)
                if upto == "level2":
                    outs.append(comp2.sum() + counts2.sum()
                                + nbytes.sum() + nboc.sum())
                    continue
                kmaxg2 = max(b.kmax for b in blocks)
                comp2, counts2, _o3 = mq_jax._compact_lanes(
                    jnp, lax, comp2, counts2,
                    mq_jax.mq_cap3(gh2, gw2, kmaxg2))
                nw = (nbytes + 3) >> 2
                flat = nw.reshape(-1)
                base = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32),
                     jnp.cumsum(flat)[:-1].astype(jnp.int32)])
                Bp = flat.shape[0]
                k, vv = mq_jax.mq_splice_keys(
                    jnp, base, comp2, counts2,
                    st[4].reshape(-1), st[5].reshape(-1), Bp)
                tb = Bp * (comp2.shape[0] * comp2.shape[1] + 1)
                out = mq_jax.mq_splice_sort(jnp, k, vv, tb)
                outs.append(out.sum() + nboc.sum())
            return sum(outs)

        return jax.jit(run)

    def sync(r):
        # np.asarray of a leaf, not block_until_ready: on the tunneled
        # backend only a host copy actually waits for execution.
        leaves = jax.tree_util.tree_leaves(r)
        return [np.asarray(x if x.ndim == 0 else x.reshape(-1)[:1])
                for x in leaves]

    def timeit(name, fn, inputs):
        sync(fn(*inputs))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sync(fn(*inputs))
            best = min(best, time.perf_counter() - t0)
        mps = tot_samples / best / 1e6 / ncomps
        print(f"{name:28s} {best * 1e3:9.2f} ms  {mps:8.2f} MP/s")
        return best

    # tunnel round-trip floor: time a trivial fetched program
    triv = jax.jit(lambda a: a.sum())
    t_rtt = timeit("(rtt floor)", triv, (xs[0],))
    t_xf = timeit("transform", stage_groups("xf"), xs)
    t_sl = timeit("+ slot build", stage_groups("slots"), xs)
    t_sc = timeit("+ mq scan", stage_groups("scan"), xs)
    t_l2 = timeit("+ level2", stage_groups("level2"), xs)
    t_sp = timeit("+ splice sort", stage_groups("splice"), xs)
    fullfn, _, _ = fused_encode._jitted_fused_mq(plan, nframes)
    t_full = timeit("full fused program", fullfn, xs)
    print(f"deltas: slots={1e3 * (t_sl - t_xf):.1f} ms "
          f"scan={1e3 * (t_sc - t_sl):.1f} ms "
          f"level2={1e3 * (t_l2 - t_sc):.1f} ms "
          f"splice={1e3 * (t_sp - t_l2):.1f} ms "
          f"rest={1e3 * (t_full - t_sp):.1f} ms")


if __name__ == "__main__":
    main()
