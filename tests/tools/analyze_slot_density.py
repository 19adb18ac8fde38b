"""Measure slot-stream activity for a geometry: emit density and the
fraction of (256-step chunk x 8-sublane lane-tile) cells with no emitting
slot (skippable by an activity-gated scan kernel). CPU-only."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from grokimagecompression_tpu.codestream import profiles
    from grokimagecompression_tpu.codestream.encoder import (build_cod,
                                                             build_siz)
    from grokimagecompression_tpu.codestream.tile import default_qcd
    from grokimagecompression_tpu.core.geometry import tile_rect
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams
    from grokimagecompression_tpu.models import fused_encode, pipeline
    from grokimagecompression_tpu.ops import mq_jax

    rng = np.random.default_rng(3)
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
    siz = build_siz(img0, params)
    cod = build_cod(img0, params)
    qcd = default_qcd(siz, cod, params.num_guard_bits, params.base_step)
    tr = tile_rect(0, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                   siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    plan = fused_encode.build_plan(siz, cod, qcd, tr, coder="mq",
                                   want_rd=True)
    xs = [jnp.asarray(np.stack([c.data])[None][0][None]
                      .astype(np.int16))[0][None]
          for c in [img0.components[i] for i in range(3)]]
    xs = [jnp.asarray(img0.components[c].data[None].astype(np.int32))
          for c in range(3)]
    bands_list = pipeline._fwd_transform(plan.cfg, tuple(xs))

    tot_cells = tot_skip = 0
    tot_slots = tot_emit = 0
    for (gh, gw, blocks) in plan.groups:
        if len(blocks) < 1000:
            continue  # headline group only
        hp = -(-gh // 4) * 4
        geo = mq_jax._geometry(gh, gw)
        mats = []
        for b in blocks:
            band = bands_list[b.comp][b.key]
            mats.append(band[..., b.y0:b.y0 + b.h, b.x0:b.x0 + b.w])
        v = jnp.stack(mats, axis=1)
        B = len(blocks)
        b_pad = -(-B // 128) * 128
        vt = v.reshape(B, gh, gw).transpose(1, 2, 0)
        vt = jnp.pad(vt, ((0, hp - gh), (0, 0), (0, b_pad - B)))
        inv = np.zeros((b_pad,), np.float32)
        inv[:B] = np.asarray([1.0 / b.step for b in blocks], np.float32)
        mag = jnp.floor(jnp.abs(vt) * inv).astype(jnp.uint32)
        neg = (vt < 0).astype(jnp.int32)
        orients = jnp.asarray(np.pad(
            np.array([b.key[1] for b in blocks], np.int32),
            (0, b_pad - B)))
        mx = jnp.max(mag, axis=(0, 1))
        kmaxg = max(b.kmax for b in blocks)
        nbps = jnp.zeros((b_pad,), jnp.int32)
        for k in range(kmaxg):
            nbps = jnp.where((mx >> np.uint32(k)) != 0, k + 1, nbps)
        nb_np = np.asarray(nbps)[:B]
        print(f"group ({gh}x{gw}) B={B} kmaxg={kmaxg} "
              f"nbps: max={nb_np.max()} p50={np.percentile(nb_np, 50):.0f} "
              f"p90={np.percentile(nb_np, 90):.0f}")
        slots = mq_jax.build_slot_stream(
            jnp, lax, mag, neg, orients[None, None, :],
            nbps[None, None, :], kmaxg, geo)
        sl = np.asarray(slots, np.uint8)          # (T, Bp)
        T, Bp = sl.shape
        s = Bp // 128
        emit = (sl & 1).astype(bool)
        tot_slots += emit.size
        tot_emit += int(emit.sum())
        nch = -(-T // 256)
        pad = nch * 256 - T
        em = np.pad(emit, ((0, pad), (0, 0)))
        em = em.reshape(nch, 256, s, 128)
        st = 8 if s % 8 == 0 else s
        ntile = s // st
        cell = em.reshape(nch, 256, ntile, st, 128).any(axis=(1, 3, 4))
        tot_cells += cell.size
        tot_skip += int((~cell).sum())
        print(f"  emit density {emit.mean():.3f}; "
              f"cells {cell.size} skippable {(~cell).mean():.3f}")
        # per-plane view
        tp = mq_jax.slots_per_plane(gh, gw)
        for p in range(kmaxg):
            e = emit[p * tp:(p + 1) * tp]
            print(f"  plane {kmaxg - 1 - p:2d}: density {e.mean():.4f}")
    print(f"TOTAL: emit density {tot_emit / max(tot_slots, 1):.3f}, "
          f"skippable cells {tot_skip / max(tot_cells, 1):.3f}")


if __name__ == "__main__":
    main()
