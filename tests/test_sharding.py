"""Sharded multi-device encode: byte-identical to the sequential encoder."""

import jax
import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams, Transform
from grokimagecompression_tpu.parallel import sharding


def _image(w, h, ncomps=1, seed=0):
    rng = np.random.default_rng(seed)
    comps = [
        Component(data=rng.integers(0, 256, (h, w)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)
        for _ in range(ncomps)
    ]
    return Image(xsiz=w, ysiz=h, components=comps)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return sharding.default_mesh(8)


def test_sharded_matches_sequential_gray(mesh8):
    img = _image(512, 384, seed=1)
    params = EncoderParams(numresolutions=4, tile_size=(128, 128))
    seq = encoder.encode(img, params, device=False)
    par = sharding.encode_sharded(img, params, mesh=mesh8)
    assert seq == par
    out = decoder.decode(par)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


def test_sharded_matches_sequential_rgb(mesh8):
    img = _image(300, 260, ncomps=3, seed=2)
    params = EncoderParams(numresolutions=3, tile_size=(96, 96))
    seq = encoder.encode(img, params, device=False)
    par = sharding.encode_sharded(img, params, mesh=mesh8)
    assert seq == par


def test_sharded_lossy_rate_control(mesh8):
    img = _image(256, 256, seed=3)
    params = EncoderParams(numresolutions=4, transform=Transform.DWT_97,
                           tile_size=(128, 128), rates=(16.0,))
    seq = encoder.encode(img, params, device=False)
    par = sharding.encode_sharded(img, params, mesh=mesh8)
    assert seq == par


def test_sharded_single_tile(mesh8):
    img = _image(128, 128, seed=4)
    params = EncoderParams(numresolutions=4)
    seq = encoder.encode(img, params, device=False)
    par = sharding.encode_sharded(img, params, mesh=mesh8)
    assert seq == par


def test_sharded_matches_sequential_ht(mesh8):
    # HT (Part 15): CAP marker, JPH rsiz, 1 guard bit must match the
    # sequential encoder exactly (round-1 divergence regression test).
    img = _image(256, 192, seed=5)
    params = EncoderParams(numresolutions=4, tile_size=(128, 128),
                           cblk_style=0x40)
    seq = encoder.encode(img, params, device=False)
    par = sharding.encode_sharded(img, params, mesh=mesh8)
    assert seq == par
    out = decoder.decode(par)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


def test_sharded_matches_sequential_poc_tileparts_plt(mesh8):
    from grokimagecompression_tpu.core.params import Progression
    img = _image(256, 256, ncomps=3, seed=6)
    params = EncoderParams(numresolutions=3, tile_size=(128, 128),
                           numlayers=2, rates=(8.0, 4.0),
                           transform=Transform.DWT_97,
                           progression=Progression.RLCP,
                           tp_flag="R", plt_markers=True,
                           tlm_markers=True)
    seq = encoder.encode(img, params, device=False)
    par = sharding.encode_sharded(img, params, mesh=mesh8)
    assert seq == par


def test_sharded_matches_sequential_ppm(mesh8):
    img = _image(200, 160, seed=7)
    params = EncoderParams(numresolutions=3, tile_size=(96, 96),
                           ppm_markers=True)
    seq = encoder.encode(img, params, device=False)
    par = sharding.encode_sharded(img, params, mesh=mesh8)
    assert seq == par


def test_sharded_decode_matches_host(mesh8):
    """Mesh-batched inverse transform: pixel-identical to host decode."""
    img = _image(512, 384, seed=11)
    params = EncoderParams(numresolutions=4, tile_size=(128, 128))
    cs = encoder.encode(img, params, device=False)
    host = decoder.decode(cs)
    par = sharding.decode_sharded(cs, mesh=mesh8)
    np.testing.assert_array_equal(par.components[0].data,
                                  host.components[0].data)
    assert (par.x0, par.y0, par.xsiz, par.ysiz) == \
        (host.x0, host.y0, host.xsiz, host.ysiz)


def test_sharded_decode_rgb_ht(mesh8):
    img = _image(300, 260, ncomps=3, seed=12)
    params = EncoderParams(numresolutions=3, tile_size=(96, 96),
                           cblk_style=0x40)
    cs = encoder.encode(img, params, device=False)
    host = decoder.decode(cs)
    par = sharding.decode_sharded(cs, mesh=mesh8)
    for c in range(3):
        np.testing.assert_array_equal(par.components[c].data,
                                      host.components[c].data)


def test_sharded_decode_lossy_97(mesh8):
    img = _image(256, 256, seed=13)
    params = EncoderParams(numresolutions=4, transform=Transform.DWT_97,
                           tile_size=(128, 128), rates=(8.0, 24.0))
    cs = encoder.encode(img, params, device=False)
    host = decoder.decode(cs)
    par = sharding.decode_sharded(cs, mesh=mesh8)
    # float inverse on identical inputs: same rounding, exact match
    np.testing.assert_array_equal(par.components[0].data,
                                  host.components[0].data)


def test_sharded_decode_offset_canvas(mesh8):
    """Odd tile origins exercise the normalized-config parity logic."""
    rng = np.random.default_rng(14)
    img = Image(xsiz=200, ysiz=150, x0=3, y0=5, components=[
        Component(data=rng.integers(0, 256, (145, 197)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)])
    params = EncoderParams(numresolutions=3, tile_size=(64, 64),
                           image_offset=(3, 5), tile_offset=(1, 2))
    cs = encoder.encode(img, params, device=False)
    host = decoder.decode(cs)
    par = sharding.decode_sharded(cs, mesh=mesh8)
    np.testing.assert_array_equal(par.components[0].data,
                                  host.components[0].data)


def _structured_image(w, h, ncomps=3, seed=5):
    """Photographic-statistics content (gradient + mild texture): the
    fused coder's word-compaction caps are sized for realistic images,
    so full-range noise would legitimately overflow some blocks onto
    the host fallback — this content keeps every tile on the device."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    comps = []
    for c in range(ncomps):
        base = ((xx * (c + 2) + yy * 3) // 8) % 200
        tex = rng.integers(0, 24, (h, w))
        comps.append(Component(data=(base + tex).astype(np.int32),
                               prec=8, signed=False, dx=1, dy=1))
    return Image(xsiz=w, ysiz=h, components=comps)


def test_sharded_fused_entropy_all_coders(mesh8):
    """Device entropy ON the mesh (fused transform+block-code program
    sharded over the tile axis, parallel/sharding.py
    fused_entropy_tiles_on_mesh) must be byte-identical to the
    sequential host encoder for both coders and both transforms."""
    img = _structured_image(256, 192, ncomps=3, seed=5)
    for style, tf, name, mincov in [(0x40, Transform.DWT_53, "HT 5/3", 12),
                                    (0x40, Transform.DWT_97, "HT 9/7", 0),
                                    (0, Transform.DWT_53, "MQ 5/3", 12),
                                    (0, Transform.DWT_97, "MQ 9/7", 12)]:
        p = EncoderParams(numresolutions=3, tile_size=(64, 64),
                          cblk_style=style, transform=tf,
                          tlm_markers=True)
        # confirm the fused mesh path actually produced the segments
        # (the 9/7 HT case: the 12-bit LL band exceeds the fused
        # coder's word-compaction cap by design and falls back to the
        # host per tile, so only byte-identity is asserted there)
        from grokimagecompression_tpu.codestream.encoder import (build_cod,
                                                                 build_siz)
        from grokimagecompression_tpu.codestream.tile import default_qcd
        siz = build_siz(img, p)
        cod = build_cod(img, p)
        qcd = default_qcd(siz, cod, p.num_guard_bits, p.base_step)
        segs = sharding.fused_entropy_tiles_on_mesh(
            img, siz, cod, qcd, mesh8, coder="ht" if style else "mq")
        assert len(segs) >= mincov, \
            f"{name}: {len(segs)}/12 tiles fused (expected >= {mincov})"
        seq = encoder.encode(img, p, device=False)
        par = sharding.encode_sharded(img, p, mesh=mesh8)
        assert par == seq, f"mesh fused-entropy {name} diverged"


def test_sharded_fused_entropy_uneven_tiles(mesh8):
    """Tile count not divisible by the mesh (edge-tile groups, padded
    shards) still assembles byte-identically."""
    img = _image(200, 136, ncomps=1, seed=9)  # 4x3 grid of 64s + edges
    p = EncoderParams(numresolutions=3, tile_size=(64, 64),
                      cblk_style=0x40)
    seq = encoder.encode(img, p, device=False)
    par = sharding.encode_sharded(img, p, mesh=mesh8)
    assert par == seq


def test_sharded_fused_decode_entropy_on_mesh(mesh8):
    """Reversible decode under the mesh runs the fused entropy+inverse
    program per device (decoder._mesh_fused_decode) and must be
    pixel-identical to the host decoder for both coders; 9/7 keeps the
    transform mesh and stays within 1 ulp-edge count."""
    img = _structured_image(256, 192, ncomps=3, seed=5)
    for style, tf, exact in [(0x40, Transform.DWT_53, True),
                             (0, Transform.DWT_53, True),
                             (0x40, Transform.DWT_97, False)]:
        p = EncoderParams(numresolutions=3, tile_size=(64, 64),
                          cblk_style=style, transform=tf)
        cs = encoder.encode(img, p, device=False)
        host = decoder.decode(cs, device=False)
        m = sharding.decode_sharded(cs, mesh=mesh8)
        for c in range(3):
            a = m.components[c].data.astype(np.int64)
            b = host.components[c].data.astype(np.int64)
            if exact:
                assert np.array_equal(a, b), (style, tf, c)
            else:
                d = np.abs(a - b)
                assert d.max() <= 1 and (d > 0).mean() < 1e-3, (c,)
    # the reversible HT case actually took the fused path
    from grokimagecompression_tpu.codestream import decoder as dec_mod
    p = EncoderParams(numresolutions=3, tile_size=(64, 64),
                      cblk_style=0x40)
    cs = encoder.encode(img, p, device=False)
    hdr = dec_mod.read_header(cs)
    bodies = {}
    for tp in dec_mod.iter_tile_parts(cs, hdr.main_header_end):
        bodies.setdefault(tp.tile_index, []).append(tp.body)
    out = dec_mod._mesh_fused_decode(sorted(bodies), bodies, hdr.siz,
                                     hdr.cod, hdr.qcd, mesh8)
    assert len(out) == 12, f"fused mesh decode covered {len(out)}/12"
