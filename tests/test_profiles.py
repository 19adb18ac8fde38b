"""Cinema / Broadcast / IMF profile enforcement."""

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder, profiles
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams, Progression


def _image(w, h, ncomps=3, seed=0):
    rng = np.random.default_rng(seed)
    comps = [
        Component(data=rng.integers(0, 256, (h, w)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)
        for _ in range(ncomps)
    ]
    return Image(xsiz=w, ysiz=h, components=comps)


def test_cinema2k_forces_parameters():
    img = _image(640, 360)
    prof = profiles.apply_cinema(
        EncoderParams(numresolutions=8, numlayers=4, tile_size=(256, 256)),
        img)
    p = prof.params
    assert p.numresolutions == 6
    assert p.numlayers == 1
    assert p.tile_size is None
    assert p.cblk_w_exp == 5 and p.cblk_h_exp == 5
    assert p.progression == Progression.CPRL
    assert prof.rsiz == profiles.PROFILE_CINEMA_2K
    assert prof.max_cs_bytes == profiles.CINEMA_24_CS


def test_cinema2k_rate_cap_and_rsiz():
    # Natural-ish image large enough that the (test-scale) cap binds.
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:360, 0:640]
    comps = [
        Component(data=(120 + 80 * np.sin(yy / (13.0 + c))
                        * np.cos(xx / (17.0 + c))
                        + rng.normal(0, 6, (360, 640))
                        ).clip(0, 255).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)
        for c in range(3)
    ]
    img = Image(xsiz=640, ysiz=360, components=comps)
    prof = profiles.apply_cinema(EncoderParams(), img)
    prof.max_cs_bytes = 60_000  # test-scale stand-in for the 1.3 MB cap
    cs = profiles.encode_with_profile(img, prof)
    assert len(cs) <= 60_000
    hdr = decoder.read_header(cs)
    assert hdr.siz.rsiz & 0xFF == profiles.PROFILE_CINEMA_2K
    out = decoder.decode(cs)
    err = (out.components[0].data.astype(np.float64)
           - img.components[0].data)
    assert np.sqrt((err ** 2).mean()) < 40


def test_cinema48_cap():
    img = _image(64, 64)
    prof = profiles.apply_cinema(EncoderParams(), img, fps=48)
    assert prof.max_cs_bytes == profiles.CINEMA_48_CS


def test_imf_profile():
    # IMF 2K forces the 9/7 irreversible transform (reference:
    # j2kprofile.cpp:432 "IMF 2K/4K/8K profiles require 9-7") -> lossy.
    img = _image(320, 180)
    prof = profiles.apply_imf(EncoderParams(numresolutions=9), img, "2k",
                              mainlevel=2, sublevel=1)
    assert prof.params.numresolutions == 6
    assert (prof.rsiz & 0xFF00) == profiles.PROFILE_IMF_2K
    assert prof.warnings == ()
    cs = profiles.encode_with_profile(img, prof)
    out = decoder.decode(cs)
    err = out.components[0].data.astype(np.int64) - \
        img.components[0].data.astype(np.int64)
    assert float(np.sqrt((err ** 2).mean())) < 2.5


def test_imf_reversible_profile_lossless():
    img = _image(320, 180)
    prof = profiles.apply_imf(EncoderParams(numresolutions=9), img,
                              "2k_r", mainlevel=2, sublevel=1)
    assert (prof.rsiz & 0xFF00) == profiles.PROFILE_IMF_2K_R
    assert prof.warnings == ()
    cs = profiles.encode_with_profile(img, prof)
    out = decoder.decode(cs)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)


def test_imf_noncompliant_strips_rsiz():
    # 17-bit input violates the 8-16-bit IMF precision rule -> rsiz is
    # stripped, warnings reported, encode still succeeds (reference:
    # j2k.cpp:1718 "Non-IMF codestream will be generated").
    rng = np.random.default_rng(0)
    from grokimagecompression_tpu.core.image import Component, Image
    data = rng.integers(0, 1 << 17, (64, 64)).astype(np.int32)
    img = Image(xsiz=64, ysiz=64, components=[
        Component(data=data, prec=17, signed=False, dx=1, dy=1)])
    prof = profiles.apply_imf(EncoderParams(), img, "2k")
    assert prof.rsiz == profiles.PROFILE_NONE
    assert any("8-16 bit" in wmsg for wmsg in prof.warnings)


def test_imf_sublevel_vs_mainlevel_rule():
    img = _image(128, 128)
    prof = profiles.apply_imf(EncoderParams(), img, "2k", mainlevel=1,
                              sublevel=5)
    assert prof.rsiz == profiles.PROFILE_NONE
    assert any("sublevel" in wmsg for wmsg in prof.warnings)


def test_imf_framerate_rate_cap():
    # sublevel 1 = 200 Mbit/s; at 25 fps the frame cap is 1 MB and the
    # codestream must stay under it.
    img = _image(1024, 512)
    prof = profiles.apply_imf(EncoderParams(), img, "2k", mainlevel=3,
                              sublevel=1, framerate=25)
    assert prof.max_cs_bytes == profiles.imf_max_cs_bytes(1, 25)
    cs = profiles.encode_with_profile(img, prof)
    assert len(cs) <= prof.max_cs_bytes


def test_broadcast_msamples_ceiling():
    # Level 1 allows 64 Msamples/s; a 4K@60 stream exceeds it.
    img = _image(512, 512)
    ok, warns = profiles.is_broadcast_compliant(
        profiles.apply_broadcast(EncoderParams(), img, level=1).params,
        img, profiles.PROFILE_BC_SINGLE | 1, framerate=600)
    assert not ok
    assert any("Msamples" in wmsg for wmsg in warns)


def test_broadcast_tile_layout_rule():
    img = _image(256, 256)
    prof = profiles.apply_broadcast(
        EncoderParams(tile_size=(86, 86)), img, level=2, multi=True)
    assert prof.rsiz == profiles.PROFILE_NONE
    assert any("tile layout" in wmsg for wmsg in prof.warnings)


def test_broadcast_profile():
    img = _image(160, 120)
    prof = profiles.apply_broadcast(EncoderParams(numresolutions=7), img,
                                    level=3)
    assert prof.params.numresolutions == 6
    assert prof.rsiz & 0xFF00 == profiles.PROFILE_BC_SINGLE
    cs = profiles.encode_with_profile(img, prof)
    assert decoder.read_header(cs).siz.rsiz == prof.rsiz


def test_cinema_per_component_caps():
    """Cinema caps bound not just the codestream but each component's
    packet bytes (reference T2.cpp:181 m_max_comp_size)."""
    import numpy as np
    from grokimagecompression_tpu.codestream import decoder as _dec
    from grokimagecompression_tpu.codestream import profiles
    from grokimagecompression_tpu.codestream.tile import index_tile_packets
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams

    rng = np.random.default_rng(0)
    comps = [Component(data=rng.integers(0, 4096, (1080, 2048))
                       .astype(np.int32), prec=12, signed=False,
                       dx=1, dy=1) for _ in range(3)]
    img = Image(xsiz=2048, ysiz=1080, components=comps)
    prof = profiles.apply_cinema(EncoderParams(numresolutions=6), img,
                                 fps=48)
    cs = profiles.encode_with_profile(img, prof)
    assert len(cs) <= profiles.CINEMA_48_CS
    hdr = _dec.read_header(cs)
    tp = next(_dec.iter_tile_parts(cs, hdr.main_header_end))
    per_comp = {}
    for (l, r, c, p, off, ln) in index_tile_packets(tp.body, hdr, 0):
        per_comp[c] = per_comp.get(c, 0) + ln
    for c, total in per_comp.items():
        assert total <= profiles.CINEMA_48_COMP, (c, total)
    out = _dec.decode(cs)
    assert out.components[0].data.shape == (1080, 2048)
