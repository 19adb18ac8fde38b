"""PCRD-opt rate control: byte budgets, PSNR targets, layer progression."""

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.codestream.pcrd import convex_hull
from grokimagecompression_tpu.codestream.t2 import CblkEnc
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import (
    DecoderParams,
    EncoderParams,
    Transform,
)
from grokimagecompression_tpu.t1.t1_np import PassInfo


def _natural_image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    data = (128 + 60 * np.sin(yy / 17.0) * np.cos(xx / 23.0)
            + 30 * np.sin((xx + yy) / 41.0)
            + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.int32)
    return Image(xsiz=w, ysiz=h, components=[
        Component(data=data, prec=8, signed=False, dx=1, dy=1)])


def _psnr(a, b, peak=255.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(peak * peak / mse) if mse > 0 else np.inf


def test_convex_hull_monotone_slopes():
    cb = CblkEnc(geom=None, numpasses=4, passes=[
        PassInfo(rate=10, distortion=100.0, terminated=False),
        PassInfo(rate=20, distortion=150.0, terminated=False),
        PassInfo(rate=30, distortion=160.0, terminated=False),
        PassInfo(rate=40, distortion=190.0, terminated=True),
    ])
    hull = convex_hull(cb)
    slopes = [hp.slope for hp in hull]
    assert slopes == sorted(slopes, reverse=True)
    assert all(s > 0 for s in slopes)
    assert hull[-1].npasses == 4


@pytest.mark.parametrize("ratio", [8.0, 16.0, 32.0])
def test_rate_target_respected(ratio):
    img = _natural_image(256, 256, seed=1)
    params = EncoderParams(numresolutions=5, transform=Transform.DWT_97,
                           rates=(ratio,))
    cs = encoder.encode(img, params)
    raw_bytes = 256 * 256
    target = raw_bytes / ratio
    # Codestream = target body + markers; allow header slack.
    assert len(cs) <= target + 400, (len(cs), target)
    out = decoder.decode(cs)
    p = _psnr(out.components[0].data, img.components[0].data)
    assert p > 25.0, p


def test_multilayer_rates_progressive():
    img = _natural_image(256, 256, seed=2)
    params = EncoderParams(numresolutions=5, transform=Transform.DWT_97,
                           numlayers=3, rates=(32.0, 8.0, 0.0))
    cs = encoder.encode(img, params)
    psnrs = []
    for nl in (1, 2, 3):
        out = decoder.decode(cs, DecoderParams(layers=nl))
        psnrs.append(_psnr(out.components[0].data, img.components[0].data))
    assert psnrs[0] < psnrs[1] < psnrs[2], psnrs
    assert psnrs[0] > 20.0


def test_quality_target():
    img = _natural_image(256, 256, seed=3)
    for q in (32.0, 40.0):
        params = EncoderParams(numresolutions=5, transform=Transform.DWT_97,
                               quality_psnr=(q,))
        cs = encoder.encode(img, params)
        out = decoder.decode(cs)
        p = _psnr(out.components[0].data, img.components[0].data)
        # The distortion estimate is transform-domain; allow 3 dB modelling
        # slack but require the target's neighborhood.
        assert p > q - 3.0, (q, p)


def test_lossless_last_layer_bit_exact():
    img = _natural_image(128, 128, seed=4)
    params = EncoderParams(numresolutions=4, numlayers=2, rates=(16.0, 0.0))
    cs = encoder.encode(img, params)
    out = decoder.decode(cs)
    np.testing.assert_array_equal(out.components[0].data,
                                  img.components[0].data)
    out1 = decoder.decode(cs, DecoderParams(layers=1))
    assert not np.array_equal(out1.components[0].data,
                              img.components[0].data)
    assert _psnr(out1.components[0].data, img.components[0].data) > 20.0


def test_rate_control_rgb_tiled():
    rng = np.random.default_rng(5)
    comps = []
    for c in range(3):
        yy, xx = np.mgrid[0:200, 0:300]
        d = (100 + 70 * np.sin(yy / (11.0 + c)) * np.cos(xx / (17.0 + c))
             + rng.normal(0, 5, (200, 300))).clip(0, 255).astype(np.int32)
        comps.append(Component(data=d, prec=8, signed=False, dx=1, dy=1))
    img = Image(xsiz=300, ysiz=200, components=comps)
    params = EncoderParams(numresolutions=4, transform=Transform.DWT_97,
                           tile_size=(128, 128), rates=(12.0,))
    cs = encoder.encode(img, params)
    target = 300 * 200 * 3 / 12.0
    assert len(cs) <= target + 1500, (len(cs), target)
    out = decoder.decode(cs)
    for c in range(3):
        assert _psnr(out.components[c].data, comps[c].data) > 24.0


def test_rates_vector_implies_numlayers():
    """rates longer than numlayers must create that many layers (the
    reference derives tcp_numlayers from the -r list length)."""
    import numpy as np
    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.codestream.decoder import DecoderParams
    from grokimagecompression_tpu.core.image import Component, Image
    from grokimagecompression_tpu.core.params import EncoderParams, Transform

    rng = np.random.default_rng(7)
    d = rng.integers(0, 256, (120, 160, 3)).astype(np.int32)
    img = Image(xsiz=160, ysiz=120, components=[
        Component(data=d[:, :, c], prec=8, signed=False, dx=1, dy=1)
        for c in range(3)])
    cs = encoder.encode(img, EncoderParams(transform=Transform.DWT_97,
                                           rates=[50.0, 10.0, 3.0]),
                        device=False)
    hdr = decoder.read_header(cs)
    assert hdr.cod.numlayers == 3
    raw = d.size  # 8-bit samples
    ratio = raw / len(cs)
    assert 2.5 <= ratio <= 3.6
    full = decoder.decode(cs)
    one = decoder.decode(cs, DecoderParams(layers=1))
    err_full = np.sqrt(np.mean(
        [(full.components[c].data.astype(np.float64) - d[:, :, c]) ** 2
         for c in range(3)]))
    err_one = np.sqrt(np.mean(
        [(one.components[c].data.astype(np.float64) - d[:, :, c]) ** 2
         for c in range(3)]))
    assert err_one > err_full


# ---------------------------------------------------------------------------
# Global (image-wide) PCRD allocation
# ---------------------------------------------------------------------------


def _hetero_image(w=512, h=256, seed=5):
    """Left half flat (cheap), right half noisy (expensive): the case
    where per-tile proportional budgets misallocate."""
    import numpy as np
    from grokimagecompression_tpu.core.image import Component, Image
    rng = np.random.default_rng(seed)
    d = np.zeros((h, w), np.int32)
    d[:, : w // 2] = 128
    d[:, w // 2:] = rng.integers(0, 256, (h, w // 2))
    return Image(xsiz=w, ysiz=h, components=[
        Component(data=d, prec=8, signed=False, dx=1, dy=1)])


def test_global_alloc_meets_budget_and_beats_tile_frac():
    import dataclasses

    import numpy as np

    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.params import (EncoderParams,
                                                      Transform)

    img = _hetero_image()
    base = EncoderParams(numresolutions=4, tile_size=(128, 128),
                         transform=Transform.DWT_97, rates=(16.0,))
    target = 512 * 256 // 16
    cs_tile = encoder.encode(img, base, device=False)
    cs_glob = encoder.encode(
        img, dataclasses.replace(base, rate_alloc="global"), device=False)
    # both respect the budget (header slack ~ a few hundred bytes)
    assert len(cs_glob) <= target + 600
    src = img.components[0].data.astype(np.float64)

    def mse(cs):
        out = decoder.decode(cs).components[0].data.astype(np.float64)
        return float(((out - src) ** 2).mean())

    # image-wide threshold spends bytes where slopes are steepest:
    # strictly better (or equal) distortion than per-tile splitting
    assert mse(cs_glob) <= mse(cs_tile) * 1.001, \
        (mse(cs_glob), mse(cs_tile))


def test_global_alloc_mesh_byte_identical():
    import dataclasses

    import jax

    from grokimagecompression_tpu.codestream import encoder
    from grokimagecompression_tpu.core.params import (EncoderParams,
                                                      Transform)
    from grokimagecompression_tpu.parallel import sharding

    assert len(jax.devices()) >= 8
    img = _hetero_image(seed=6)
    params = EncoderParams(numresolutions=4, tile_size=(128, 128),
                           transform=Transform.DWT_97,
                           rates=(12.0, 48.0), rate_alloc="global")
    seq = encoder.encode(img, params, device=False)
    par = sharding.encode_sharded(img, params,
                                  mesh=sharding.default_mesh(8))
    # psum-reduced totals must reproduce the local-sum thresholds exactly
    assert seq == par


def test_global_alloc_quality_mode():
    import dataclasses

    import numpy as np

    from grokimagecompression_tpu.codestream import decoder, encoder
    from grokimagecompression_tpu.core.params import (EncoderParams,
                                                      Transform)

    img = _hetero_image(seed=7)
    src = img.components[0].data.astype(np.float64)

    def psnr_of(mode):
        params = EncoderParams(numresolutions=4, tile_size=(128, 128),
                               transform=Transform.DWT_97,
                               quality_psnr=(34.0,), rate_alloc=mode)
        cs = encoder.encode(img, params, device=False)
        out = decoder.decode(cs).components[0].data.astype(np.float64)
        mse = ((out - src) ** 2).mean()
        return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))

    pg, pt = psnr_of("global"), psnr_of("tile")
    # the NMSEDEC distortion proxy undershoots the dB request by ~1 dB
    # for BOTH modes (shared calibration); global must track tile mode
    assert pg >= pt - 0.25, (pg, pt)
    assert pg >= 31.5, pg


def test_native_hulls_match_python_oracle():
    """grok_rc_hulls (native batch hull) must reproduce convex_hull
    exactly — slopes bit-for-bit, same truncation points."""
    import numpy as np

    from grokimagecompression_tpu.codestream.pcrd import convex_hull
    from grokimagecompression_tpu.codestream.t2 import CblkEnc
    from grokimagecompression_tpu.native import t1_native
    from grokimagecompression_tpu.t1.t1_np import PassInfo

    rng = np.random.default_rng(17)
    blocks = []
    for _ in range(120):
        n = int(rng.integers(1, 40))
        rates = np.maximum.accumulate(rng.integers(0, 60, n)).astype(int)
        # nondecreasing cumulative distortions with flat/zero stretches
        dd = rng.random(n) * (rng.random(n) < 0.8)
        dists = np.cumsum(dd) * 100
        passes = [PassInfo(rate=int(r), distortion=float(d),
                           terminated=False)
                  for r, d in zip(rates, dists)]
        blocks.append(passes)
    offs = np.zeros(len(blocks) + 1, np.int64)
    for i, ps in enumerate(blocks):
        offs[i + 1] = offs[i] + len(ps)
    flat_r = np.asarray([p.rate for ps in blocks for p in ps], np.int32)
    flat_d = np.asarray([p.distortion for ps in blocks for p in ps])
    H = max(len(ps) for ps in blocks)
    S, NPV, DV, hl = t1_native.rc_hulls(offs, flat_r, flat_d, H)
    for i, ps in enumerate(blocks):
        cb = CblkEnc(geom=None, data=b"", numbps=1, numpasses=len(ps),
                     passes=ps)
        ref = convex_hull(cb)
        assert hl[i] == len(ref), (i, hl[i], len(ref))
        for j, hp in enumerate(ref):
            assert S[i, j] == hp.slope, (i, j)
            assert NPV[i, j] == hp.npasses
            assert DV[i, j] == hp.dist
