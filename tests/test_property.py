"""Randomized property sweep: deterministic random coding
configurations and geometries must round-trip losslessly (5/3) or
within quantizer tolerance (9/7). Complements the targeted tests with
breadth over odd origins, tiny images, subsampling and style mixes."""

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import (
    EncoderParams,
    Progression,
    Transform,
)

STYLES = [0, 0x01, 0x04, 0x08, 0x20, 0x01 | 0x02, 0x04 | 0x10, 0x40]


def _random_case(seed: int):
    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 180))
    h = int(rng.integers(1, 180))
    x0 = int(rng.integers(0, 4))
    y0 = int(rng.integers(0, 4))
    ncomps = int(rng.choice([1, 1, 3, 4]))
    prec = int(rng.choice([8, 8, 8, 12, 16, 4]))
    sub = (1, 1)
    if ncomps == 3 and rng.random() < 0.3 and w > 4 and h > 4:
        sub = (2, 2)
    comps = []
    for i in range(ncomps):
        dx, dy = (1, 1) if i == 0 else sub
        cw = (x0 + w - (x0 + dx - 1) // dx * dx + dx - 1) // dx
        cw = -(-(x0 + w) // dx) - -(-x0 // dx)
        ch = -(-(y0 + h) // dy) - -(-y0 // dy)
        comps.append(Component(
            data=rng.integers(0, 1 << prec,
                              (max(1, ch), max(1, cw))).astype(np.int32),
            prec=prec, signed=False, dx=dx, dy=dy))
    img = Image(x0=x0, y0=y0, xsiz=x0 + w, ysiz=y0 + h, components=comps)

    style = int(rng.choice(STYLES))
    transform = Transform.DWT_53
    if style != 0x40 and rng.random() < 0.25:
        transform = Transform.DWT_97
    maxres = max(1, min(6, (min(w, h)).bit_length()))
    kw = dict(
        numresolutions=int(rng.integers(1, maxres + 1)),
        progression=Progression(int(rng.integers(0, 5))),
        cblk_style=style,
        transform=transform,
        cblk_w_exp=int(rng.choice([4, 5, 6])),
        cblk_h_exp=int(rng.choice([4, 5, 6])),
        sop_markers=bool(rng.random() < 0.2),
        eph_markers=bool(rng.random() < 0.2),
        image_offset=(x0, y0),
    )
    if rng.random() < 0.3 and w > 40 and h > 40:
        kw["tile_size"] = (int(rng.integers(16, w + 8)),
                           int(rng.integers(16, h + 8)))
    if rng.random() < 0.25:
        kw["precincts"] = ((int(rng.integers(5, 9)),
                            int(rng.integers(5, 9))),)
    return img, EncoderParams(**kw), transform


@pytest.mark.parametrize("seed", range(30))
def test_random_config_roundtrip(seed):
    img, params, transform = _random_case(seed)
    try:
        cs = encoder.encode(img, params)
    except ValueError:
        pytest.skip("configuration rejected by encoder (valid behavior)")
    out = decoder.decode(cs)
    assert len(out.components) == len(img.components)
    for c, (co, ci) in enumerate(zip(out.components, img.components)):
        assert co.data.shape == ci.data.shape, (seed, c)
        if transform == Transform.DWT_53:
            np.testing.assert_array_equal(co.data, ci.data,
                                          err_msg=f"seed={seed} comp={c}")
        else:
            err = np.sqrt(np.mean((co.data.astype(np.float64)
                                   - ci.data) ** 2))
            lim = (1 << ci.prec) / 100.0 + 2.0
            assert err < lim, (seed, c, err)
