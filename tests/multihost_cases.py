"""Shared image/params factories for the multi-host tests: the worker
subprocesses and the in-process single-host comparison must build the
exact same inputs."""

import numpy as np

from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams, Transform


def make_case(mode: str):
    rng = np.random.default_rng(5)
    if mode == "lossless":
        d = rng.integers(0, 256, (192, 256)).astype(np.int32)
        img = Image(xsiz=256, ysiz=192, components=[
            Component(data=d, prec=8, signed=False, dx=1, dy=1)])
        params = EncoderParams(numresolutions=3, tile_size=(64, 64),
                               cblk_style=0x40, tlm_markers=True)
        return img, params
    if mode == "global-pcrd":
        # Content complexity varies across tiles so the global
        # allocation actually differs from per-tile splitting: smooth
        # gradient left, noise right.
        h, w = 160, 256
        yy, xx = np.mgrid[0:h, 0:w]
        smooth = ((yy * 2 + xx) // 3) % 256
        noise = rng.integers(0, 256, (h, w))
        d = np.where(xx < w // 2, smooth, noise).astype(np.int32)
        img = Image(xsiz=w, ysiz=h, components=[
            Component(data=d, prec=8, signed=False, dx=1, dy=1)])
        params = EncoderParams(numresolutions=4, tile_size=(64, 64),
                               transform=Transform.DWT_97,
                               numlayers=2, rates=(24.0, 8.0),
                               rate_alloc="global")
        return img, params
    raise ValueError(f"unknown multihost case {mode!r}")
