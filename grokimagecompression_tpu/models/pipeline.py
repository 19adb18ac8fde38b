"""Device (TPU) tile-transform pipeline.

The flagship compute graph of the framework: DC level shift -> MCT ->
multi-level DWT (-> sign-magnitude) for a whole tile, jitted once per tile
geometry and batchable over a leading tile axis. This replaces the
reference's per-stage ThreadPool pipeline
(reference: src/lib/jp2/TileProcessor.cpp:951 encode_tile stages
dc_level_shift_encode:1449, mct_encode:1473, dwt_encode:1520) with a single
fused XLA program; the tile axis is the sharding axis for multi-chip
scale-out (see parallel/).

Entropy coding (T1/T2) consumes the band arrays on the host — the split
mirrors the reference's plugin seam (reference:
src/lib/jp2/plugin/plugin_bridge.cpp:24, where an accelerator does
transform work and the host does packetization).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..core.geometry import Rect
from ..ops import dwt_jax, dwt_pallas, mct_jax


def _use_pallas(rect: Rect, numresolutions: int) -> bool:
    """Route the DWT through the fused Pallas kernel when enabled
    (GROK_TPU_PALLAS=1), the geometry is in kernel scope, and a real
    accelerator backend is active (Pallas has no compiled CPU path)."""
    return (os.environ.get("GROK_TPU_PALLAS", "") == "1"
            and jax.default_backend() != "cpu"
            and dwt_pallas.supports(rect, numresolutions))


def _dwt_fwd(x, rect, numresolutions, reversible):
    if _use_pallas(rect, numresolutions):
        squeeze = x.ndim == 2
        xb = x[None] if squeeze else x
        bands = dwt_pallas.fwd_dwt_2d(xb, rect, numresolutions,
                                      reversible=reversible)
        if squeeze:
            bands = {k: v[0] for k, v in bands.items()}
        return bands
    return dwt_jax.fwd_dwt_2d(x, rect, numresolutions, reversible)


def _dwt_inv(bands, rect, numresolutions, reversible):
    if _use_pallas(rect, numresolutions):
        sample = next(iter(bands.values()))
        squeeze = sample.ndim == 2
        bb = {k: (v[None] if squeeze else v) for k, v in bands.items()}
        out = dwt_pallas.inv_dwt_2d(bb, rect, numresolutions,
                                    reversible=reversible)
        return out[0] if squeeze else out
    return dwt_jax.inv_dwt_2d(bands, rect, numresolutions, reversible)

BandKey = Tuple[int, int]


@dataclasses.dataclass(frozen=True)
class TileTransformConfig:
    """Static per-tile-geometry description (hashable: jit cache key)."""

    tc_rects: Tuple[Rect, ...]          # per-component tile-component rect
    precs: Tuple[int, ...]
    signeds: Tuple[bool, ...]
    numresolutions: int
    reversible: bool
    mct: bool                            # RCT (reversible) / ICT (irreversible)


def _fwd_transform(cfg: TileTransformConfig, comps):
    """comps: tuple of (..., h_c, w_c) arrays -> list of {(r, o): band}."""
    ncomps = len(comps)
    shifted = [
        mct_jax.dc_shift_fwd(comps[c].astype(jnp.int32), cfg.precs[c],
                             cfg.signeds[c])
        for c in range(ncomps)
    ]
    if cfg.mct and ncomps >= 3:
        if cfg.reversible:
            y, u, v = mct_jax.rct_fwd(shifted[0], shifted[1], shifted[2])
        else:
            y, u, v = mct_jax.ict_fwd(shifted[0], shifted[1], shifted[2])
        shifted[0], shifted[1], shifted[2] = y, u, v
    if not cfg.reversible:
        shifted = [a.astype(jnp.float32) for a in shifted]
    out = []
    for c in range(ncomps):
        out.append(_dwt_fwd(shifted[c], cfg.tc_rects[c],
                            cfg.numresolutions, cfg.reversible))
    return out


def _inv_transform(cfg: TileTransformConfig, bands_list):
    """Inverse of _fwd_transform: list of band dicts -> tuple of comps."""
    ncomps = len(bands_list)
    comps = [
        _dwt_inv(bands_list[c], cfg.tc_rects[c],
                 cfg.numresolutions, cfg.reversible)
        for c in range(ncomps)
    ]
    if cfg.mct and ncomps >= 3:
        if cfg.reversible:
            r, g, b = mct_jax.rct_inv(comps[0], comps[1], comps[2])
        else:
            r, g, b = mct_jax.ict_inv(comps[0], comps[1], comps[2])
        comps[0], comps[1], comps[2] = r, g, b
    out = []
    for c in range(ncomps):
        a = comps[c]
        if not cfg.reversible:
            a = jnp.round(a).astype(jnp.int32)
        out.append(mct_jax.dc_shift_inv(a, cfg.precs[c], cfg.signeds[c]))
    return tuple(out)


@functools.lru_cache(maxsize=64)
def _jitted_fwd(cfg: TileTransformConfig):
    """Jitted forward transform returning bands as a flat tuple (stable
    ordering) so the output pytree is hashable-friendly."""
    keys = _band_keys(cfg.numresolutions)

    @jax.jit
    def run(*comps):
        bands_list = _fwd_transform(cfg, comps)
        return tuple(bands_list[c][k] for c in range(len(comps))
                     for k in keys)

    return run


@functools.lru_cache(maxsize=64)
def _jitted_inv(cfg: TileTransformConfig):
    keys = _band_keys(cfg.numresolutions)

    @jax.jit
    def run(*flat_bands):
        nk = len(keys)
        ncomps = len(flat_bands) // nk
        bands_list = [
            {k: flat_bands[c * nk + i] for i, k in enumerate(keys)}
            for c in range(ncomps)
        ]
        return _inv_transform(cfg, bands_list)

    return run


def _band_keys(numresolutions: int) -> Tuple[BandKey, ...]:
    keys: List[BandKey] = [(0, 0)]
    for r in range(1, numresolutions):
        keys += [(r, 1), (r, 2), (r, 3)]
    return tuple(keys)


def config_for_tile(siz, cod, tile: Rect) -> TileTransformConfig:
    """Build a TileTransformConfig from codestream structs for one tile.

    Tile-component rects are normalized to their origin modulo
    2^(numresolutions-1): the transform depends on the origin only
    through each level's parity (and the band residues), so interior
    tiles of a uniform grid collapse to ONE config — one jit compile,
    and the mesh/batched paths batch them together instead of running
    singleton groups."""
    from ..core.geometry import component_rect

    m = 1 << (cod.numresolutions - 1)

    def _norm(r: Rect) -> Rect:
        dx, dy = r.x0 - r.x0 % m, r.y0 - r.y0 % m
        return Rect(r.x0 - dx, r.y0 - dy, r.x1 - dx, r.y1 - dy)

    tc_rects = tuple(
        _norm(component_rect(tile, c.dx, c.dy)) for c in siz.comps)
    from ..core.params import Transform
    return TileTransformConfig(
        tc_rects=tc_rects,
        precs=tuple(c.prec for c in siz.comps),
        signeds=tuple(c.signed for c in siz.comps),
        numresolutions=cod.numresolutions,
        reversible=(cod.transform == Transform.DWT_53),
        mct=bool(cod.mct),
    )


def device_fwd_bands(comps_data: List[np.ndarray],
                     cfg: TileTransformConfig) -> List[Dict[BandKey, np.ndarray]]:
    """Run the forward transform on device; return numpy band dicts usable as
    `encode_tile(..., coeff_bands=...)`."""
    fn = _jitted_fwd(cfg)
    flat = fn(*[jnp.asarray(a) for a in comps_data])
    flat = jax.device_get(flat)
    keys = _band_keys(cfg.numresolutions)
    nk = len(keys)
    return [
        {k: flat[c * nk + i] for i, k in enumerate(keys)}
        for c in range(len(comps_data))
    ]


def device_inv_comps(bands_list: List[Dict[BandKey, np.ndarray]],
                     cfg: TileTransformConfig) -> List[np.ndarray]:
    """Inverse transform on device: band dicts -> component sample arrays."""
    keys = _band_keys(cfg.numresolutions)
    flat = [jnp.asarray(bands_list[c][k]) for c in range(len(bands_list))
            for k in keys]
    fn = _jitted_inv(cfg)
    out = fn(*flat)
    return [np.asarray(a) for a in jax.device_get(out)]
