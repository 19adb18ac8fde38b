"""Multi-chip sharded encode: the tile grid is the data-parallel axis.

The reference processes tiles sequentially on one host (reference:
src/lib/jp2/codestream/j2k.cpp:2088 tile loop); here the tile batch is
sharded over a `jax.sharding.Mesh` with `shard_map` — each device runs the
fused transform pipeline (DC shift -> MCT -> DWT) for its tile shard, the
hosts then run batched T1/T2 on their shards' coefficients, and byte
assembly is a deterministic concatenation because the packet layout is a
pure function of (tile index, progression) (SURVEY.md §2.5). Tiles are
grouped by geometry so every group compiles once.

Works identically on a virtual CPU mesh (tests / driver dryrun) and real
TPU slices.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codestream import markers
from ..codestream.encoder import (
    build_cod,
    build_siz,
    extract_tile_comps,
)
from ..codestream.markers import SotInfo
from ..codestream.tile import TileEncResult, default_qcd, encode_tile
from ..core.geometry import Rect, tile_grid_size, tile_rect
from ..core.image import Image
from ..core.params import EncoderParams
from ..models.pipeline import (
    TileTransformConfig,
    _band_keys,
    _fwd_transform,
    config_for_tile,
)


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("tiles",))


@functools.lru_cache(maxsize=32)
def _sharded_transform(cfg: TileTransformConfig, mesh: Mesh):
    """Batched transform (B, C, h, w) -> flat band tuple, sharded on B."""
    keys = _band_keys(cfg.numresolutions)

    def step(batch):
        # batch: (b_local, C, h, w) on each device after shard_map.
        comps = tuple(batch[:, c] for c in range(len(cfg.tc_rects)))
        bands_list = _fwd_transform(cfg, comps)
        return tuple(bands_list[c][k] for c in range(len(comps))
                     for k in keys)

    from jax.experimental.shard_map import shard_map

    spec_in = P("tiles", None, None, None)
    spec_out = tuple(P("tiles", None, None) for _ in
                     range(len(cfg.tc_rects) * len(keys)))
    return jax.jit(shard_map(step, mesh=mesh, in_specs=(spec_in,),
                             out_specs=spec_out))


def _transform_tile_group(
    tiles: List[Tuple[int, Rect, List[np.ndarray]]],
    cfg: TileTransformConfig,
    mesh: Mesh,
) -> Dict[int, List[Dict[Tuple[int, int], np.ndarray]]]:
    """Run the device transform for a group of same-geometry tiles.
    Returns {tile_index: coeff_bands}."""
    ndev = mesh.devices.size
    b = len(tiles)
    b_pad = -(-b // ndev) * ndev
    c = len(cfg.tc_rects)
    h, w = cfg.tc_rects[0].h, cfg.tc_rects[0].w
    batch = np.zeros((b_pad, c, h, w), dtype=np.int32)
    for i, (_, _, comps) in enumerate(tiles):
        for ci in range(c):
            batch[i, ci] = comps[ci]
    fn = _sharded_transform(cfg, mesh)
    sharding = NamedSharding(mesh, P("tiles", None, None, None))
    flat = fn(jax.device_put(batch, sharding))
    flat = jax.device_get(flat)
    keys = _band_keys(cfg.numresolutions)
    nk = len(keys)
    out = {}
    for i, (t, _, _) in enumerate(tiles):
        out[t] = [
            {k: np.asarray(flat[ci * nk + j][i])
             for j, k in enumerate(keys)}
            for ci in range(c)
        ]
    return out


def encode_sharded(image: Image, params: Optional[EncoderParams] = None,
                   mesh: Optional[Mesh] = None) -> bytes:
    """Encode with the tile batch sharded over the mesh.

    Byte-identical to codestream.encoder.encode (the packet layout is a
    pure function of the tile plan; only the transform execution moves to
    the mesh).
    """
    params = params or EncoderParams()
    mesh = mesh or default_mesh()
    siz = build_siz(image, params)
    cod = build_cod(image, params)
    qcd = default_qcd(siz, cod, params.num_guard_bits, params.base_step)

    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    numtiles = ntx * nty

    # Group tiles by transform geometry (uniform interior tiles compile
    # once; edge tiles form their own groups).
    groups: Dict[TileTransformConfig,
                 List[Tuple[int, Rect, List[np.ndarray]]]] = {}
    rects: Dict[int, Rect] = {}
    for t in range(numtiles):
        tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                       siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
        rects[t] = tr
        comps = extract_tile_comps(image, siz, t)
        cfg = config_for_tile(siz, cod, tr)
        groups.setdefault(cfg, []).append((t, tr, comps))

    coeff: Dict[int, List[Dict[Tuple[int, int], np.ndarray]]] = {}
    for cfg, tiles in groups.items():
        # The batched device path needs equal per-component shapes; mixed
        # subsampling falls back to per-tile host transform (coeff=None).
        if len(set(r.w for r in cfg.tc_rects)) == 1 and \
                len(set(r.h for r in cfg.tc_rects)) == 1:
            coeff.update(_transform_tile_group(tiles, cfg, mesh))

    layer_alloc = None
    needs_rc = bool(params.rates and any(r > 0 for r in params.rates)) \
        or bool(params.quality_psnr)
    if needs_rc:
        from ..codestream.pcrd import make_layer_alloc
        layer_alloc = make_layer_alloc(image, params)

    out = bytearray()
    out += markers.write_soc()
    out += markers.write_siz(siz)
    out += markers.write_cod(cod)
    out += markers.write_qcd(qcd)
    if params.comment:
        out += markers.write_com(params.comment)
    for t in range(numtiles):
        comps = extract_tile_comps(image, siz, t)
        res: TileEncResult = encode_tile(
            comps, siz, cod, qcd, rects[t], layer_alloc=layer_alloc,
            coeff_bands=coeff.get(t))
        psot = 12 + 2 + len(res.body)
        out += markers.write_sot(SotInfo(tile_index=t, psot=psot))
        out += markers.write_sod()
        out += res.body
    out += markers.write_eoc()
    return bytes(out)


def pcrd_global_stats(stats: jnp.ndarray) -> jnp.ndarray:
    """All-reduce per-shard PCRD summaries so every shard derives identical
    layer thresholds (inside shard_map; SURVEY.md §2.5)."""
    return jax.lax.psum(stats, "tiles")
