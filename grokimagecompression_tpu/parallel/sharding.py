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

from ..codestream.encoder import extract_tile_comps
from ..core.geometry import Rect, tile_grid_size, tile_rect
from ..core.image import Image
from ..core.params import EncoderParams
from ..models.pipeline import (
    TileTransformConfig,
    _band_keys,
    _fwd_transform,
    _inv_transform,
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

    try:
        from jax import shard_map
    except ImportError:  # older jax
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


def transform_tiles_on_mesh(
    image: Image, siz, cod, mesh: Mesh,
) -> Tuple[Dict[int, List[Dict[Tuple[int, int], np.ndarray]]],
           Dict[int, List[np.ndarray]]]:
    """Run the fused tile transform for every tile over the mesh.

    Returns ({tile_index: coeff_bands}, {tile_index: comps}); tiles whose
    geometry cannot batch (mixed per-component shapes from subsampling)
    are absent from the first dict and fall back to the host transform in
    the caller. The comps dict lets the caller skip re-extracting tile
    planes (each extraction is a copy).
    """
    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    numtiles = ntx * nty
    # Group tiles by transform geometry (uniform interior tiles compile
    # once; edge tiles form their own groups).
    groups: Dict[TileTransformConfig,
                 List[Tuple[int, Rect, List[np.ndarray]]]] = {}
    comps_by_tile: Dict[int, List[np.ndarray]] = {}
    for t in range(numtiles):
        tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                       siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
        comps = extract_tile_comps(image, siz, t)
        comps_by_tile[t] = comps
        cfg = config_for_tile(siz, cod, tr)
        groups.setdefault(cfg, []).append((t, tr, comps))

    coeff: Dict[int, List[Dict[Tuple[int, int], np.ndarray]]] = {}
    for cfg, tiles in groups.items():
        if len(set(r.w for r in cfg.tc_rects)) == 1 and \
                len(set(r.h for r in cfg.tc_rects)) == 1:
            coeff.update(_transform_tile_group(tiles, cfg, mesh))
    return coeff, comps_by_tile


# ---------------------------------------------------------------------------
# Mesh-sharded FUSED entropy encode: the flagship device kernels
# (models/fused_encode: transform -> block gather -> HT/MQ coding ->
# packed segments, one XLA program) composed with the tile mesh.  Each
# device runs the whole fused program for its shard of same-geometry
# tiles under shard_map (the per-batch word compaction and packing stay
# device-local — no cross-device collectives are needed because tiles
# are independent); the host splices each shard's packed bytes with the
# same collect logic as the single-device path.  The reference's
# dominant cost center (block coding, T1Encoder.cpp:57-83) thereby runs
# ON the mesh instead of on host threads.
# ---------------------------------------------------------------------------


def fused_entropy_tiles_on_mesh(image: Image, siz, cod, qcd, mesh: Mesh,
                                coder: str):
    """Run the fused device entropy encode for every batchable tile over
    the mesh. Returns {tile_index: t1_segments} (the encode_tile
    `t1_segments` contract: HT segment bytes, or MQ
    (data, numbps, numpasses) tuples, in t1-desc order); tiles whose
    geometry cannot batch, or whose MQ word compaction overflowed, are
    absent and fall back to the host coder in the caller."""
    from ..models import fused_encode
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    numtiles = ntx * nty
    groups: Dict[object, List[Tuple[int, List[np.ndarray]]]] = {}
    plans: Dict[object, object] = {}
    for t in range(numtiles):
        tr = tile_rect(t, siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                       siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
        plan = fused_encode.build_plan(siz, cod, qcd, tr, coder=coder)
        if plan is None:
            continue
        comps = extract_tile_comps(image, siz, t)
        if len(set(a.shape for a in comps)) != 1:
            continue
        groups.setdefault(plan, []).append((t, comps))
        plans[plan] = plan

    ndev = mesh.devices.size
    out: Dict[int, List] = {}
    for plan, tiles in groups.items():
        b = len(tiles)
        b_pad = -(-b // ndev) * ndev
        nloc = b_pad // ndev
        C = len(tiles[0][1])
        h, w = tiles[0][1][0].shape
        batch = np.zeros((b_pad, C, h, w), np.int32)
        for i, (_, comps) in enumerate(tiles):
            for ci in range(C):
                batch[i, ci] = comps[ci]
        if coder == "mq":
            fn, total_bound, mhead = fused_encode._jitted_fused_mq(
                plan, nloc)
        else:
            fn, total_bound, mhead = fused_encode._jitted_fused(plan, nloc)

        def local(bt, _fn=fn, _C=C):
            return _fn(*(bt[:, c] for c in range(_C)))

        spec_in = P("tiles", None, None, None)
        # check_vma off: the body is collective-free (tiles are
        # independent) but its lax.scan carries start from constants,
        # which the replication checker flags as unvarying-vs-varying.
        kw = {}
        import inspect
        sig = inspect.signature(shard_map).parameters
        if "check_vma" in sig:
            kw["check_vma"] = False
        elif "check_rep" in sig:
            kw["check_rep"] = False
        if coder == "mq":
            sm = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec_in,),
                                   out_specs=(P("tiles"), P("tiles")),
                                   **kw))
        else:
            sm = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec_in,),
                                   out_specs=P("tiles"), **kw))
        sharding = NamedSharding(mesh, spec_in)
        res = sm(jax.device_put(batch, sharding))
        if coder == "mq":
            head_all = np.asarray(jax.device_get(res[0])).reshape(ndev, -1)
            words_all = np.asarray(jax.device_get(res[1])).reshape(ndev, -1)
        else:
            flat_all = np.asarray(jax.device_get(res)).reshape(ndev, -1)
        for di in range(ndev):
            lo = di * nloc
            if lo >= b:
                break
            if coder == "mq":
                per = fused_encode.assemble_collected_mq(
                    plan, nloc, head_all[di], words_all[di])
            else:
                from ..ops import ht_jax
                flat = flat_all[di]
                metrics_np = flat[:mhead].reshape(-1, ht_jax.NMETRICS)
                per = fused_encode.assemble_collected_ht(
                    plan, nloc, metrics_np, flat[mhead:])
            for f in range(nloc):
                gi = lo + f
                if gi >= b or per[f] is None:
                    continue
                out[tiles[gi][0]] = per[f]
    return out


def encode_sharded(image: Image, params: Optional[EncoderParams] = None,
                   mesh: Optional[Mesh] = None) -> bytes:
    """Encode with the tile-batch transform sharded over the mesh.

    Thin wrapper over codestream.encoder.encode(mesh=...): markers, HT/CAP
    signalling, POC, tile-parts, packed headers, and rate control all run
    through the single encoder code path, so sharded output is
    byte-identical to sequential output for every parameter combination.
    """
    from ..codestream import encoder as _encoder
    return _encoder.encode(image, params, mesh=mesh or default_mesh())


def pcrd_global_stats(stats: jnp.ndarray) -> jnp.ndarray:
    """All-reduce per-shard PCRD summaries so every shard derives identical
    layer thresholds (inside shard_map; SURVEY.md §2.5)."""
    return jax.lax.psum(stats, "tiles")


# ---------------------------------------------------------------------------
# Sharded decode: mesh-batched inverse transform (tiles = data axis)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _sharded_inverse(cfg: TileTransformConfig, mesh: Mesh):
    """Batched inverse transform: flat (B, bh, bw) band tuple ->
    (B, C, h, w)-ish component tuple, sharded on B."""
    keys = _band_keys(cfg.numresolutions)
    nk = len(keys)

    def step(*flat_bands):
        ncomps = len(flat_bands) // nk
        bands_list = [
            {k: flat_bands[c * nk + i] for i, k in enumerate(keys)}
            for c in range(ncomps)
        ]
        return _inv_transform(cfg, bands_list)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    ncomps = len(cfg.tc_rects)
    spec_in = tuple(P("tiles", None, None) for _ in range(ncomps * nk))
    spec_out = tuple(P("tiles", None, None) for _ in range(ncomps))
    return jax.jit(shard_map(step, mesh=mesh, in_specs=spec_in,
                             out_specs=spec_out))


def inverse_tiles_on_mesh(
    groups: Dict[TileTransformConfig,
                 List[Tuple[int, List[Dict[Tuple[int, int], np.ndarray]]]]],
    mesh: Mesh,
) -> Dict[int, List[np.ndarray]]:
    """Run the inverse transform for groups of same-geometry tiles over
    the mesh. groups: {cfg: [(tile_index, bands_list), ...]} ->
    {tile_index: [comp arrays]}. The decode mirror of
    transform_tiles_on_mesh (reference decode hot loops it replaces:
    src/lib/jp2/transform/dwt.cpp:1208/2154, TileProcessor.cpp:1303)."""
    out: Dict[int, List[np.ndarray]] = {}
    ndev = mesh.devices.size
    sharding = NamedSharding(mesh, P("tiles", None, None))
    for cfg, tiles in groups.items():
        keys = _band_keys(cfg.numresolutions)
        b = len(tiles)
        b_pad = -(-b // ndev) * ndev
        ncomps = len(cfg.tc_rects)
        flat = []
        for c in range(ncomps):
            for k in keys:
                sample = tiles[0][1][c][k]
                arr = np.zeros((b_pad,) + sample.shape, sample.dtype)
                for i, (_, bl) in enumerate(tiles):
                    arr[i] = bl[c][k]
                flat.append(jax.device_put(arr, sharding))
        fn = _sharded_inverse(cfg, mesh)
        comps = jax.device_get(fn(*flat))
        for i, (t, _) in enumerate(tiles):
            out[t] = [np.asarray(comps[c][i]) for c in range(ncomps)]
    return out


def decode_sharded(data: bytes, params=None,
                   mesh: Optional[Mesh] = None) -> Image:
    """Decode with the tile batch sharded over the mesh: reversible
    streams run the FUSED entropy+inverse program per device (tiles
    round-robin; pixel-identical to the host decoder), irreversible
    streams shard the inverse transform (the 9/7 float path can differ
    from the host by 1 ulp on knife-edge samples — both conformant).
    Thin wrapper over codestream.decoder.decode(mesh=...)."""
    from ..codestream import decoder as _decoder
    return _decoder.decode(data, params, mesh=mesh or default_mesh())
