"""Multi-host (multi-process) encode: jax.distributed + DCN byte gather.

The reference is a single-host codec (SURVEY.md §2.5: no MPI/NCCL
anywhere); this module supplies the pod-scale story the TPU build needs:

- `init_distributed()` wires a process into the jax.distributed runtime
  (ICI collectives inside a slice, DCN across slices — jax inserts the
  right transport from the global mesh).
- Each process encodes the TILES OWNED BY ITS SHARD through the one
  production encoder code path (codestream/encoder.py — markers, HT/CAP,
  POC, tile-parts, rate control all identical), then
  `gather_tile_bytes()` all-gathers the per-tile compressed bodies over
  the mesh so host 0 (the writer, mirroring how the reference funnels
  every byte through one BufferedStream, reference:
  src/lib/jp2/t2/T2.cpp:859) assembles the final codestream.
- Determinism needs no coordination: the packet layout is a pure
  function of (tile index, progression, counters)
  (codestream/packetiter.py), and the global-PCRD thresholds derive
  from psum-reduced totals (codestream/pcrd.py GlobalPCRDAllocator), so
  every process computes identical bytes for its tiles.

Tested with real separate processes on the CPU backend
(tests/test_multihost.py spawns a 2-process jax.distributed cluster and
byte-compares against the single-process encoder).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Join the jax.distributed cluster (idempotent per process)."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def owned_tiles(numtiles: int, process_id: Optional[int] = None,
                num_processes: Optional[int] = None) -> List[int]:
    """Static tile ownership: tile t belongs to process t % P (matches
    the shard layout GlobalPCRDAllocator assumes for its psum
    partials)."""
    import jax
    p = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [t for t in range(numtiles) if t % n == p]


def gather_tile_bytes(local: Sequence[bytes], owned: Sequence[int],
                      numtiles: int, max_len: Optional[int] = None
                      ) -> List[bytes]:
    """All-gather per-tile byte strings over the global device mesh.

    `local[i]` is the compressed bytes of tile `owned[i]`. Every process
    returns the full numtiles-long list (so any process can act as the
    writer). Bytes ride a (numtiles, max_len) uint8 all-reduce: each
    process contributes its tiles' rows, zeros elsewhere — a psum over
    one-hot rows IS the gather, and it maps onto ICI/DCN collectives
    instead of a side channel.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    lens = np.zeros(numtiles, np.int32)
    for t, b in zip(owned, local):
        lens[t] = len(b)
    # agree on the padded row length first (tiny all-reduce)
    gl = multihost_utils.process_allgather(lens)
    gl = gl.reshape(-1, numtiles).max(axis=0) if gl.ndim > 1 else gl
    cap = int(max_len or max(int(gl.max()), 1))
    mat = np.zeros((numtiles, cap), np.uint8)
    for t, b in zip(owned, local):
        mat[t, :len(b)] = np.frombuffer(b, np.uint8)
    total = multihost_utils.process_allgather(mat)
    if total.ndim == 3:  # (P, numtiles, cap): sum the one-hot rows
        total = total.astype(np.int32).sum(axis=0).astype(np.uint8)
    out = []
    lens_final = np.maximum(lens, np.asarray(gl))
    for t in range(numtiles):
        out.append(bytes(np.asarray(total[t, : int(lens_final[t])])))
    return out


def encode_multihost(image, params=None, rsiz: int = 0) -> bytes:
    """Encode with the per-tile pipeline partitioned across jax
    processes; every process returns the identical full codestream
    (process 0 is the canonical writer in a deployment).

    Phase 1: each process runs DC shift -> MCT -> DWT -> T1 -> T2 body
    emission only for its owned tiles (tile t -> process t % P) through
    the one production code path. With `rate_alloc='global'`, phase 1
    also runs the image-wide PCRD collective: every host registers its
    owned tiles' R-D tables, the bisection reduces byte/distortion
    totals over the process mesh in deterministic tile order
    (pcrd.GlobalPCRDAllocator process_reduce mode), and each host
    derives bit-identical thresholds. Phase 2: the per-tile results
    cross the mesh with `gather_tile_bytes` (an all-reduce of one-hot
    rows — ICI/DCN collectives, no side channel). Phase 3: every
    process runs the cheap marker/tile-part assembly over the complete
    result set; determinism of the packet layout makes the outputs
    byte-identical.
    """
    import pickle

    import jax

    from ..codestream import encoder as enc
    from ..core.geometry import tile_grid_size
    from ..core.params import EncoderParams

    params = params or EncoderParams()
    siz = enc.build_siz(image, params)
    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz,
                              siz.ytosiz)
    numtiles = ntx * nty
    if jax.process_count() == 1:
        return enc.encode(image, params, rsiz=rsiz)
    owned = owned_tiles(numtiles)
    mine = enc.encode(image, params, rsiz=rsiz, _only_tiles=set(owned))
    payloads = [pickle.dumps(mine[t]) for t in owned]
    gathered = gather_tile_bytes(payloads, owned, numtiles)
    results = {t: pickle.loads(gathered[t]) for t in range(numtiles)}
    return enc.encode(image, params, rsiz=rsiz, _tile_results=results)
