"""PCRD-opt rate control: convex-hull pass pruning + slope-threshold
bisection with full Tier-2 packet simulation.

Algorithmic analog of the reference's feasible-slope bisection
(reference: src/lib/jp2/TileProcessor.cpp pcrd_bisect_feasible:371,
makelayer_feasible:281, rate hull RateControl.cpp convexHull:31, simulate
T2.cpp encode_packets_simulate:131), restructured: per-pass (rate,
distortion) tables come out of the batched T1 (device or native) in one
shot, the hull and bisection are pure host math, and the simulation is the
real packet writer run in counting mode — so every shard can reproduce the
identical allocation from the same gathered statistics (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .t2 import CblkEnc


@dataclasses.dataclass
class HullPoint:
    npasses: int      # truncation after this many passes
    rate: int         # cumulative bytes
    dist: float       # cumulative distortion decrease (weighted)
    slope: float      # R-D slope vs previous hull point


def convex_hull(cblk: CblkEnc) -> List[HullPoint]:
    """Feasible truncation points with strictly decreasing slopes."""
    pts: List[Tuple[int, int, float]] = [(0, 0, 0.0)]
    for i, p in enumerate(cblk.passes):
        pts.append((i + 1, p.rate, p.distortion))
    hull: List[Tuple[int, int, float]] = [pts[0]]
    for pt in pts[1:]:
        while hull:
            n0, r0, d0 = hull[-1]
            dr = pt[1] - r0
            dd = pt[2] - d0
            if dr < 0 or (dr == 0 and dd <= 0):
                break
            if dr == 0:           # free distortion: replace
                hull.pop()
                continue
            slope = dd / dr
            if len(hull) >= 2:
                n1, r1, d1 = hull[-2]
                prev_slope = (d0 - d1) / max(1, (r0 - r1))
                if slope >= prev_slope:
                    hull.pop()
                    continue
            if dd <= 0:
                break             # no gain: not a feasible point
            hull.append(pt)
            break
        else:
            hull.append(pt)
    out: List[HullPoint] = []
    for i in range(1, len(hull)):
        n0, r0, d0 = hull[i - 1]
        n1, r1, d1 = hull[i]
        out.append(HullPoint(npasses=n1, rate=r1, dist=d1,
                             slope=(d1 - d0) / max(1, r1 - r0)))
    return out


def _npasses_at(hull: List[HullPoint], thresh: float) -> Tuple[int, float]:
    """(passes included, distortion decrease) at slope threshold."""
    n, d = 0, 0.0
    for hp in hull:
        if hp.slope >= thresh:
            n, d = hp.npasses, hp.dist
        else:
            break
    return n, d


@dataclasses.dataclass
class RateControlCtx:
    """Per-tile context handed to a layer allocator by encode_tile."""

    cblks: List[CblkEnc]
    numlayers: int
    tile_samples: int       # samples in this tile across components
    image_samples: int      # samples in the whole image across components
    max_prec: int           # max component bit depth (for maxSE)
    simulate_upto: Callable[[int], int]  # bytes of packets for layers 0..l
    # per-component packet byte totals for layers 0..l (cinema caps)
    simulate_comp_upto: Optional[Callable[[int], dict]] = None
    # Optional fast path: write one layer's pass counts (values aligned
    # with the filtered cblk list passed alongside) straight into the
    # native simulator's buffer, skipping per-object attribute stores
    # during bisection.
    write_layer: Optional[Callable[[int, "np.ndarray", list], None]] = None


class PCRDAllocator:
    """Assigns passes to quality layers to meet byte and/or PSNR targets.

    `rates`: per-layer cumulative compression ratios (like -r); 0 = no
    constraint (all remaining passes — lossless last layer).
    `quality_psnr`: per-layer PSNR targets in dB (like -q); 0 on the last
    layer = lossless.
    `image_bytes`: uncompressed image size the ratios refer to.
    """

    def __init__(self, rates: Sequence[float] = (),
                 quality_psnr: Sequence[float] = (),
                 image_bytes: int = 0,
                 max_abs_bytes: int = 0,
                 max_comp_bytes: int = 0):
        self.rates = tuple(rates)
        self.quality_psnr = tuple(quality_psnr)
        self.image_bytes = image_bytes
        # Absolute codestream byte cap (profiles): overrides ratio-derived
        # targets on the final layer.
        self.max_abs_bytes = max_abs_bytes
        # Per-component packet byte cap (cinema: reference T2.cpp:181
        # encode_packets_simulate m_max_comp_size check).
        self.max_comp_bytes = max_comp_bytes

    def __call__(self, ctx: RateControlCtx) -> None:
        cblks = [cb for cb in ctx.cblks if cb.numpasses > 0]
        hull_list = [convex_hull(cb) for cb in cblks]
        slopes = [hp.slope for h in hull_list for hp in h]
        for cb in ctx.cblks:
            cb.layer_npasses = [0] * ctx.numlayers
        if not slopes:
            if ctx.cblks:
                for cb in ctx.cblks:
                    cb.layer_npasses[-1] = cb.numpasses
            return
        smin, smax = min(slopes), max(slopes)
        tile_frac = ctx.tile_samples / max(1, ctx.image_samples)
        distotile = sum(cb.passes[-1].distortion for cb in cblks)
        max_se = float((1 << ctx.max_prec) - 1) ** 2 * ctx.tile_samples

        # Padded per-block hull tables: slopes strictly descending along
        # each row, so the passes included at a threshold is the last
        # column with slope >= thresh — one vectorized comparison for the
        # whole tile instead of a Python hull walk per block.
        N = len(cblks)
        H = max(len(h) for h in hull_list) or 1
        S = np.full((N, H), -np.inf)
        NPV = np.full((N, H), 1 << 30, dtype=np.int64)  # pad > any prev_n
        DV = np.zeros((N, H))
        for i, h in enumerate(hull_list):
            for j, hp in enumerate(h):
                S[i, j] = hp.slope
                NPV[i, j] = hp.npasses
                DV[i, j] = hp.dist
        rows = np.arange(N)
        numpasses_vec = np.asarray([cb.numpasses for cb in cblks],
                                   np.int64)
        prev_n = np.zeros(N, dtype=np.int64)
        cur_col = [np.zeros(N, dtype=np.int64)]

        def _n_d_at(thresh: float):
            k = (S >= thresh).sum(axis=1)
            idx = np.maximum(k - 1, 0)
            pos = k > 0
            n = np.where(pos, NPV[rows, idx], 0)
            d = np.where(pos, DV[rows, idx], 0.0)
            return n, d

        def apply(thresh: Optional[float], layer: int) -> None:
            """Set layer pass counts from threshold (None = all rest)."""
            if thresh is None:
                n = numpasses_vec
            else:
                n, _ = _n_d_at(thresh)
            n = np.maximum(n, prev_n)
            col = n - prev_n
            cur_col[0] = col
            if ctx.write_layer is not None:
                ctx.write_layer(layer, col, cblks)
            else:
                for cb, v in zip(cblks, col):
                    cb.layer_npasses[layer] = int(v)

        def _store_objects(layer: int) -> None:
            """Materialize the converged column into the CblkEnc objects
            (packet emission reads them; bisection iterations don't)."""
            if ctx.write_layer is not None:
                for cb, v in zip(cblks, cur_col[0]):
                    cb.layer_npasses[layer] = int(v)

        def included_dist(thresh: float) -> float:
            n, d = _n_d_at(thresh)
            j = (NPV <= prev_n[:, None]).sum(axis=1)
            d_prev = np.where(j > 0, DV[rows, np.maximum(j - 1, 0)], 0.0)
            d_eff = np.where(n < prev_n, d_prev, d)
            return float(np.maximum(d_eff, 0.0).sum())

        for layer in range(ctx.numlayers):
            rate = self.rates[layer] if layer < len(self.rates) else 0.0
            q = (self.quality_psnr[layer]
                 if layer < len(self.quality_psnr) else 0.0)
            target_bytes = 0
            if rate > 0:
                target_bytes = int(self.image_bytes / rate * tile_frac)
            if self.max_abs_bytes and layer == ctx.numlayers - 1:
                cap = int(self.max_abs_bytes * tile_frac)
                target_bytes = min(target_bytes, cap) if target_bytes \
                    else cap
            if target_bytes <= 0 and q <= 0:
                apply(None, layer)
                _store_objects(layer)
                prev_n = numpasses_vec.copy()
                continue

            if q > 0:
                # Quality mode (reference pcrd "fixed quality"): remaining
                # distortion grows with threshold; find the LARGEST feasible
                # threshold (fewest passes) meeting the PSNR target.
                limit = max_se / (10.0 ** (q / 10.0))
                lo, hi = smin, smax
                feasible = (distotile - included_dist(smin)) <= limit
                if feasible:
                    for _ in range(60):
                        mid = 0.5 * (lo + hi)
                        if (distotile - included_dist(mid)) <= limit:
                            lo = mid
                        else:
                            hi = mid
                    thresh = lo
                else:
                    thresh = smin  # best effort: include everything feasible
                apply(thresh, layer)
                _store_objects(layer)
            else:
                # Byte-budget mode: bytes shrink as threshold grows; find
                # the SMALLEST feasible threshold (most passes) that fits.
                comp_cap = 0
                if self.max_comp_bytes and ctx.simulate_comp_upto:
                    comp_cap = max(1, int(self.max_comp_bytes * tile_frac))

                def fits(l: int) -> bool:
                    if ctx.simulate_upto(l) > target_bytes:
                        return False
                    if comp_cap:
                        per_comp = ctx.simulate_comp_upto(l)
                        if any(v > comp_cap for v in per_comp.values()):
                            return False
                    return True

                lo, hi = smin, smax
                apply(hi, layer)
                feasible = fits(layer)
                if feasible:
                    for _ in range(60):
                        mid = 0.5 * (lo + hi)
                        apply(mid, layer)
                        if fits(layer):
                            hi = mid
                        else:
                            lo = mid
                    apply(hi, layer)
                    _store_objects(layer)
                else:
                    # Even the sparsest assignment busts the budget: emit
                    # an empty layer (headers only), like the reference's
                    # failure path.
                    zero = np.zeros(N, dtype=np.int64)
                    cur_col[0] = zero
                    if ctx.write_layer is not None:
                        ctx.write_layer(layer, zero, cblks)
                    for cb in cblks:
                        cb.layer_npasses[layer] = 0
            prev_n = prev_n + cur_col[0]


def make_layer_alloc(image, params) -> PCRDAllocator:
    """Build the allocator from EncoderParams (-r ratios / -q PSNR)."""
    image_bytes = sum(
        c.data.shape[0] * c.data.shape[1] * c.prec for c in image.components
    ) // 8
    return PCRDAllocator(rates=params.rates,
                         quality_psnr=params.quality_psnr,
                         image_bytes=image_bytes)
