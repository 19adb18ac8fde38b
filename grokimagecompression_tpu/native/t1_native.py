"""ctypes binding for the native T1/MQ coder (src/t1.cpp).

Builds the shared library on first import if missing (g++ via Makefile).
Bit-identical to the Python reference t1/t1_np.py (enforced by
tests/test_t1_native.py); exposes the same per-block API plus batch
entry points that fan code-blocks out over C++ worker threads.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from ..t1.t1_np import PassInfo

_DIR = os.path.dirname(os.path.abspath(__file__))
# GROK_T1_LIB selects an alternate build of the native runtime (the
# sanitizer targets `make asan` / `make tsan`; tests/tools/run_sanitized.sh)
_SO = os.path.join(_DIR, os.environ.get("GROK_T1_LIB", "libgrok_t1.so"))

MAX_PASSES = 3 * 32 - 2


def _build() -> None:
    target = {"libgrok_t1_asan.so": "asan",
              "libgrok_t1_tsan.so": "tsan"}.get(os.path.basename(_SO))
    cmd = ["make", "-s"] + ([target] if target else [])
    subprocess.run(cmd, cwd=_DIR, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    # Must be set before libgomp is dlopen'd (it reads env at load).
    # Every native stage (DWT, T1, T2, MCT) runs on the same OMP team
    # now, so keeping workers briefly spinning between the back-to-back
    # parallel regions of one encode saves the wake-up latency per
    # region (~20% wall on the single-tile pipeline). The bounded
    # spincount still lets truly idle processes sleep.
    os.environ.setdefault("OMP_WAIT_POLICY", "active")
    os.environ.setdefault("GOMP_SPINCOUNT", "100000")
    srcs = [os.path.join(_DIR, "src", f) for f in
            ("t1.cpp", "ht.cpp", "dwt.cpp", "t2.cpp", "imgio.cpp",
             "mct.cpp", "ht_tables.inc")]
    if not os.path.exists(_SO) or any(
        os.path.getmtime(_SO) < os.path.getmtime(f) for f in srcs
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.grok_t1_encode.restype = ctypes.c_int
    lib.grok_t1_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.grok_t1_decode.restype = ctypes.c_int
    lib.grok_t1_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.grok_t1_encode_batch.restype = ctypes.c_int
    lib.grok_t1_encode_batch.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.grok_t1_decode_batch.restype = ctypes.c_int
    lib.grok_t1_decode_batch.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.grok_ht_encode.restype = ctypes.c_int
    lib.grok_ht_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.grok_ht_decode.restype = ctypes.c_int
    lib.grok_ht_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.grok_rc_hulls.restype = ctypes.c_int
    lib.grok_rc_hulls.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.grok_ht_encode_refined.restype = ctypes.c_int
    lib.grok_ht_encode_refined.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.grok_ht_decode_refined.restype = ctypes.c_int
    lib.grok_ht_decode_refined.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.grok_ht_encode_batch.restype = ctypes.c_int
    lib.grok_ht_encode_batch.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.grok_ht_decode_batch.restype = ctypes.c_int
    lib.grok_ht_decode_batch.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.grok_extract_blocks.restype = ctypes.c_int
    lib.grok_extract_blocks.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.grok_ht_encode_bands.restype = ctypes.c_int
    lib.grok_ht_encode_bands.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.grok_extract_blocks_f32.restype = ctypes.c_int
    lib.grok_extract_blocks_f32.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.grok_ht_decode_bands.restype = ctypes.c_int
    lib.grok_ht_decode_bands.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.grok_t1_decode_bands.restype = ctypes.c_int
    lib.grok_t1_decode_bands.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.grok_ht_dec_prepass.restype = ctypes.c_int
    lib.grok_ht_dec_prepass.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.grok_rct_fwd.restype = ctypes.c_int
    lib.grok_rct_fwd.argtypes = [ctypes.c_void_p] * 6 + [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int]
    lib.grok_rct_inv.restype = ctypes.c_int
    lib.grok_rct_inv.argtypes = [ctypes.c_void_p] * 6 + [
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int]
    lib.grok_dc_unshift.restype = ctypes.c_int
    lib.grok_dc_unshift.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int]
    for nm in ("grok_png_unfilter", "grok_png_filter"):
        fn = getattr(lib, nm)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.c_void_p]
    lib.grok_png_filter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p,
    ]
    return lib


_lib = _load()


import threading as _threading

_thread_override = _threading.local()


def set_thread_override(n):
    """Per-thread cap on batch worker threads (used by tile-parallel
    encode so nested pools don't oversubscribe)."""
    _thread_override.value = n


def default_threads() -> int:
    ov = getattr(_thread_override, "value", None)
    if ov:
        return max(1, int(ov))
    env = os.environ.get("GROK_TPU_THREADS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 1


def encode_cblk(mag: np.ndarray, neg: np.ndarray, orient: int,
                cblk_style: int = 0
                ) -> Tuple[bytes, int, int, List[PassInfo]]:
    h, w = mag.shape
    mag = np.ascontiguousarray(mag, dtype=np.uint32)
    neg = np.ascontiguousarray(neg, dtype=np.uint8)
    cap = max(4096, w * h * 6)
    out = np.empty(cap, dtype=np.uint8)
    meta = np.zeros(2, dtype=np.int32)
    rates = np.zeros(MAX_PASSES, dtype=np.int32)
    dist = np.zeros(MAX_PASSES, dtype=np.float64)
    term = np.zeros(MAX_PASSES, dtype=np.uint8)
    n = _lib.grok_t1_encode(
        mag.ctypes.data, neg.ctypes.data, w, h, orient, cblk_style,
        out.ctypes.data, cap, meta.ctypes.data, rates.ctypes.data,
        dist.ctypes.data, term.ctypes.data)
    if n < 0:
        raise RuntimeError("native T1 encode: output buffer overflow")
    numbps = int(meta[0])
    numpasses = int(meta[1])
    passes = [PassInfo(rate=int(rates[i]), distortion=float(dist[i]),
                       terminated=bool(term[i]))
              for i in range(numpasses)]
    return bytes(out[:n]), numbps, numpasses, passes


def decode_cblk(data: bytes, seg_lengths: Optional[List[int]], w: int, h: int,
                orient: int, numbps: int, numpasses: int,
                cblk_style: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    mag = np.zeros((h, w), dtype=np.uint32)
    neg = np.zeros((h, w), dtype=np.uint8)
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if data else \
        np.zeros(1, dtype=np.uint8)
    if seg_lengths:
        segs = np.asarray(seg_lengths, dtype=np.int32)
        nsegs = len(seg_lengths)
    else:
        segs = np.zeros(1, dtype=np.int32)
        nsegs = 0
    _lib.grok_t1_decode(
        buf.ctypes.data, len(data), segs.ctypes.data, nsegs, w, h, orient,
        numbps, numpasses, cblk_style, mag.ctypes.data, neg.ctypes.data)
    return mag, neg


def extract_blocks(bands: List[np.ndarray], descs: np.ndarray,
                   stepsizes=None
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gather code-blocks out of band planes natively.

    `bands`: contiguous 2-D arrays — int32 (reversible; abs/sign split)
    or, with `stepsizes` (one per band), float32 planes quantized with
    the deadzone quantizer during the gather. `descs`: (n, 5) int64
    rows of (band_idx, x0, y0, w, h). Returns (mag_flat, neg_flat,
    offsets).
    """
    n = len(descs)
    band_ptrs = np.array([b.ctypes.data for b in bands], dtype=np.int64)
    strides = np.array([b.strides[0] // 4 for b in bands], dtype=np.int64)
    sizes = descs[:, 3] * descs[:, 4]
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    total = int(offs[-1] + sizes[-1]) if n else 0
    desc6 = np.concatenate([descs, offs[:, None]], axis=1)
    desc6 = np.ascontiguousarray(desc6, dtype=np.int64)
    mag_flat = np.empty(max(1, total), dtype=np.uint32)
    neg_flat = np.empty(max(1, total), dtype=np.uint8)
    if stepsizes is not None:
        steps = np.asarray(stepsizes, np.float64)
        _lib.grok_extract_blocks_f32(
            n, band_ptrs.ctypes.data, strides.ctypes.data,
            steps.ctypes.data, desc6.ctypes.data, mag_flat.ctypes.data,
            neg_flat.ctypes.data)
    else:
        _lib.grok_extract_blocks(n, band_ptrs.ctypes.data,
                                 strides.ctypes.data, desc6.ctypes.data,
                                 mag_flat.ctypes.data,
                                 neg_flat.ctypes.data)
    return mag_flat, neg_flat, offs


def encode_cblk_batch(blocks: List[Tuple[np.ndarray, np.ndarray, int]],
                      cblk_style: int = 0, nthreads: Optional[int] = None
                      ) -> List[Tuple[bytes, int, int, List[PassInfo]]]:
    """Encode many code-blocks in one native call.

    `blocks` is a list of (mag, neg, orient). Returns per-block
    (data, numbps, numpasses, passes) like encode_cblk.
    """
    n = len(blocks)
    if n == 0:
        return []
    sizes = [b[0].size for b in blocks]
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:]) if n > 1 else None
    total = int(sum(sizes))
    mag_flat = np.empty(total, dtype=np.uint32)
    neg_flat = np.empty(total, dtype=np.uint8)
    desc = np.empty(n * 4, dtype=np.int64)
    max_wh = 0
    for i, (mag, neg, orient) in enumerate(blocks):
        h, w = mag.shape
        o = offsets[i]
        mag_flat[o:o + w * h] = mag.astype(np.uint32).ravel()
        neg_flat[o:o + w * h] = neg.astype(np.uint8).ravel()
        desc[i * 4] = o
        desc[i * 4 + 1] = w
        desc[i * 4 + 2] = h
        desc[i * 4 + 3] = orient
        max_wh = max(max_wh, w * h)
    return _mq_encode_flat(n, mag_flat, neg_flat, desc, cblk_style,
                           max_wh, nthreads)


def _mq_encode_flat(n, mag_flat, neg_flat, desc, cblk_style, max_wh,
                    nthreads):
    out_stride = max(4096, max_wh * 6)
    out_flat = np.empty(n * out_stride, dtype=np.uint8)
    out_meta = np.zeros(n * 3, dtype=np.int32)
    rates = np.zeros(n * MAX_PASSES, dtype=np.int32)
    dist = np.zeros(n * MAX_PASSES, dtype=np.float64)
    term = np.zeros(n * MAX_PASSES, dtype=np.uint8)
    rc = _lib.grok_t1_encode_batch(
        n, mag_flat.ctypes.data, neg_flat.ctypes.data, desc.ctypes.data,
        cblk_style, out_flat.ctypes.data, out_stride, out_meta.ctypes.data,
        rates.ctypes.data, dist.ctypes.data, term.ctypes.data, MAX_PASSES,
        nthreads if nthreads is not None else default_threads())
    if rc != 0:
        raise RuntimeError("native T1 batch encode failed")
    results = []
    for i in range(n):
        ln = int(out_meta[i * 3])
        numbps = int(out_meta[i * 3 + 1])
        numpasses = int(out_meta[i * 3 + 2])
        data = bytes(out_flat[i * out_stride:i * out_stride + ln])
        passes = [
            PassInfo(rate=int(rates[i * MAX_PASSES + j]),
                     distortion=float(dist[i * MAX_PASSES + j]),
                     terminated=bool(term[i * MAX_PASSES + j]))
            for j in range(numpasses)
        ]
        results.append((data, numbps, numpasses, passes))
    return results


def encode_cblk_batch_bands(bands: List[np.ndarray], descs: np.ndarray,
                            orients: np.ndarray, cblk_style: int = 0,
                            nthreads: Optional[int] = None,
                            stepsizes=None):
    """Like encode_cblk_batch but gathers blocks from band planes
    natively (no per-block numpy marshaling); with `stepsizes` the
    planes are float32 and quantized during the gather.

    `descs`: (n, 5) int64 (band_idx, x0, y0, w, h); `orients`: (n,).
    """
    n = len(descs)
    if n == 0:
        return []
    mag_flat, neg_flat, offs = extract_blocks(bands, descs, stepsizes)
    desc = np.empty((n, 4), dtype=np.int64)
    desc[:, 0] = offs
    desc[:, 1] = descs[:, 3]
    desc[:, 2] = descs[:, 4]
    desc[:, 3] = orients
    max_wh = int((descs[:, 3] * descs[:, 4]).max())
    return _mq_encode_flat(n, mag_flat, neg_flat,
                           np.ascontiguousarray(desc.ravel()), cblk_style,
                           max_wh, nthreads)


def decode_cblk_batch(blocks: List[Tuple[bytes, Optional[List[int]], int,
                                         int, int, int, int]],
                      cblk_style: int = 0, nthreads: Optional[int] = None,
                      signed_out: bool = False
                      ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Decode many code-blocks in one native call.

    `blocks` is a list of (data, seg_lengths, w, h, orient, numbps,
    numpasses). Returns per-block (mag, neg).
    """
    n = len(blocks)
    if n == 0:
        return []
    data_parts = []
    seg_parts: List[int] = []
    rows = []
    data_off = 0
    out_off = 0
    for (data, segs, w, h, orient, numbps, numpasses) in blocks:
        rows.append((data_off, len(data), len(seg_parts),
                     len(segs) if segs else 0, w, h, orient, numbps,
                     numpasses, cblk_style, out_off))
        data_parts.append(bytes(data))
        if segs:
            seg_parts.extend(int(s) for s in segs)
        data_off += len(data)
        out_off += w * h
    desc = np.asarray(rows, dtype=np.int64).reshape(-1)
    data_flat = np.frombuffer(b"".join(data_parts) or b"\x00",
                              dtype=np.uint8)
    segs_flat = np.asarray(seg_parts or [0], dtype=np.int32)
    mag_flat = np.zeros(out_off, dtype=np.uint32)
    neg_flat = np.zeros(out_off, dtype=np.uint8)
    _lib.grok_t1_decode_batch(
        n, data_flat.ctypes.data, segs_flat.ctypes.data, desc.ctypes.data,
        mag_flat.ctypes.data, neg_flat.ctypes.data,
        nthreads if nthreads is not None else default_threads(),
        1 if signed_out else 0)
    if signed_out:
        coef = mag_flat.view(np.int32)
    results = []
    out_off = 0
    for i, (data, segs, w, h, orient, numbps, numpasses) in enumerate(blocks):
        if signed_out:
            results.append(coef[out_off:out_off + w * h].reshape(h, w))
        else:
            mag = mag_flat[out_off:out_off + w * h].reshape(h, w).copy()
            neg = neg_flat[out_off:out_off + w * h].reshape(h, w).copy()
            results.append((mag, neg))
        out_off += w * h
    return results


def ht_encode_cblk(mag: np.ndarray, neg: np.ndarray, Mb: int) -> bytes:
    """Encode one HTJ2K cleanup segment (Part 15)."""
    h, w = mag.shape
    mag = np.ascontiguousarray(mag, dtype=np.uint32)
    neg = np.ascontiguousarray(neg, dtype=np.uint8)
    cap = max(4096, w * h * 6)
    out = np.empty(cap, dtype=np.uint8)
    n = _lib.grok_ht_encode(mag.ctypes.data, neg.ctypes.data, w, h, Mb,
                            out.ctypes.data, cap)
    if n < 0:
        raise RuntimeError("HT encode: output buffer overflow")
    return bytes(out[:n])


def ht_decode_cblk(data: bytes, w: int, h: int, missing_msbs: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode one HTJ2K cleanup segment into (mag, neg)."""
    mag = np.zeros((h, w), dtype=np.uint32)
    neg = np.zeros((h, w), dtype=np.uint8)
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if data else \
        np.zeros(1, dtype=np.uint8)
    rc = _lib.grok_ht_decode(buf.ctypes.data, len(data), w, h, missing_msbs,
                             mag.ctypes.data, neg.ctypes.data)
    if rc != 0:
        raise RuntimeError("HT decode failed")
    return mag, neg


def rc_hulls(offs: np.ndarray, rates: np.ndarray, dists: np.ndarray,
             H: int):
    """Batch convex hulls for rate control: offs (n+1,) int64 prefix
    offsets into flat cumulative rates (int32) / distortions (float64).
    Returns (S (n, H) float64 slopes [-inf pad], NPV (n, H) int64 pass
    counts, DV (n, H) float64 cumulative distortions, hull_len (n,))."""
    n = len(offs) - 1
    offs = np.ascontiguousarray(offs, np.int64)
    rates = np.ascontiguousarray(rates, np.int32)
    dists = np.ascontiguousarray(dists, np.float64)
    S = np.full((n, max(H, 1)), -np.inf)
    NPV = np.full((n, max(H, 1)), 1 << 30, dtype=np.int64)
    DV = np.zeros((n, max(H, 1)))
    hl = np.zeros(n, np.int32)
    _lib.grok_rc_hulls(n, offs.ctypes.data, rates.ctypes.data,
                       dists.ctypes.data, max(H, 1), S.ctypes.data,
                       NPV.ctypes.data, DV.ctypes.data, hl.ctypes.data)
    return S, NPV, DV, hl


def ht_encode_cblk_refined(mag: np.ndarray, neg: np.ndarray, Mb: int,
                           passes: int = 3) -> Tuple[bytes, int, int]:
    """Encode one HT cleanup segment (at one plane up) plus a
    SigProp(/MagRef) refinement segment (Part 15 full mode).

    Returns (data, len_cleanup, len_refinement); data holds both
    segments back to back, as they appear in the codestream."""
    h, w = mag.shape
    mag = np.ascontiguousarray(mag, dtype=np.uint32)
    neg = np.ascontiguousarray(neg, dtype=np.uint8)
    cap = max(4096, w * h * 8)
    out = np.empty(cap, dtype=np.uint8)
    l1 = ctypes.c_int(0)
    l2 = ctypes.c_int(0)
    rc = _lib.grok_ht_encode_refined(
        mag.ctypes.data, neg.ctypes.data, w, h, Mb, passes,
        out.ctypes.data, cap, ctypes.byref(l1), ctypes.byref(l2))
    if rc != 0:
        raise RuntimeError("HT refined encode failed")
    return bytes(out[:l1.value + l2.value]), l1.value, l2.value


def ht_decode_cblk_refined(data: bytes, len1: int, len2: int, passes: int,
                           w: int, h: int, Mb: int
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode cleanup + refinement segments; returns (quarters, neg)
    with magnitudes in quarter units of the cleanup plane (see
    native/src/ht.cpp grok_ht_decode_refined for the exact mapping)."""
    quarters = np.zeros((h, w), dtype=np.uint32)
    neg = np.zeros((h, w), dtype=np.uint8)
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if data else \
        np.zeros(1, dtype=np.uint8)
    rc = _lib.grok_ht_decode_refined(
        buf.ctypes.data, len1, len2, passes, w, h, Mb,
        quarters.ctypes.data, neg.ctypes.data)
    if rc != 0:
        raise RuntimeError("HT refined decode failed")
    return quarters, neg


def ht_encode_cblk_batch(blocks, nthreads: Optional[int] = None):
    """Batch HT encode: blocks = [(mag, neg, Mb), ...] -> [bytes, ...]."""
    n = len(blocks)
    if n == 0:
        return []
    sizes = [b[0].size for b in blocks]
    total = int(sum(sizes))
    mag_flat = np.empty(total, dtype=np.uint32)
    neg_flat = np.empty(total, dtype=np.uint8)
    desc = np.empty(n * 4, dtype=np.int64)
    off = 0
    max_wh = 0
    for i, (mag, neg, Mb) in enumerate(blocks):
        h, w = mag.shape
        mag_flat[off:off + w * h] = mag.astype(np.uint32).ravel()
        neg_flat[off:off + w * h] = neg.astype(np.uint8).ravel()
        desc[i * 4] = off
        desc[i * 4 + 1] = w
        desc[i * 4 + 2] = h
        desc[i * 4 + 3] = Mb
        off += w * h
        max_wh = max(max_wh, w * h)
    return _ht_encode_flat(n, mag_flat, neg_flat, desc, max_wh, nthreads)


def _ht_encode_flat(n, mag_flat, neg_flat, desc, max_wh, nthreads):
    out_stride = max(4096, max_wh * 6)
    out_flat = np.empty(n * out_stride, dtype=np.uint8)
    out_lens = np.zeros(n, dtype=np.int32)
    rc = _lib.grok_ht_encode_batch(
        n, mag_flat.ctypes.data, neg_flat.ctypes.data, desc.ctypes.data,
        out_flat.ctypes.data, out_stride, out_lens.ctypes.data,
        nthreads if nthreads is not None else default_threads())
    if rc != 0:
        raise RuntimeError("HT batch encode failed")
    return [bytes(out_flat[i * out_stride:i * out_stride + int(out_lens[i])])
            for i in range(n)]


def ht_encode_cblk_batch_bands(bands: List[np.ndarray], descs: np.ndarray,
                               mbs: np.ndarray,
                               nthreads: Optional[int] = None,
                               stepsizes=None):
    """HT batch encode fully fused with the block gather: each native
    worker extracts (and quantizes, for float planes) its block and
    encodes it straight into the output slot.
    `descs`: (n, 5) int64 (band_idx, x0, y0, w, h); `mbs`: (n,) per-block
    band Mb; `stepsizes` marks float32 planes."""
    n = len(descs)
    if n == 0:
        return []
    band_ptrs = np.array([b.ctypes.data for b in bands], dtype=np.int64)
    strides = np.array([b.strides[0] // 4 for b in bands], dtype=np.int64)
    is_float = stepsizes is not None
    steps = np.asarray(stepsizes if is_float else [1.0] * len(bands),
                       np.float64)
    desc5 = np.ascontiguousarray(descs, dtype=np.int64)
    mbs64 = np.ascontiguousarray(mbs, dtype=np.int64)
    max_wh = int((descs[:, 3] * descs[:, 4]).max())
    out_stride = max(4096, max_wh * 6)
    out_flat = np.empty(n * out_stride, dtype=np.uint8)
    out_lens = np.zeros(n, dtype=np.int32)
    rc = _lib.grok_ht_encode_bands(
        n, band_ptrs.ctypes.data, strides.ctypes.data, steps.ctypes.data,
        1 if is_float else 0, desc5.ctypes.data, mbs64.ctypes.data,
        out_flat.ctypes.data, out_stride, out_lens.ctypes.data,
        nthreads if nthreads is not None else default_threads())
    if rc != 0:
        raise RuntimeError("HT fused band encode failed")
    return [bytes(out_flat[i * out_stride:i * out_stride
                           + int(out_lens[i])]) for i in range(n)]


def ht_decode_cblk_batch(blocks, nthreads: Optional[int] = None,
                         signed_out: bool = False):
    """Batch HT decode: blocks = [(data, w, h, missing_msbs), ...] ->
    [(mag, neg), ...]."""
    n = len(blocks)
    if n == 0:
        return []
    data_parts = [bytes(b[0]) for b in blocks]
    data_flat = np.frombuffer(b"".join(data_parts) or b"\x00",
                              dtype=np.uint8)
    rows = []
    data_off = 0
    out_off = 0
    for (data, w, h, miss) in blocks:
        rows.append((data_off, len(data), w, h, miss, out_off))
        data_off += len(data)
        out_off += w * h
    desc = np.asarray(rows, dtype=np.int64).reshape(-1)
    mag_flat = np.zeros(out_off, dtype=np.uint32)
    neg_flat = np.zeros(out_off, dtype=np.uint8)
    _lib.grok_ht_decode_batch(
        n, data_flat.ctypes.data, desc.ctypes.data, mag_flat.ctypes.data,
        neg_flat.ctypes.data,
        nthreads if nthreads is not None else default_threads(),
        1 if signed_out else 0)
    if signed_out:
        coef = mag_flat.view(np.int32)
    out = []
    out_off = 0
    for (data, w, h, miss) in blocks:
        if signed_out:
            out.append(coef[out_off:out_off + w * h].reshape(h, w))
        else:
            mag = mag_flat[out_off:out_off + w * h].reshape(h, w).copy()
            neg = neg_flat[out_off:out_off + w * h].reshape(h, w).copy()
            out.append((mag, neg))
        out_off += w * h
    return out


def _band_meta(bands: List[np.ndarray], stepsizes):
    ptrs = np.array([b.ctypes.data for b in bands], dtype=np.int64)
    strides = np.array([b.strides[0] // b.itemsize for b in bands],
                       dtype=np.int64)
    is_float = stepsizes is not None
    steps = np.asarray(stepsizes if is_float else [1.0] * len(bands),
                       np.float64)
    return ptrs, strides, steps, is_float


def ht_decode_cblk_batch_bands(blocks, bands: List[np.ndarray],
                               placements, stepsizes=None,
                               nthreads: Optional[int] = None) -> None:
    """Fused HT decode + scatter into band planes.

    blocks = [(data, w, h, missing_msbs), ...]; placements = (n, 3) rows
    of (band_idx, x0, y0); `bands` are pre-zeroed contiguous planes —
    int32, or float32 with `stepsizes` (per-band mid-point dequantize
    fused into the scatter)."""
    n = len(blocks)
    if n == 0:
        return
    data_flat = np.frombuffer(b"".join(bytes(b[0]) for b in blocks)
                              or b"\x00", dtype=np.uint8)
    ptrs, strides, steps, is_float = _band_meta(bands, stepsizes)
    rows = np.empty((n, 9), dtype=np.int64)
    off = 0
    for i, (data, w, h, miss) in enumerate(blocks):
        rows[i] = (off, len(data), w, h, miss, placements[i][0],
                   placements[i][1], placements[i][2], 0)
        off += len(data)
    desc = np.ascontiguousarray(rows.ravel())
    rc = _lib.grok_ht_decode_bands(
        n, data_flat.ctypes.data, desc.ctypes.data, ptrs.ctypes.data,
        strides.ctypes.data, steps.ctypes.data, 1 if is_float else 0,
        nthreads if nthreads is not None else default_threads())
    if rc != 0:
        raise RuntimeError("HT fused band decode failed")


def decode_cblk_batch_bands(blocks, bands: List[np.ndarray],
                            placements, cblk_style: int = 0,
                            stepsizes=None,
                            nthreads: Optional[int] = None) -> None:
    """Fused MQ T1 decode + scatter into band planes.

    blocks = [(data, seg_lengths, w, h, orient, numbps, numpasses), ...]
    (kmax trailing fields tolerated); placements as in
    ht_decode_cblk_batch_bands."""
    n = len(blocks)
    if n == 0:
        return
    data_flat = np.frombuffer(b"".join(bytes(b[0]) for b in blocks)
                              or b"\x00", dtype=np.uint8)
    seg_rows = []
    ptrs, strides, steps, is_float = _band_meta(bands, stepsizes)
    rows = np.empty((n, 13), dtype=np.int64)
    doff = soff = 0
    for i, b in enumerate(blocks):
        data, segs, w, h, orient, numbps, numpasses = b[:7]
        nsegs = len(segs) if segs else 0
        if nsegs:
            seg_rows.extend(int(x) for x in segs)
        rows[i] = (doff, len(data), soff, nsegs, w, h, orient, numbps,
                   numpasses, cblk_style, placements[i][0],
                   placements[i][1], placements[i][2])
        doff += len(data)
        soff += nsegs
    segs_flat = np.asarray(seg_rows or [0], dtype=np.int32)
    desc = np.ascontiguousarray(rows.ravel())
    rc = _lib.grok_t1_decode_bands(
        n, data_flat.ctypes.data, segs_flat.ctypes.data, desc.ctypes.data,
        ptrs.ctypes.data, strides.ctypes.data, steps.ctypes.data,
        1 if is_float else 0,
        nthreads if nthreads is not None else default_threads())
    if rc != 0:
        raise RuntimeError("T1 fused band decode failed")


def ht_dec_prepass(segs: List[bytes], lcups, scups, wm_mel: int,
                   wm_vlc: int, wm_ms: int,
                   nthreads: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expand HT cleanup segments into the three dense unstuffed
    stream-word matrices ((wm, B) uint32, lanes-last) consumed by the
    device decoder — bit-identical native mirror of
    ops.ht_dec_jax._prepass_{mel,vlc,ms}."""
    B = len(segs)
    data = np.frombuffer(b"".join(segs) or b"\x00", dtype=np.uint8)
    offs = np.zeros(B + 1, np.int64)
    np.cumsum([len(s) for s in segs], out=offs[1:])
    lc = np.asarray(lcups, np.int32)
    sc = np.asarray(scups, np.int32)
    out_mel = np.zeros((wm_mel, B), np.uint32)
    out_vlc = np.zeros((wm_vlc, B), np.uint32)
    out_ms = np.zeros((wm_ms, B), np.uint32)
    rc = _lib.grok_ht_dec_prepass(
        data.ctypes.data, offs.ctypes.data, lc.ctypes.data, sc.ctypes.data,
        B, wm_mel, wm_vlc, wm_ms, out_mel.ctypes.data, out_vlc.ctypes.data,
        out_ms.ctypes.data,
        nthreads if nthreads is not None else default_threads())
    if rc != 0:
        raise RuntimeError("HT decode prepass failed")
    return out_mel, out_vlc, out_ms
