"""T1 backend dispatch: selects between the Python reference coder and the
native C++ fast path (grokimagecompression_tpu/native), the analog of the
reference's T1Factory (reference: src/lib/jp2/t1/T1Factory.cpp).

The native backend is used when available unless GROK_TPU_T1=python is set.
Both backends are bit-identical (enforced by tests/test_t1_native.py).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from . import t1_np

_native = None
_checked = False


def _get_native():
    global _native, _checked
    if _checked:
        return _native
    _checked = True
    if os.environ.get("GROK_TPU_T1", "") == "python":
        _native = None
        return None
    try:
        from ..native import t1_native
        _native = t1_native
    except Exception:
        _native = None
    return _native


def encode_cblk(mag: np.ndarray, neg: np.ndarray, orient: int,
                cblk_style: int = 0):
    nat = _get_native()
    if nat is not None:
        return nat.encode_cblk(mag, neg, orient, cblk_style)
    return t1_np.encode_cblk(mag, neg, orient, cblk_style)


def decode_cblk(data: bytes, seg_lengths: Optional[List[int]], w: int, h: int,
                orient: int, numbps: int, numpasses: int,
                cblk_style: int = 0):
    nat = _get_native()
    if nat is not None:
        return nat.decode_cblk(data, seg_lengths, w, h, orient, numbps,
                               numpasses, cblk_style)
    return t1_np.decode_cblk(data, seg_lengths, w, h, orient, numbps,
                             numpasses, cblk_style)


CBLKSTY_HT = 0x40


def _use_device_t1() -> bool:
    """Route HT block coding through the device (TPU) coder
    (ops/ht_jax.py) when GROK_TPU_T1=device. Byte-identical to the
    native backend (tests/test_ht_device.py)."""
    return os.environ.get("GROK_TPU_T1", "") == "device"


def encode_cblk_batch(blocks, cblk_style: int = 0):
    """Batch encode: blocks = [(mag, neg, orient[, kmax]), ...] ->
    [(data, numbps, numpasses, passes), ...]. Uses native worker threads
    when available; the HT style bit (0x40) routes to the Part-15 cleanup
    coder (kmax = band Mb required)."""
    nat = _get_native()
    if cblk_style & CBLKSTY_HT:
        if nat is None:
            raise RuntimeError("HT coding requires the native backend")
        datas = nat.ht_encode_cblk_batch(
            [(m, n, kmax) for (m, n, o, kmax) in blocks])
        return [(d, 1, 1, [t1_np.PassInfo(rate=len(d), distortion=0.0,
                                          terminated=True)])
                for d in datas]
    blocks3 = [b[:3] for b in blocks]
    if nat is not None:
        return nat.encode_cblk_batch(blocks3, cblk_style)
    return [t1_np.encode_cblk(m, n, o, cblk_style) for (m, n, o) in blocks3]


def encode_cblk_batch_bands(bands, descs, orients, kmaxs,
                            cblk_style: int = 0, stepsizes=None,
                            needs_pass_rates: bool = False,
                            ht_refined: bool = False):
    """Batch encode straight from band planes.

    `bands`: list of contiguous 2-D arrays — int32 DWT coefficients
    (reversible), or float32 coefficients with `stepsizes` (one per
    band) for the irreversible path, where deadzone quantization fuses
    into the native gather. `descs`: (n, 5) int64 rows
    (band_idx, x0, y0, w, h). Equivalent to slicing each block,
    quantizing, converting to (mag, neg) and calling encode_cblk_batch.

    `needs_pass_rates=True` (PCRD / multi-layer callers) makes the
    device MQ route return per-pass truncation rates (byte-identical
    to the host coder's) and device-summed distortion decreases.
    """
    import numpy as _np
    nat = _get_native()
    descs = _np.asarray(descs, _np.int64).reshape(-1, 5)
    n = len(descs)
    if n == 0:
        return []
    if cblk_style == 0 and _use_device_t1():
        # Device EBCOT Part-1: analysis passes + lane-parallel Pallas MQ
        # scan on the TPU (ops/mq_jax.py); default code-block style only.
        from ..ops import mq_jax
        blocks = []
        for i in range(n):
            bi, x0, y0, w, h = (int(v) for v in descs[i])
            a = bands[bi][y0:y0 + h, x0:x0 + w]
            if stepsizes is not None and a.dtype == _np.float32:
                m = _np.floor(_np.abs(a.astype(_np.float64))
                              / _np.float64(stepsizes[bi])).astype(_np.uint32)
                neg = (a < 0).astype(_np.int32)
            else:
                aa = _np.asarray(a, _np.int64)
                m = _np.abs(aa).astype(_np.uint32)
                neg = (aa < 0).astype(_np.int32)
            blocks.append((m, neg, int(orients[i])))
        if needs_pass_rates:
            return mq_jax.mq_encode_blocks(blocks, want_rd=True)
        out = []
        for (d, nb, npasses) in mq_jax.mq_encode_blocks(blocks):
            passes = [t1_np.PassInfo(rate=len(d), distortion=0.0,
                                     terminated=(k == npasses - 1))
                      for k in range(npasses)]
            out.append((d, nb, npasses, passes))
        return out
    if cblk_style & CBLKSTY_HT and _use_device_t1() and not ht_refined:
        from ..ops import ht_jax
        datas = ht_jax.ht_encode_cblk_batch_bands(
            bands, descs, kmaxs, stepsizes=stepsizes)
        return [(d, 1, 1, [t1_np.PassInfo(rate=len(d), distortion=0.0,
                                          terminated=True)])
                for d in datas]
    if (cblk_style & CBLKSTY_HT) and ht_refined:
        if nat is None:
            raise RuntimeError("HT coding requires the native backend")
        # Part-15 full mode: cleanup one plane up + SigProp/MagRef
        # refinement segment (3 passes, 2 codeword segments).  numbps=2
        # signals the extra coded plane (imsb = kmax - 2), keeping the
        # decoder's missing = kmax - numbps convention aligned with the
        # encoder's internal cleanup alignment.  Blocks whose band has
        # kmax < 2 fall back to plain cleanup coding.
        out = []
        for i in range(n):
            bi, x0, y0, w, h = (int(v) for v in descs[i])
            a = bands[bi][y0:y0 + h, x0:x0 + w]
            if stepsizes is not None and a.dtype == _np.float32:
                m = _np.floor(_np.abs(a.astype(_np.float64))
                              / _np.float64(stepsizes[bi])).astype(_np.uint32)
                neg = (a < 0).astype(_np.uint8)
            else:
                aa = _np.asarray(a, _np.int64)
                m = _np.abs(aa).astype(_np.uint32)
                neg = (aa < 0).astype(_np.uint8)
            kmax = int(kmaxs[i])
            if kmax < 2:
                d = nat.ht_encode_cblk(m, neg, kmax)
                out.append((d, 1, 1,
                            [t1_np.PassInfo(rate=len(d), distortion=0.0,
                                            terminated=True)]))
                continue
            d, l1, l2 = nat.ht_encode_cblk_refined(m, neg, kmax, passes=3)
            out.append((d, 2, 3, [
                t1_np.PassInfo(rate=l1, distortion=0.0, terminated=True),
                t1_np.PassInfo(rate=l1, distortion=0.0, terminated=False),
                t1_np.PassInfo(rate=l1 + l2, distortion=0.0,
                               terminated=True)]))
        return out
    if nat is not None:
        if cblk_style & CBLKSTY_HT:
            datas = nat.ht_encode_cblk_batch_bands(
                bands, descs, _np.asarray(kmaxs, _np.int64),
                stepsizes=stepsizes)
            return [(d, 1, 1, [t1_np.PassInfo(rate=len(d), distortion=0.0,
                                              terminated=True)])
                    for d in datas]
        return nat.encode_cblk_batch_bands(
            bands, descs, _np.asarray(orients, _np.int64), cblk_style,
            stepsizes=stepsizes)
    # Oracle fallback: slice in Python.
    blocks = []
    for i in range(n):
        bi, x0, y0, w, h = (int(v) for v in descs[i])
        a = bands[bi][y0:y0 + h, x0:x0 + w]
        if stepsizes is not None:
            m = _np.floor(_np.abs(a) /
                          _np.float64(stepsizes[bi])).astype(_np.uint32)
        else:
            m = _np.abs(a).astype(_np.uint32)
        s = (a < 0).astype(_np.uint8)
        blocks.append((m, s, int(orients[i]), int(kmaxs[i])))
    return encode_cblk_batch(blocks, cblk_style)


def native_threads() -> int:
    """Worker thread count the native batch entries would use (respects
    the per-thread tile-parallel override)."""
    nat = _get_native()
    if nat is None:
        return 1
    return nat.default_threads()


def decode_cblk_batch_bands(blocks, bands, placements, cblk_style: int = 0,
                            stepsizes=None) -> bool:
    """Fused native decode straight into band planes. Returns False when
    the native backend is unavailable (caller falls back to
    decode_cblk_batch + Python placement)."""
    nat = _get_native()
    refined = [i for i, b in enumerate(blocks)
               if (cblk_style & CBLKSTY_HT) and b[6] > 1]
    if refined:
        if nat is None:
            return False
        _decode_refined_into_bands([blocks[i] for i in refined],
                                   [placements[i] for i in refined],
                                   bands, stepsizes, nat)
        blocks = [b for i, b in enumerate(blocks) if i not in set(refined)]
        placements = [pl for i, pl in enumerate(placements)
                      if i not in set(refined)]
        if not blocks:
            return True
    if (cblk_style & CBLKSTY_HT) and _use_device_t1() \
            and _device_ht_decode_bands(blocks, bands, placements,
                                        stepsizes):
        return True
    if cblk_style == 0 and _use_device_t1() \
            and _device_mq_decode_bands(blocks, bands, placements,
                                        stepsizes):
        return True
    if nat is None:
        return False
    if cblk_style & CBLKSTY_HT:
        nat.ht_decode_cblk_batch_bands(
            [(bytes(d), w, h, kmax - nb)
             for (d, s, w, h, o, nb, np_, kmax) in blocks],
            bands, placements, stepsizes=stepsizes)
    else:
        nat.decode_cblk_batch_bands(blocks, bands, placements, cblk_style,
                                    stepsizes=stepsizes)
    return True


def _device_ht_decode_bands(blocks, bands, placements, stepsizes) -> bool:
    """Device (TPU) HT entropy decode (ops/ht_dec_jax.py) + band-plane
    scatter. Bit-exact with the native fused decode; returns False on
    any structurally invalid segment so the caller's native path keeps
    ownership of error handling."""
    import numpy as _np

    from ..ops import ht_dec_jax
    dev_blocks = []
    live = []
    for i, (d, s, w, h, o, nb, np_, kmax) in enumerate(blocks):
        d = bytes(d)
        if len(d) == 0:
            continue  # empty segment: all-zero block, plane pre-zeroed
        dev_blocks.append((d, w, h, kmax - nb))
        live.append(i)
    res = ht_dec_jax.ht_decode_blocks(dev_blocks)
    if any(r is None for r in res):
        return False
    _scatter_decoded(res, live, bands, placements, stepsizes)
    return True


def _scatter_decoded(res, live, bands, placements, stepsizes,
                     pmins=None) -> None:
    """Scatter device-decoded (mag, neg) blocks into band planes with
    the mid-point dequantizer (shared by the HT and MQ device decode
    routes; must track quant.dequantize's reconstruction convention).
    `pmins`: per-live-block lowest decoded plane (quant.trunc_plane) —
    truncated blocks reconstruct at the center of their decoded
    interval, like the host paths."""
    import numpy as _np
    for k, ((mag, neg), i) in enumerate(zip(res, live)):
        bi, x0, y0 = placements[i][:3]
        h, w = mag.shape
        plane = bands[bi]
        pm = pmins[k] if pmins is not None else 0
        if stepsizes is not None and plane.dtype == _np.float32:
            mm = mag.astype(_np.float32)
            half = _np.float32(0.5 * (1 << pm))
            mm = _np.where(mag != 0, mm + half, mm)
            v = mm * _np.float32(stepsizes[bi])
            plane[y0:y0 + h, x0:x0 + w] = _np.where(neg != 0, -v, v)
        else:
            m = mag.astype(_np.int32)
            if pm > 0:
                m = _np.where(m != 0, m + _np.int32(1 << (pm - 1)), m)
            plane[y0:y0 + h, x0:x0 + w] = _np.where(neg != 0, -m, m)


def _mq_pallas_ok(max_nbps: int) -> bool:
    """Route MQ device decode through the Pallas column-step kernel
    (ops/mq_dec_pallas.py) on real accelerator hardware; the lax.scan
    core otherwise. The kernel packs the sign in bit 31, so magnitudes
    must fit 31 bits (numbps <= 30 — true for every <= 16-bit image).
    GROK_TPU_DEC_PALLAS=0 forces the scan core."""
    import os
    if max_nbps > 30:
        return False
    if os.environ.get("GROK_TPU_DEC_PALLAS", "1") == "0":
        return False
    try:
        import jax
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - backend probe
        return False


def _device_mq_decode_bands(blocks, bands, placements, stepsizes) -> bool:
    """Device (TPU) Part-1 MQ entropy decode: the Pallas column-step
    kernel (ops/mq_dec_pallas.py) on accelerator hardware, the
    lane-parallel slot-walk scan (ops/mq_dec_jax.py) elsewhere — both
    bit-exact with the host decoder. Default code-block style / single
    codeword segment only; returns False when any block is out of
    scope so the native path keeps ownership."""
    import numpy as _np

    from ..ops import mq_dec_jax, mq_dec_pallas
    dev_blocks = []
    live = []
    for i, (d, s, w, h, o, nb, np_, kmax) in enumerate(blocks):
        if s is not None and len(s) > 1:
            return False  # terminated/bypass segment layout
        d = bytes(d)
        if s is not None and len(s) == 1:
            d = d[:int(s[0])]
        if nb <= 0 or np_ <= 0:
            continue  # plane stays zero
        dev_blocks.append((d, w, h, o, nb, np_))
        live.append(i)
    if dev_blocks and _mq_pallas_ok(max(b[4] for b in dev_blocks)):
        res = mq_dec_pallas.decode_blocks(dev_blocks)
    else:
        res = mq_dec_jax.decode_blocks(dev_blocks)
    from ..ops.quant import trunc_plane
    pmins = [trunc_plane(nb, np_) for (_, _, _, _, nb, np_) in dev_blocks]
    _scatter_decoded(res, live, bands, placements, stepsizes, pmins=pmins)
    return True


def _decode_refined_block(nat, d, seg_lengths, w, h, np_, kmax):
    """Decode one HT block carrying a refinement segment; returns
    (mag, neg) with magnitudes in the band's quantizer units (exact for
    3-pass streams: quarters are 2m+1, so q >> 1 == m and the standard
    mid-point dequantizer reconstructs q/4 exactly)."""
    import numpy as _np
    d = bytes(d)
    if seg_lengths and len(seg_lengths) >= 2:
        l1, l2 = int(seg_lengths[0]), int(seg_lengths[1])
    else:
        l1, l2 = len(d), 0
    # truncated streams: clamp segment lengths to the bytes present and
    # degrade to zeros if even the cleanup is unusable (the plain HT
    # path's behavior — decode as far as the data allows, never raise)
    l1 = min(l1, len(d))
    l2 = min(l2, max(0, len(d) - l1))
    try:
        q, neg = nat.ht_decode_cblk_refined(d, l1, l2, int(np_), w, h,
                                            int(kmax))
    except RuntimeError:
        return (_np.zeros((h, w), _np.uint32), _np.zeros((h, w), _np.uint8))
    return (q >> 1).astype(_np.uint32), neg


def _decode_refined_into_bands(blocks, placements, bands, stepsizes,
                               nat) -> None:
    import numpy as _np
    for (d, s, w, h, o, nb, np_, kmax), pl in zip(blocks, placements):
        mag, neg = _decode_refined_block(nat, d, s, w, h, np_, kmax)
        _scatter_decoded([(mag, neg)], [0], bands, [pl], stepsizes)


def decode_cblk_batch(blocks, cblk_style: int = 0, signed_out: bool = False):
    """Batch decode: blocks = [(data, seg_lengths, w, h, orient, numbps,
    numpasses[, kmax]), ...] -> [(mag, neg), ...] or signed int32 arrays
    when `signed_out`."""
    nat = _get_native()
    if cblk_style & CBLKSTY_HT:
        if nat is None:
            raise RuntimeError("HT decoding requires the native backend")
        refined = {i for i, b in enumerate(blocks) if b[6] > 1}
        plain = [b for i, b in enumerate(blocks) if i not in refined]
        out_plain = nat.ht_decode_cblk_batch(
            [(bytes(d), w, h, kmax - nb)
             for (d, s, w, h, o, nb, np_, kmax) in plain],
            signed_out=signed_out)
        if not refined:
            return out_plain
        import numpy as _np
        out = []
        it = iter(out_plain)
        for i, (d, s, w, h, o, nb, np_, kmax) in enumerate(blocks):
            if i not in refined:
                out.append(next(it))
                continue
            mag, neg = _decode_refined_block(nat, d, s, w, h, np_, kmax)
            if signed_out:
                out.append(_np.where(neg > 0, -(mag.astype(_np.int64)),
                                     mag.astype(_np.int64))
                           .astype(_np.int32))
            else:
                out.append((mag, neg))
        return out
    blocks7 = [b[:7] for b in blocks]
    if nat is not None:
        return nat.decode_cblk_batch(blocks7, cblk_style,
                                     signed_out=signed_out)
    out = [t1_np.decode_cblk(d, s, w, h, o, nb, np_, cblk_style)
           for (d, s, w, h, o, nb, np_) in blocks7]
    if signed_out:
        import numpy as _np
        return [_np.where(neg > 0, -(mag.astype(_np.int64)),
                          mag.astype(_np.int64)).astype(_np.int32)
                for (mag, neg) in out]
    return out
