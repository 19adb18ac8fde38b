"""EBCOT Tier-1 code-block coder (ISO/IEC 15444-1 Annex D) — Python
reference implementation.

Bit-plane coding with three passes per plane (significance propagation,
magnitude refinement, cleanup) over the stripe-oriented scan, driving the
MQ coder. This is the bit-exactness oracle for the native C++ fast path
(grokimagecompression_tpu/native) and future Pallas kernels; it mirrors the
behavior of the reference coder (reference: src/lib/jp2/t1/t1_part1/t1.cpp:
t1_encode_cblk:1182, t1_decode_cblk:1038) but is written directly from the
Annex D pass/context rules with a plain per-sample flags model instead of
the reference's 3-rows-per-word stripe flags (t1_flags.h).

Supported code-block styles: default (single MQ codeword), SEGSYM, RESET,
TERMALL, LAZY (bypass), VSC (stripe-causal contexts), PTERM (emitted with
the standard FLUSH; decodable everywhere, strict predictability checkers
may warn).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from .mq import (
    CTX_MAG,
    CTX_RL,
    CTX_SC,
    CTX_UNI,
    CTX_ZC,
    MQDecoder,
    MQEncoder,
    RawDecoder,
    RawEncoder,
)

CBLKSTY_LAZY = 0x01
CBLKSTY_RESET = 0x02
CBLKSTY_TERMALL = 0x04
CBLKSTY_VSC = 0x08
CBLKSTY_PTERM = 0x10
CBLKSTY_SEGSYM = 0x20

# Pass types
PASS_SIG = 0
PASS_REF = 1
PASS_CLN = 2


@dataclasses.dataclass
class PassInfo:
    """Per coding-pass record for rate allocation (PCRD)."""

    rate: int          # cumulative truncation length in bytes after this pass
    distortion: float  # cumulative distortion *decrease* (sum of err^2 drops)
    terminated: bool   # whether the arithmetic coder was flushed after it


# --- Zero-coding context tables (Table D.1) ---------------------------------

def _zc_context(h: int, v: int, d: int, orient: int) -> int:
    if orient == 1:  # HL: swap h and v
        h, v = v, h
    if orient == 3:  # HH: diagonal-major
        if d >= 3:
            return 8
        if d == 2:
            return 7 if h + v >= 1 else 6
        if d == 1:
            hv = h + v
            return 5 if hv >= 2 else (4 if hv == 1 else 3)
        hv = h + v
        return 2 if hv >= 2 else (1 if hv == 1 else 0)
    # LL and LH (and HL after swap)
    if h == 2:
        return 8
    if h == 1:
        return 7 if v >= 1 else (6 if d >= 1 else 5)
    if v == 2:
        return 4
    if v == 1:
        return 3
    return 2 if d >= 2 else (1 if d == 1 else 0)


# Sign-coding contexts (Table D.2): (h, v) in {-1,0,1} -> (ctx offset, spb)
_SC_TABLE = {
    (1, 1): (4, 0), (1, 0): (3, 0), (1, -1): (2, 0),
    (0, 1): (1, 0), (0, 0): (0, 0), (0, -1): (1, 1),
    (-1, 1): (2, 1), (-1, 0): (3, 1), (-1, -1): (4, 1),
}


class _BlockState:
    """Shared flag state for one code-block coding session."""

    __slots__ = ("w", "h", "orient", "sig", "neg", "visited", "refined",
                 "vsc")

    def __init__(self, w: int, h: int, orient: int, vsc: bool = False):
        self.w = w
        self.h = h
        self.orient = orient
        self.vsc = vsc
        self.sig = np.zeros((h, w), dtype=np.uint8)
        self.neg = np.zeros((h, w), dtype=np.uint8)
        self.visited = np.zeros((h, w), dtype=np.uint8)
        self.refined = np.zeros((h, w), dtype=np.uint8)

    def neighbor_counts(self, x: int, y: int) -> Tuple[int, int, int]:
        sig, w, h = self.sig, self.w, self.h
        # VSC (stripe-causal): a stripe's last row sees the next stripe's
        # first row as insignificant.
        below_ok = y < h - 1 and not (self.vsc and (y & 3) == 3)
        hh = 0
        if x > 0:
            hh += sig[y, x - 1]
        if x < w - 1:
            hh += sig[y, x + 1]
        vv = 0
        if y > 0:
            vv += sig[y - 1, x]
        if below_ok:
            vv += sig[y + 1, x]
        dd = 0
        if x > 0 and y > 0:
            dd += sig[y - 1, x - 1]
        if x < w - 1 and y > 0:
            dd += sig[y - 1, x + 1]
        if x > 0 and below_ok:
            dd += sig[y + 1, x - 1]
        if x < w - 1 and below_ok:
            dd += sig[y + 1, x + 1]
        return int(hh), int(vv), int(dd)

    def zc_ctx(self, x: int, y: int) -> int:
        hh, vv, dd = self.neighbor_counts(x, y)
        return CTX_ZC + _zc_context(hh, vv, dd, self.orient)

    def has_sig_neighbor(self, x: int, y: int) -> bool:
        hh, vv, dd = self.neighbor_counts(x, y)
        return (hh + vv + dd) > 0

    def sc_ctx(self, x: int, y: int) -> Tuple[int, int]:
        """Sign context and sign-prediction bit."""
        sig, neg, w, h = self.sig, self.neg, self.w, self.h

        def contrib(xx: int, yy: int) -> int:
            if 0 <= xx < w and 0 <= yy < h and sig[yy, xx]:
                return -1 if neg[yy, xx] else 1
            return 0

        below = 0 if (self.vsc and (y & 3) == 3) else contrib(x, y + 1)
        hc = max(-1, min(1, contrib(x - 1, y) + contrib(x + 1, y)))
        vc = max(-1, min(1, contrib(x, y - 1) + below))
        off, spb = _SC_TABLE[(hc, vc)]
        return CTX_SC + off, spb

    def mag_ctx(self, x: int, y: int) -> int:
        if self.refined[y, x]:
            return CTX_MAG + 2
        return CTX_MAG + (1 if self.has_sig_neighbor(x, y) else 0)


def _scan_columns(w: int, h: int):
    """Stripe scan: yields (x, y0, stripe_h) column segments in coding order."""
    for k in range(0, h, 4):
        sh = min(4, h - k)
        for x in range(w):
            yield x, k, sh


def _num_bitplanes(mag: np.ndarray) -> int:
    m = int(mag.max()) if mag.size else 0
    return m.bit_length()


def encode_cblk(
    mag: np.ndarray,
    neg: np.ndarray,
    orient: int,
    cblk_style: int = 0,
) -> Tuple[bytes, int, int, List[PassInfo]]:
    """Encode one code-block.

    Args:
      mag: (h, w) uint32 magnitudes (already quantized integers).
      neg: (h, w) 0/1 sign bits (1 = negative).
      orient: band orientation 0..3.
      cblk_style: SPcod code-block style bits.

    Returns (data, numbps, numpasses, passes).
    """
    h, w = mag.shape
    numbps = _num_bitplanes(mag)
    if numbps == 0:
        return b"", 0, 0, []
    st = _BlockState(w, h, orient, vsc=bool(cblk_style & CBLKSTY_VSC))
    # Sign-context formation reads signs of significant samples only, so the
    # true sign plane can back the state directly.
    st.neg = np.asarray(neg, dtype=np.uint8)
    mq = MQEncoder()
    passes: List[PassInfo] = []
    mag = mag.astype(np.uint32)
    total_dist = 0.0

    lazy = bool(cblk_style & CBLKSTY_LAZY)
    termall = bool(cblk_style & CBLKSTY_TERMALL)
    reset = bool(cblk_style & CBLKSTY_RESET)
    segsym = bool(cblk_style & CBLKSTY_SEGSYM)
    pterm = bool(cblk_style & CBLKSTY_PTERM)

    # Chunks of finished (terminated) bytes; the active coder appends.
    chunks: List[bytes] = []

    def cur_len() -> int:
        return sum(len(c) for c in chunks)

    def bitof(x: int, y: int, plane: int) -> int:
        return int((mag[y, x] >> plane) & 1)

    def code_sign(coder, x: int, y: int, raw: bool):
        if raw:
            coder.encode(int(st.neg[y, x]))
        else:
            ctx, spb = st.sc_ctx(x, y)
            coder.encode(int(st.neg[y, x]) ^ spb, ctx)

    def sig_dist(x: int, y: int, plane: int) -> float:
        v = float(mag[y, x])
        half = 1.5 * (1 << plane)
        return v * v - (v - half) * (v - half)

    def ref_dist(x: int, y: int, plane: int) -> float:
        v = float(mag[y, x])
        # Reconstruction moves from (bits above plane)+2^plane to
        # (bits incl plane)+2^(plane-1).
        above = float((int(mag[y, x]) >> (plane + 1)) << (plane + 1))
        rb = above + (1 << plane)
        ra = float((int(mag[y, x]) >> plane) << plane) + (1 << plane) * 0.5
        return (v - rb) ** 2 - (v - ra) ** 2

    def spp(coder, plane: int, raw: bool):
        nonlocal total_dist
        st.visited[:] = 0
        for x, y0, sh in _scan_columns(w, h):
            for y in range(y0, y0 + sh):
                if st.sig[y, x]:
                    continue
                if not st.has_sig_neighbor(x, y):
                    continue
                bit = bitof(x, y, plane)
                if raw:
                    coder.encode(bit)
                else:
                    coder.encode(bit, st.zc_ctx(x, y))
                if bit:
                    code_sign(coder, x, y, raw)
                    st.sig[y, x] = 1
                    total_dist += sig_dist(x, y, plane)
                st.visited[y, x] = 1

    def mrp(coder, plane: int, raw: bool):
        nonlocal total_dist
        for x, y0, sh in _scan_columns(w, h):
            for y in range(y0, y0 + sh):
                if not st.sig[y, x] or st.visited[y, x]:
                    continue
                bit = bitof(x, y, plane)
                if raw:
                    coder.encode(bit)
                else:
                    coder.encode(bit, st.mag_ctx(x, y))
                total_dist += ref_dist(x, y, plane)
                st.refined[y, x] = 1

    def cp(coder, plane: int):
        nonlocal total_dist
        for x, y0, sh in _scan_columns(w, h):
            start = 0
            if sh == 4:
                agg = True
                for y in range(y0, y0 + 4):
                    if st.sig[y, x] or st.visited[y, x] or st.has_sig_neighbor(x, y):
                        agg = False
                        break
                if agg:
                    r = -1
                    for i in range(4):
                        if bitof(x, y0 + i, plane):
                            r = i
                            break
                    if r < 0:
                        coder.encode(0, CTX_RL)
                        continue
                    coder.encode(1, CTX_RL)
                    coder.encode((r >> 1) & 1, CTX_UNI)
                    coder.encode(r & 1, CTX_UNI)
                    # Sample r becomes significant.
                    y = y0 + r
                    code_sign(coder, x, y, False)
                    st.sig[y, x] = 1
                    total_dist += sig_dist(x, y, plane)
                    start = r + 1
            for y in range(y0 + start, y0 + sh):
                if st.sig[y, x] or st.visited[y, x]:
                    continue
                bit = bitof(x, y, plane)
                coder.encode(bit, st.zc_ctx(x, y))
                if bit:
                    code_sign(coder, x, y, False)
                    st.sig[y, x] = 1
                    total_dist += sig_dist(x, y, plane)
        if segsym:
            for b in (1, 0, 1, 0):
                coder.encode(b, CTX_UNI)

    # Build the pass schedule: plane numbps-1 has only CP; below that SPP,
    # MRP, CP per plane. LAZY switches SPP/MRP to raw coding for planes
    # after the first four most-significant bit-planes.
    num_passes_total = 3 * numbps - 2
    passno = 0
    saved_ctx = mq.ctx  # MQ contexts persist across raw (bypass) segments
    coder = mq
    prev_terminated = False
    for plane in range(numbps - 1, -1, -1):
        plane_passes = (PASS_CLN,) if plane == numbps - 1 else (
            PASS_SIG, PASS_REF, PASS_CLN)
        for ptype in plane_passes:
            raw = (
                lazy
                and ptype != PASS_CLN
                and passno >= 10  # bypass starts after the 10th pass
            )
            is_last = passno == num_passes_total - 1
            # A new codeword segment starts right after a terminated pass;
            # with the standard termination rules a coder-type switch can
            # only happen at such a boundary.
            if prev_terminated:
                if raw:
                    coder = RawEncoder()
                else:
                    mq = MQEncoder()
                    if saved_ctx is not None:
                        mq.ctx = saved_ctx
                    coder = mq
                prev_terminated = False
            assert raw == isinstance(coder, RawEncoder)
            if ptype == PASS_SIG:
                spp(coder, plane, raw)
            elif ptype == PASS_REF:
                mrp(coder, plane, raw)
            else:
                cp(coder, plane)
            terminated = False
            if termall or is_last or (lazy and _lazy_boundary(passno, ptype)):
                # PTERM: the spec's predictable termination; we use the
                # standard FLUSH (always decodable; a strict PTERM checker
                # may warn about the extra tail byte) with the alternating
                # raw padding the style requires.
                if isinstance(coder, MQEncoder):
                    chunks.append(coder.flush())
                else:
                    chunks.append(coder.flush(erterm=pterm))
                if isinstance(coder, MQEncoder):
                    saved_ctx = None if reset else coder.ctx
                terminated = True
                prev_terminated = True
            if reset and not terminated and isinstance(coder, MQEncoder):
                coder.reset_states()
            rate = cur_len()
            if not terminated:
                # Conservative truncation length for a non-terminated pass:
                # current bytes plus worst-case flush spill.
                pending = len(coder.out)
                rate += pending + 5
            passes.append(PassInfo(rate=rate, distortion=total_dist,
                                   terminated=terminated))
            passno += 1

    data = b"".join(chunks)
    # Terminated passes carry exact lengths (segment boundaries) and must be
    # preserved; non-terminated estimates are clamped down to the next exact
    # rate, then monotonicity is restored forward.
    for p in passes:
        p.rate = min(p.rate, len(data))
    for i in range(len(passes) - 2, -1, -1):
        if not passes[i].terminated:
            passes[i].rate = min(passes[i].rate, passes[i + 1].rate)
    for i in range(1, len(passes)):
        if passes[i].rate < passes[i - 1].rate:
            passes[i].rate = passes[i - 1].rate
    if passes:
        passes[-1].rate = len(data)
    return data, numbps, num_passes_total, passes


def _lazy_boundary(passno: int, ptype: int) -> bool:
    """With LAZY, raw coding applies to SIG/REF passes with passno >= 10 and
    CLN passes stay MQ-coded, so segments terminate at every raw<->MQ switch:
    after the CLN pass at index 9 and after every REF and CLN pass beyond.
    A SIG pass never ends a segment (SIG+REF share one raw segment)."""
    return passno >= 9 and ptype != PASS_SIG


def pass_type(passno: int) -> int:
    """Pass type for 0-based pass index (CLN, then SIG/REF/CLN per plane)."""
    return PASS_CLN if passno == 0 else ((passno - 1) % 3)


def pass_is_raw(passno: int, cblk_style: int) -> bool:
    return (bool(cblk_style & CBLKSTY_LAZY) and passno >= 10
            and pass_type(passno) != PASS_CLN)


def pass_ends_segment(passno: int, cblk_style: int,
                      num_passes_total: int) -> bool:
    """Whether pass `passno` is a codeword-segment boundary — shared by the
    T1 coders and the Tier-2 packet length coder."""
    if passno == num_passes_total - 1:
        return True
    if cblk_style & CBLKSTY_TERMALL:
        return True
    if cblk_style & CBLKSTY_LAZY:
        return _lazy_boundary(passno, pass_type(passno))
    return False


def decode_cblk(
    data: bytes,
    seg_lengths: Optional[List[int]],
    w: int,
    h: int,
    orient: int,
    numbps: int,
    numpasses: int,
    cblk_style: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode one code-block; returns (mag, neg) arrays of shape (h, w).

    `numbps` is the actual number of bit-planes for this block (Kmax minus
    the signalled missing bit-planes); `numpasses` the number of coding
    passes present in `data`.
    """
    mag = np.zeros((h, w), dtype=np.uint32)
    neg = np.zeros((h, w), dtype=np.uint8)
    if numpasses == 0 or numbps == 0:
        return mag, neg
    st = _BlockState(w, h, orient, vsc=bool(cblk_style & CBLKSTY_VSC))
    st.neg = neg  # decoded signs feed sign-context formation directly
    lazy = bool(cblk_style & CBLKSTY_LAZY)
    termall = bool(cblk_style & CBLKSTY_TERMALL)
    segsym = bool(cblk_style & CBLKSTY_SEGSYM)

    # Segment layout: with no termination styles there is one segment
    # covering everything.
    offset = 0
    seg_iter = iter(seg_lengths) if seg_lengths else None

    def next_segment() -> bytes:
        nonlocal offset
        if seg_iter is None:
            seg = data[offset:]
            offset = len(data)
            return seg
        ln = next(seg_iter)
        seg = data[offset:offset + ln]
        offset += ln
        return seg

    mq: Optional[MQDecoder] = None
    raw_dec: Optional[RawDecoder] = None
    saved_ctx = None

    def get_mq() -> MQDecoder:
        nonlocal mq, saved_ctx
        if mq is None:
            mq = MQDecoder(next_segment(), ctx=saved_ctx)
        return mq

    def get_raw() -> RawDecoder:
        nonlocal raw_dec
        if raw_dec is None:
            raw_dec = RawDecoder(next_segment())
        return raw_dec

    reset = bool(cblk_style & CBLKSTY_RESET)

    def end_coder():
        nonlocal mq, raw_dec, saved_ctx
        if mq is not None:
            saved_ctx = None if reset else mq.ctx
        mq = None
        raw_dec = None

    def decode_sign(coder, x: int, y: int, raw: bool) -> int:
        if raw:
            return coder.decode()
        ctx, spb = st.sc_ctx(x, y)
        return coder.decode(ctx) ^ spb

    def spp(coder, plane: int, raw: bool):
        st.visited[:] = 0
        for x, y0, sh in _scan_columns(w, h):
            for y in range(y0, y0 + sh):
                if st.sig[y, x]:
                    continue
                if not st.has_sig_neighbor(x, y):
                    continue
                bit = coder.decode() if raw else coder.decode(st.zc_ctx(x, y))
                if bit:
                    s = decode_sign(coder, x, y, raw)
                    st.sig[y, x] = 1
                    neg[y, x] = s
                    mag[y, x] |= np.uint32(1 << plane)
                st.visited[y, x] = 1

    def mrp(coder, plane: int, raw: bool):
        for x, y0, sh in _scan_columns(w, h):
            for y in range(y0, y0 + sh):
                if not st.sig[y, x] or st.visited[y, x]:
                    continue
                bit = coder.decode() if raw else coder.decode(st.mag_ctx(x, y))
                if bit:
                    mag[y, x] |= np.uint32(1 << plane)
                st.refined[y, x] = 1

    def cp(coder, plane: int):
        for x, y0, sh in _scan_columns(w, h):
            start = 0
            if sh == 4:
                agg = True
                for y in range(y0, y0 + 4):
                    if st.sig[y, x] or st.visited[y, x] or st.has_sig_neighbor(x, y):
                        agg = False
                        break
                if agg:
                    if coder.decode(CTX_RL) == 0:
                        continue
                    r = (coder.decode(CTX_UNI) << 1) | coder.decode(CTX_UNI)
                    y = y0 + r
                    s = decode_sign(coder, x, y, False)
                    st.sig[y, x] = 1
                    neg[y, x] = s
                    mag[y, x] |= np.uint32(1 << plane)
                    start = r + 1
            for y in range(y0 + start, y0 + sh):
                if st.sig[y, x] or st.visited[y, x]:
                    continue
                bit = coder.decode(st.zc_ctx(x, y))
                if bit:
                    s = decode_sign(coder, x, y, False)
                    st.sig[y, x] = 1
                    neg[y, x] = s
                    mag[y, x] |= np.uint32(1 << plane)
        if segsym:
            for _ in range(4):
                coder.decode(CTX_UNI)

    num_passes_total = 3 * numbps - 2
    passno = 0
    for plane in range(numbps - 1, -1, -1):
        plane_passes = (PASS_CLN,) if plane == numbps - 1 else (
            PASS_SIG, PASS_REF, PASS_CLN)
        for ptype in plane_passes:
            if passno >= numpasses:
                return mag, neg
            raw = lazy and ptype != PASS_CLN and passno >= 10
            coder = get_raw() if raw else get_mq()
            if ptype == PASS_SIG:
                spp(coder, plane, raw)
            elif ptype == PASS_REF:
                mrp(coder, plane, raw)
            else:
                cp(coder, plane)
            is_last = passno == num_passes_total - 1
            if termall or is_last or (lazy and _lazy_boundary(passno, ptype)):
                end_coder()
            elif bool(cblk_style & CBLKSTY_RESET) and mq is not None:
                mq.reset_states()
            passno += 1
    return mag, neg
