"""MQ arithmetic coder (ISO/IEC 15444-1 Annex C), plus the raw (bypass)
bit coder used by the LAZY code-block style.

Pure-Python reference implementation — the bit-exactness oracle for the
native C++ fast path and any device kernels. Follows the spec's software
conventions (C.3.2 BYTEOUT / C.3.4 FLUSH, C.4 INITDEC/BYTEIN), with the
same end-of-stream handling as the reference codec's coder
(reference: src/lib/jp2/t1/t1_part1/mqc_enc.cpp:69, mqc.h:63-120):
0xFF byte-stuffing, trailing-0xFF suppression on flush, and decoder
saturation with 1-bits once a terminating marker (>0x8F after 0xFF) or the
segment end is reached.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

# (Qe, NMPS, NLPS, SWITCH) — Table C.2.
MQ_TABLE: Tuple[Tuple[int, int, int, int], ...] = (
    (0x5601, 1, 1, 1),
    (0x3401, 2, 6, 0),
    (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0),
    (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1),
    (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0),
    (0x3001, 11, 17, 0),
    (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0),
    (0x1601, 29, 21, 0),
    (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0),
    (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0),
    (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0),
    (0x2401, 23, 20, 0),
    (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0),
    (0x1801, 26, 23, 0),
    (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0),
    (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0),
    (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0),
    (0x0441, 35, 32, 0),
    (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0),
    (0x0141, 38, 35, 0),
    (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0),
    (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0),
    (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0),
    (0x5601, 46, 46, 0),
)

QE = tuple(e[0] for e in MQ_TABLE)
NMPS = tuple(e[1] for e in MQ_TABLE)
NLPS = tuple(e[2] for e in MQ_TABLE)
SWITCH = tuple(e[3] for e in MQ_TABLE)

NUM_CTXS = 19
# Context indices (layout shared with the T1 coder).
CTX_ZC = 0    # 9 zero-coding contexts: 0..8
CTX_SC = 9    # 5 sign-coding contexts: 9..13
CTX_MAG = 14  # 3 magnitude-refinement contexts: 14..16
CTX_RL = 17   # run-length (aggregation) context
CTX_UNI = 18  # uniform context


def initial_states() -> List[List[int]]:
    """Initial (state_index, mps) per context (Annex D: all at state 0 except
    ZC0 at 4, RL at 3, UNI at 46)."""
    ctx = [[0, 0] for _ in range(NUM_CTXS)]
    ctx[CTX_ZC][0] = 4
    ctx[CTX_RL][0] = 3
    ctx[CTX_UNI][0] = 46
    return ctx


class MQEncoder:
    """MQ encoder with 19 contexts and byte-stuffed output."""

    __slots__ = ("a", "c", "ct", "out", "ctx")

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.ctx = initial_states()

    def reset_states(self):
        self.ctx = initial_states()

    def encode(self, d: int, cx: int) -> None:
        state, mps = self.ctx[cx]
        qe = QE[state]
        self.a -= qe
        if d == mps:
            if self.a & 0x8000:
                self.c += qe
            else:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.ctx[cx][0] = NMPS[state]
                self._renorm()
        else:
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if SWITCH[state]:
                self.ctx[cx][1] = 1 - mps
            self.ctx[cx][0] = NLPS[state]
            self._renorm()

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        out = self.out
        if out and out[-1] == 0xFF:
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c > 0x7FFFFFF:
                # Carry into the previous byte.
                if out:
                    out[-1] += 1
                    if out[-1] == 0xFF:
                        self.c &= 0x7FFFFFF
                        out.append((self.c >> 20) & 0xFF)
                        self.c &= 0xFFFFF
                        self.ct = 7
                        return
                self.c &= 0x7FFFFFF
            out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8

    def flush(self) -> bytes:
        """Terminate the codeword (FLUSH, C.3.4) and return the bytes."""
        # SETBITS
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.out and self.out[-1] == 0xFF:
            self.out.pop()
        return bytes(self.out)

    def erterm(self) -> bytes:
        """Predictable (error-resilient) termination, used by the PTERM
        code-block style (reference: mqc_enc.cpp mqc_erterm_enc)."""
        k = 11 - self.ct + 1
        while k > 0:
            self.c = (self.c << self.ct) & 0xFFFFFFFF
            self.ct = 0
            self._byteout()
            k -= self.ct
        if not self.out or self.out[-1] != 0xFF:
            self._byteout()
        return bytes(self.out)

    def numbytes(self) -> int:
        return len(self.out)


class MQDecoder:
    """MQ decoder over a byte segment."""

    __slots__ = ("a", "c", "ct", "data", "pos", "end", "ctx")

    def __init__(self, data: bytes, ctx=None):
        self.data = data
        self.pos = 0
        self.end = len(data)
        self.ctx = ctx if ctx is not None else initial_states()
        if self.end == 0:
            self.c = 0xFF << 16
        else:
            self.c = data[0] << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def reset_states(self):
        self.ctx = initial_states()

    def _bytein(self) -> None:
        data, pos, end = self.data, self.pos, self.end
        if pos < end:
            nxt = data[pos + 1] if pos + 1 < end else 0xFF
            if data[pos] == 0xFF:
                if nxt > 0x8F:
                    self.c += 0xFF00
                    self.ct = 8
                else:
                    self.pos = pos + 1
                    self.c += nxt << 9
                    self.ct = 7
            else:
                self.pos = pos + 1
                self.c += nxt << 8
                self.ct = 8
        else:
            self.c += 0xFF00
            self.ct = 8

    def decode(self, cx: int) -> int:
        state, mps = self.ctx[cx]
        qe = QE[state]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange path.
            if self.a < qe:
                d = mps
                self.ctx[cx][0] = NMPS[state]
            else:
                d = 1 - mps
                if SWITCH[state]:
                    self.ctx[cx][1] = 1 - mps
                self.ctx[cx][0] = NLPS[state]
            self.a = qe
            self._renormd()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - mps
                    if SWITCH[state]:
                        self.ctx[cx][1] = 1 - mps
                    self.ctx[cx][0] = NLPS[state]
                else:
                    d = mps
                    self.ctx[cx][0] = NMPS[state]
                self._renormd()
            else:
                d = mps
        return d

    def _renormd(self) -> None:
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break


class RawEncoder:
    """Raw (bypass-mode) bit packer with 0xFF stuffing (Annex D.5)."""

    __slots__ = ("out", "c", "ct")

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.ct = 8

    def encode(self, d: int) -> None:
        self.c = (self.c << 1) | (d & 1)
        self.ct -= 1
        if self.ct == 0:
            self.out.append(self.c)
            self.ct = 7 if self.c == 0xFF else 8
            self.c = 0

    def flush(self, erterm: bool = False) -> bytes:
        """Pad the final partial byte; PTERM pads with alternating bits
        and always emits after 0xFF (reference: mqc_bypass_flush_enc)."""
        full_ct = 7 if (self.out and self.out[-1] == 0xFF) else 8
        if self.ct < full_ct or (erterm and self.ct == 7):
            c = self.c
            ct = self.ct
            bit = 0
            while ct > 0:
                ct -= 1
                c = (c << 1) | bit
                bit = 1 - bit
            self.out.append(c & 0xFF)
        return bytes(self.out)


class RawDecoder:
    """Raw (bypass-mode) bit reader with 0xFF stuffing."""

    __slots__ = ("data", "pos", "c", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.c = 0
        self.ct = 0

    def decode(self) -> int:
        if self.ct == 0:
            if self.pos < len(self.data):
                prev_ff = self.pos > 0 and self.data[self.pos - 1] == 0xFF
                self.c = self.data[self.pos]
                self.pos += 1
                self.ct = 7 if prev_ff else 8
                if prev_ff:
                    self.c &= 0x7F
            else:
                self.c = 0xFF
                self.ct = 8
        self.ct -= 1
        return (self.c >> self.ct) & 1
