"""Device (TPU/XLA) HTJ2K cleanup-pass DECODER.

The FBCOT cleanup decoder re-formulated for a vector machine instead of
the reference's per-block scalar loop (reference:
src/lib/jp2/t1/t1_ht/coding/ojph_block_decoder.cpp:687; byte-identical
host mirror: native/src/ht.cpp ht_decode_t):

- Byte unstuffing is content-INDEPENDENT per stream (whether a byte
  contributes 7 or 8 payload bits depends only on the previous byte's
  value), so a host prepass expands each segment's three streams (MEL
  forward, VLC backward, MagSgn forward) into dense unstuffed bit WORDS
  once, lanes-last. After that the entropy decode proper carries only
  per-lane BIT OFFSETS.
- The quad-pair walk runs as ONE lax.scan over the static step grid
  (row-pair-major, two quads per step) with the batch of code-blocks in
  the trailing lane dimension. Every data-dependent stream read becomes
  a 2-word gather at a per-lane offset (`take_along_axis` over the
  (W, B) word matrix); CxtVLC decode is a 1024-entry LUT take; the quad
  line state (sigma + max exponent of the row above) is a (qw+4, B)
  carry updated at STATIC per-step indices.
- Magnitude reconstruction collapses to integer ops: the reference's
  64-bit `((v+2) << (p-1)) >> (31-(missing+1))` is exactly `(v+2) >> 1`
  for every legal p, so lanes stay uint32.

Output is bit-exact with the native decoder (tests/test_ht_device.py);
blocks are grouped by (w, h) per launch like the encoder.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from . import ht_jax

# ---------------------------------------------------------------------------
# Decode LUTs (shared normative source with the encoder / native coder)
# ---------------------------------------------------------------------------


def _build_dec_table(src: np.ndarray) -> np.ndarray:
    """Decode LUT: [(c_q<<7)|cwd7] -> (e_k<<12)|(e_1<<8)|(rho<<4)|
    (u_off<<3)|len (same derivation as native build_tables)."""
    c_q = ((src >> 28) & 0xF).astype(np.int64)
    rho = ((src >> 24) & 0xF).astype(np.int64)
    u_off = ((src >> 23) & 1).astype(np.int64)
    e_k = ((src >> 19) & 0xF).astype(np.int64)
    e_1 = ((src >> 15) & 0xF).astype(np.int64)
    cwd = ((src >> 7) & 0xFF).astype(np.int64)
    ln = (src & 0x7F).astype(np.int64)
    dec = np.zeros(1024, np.int64)
    idx = np.arange(1024)
    cwd_i = idx & 0x7F
    cq_i = idx >> 7
    for j in range(len(src)):
        m = (cq_i == c_q[j]) & ((cwd_i & ((1 << ln[j]) - 1)) == cwd[j])
        val = (e_k[j] << 12) | (e_1[j] << 8) | (rho[j] << 4) \
            | (u_off[j] << 3) | ln[j]
        dec = np.where(m, val, dec)
    return dec.astype(np.int32)


@functools.lru_cache(maxsize=1)
def _dec_tables() -> Tuple[np.ndarray, np.ndarray]:
    src0, src1 = ht_jax._load_vlc_sources()
    return _build_dec_table(src0), _build_dec_table(src1)


MEL_EXP = ht_jax.MEL_EXP

# ---------------------------------------------------------------------------
# Host prepass: unstuffed dense bit words per stream, lanes-last
# ---------------------------------------------------------------------------


def _pack_lsb(bits_list: List[np.ndarray], nwords: int) -> np.ndarray:
    """[per-lane uint8 bit vectors (consumption order)] -> (nwords, B)
    uint32 words, bit j of the stream at bit (j % 32) of word j//32."""
    B = len(bits_list)
    out = np.zeros((nwords, B), np.uint32)
    for i, bits in enumerate(bits_list):
        n = len(bits)
        pad = np.zeros(nwords * 32, np.uint8)
        pad[:n] = bits[: nwords * 32]
        w = pad.reshape(nwords, 32).astype(np.uint32)
        out[:, i] = (w << np.arange(32, dtype=np.uint32)[None]).sum(
            axis=1, dtype=np.uint32)
    return out


def _mel_bits(seg: bytes, scup: int, nbits: int) -> np.ndarray:
    """MEL bit sequence in consumption order (reader consumes MSB-first
    from `tmp = (tmp << d_bits) | d`; mirrors native MelDec.read_byte
    incl. the last-byte low-nibble override and the 0xFF pad)."""
    data = seg[len(seg) - scup:]
    size = scup - 1
    out = np.zeros(nbits, np.uint8)
    pos = 0
    bitpos = 0
    unstuff = False
    carry = 0  # OR of the previous byte's overlapped bit
    while bitpos < nbits:
        d = data[pos] if pos < size else 0xFF
        if pos == size - 1:
            d |= 0xF
        pos += 1
        d_bits = 7 if unstuff else 8
        # consumption order = MSB first of the d_bits-bit value; when
        # d_bits == 7 the byte's bit 7 overlaps the previous byte's last
        # bit (OR semantics of `tmp << 7 | d`).
        if d_bits == 7 and bitpos > 0:
            out[bitpos - 1] |= (d >> 7) & 1
        for k in range(d_bits - 1, -1, -1):
            if bitpos >= nbits:
                break
            out[bitpos] = (d >> k) & 1
            bitpos += 1
        unstuff = (d & 0xFF) == 0xFF
    return out


def _pack_msb(bits_list: List[np.ndarray], nwords: int) -> np.ndarray:
    """Consumption-order bits -> words with stream bit j at bit
    (31 - j%32) of word j//32 (MSB-aligned windows)."""
    B = len(bits_list)
    out = np.zeros((nwords, B), np.uint32)
    for i, bits in enumerate(bits_list):
        n = min(len(bits), nwords * 32)
        pad = np.zeros(nwords * 32, np.uint8)
        pad[:n] = bits[:n]
        w = pad.reshape(nwords, 32).astype(np.uint32)
        out[:, i] = (w << (31 - np.arange(32, dtype=np.uint32))[None]).sum(
            axis=1, dtype=np.uint32)
    return out


def _ms_bits(seg: bytes, lcup: int, scup: int, nbits: int) -> np.ndarray:
    """MagSgn dense bits, LSB-consumption order (native MsDec: forward
    bytes, `tmp |= d << bits`, pads 0xFF past the end)."""
    data = seg[: lcup - scup]
    size = lcup - scup
    out = np.zeros(nbits, np.uint8)
    pos = 0
    bitpos = 0
    unstuff = False
    while bitpos < nbits:
        d = data[pos] if pos < size else 0xFF
        pos += 1
        d_bits = 7 if unstuff else 8
        if d_bits == 7 and bitpos > 0:
            out[bitpos - 1] |= (d >> 7) & 1
        nb = min(d_bits, nbits - bitpos)
        for k in range(nb):
            out[bitpos] = (d >> k) & 1
            bitpos += 1
        unstuff = (d & 0xFF) == 0xFF
    return out


def _vlc_bits(seg: bytes, lcup: int, scup: int, nbits: int) -> np.ndarray:
    """VLC dense bits, LSB-consumption order (native VlcDec: bytes read
    BACKWARD from lcup-2 with its own unstuff rule; initial high nibble
    contributes 4 bits, 3 when its low 3 bits are 111; pads 0 bytes)."""
    out = np.zeros(nbits, np.uint8)
    pos = lcup - 2
    d = seg[pos]
    pos -= 1
    size = scup - 2
    nib = d >> 4
    first_bits = 4 - (1 if (nib & 7) == 7 else 0)
    bitpos = 0
    for k in range(first_bits):
        out[bitpos] = (nib >> k) & 1
        bitpos += 1
    # the dropped 4th nibble bit overlaps the next byte's first bit
    if first_bits == 3:
        carry = (nib >> 3) & 1
    else:
        carry = 0
    unstuff = (d | 0xF) > 0x8F
    while bitpos < nbits:
        d = seg[pos] if size > 0 else 0
        pos -= 1
        size -= 1
        d_bits = 7 if (unstuff and (d & 0x7F) == 0x7F) else 8
        if carry and bitpos > 0:
            out[bitpos - 1] |= carry
        elif carry:
            out[0] |= carry  # cannot happen: first_bits >= 3
        carry = 0
        if d_bits == 7:
            carry = (d >> 7) & 1
        nb = min(d_bits, nbits - bitpos)
        for k in range(nb):
            out[bitpos] = (d >> k) & 1
            bitpos += 1
        unstuff = d > 0x8F
    return out


# ---------------------------------------------------------------------------
# Vectorized prepass (numpy, all lanes at once)
# ---------------------------------------------------------------------------


def _deposit_lsb(bytes_mat: np.ndarray, d_bits: np.ndarray,
                 nwords: int) -> np.ndarray:
    """(B, L) byte matrix + per-byte payload widths -> (nwords, B)
    LSB-layout words. Full bytes are OR-deposited at the cumulative bit
    position, so a 7-bit byte's top bit lands on the next byte's first
    bit — the native readers' overlap semantics exactly."""
    B, L = bytes_mat.shape
    pos = np.zeros((B, L), np.int64)
    np.cumsum(d_bits[:, :-1], axis=1, out=pos[:, 1:])
    words = np.zeros((nwords + 2, B), np.uint32)
    lanes = np.arange(B)
    val = bytes_mat.astype(np.uint64)
    idx = (pos >> 5).astype(np.int64)
    sh = (pos & 31).astype(np.uint64)
    for j in range(L):
        v = val[:, j] << sh[:, j]
        np.bitwise_or.at(words, (idx[:, j], lanes),
                         (v & 0xFFFFFFFF).astype(np.uint32))
        np.bitwise_or.at(words, (idx[:, j] + 1, lanes),
                         (v >> 32).astype(np.uint32))
    return words[:nwords]


def _deposit_msb(bytes_mat: np.ndarray, d_bits: np.ndarray,
                 nwords: int) -> np.ndarray:
    """MSB-layout deposit (MEL): the byte's 8 bits, MSB first, start at
    position pos - (8 - d_bits) so the overlapped top bit ORs into the
    previous byte's last consumed bit."""
    B, L = bytes_mat.shape
    pos = np.zeros((B, L), np.int64)
    np.cumsum(d_bits[:, :-1], axis=1, out=pos[:, 1:])
    start = pos - (8 - d_bits)
    start[:, 0] = 0  # first byte always contributes 8 bits
    words = np.zeros((nwords + 2, B), np.uint32)
    lanes = np.arange(B)
    val = bytes_mat.astype(np.uint64)
    idx = (start >> 5).astype(np.int64)
    sh = (start & 31).astype(np.uint64)
    for j in range(L):
        v = val[:, j] << (np.uint64(56) - sh[:, j])
        np.bitwise_or.at(words, (idx[:, j], lanes),
                         (v >> 32).astype(np.uint32))
        np.bitwise_or.at(words, (idx[:, j] + 1, lanes),
                         (v & 0xFFFFFFFF).astype(np.uint32))
    return words[:nwords]


def _ones_from(words: np.ndarray, ends: np.ndarray, msb: bool) -> None:
    """Set every stream bit at position >= ends[lane] to 1 (the 0xFF
    infinite pad the forward readers see), per lane, in place."""
    nwords, B = words.shape
    lanes = np.arange(B)
    we = (ends >> 5).astype(np.int64)
    full = np.arange(nwords)[:, None] > we[None, :]
    words |= np.where(full, np.uint32(0xFFFFFFFF), np.uint32(0))
    rem = (ends & 31).astype(np.uint64)
    if msb:
        # position j lives at word bit 31 - (j % 32)
        bmask = ((np.uint64(1) << (np.uint64(32) - rem)) - 1).astype(
            np.uint32)
    else:
        bmask = (~((np.uint64(1) << rem) - 1)).astype(np.uint32)
    sel = we < nwords
    np.bitwise_or.at(words, (we[sel], lanes[sel]), bmask[sel])


def _prepass_ms(segs: List[bytes], lcups, scups, nwords: int) -> np.ndarray:
    """Batched MagSgn stream words (forward, LSB, 0xFF pad)."""
    B = len(segs)
    sizes = np.asarray([lc - sc for lc, sc in zip(lcups, scups)], np.int64)
    L = int(sizes.max()) + 7
    mat = np.full((B, L), 0xFF, np.uint8)
    for i, seg in enumerate(segs):
        n = sizes[i]
        if n > 0:
            mat[i, :n] = np.frombuffer(seg[:n], np.uint8)
    prev = np.concatenate(
        [np.zeros((B, 1), np.uint8), mat[:, :-1]], axis=1)
    d_bits = np.where(prev == 0xFF, 7, 8).astype(np.int64)
    d_bits[:, 0] = 8
    words = _deposit_lsb(mat, d_bits, nwords)
    _ones_from(words, d_bits.sum(axis=1), msb=False)
    return words


def _prepass_mel(segs: List[bytes], lcups, scups, nwords: int) -> np.ndarray:
    """Batched MEL stream words (forward from lcup-scup, MSB, 0xFF pad,
    last real byte's low nibble forced to 0xF)."""
    B = len(segs)
    sizes = np.asarray([sc - 1 for sc in scups], np.int64)
    L = int(sizes.max()) + 7
    mat = np.full((B, L), 0xFF, np.uint8)
    for i, seg in enumerate(segs):
        n = sizes[i]
        base = lcups[i] - scups[i]
        if n > 0:
            mat[i, :n] = np.frombuffer(seg[base:base + n], np.uint8)
            mat[i, n - 1] |= 0xF
    prev = np.concatenate(
        [np.zeros((B, 1), np.uint8), mat[:, :-1]], axis=1)
    d_bits = np.where(prev == 0xFF, 7, 8).astype(np.int64)
    d_bits[:, 0] = 8
    words = _deposit_msb(mat, d_bits, nwords)
    _ones_from(words, d_bits.sum(axis=1), msb=True)
    return words


def _prepass_vlc(segs: List[bytes], lcups, scups, nwords: int) -> np.ndarray:
    """Batched VLC stream words (bytes BACKWARD from lcup-2, LSB, zero
    pad; initial high nibble contributes 4 bits, or 3 when its low 3
    bits are 111)."""
    B = len(segs)
    sizes = np.asarray([sc - 2 for sc in scups], np.int64)
    L = int(sizes.max()) + 7
    # column 0 = the nibble pseudo-byte; columns 1.. = backward bytes
    mat = np.zeros((B, L + 1), np.uint8)
    d_bits = np.full((B, L + 1), 8, np.int64)
    unstuff0 = np.zeros(B, bool)
    for i, seg in enumerate(segs):
        d0 = seg[lcups[i] - 2]
        nib = d0 >> 4
        mat[i, 0] = nib
        d_bits[i, 0] = 4 - (1 if (nib & 7) == 7 else 0)
        unstuff0[i] = (d0 | 0xF) > 0x8F
        n = sizes[i]
        if n > 0:
            rev = np.frombuffer(
                seg[lcups[i] - 2 - n:lcups[i] - 2], np.uint8)[::-1]
            mat[i, 1:1 + n] = rev
    prev = mat[:, :-1]
    unstuff = np.concatenate([unstuff0[:, None], prev[:, 1:] > 0x8F],
                             axis=1)
    stuffed = unstuff & ((mat[:, 1:] & 0x7F) == 0x7F)
    d_bits[:, 1:] = np.where(stuffed, 7, 8)
    return _deposit_lsb(mat, d_bits, nwords)


def prepass_all(segs: List[bytes], lcups, scups, wm_mel: int, wm_vlc: int,
                wm_ms: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(MEL, VLC, MagSgn) stream-word matrices for a segment batch.
    Prefers the native mirror (one OpenMP call; the numpy scatters here
    cost ~60 ms per 512^2 tile and dominate fused decode). Set
    GROK_TPU_PREPASS=numpy to force the numpy path (oracle/tests)."""
    import os
    if os.environ.get("GROK_TPU_PREPASS", "") != "numpy":
        try:
            from ..native import t1_native
            return t1_native.ht_dec_prepass(
                [bytes(s) for s in segs], lcups, scups,
                wm_mel, wm_vlc, wm_ms)
        except ImportError:  # pragma: no cover - native build unavailable
            pass
    return (_prepass_mel(segs, lcups, scups, wm_mel),
            _prepass_vlc(segs, lcups, scups, wm_vlc),
            _prepass_ms(segs, lcups, scups, wm_ms))


# ---------------------------------------------------------------------------
# Jitted scan decoder (one shape group)
# ---------------------------------------------------------------------------


def _fetch_lsb(jnp, words, off):
    """Next 32 stream bits at per-lane bit offset `off`, LSB-aligned.
    Offsets past the buffer clamp to the final pad words, whose content
    equals the stream's infinite pad (1-bits for MEL/MagSgn, 0 for
    VLC)."""
    wi = jnp.minimum((off >> 5).astype(jnp.int32), words.shape[0] - 2)
    sh = (off & 31).astype(jnp.uint32)
    w0 = jnp.take_along_axis(words, wi[None, :], axis=0)[0]
    w1 = jnp.take_along_axis(words, wi[None, :] + 1, axis=0)[0]
    lo = w0 >> sh
    hi = jnp.where(sh > 0,
                   w1 << ((jnp.uint32(32) - sh) & jnp.uint32(31)),
                   jnp.uint32(0))
    return lo | hi


def _fetch_msb(jnp, words, off):
    """Next 32 stream bits at offset, MSB-aligned (MEL layout)."""
    wi = jnp.minimum((off >> 5).astype(jnp.int32), words.shape[0] - 2)
    sh = (off & 31).astype(jnp.uint32)
    w0 = jnp.take_along_axis(words, wi[None, :], axis=0)[0]
    w1 = jnp.take_along_axis(words, wi[None, :] + 1, axis=0)[0]
    hi = w0 << sh
    lo = jnp.where(sh > 0,
                   w1 >> ((jnp.uint32(32) - sh) & jnp.uint32(31)),
                   jnp.uint32(0))
    return hi | lo


def _mel_get_run(jnp, mel_words, off, k):
    """One MEL run decode: returns (run, off', k'). Mirrors native
    MelDec::get_run (exponent ladder MEL_EXP)."""
    win = _fetch_msb(jnp, mel_words, off)
    eval_ = jnp.take(jnp.asarray(MEL_EXP), k)
    msb = (win >> 31) & 1
    full = msb == 1
    run_full = ((jnp.int32(1) << eval_) - 1) << 1
    rest = (win << 1) >> ((jnp.uint32(32) - eval_.astype(jnp.uint32))
                          & jnp.uint32(31))
    rest = jnp.where(eval_ > 0, rest, jnp.uint32(0)).astype(jnp.int32)
    run_part = (rest << 1) + 1
    run = jnp.where(full, run_full, run_part)
    k2 = jnp.where(full, jnp.minimum(k + 1, 12), jnp.maximum(k - 1, 0))
    off2 = off + jnp.where(full, 1, eval_ + 1)
    return run, off2, k2


def _cond_get_run(jnp, mel_words, need, run, off, k):
    """Where `need`, pull the next MEL run (native: `if (run < 0)
    run = mel.get_run()`); elsewhere keep state."""
    r2, o2, k2 = _mel_get_run(jnp, mel_words, off, k)
    return (jnp.where(need, r2, run), jnp.where(need, o2, off),
            jnp.where(need, k2, k))


def _uvlc_classify(jnp, win):
    """(pre_len, suf_len, base) of a UVLC prefix at the window's low
    bits (native uvlc_classify)."""
    b0 = win & 1
    b01 = win & 3
    b02 = win & 7
    pre_len = jnp.where(b0 == 1, 1, jnp.where(b01 == 2, 2, 3))
    suf_len = jnp.where(b0 == 1, 0,
                        jnp.where(b01 == 2, 0,
                                  jnp.where(b02 == 4, 1, 5)))
    base = jnp.where(b0 == 1, 1,
                     jnp.where(b01 == 2, 2,
                               jnp.where(b02 == 4, 3, 5)))
    return pre_len, suf_len, base


def _uvlc_decode(jnp, win, mode, initial: bool):
    """Vectorized native uvlc_decode: (u0, u1, consumed bits)."""
    win = win.astype(jnp.uint32)
    p1, s1, b1 = _uvlc_classify(jnp, win)
    w_after1 = win >> p1.astype(jnp.uint32)

    # mode 1/2: single value
    v_single = b1 + (w_after1 & ((jnp.uint32(1) << s1) - 1)).astype(
        jnp.int32)
    c_single = p1 + s1

    if initial:
        # mode 3 initial: u_q0 code, then either the 1-bit u_q1 in {1,2}
        # (when u_q0's prefix > 2) or a second full code
        long0 = p1 > 2
        # branch A: u1 = bit + 1, then u0 suffix
        wA = w_after1 >> 1
        u1_A = (w_after1 & 1).astype(jnp.int32) + 1
        u0_A = b1 + (wA & ((jnp.uint32(1) << s1) - 1)).astype(jnp.int32)
        c_A = p1 + 1 + s1
        # branch B: second prefix, then both suffixes
        p2, s2, b2 = _uvlc_classify(jnp, w_after1)
        wB = w_after1 >> p2.astype(jnp.uint32)
        u0_B = b1 + (wB & ((jnp.uint32(1) << s1) - 1)).astype(jnp.int32)
        wB2 = wB >> s1.astype(jnp.uint32)
        u1_B = b2 + (wB2 & ((jnp.uint32(1) << s2) - 1)).astype(jnp.int32)
        c_B = p1 + p2 + s1 + s2
        u0_m3 = jnp.where(long0, u0_A, u0_B)
        u1_m3 = jnp.where(long0, u1_A, u1_B)
        c_m3 = jnp.where(long0, c_A, c_B)
        # mode 4: two codes, both +2
        u0_m4 = u0_B + 2
        u1_m4 = u1_B + 2
        c_m4 = c_B
    else:
        # mode 3 non-initial: two independent codes
        p2, s2, b2 = _uvlc_classify(jnp, w_after1)
        wB = w_after1 >> p2.astype(jnp.uint32)
        u0_m3 = b1 + (wB & ((jnp.uint32(1) << s1) - 1)).astype(jnp.int32)
        wB2 = wB >> s1.astype(jnp.uint32)
        u1_m3 = b2 + (wB2 & ((jnp.uint32(1) << s2) - 1)).astype(jnp.int32)
        c_m3 = p1 + p2 + s1 + s2
        u0_m4 = u0_m3
        u1_m4 = u1_m3
        c_m4 = c_m3

    zero = jnp.zeros_like(mode)
    u0 = jnp.where(mode == 0, zero,
                   jnp.where(mode == 1, v_single,
                             jnp.where(mode == 2, zero,
                                       jnp.where(mode == 3, u0_m3,
                                                 u0_m4))))
    u1 = jnp.where(mode == 0, zero,
                   jnp.where(mode == 1, zero,
                             jnp.where(mode == 2, v_single,
                                       jnp.where(mode == 3, u1_m3,
                                                 u1_m4))))
    c = jnp.where(mode == 0, zero,
                  jnp.where(mode <= 2, c_single,
                            jnp.where(mode == 3, c_m3, c_m4)))
    return u0, u1, c


def _bit_length(jnp, v):
    """bit_length of uint32 lanes (0 -> 0)."""
    x = v.astype(jnp.uint32)
    n = jnp.zeros(x.shape, jnp.int32)
    for s in (16, 8, 4, 2, 1):
        big = x >= (jnp.uint32(1) << s)
        n = n + jnp.where(big, s, 0)
        x = jnp.where(big, x >> s, x)
    return n + (x > 0).astype(jnp.int32)


def _decode_quad(jnp, qf, U_p, ms_words, ms_off):
    """Decode one quad's 4 samples for every lane. Returns
    (mags (4, B) uint32 CENTERED (v+2)>>1 values, signs (4, B),
    ms_off', bl_exp, br_exp, bl_sig, br_sig)."""
    mags = []
    signs = []
    exps = []
    sigs = []
    v_prev = None
    for n in range(4):
        sig = ((qf >> (4 + n)) & 1) == 1
        win = _fetch_lsb(jnp, ms_words, ms_off)
        m_n = (U_p - ((qf >> (12 + n)) & 1)).astype(jnp.uint32)
        sign = win & 1
        mask = jnp.where(m_n < 32,
                         (jnp.uint32(1) << (m_n & jnp.uint32(31))) - 1,
                         jnp.uint32(0xFFFFFFFF))
        v_n = (win & mask) \
            | (((qf >> (8 + n)) & 1).astype(jnp.uint32)
               << (m_n & jnp.uint32(31))) \
            | jnp.uint32(1)
        v_n = jnp.where(sig, v_n, jnp.uint32(0))
        ms_off = ms_off + jnp.where(sig, m_n.astype(jnp.int32), 0)
        mag = jnp.where(sig, (v_n + 2) >> 1, jnp.uint32(0))
        mags.append(mag)
        signs.append(jnp.where(sig, sign, jnp.uint32(0)))
        exps.append(_bit_length(jnp, v_n))
        sigs.append(sig)
    return (mags, signs, ms_off, exps[1], exps[3], sigs[1], sigs[3])


def bucket_words(n: int) -> int:
    """Round a stream word count up to a coarse ladder so jit signatures
    (and therefore compiles of the scan program — minutes each on the
    CPU backend) are shared across content. Extra rows are pure pad:
    the prepasses fill them with each stream's infinite-pad pattern and
    the fetches clamp into them."""
    b = 32
    while b < n:
        b *= 2
    return b


def decode_group_core(w: int, h: int):
    """Traceable group decoder body for one (w, h) block shape:
    (mel_words, vlc_words, ms_words) dense stream words, lanes-last ->
    (B, H2, W4) uint32 magnitudes ((v+2)>>1 form) and signs on the
    2*ny x 4*nx padded grid. Usable inside larger jitted programs
    (models/fused_decode.py)."""
    import jax
    import jax.numpy as jnp

    dec0_np, dec1_np = _dec_tables()
    qw = (w + 1) // 2
    nx = (w + 3) // 4
    ny = (h + 1) // 2
    xs_x = np.tile(np.arange(nx, dtype=np.int32) * 4, ny)
    xs_first = (np.arange(nx * ny, dtype=np.int32) % nx) == 0
    xs_row0 = (np.arange(nx * ny, dtype=np.int32) // nx) == 0

    def run(mel_words, vlc_words, ms_words):
        B = mel_words.shape[1]
        dec0 = jnp.asarray(dec0_np)
        dec1 = jnp.asarray(dec1_np)
        zi = jnp.zeros((B,), jnp.int32)

        run0, mel_off, mel_k = _mel_get_run(jnp, mel_words, zi, zi)

        def step(carry, xs):
            (vlc_off, mel_off, mel_k, mel_run, ms_off, c_p, ls0,
             lstate) = carry
            x, first, row0 = xs
            q = x >> 1  # quad base index (static per step)

            ls_q1 = jax.lax.dynamic_slice_in_dim(lstate, q + 1, 1,
                                                 axis=0)[0]
            ls_q2 = jax.lax.dynamic_slice_in_dim(lstate, q + 2, 1,
                                                 axis=0)[0]
            # row start: snapshot entry 0, zero it, reset c_p
            ls0 = jnp.where(first, lstate[0], ls0)
            lstate = jnp.where(
                first, lstate.at[0].set(0), lstate)
            c_p = jnp.where(first, 0, c_p)

            # ---- quad 0 ----
            cq0 = jnp.where(row0, c_p,
                            c_p | (ls0 >> 7) | ((ls_q1 >> 5) & 4))
            win = _fetch_lsb(jnp, vlc_words, vlc_off)
            idx0 = (cq0 << 7) | (win & 0x7F).astype(jnp.int32)
            qf0 = jnp.where(row0, jnp.take(dec0, idx0),
                            jnp.take(dec1, idx0))
            azc0 = cq0 == 0
            mel_run = mel_run - jnp.where(azc0, 2, 0)
            qf0 = jnp.where(azc0 & (mel_run != -1), 0, qf0)
            need = azc0 & (mel_run < 0)
            mel_run, mel_off, mel_k = _cond_get_run(
                jnp, mel_words, need, mel_run, mel_off, mel_k)
            c_p = jnp.where(
                row0,
                ((qf0 & 0x10) >> 4) | ((qf0 & 0xE0) >> 5),
                ((qf0 & 0x40) >> 5) | ((qf0 & 0x80) >> 6))
            vlc_off = vlc_off + (qf0 & 0x7)

            # ---- quad 1 ----
            has_q1 = x + 2 < w
            cq1 = jnp.where(row0, c_p,
                            c_p | (ls_q1 >> 7) | ((ls_q2 >> 5) & 4))
            win = _fetch_lsb(jnp, vlc_words, vlc_off)
            idx1 = (cq1 << 7) | (win & 0x7F).astype(jnp.int32)
            qf1 = jnp.where(row0, jnp.take(dec0, idx1),
                            jnp.take(dec1, idx1))
            azc1 = (cq1 == 0) & has_q1
            mel_run = mel_run - jnp.where(azc1, 2, 0)
            qf1 = jnp.where(azc1 & (mel_run != -1), 0, qf1)
            qf1 = jnp.where(has_q1, qf1, 0)
            need = azc1 & (mel_run < 0)
            mel_run, mel_off, mel_k = _cond_get_run(
                jnp, mel_words, need, mel_run, mel_off, mel_k)
            c_p = jnp.where(
                has_q1,
                jnp.where(row0,
                          ((qf1 & 0x10) >> 4) | ((qf1 & 0xE0) >> 5),
                          ((qf1 & 0x40) >> 5) | ((qf1 & 0x80) >> 6)),
                c_p)
            vlc_off = vlc_off + jnp.where(has_q1, qf1 & 0x7, 0)

            # ---- u values ----
            uvlc_mode = ((qf0 & 0x8) >> 3) | ((qf1 & 0x8) >> 2)
            m3 = uvlc_mode == 3
            mel_run = mel_run - jnp.where(row0 & m3, 2, 0)
            uvlc_mode = uvlc_mode + jnp.where(
                row0 & m3 & (mel_run == -1), 1, 0)
            need = row0 & m3 & (mel_run < 0)
            mel_run, mel_off, mel_k = _cond_get_run(
                jnp, mel_words, need, mel_run, mel_off, mel_k)
            win = _fetch_lsb(jnp, vlc_words, vlc_off)
            u0_i, u1_i, c_i = _uvlc_decode(jnp, win, uvlc_mode, True)
            u0_n, u1_n, c_n = _uvlc_decode(jnp, win, uvlc_mode, False)
            u0 = jnp.where(row0, u0_i, u0_n)
            u1 = jnp.where(row0, u1_i, u1_n)
            vlc_off = vlc_off + jnp.where(row0, c_i, c_n)

            U_p0 = u0 + 1
            U_p1 = u1 + 1
            # non-initial rows: exponent bonus for 2+ significant quads
            multi0 = ((qf0 & 0xF0) & ((qf0 & 0xF0) - 1)) != 0
            multi1 = ((qf1 & 0xF0) & ((qf1 & 0xF0) - 1)) != 0
            e0 = jnp.maximum(ls0 & 0x7F, ls_q1 & 0x7F) - 2
            e1 = jnp.maximum(ls_q1 & 0x7F, ls_q2 & 0x7F) - 2
            U_p0 = U_p0 + jnp.where((~row0) & multi0,
                                    jnp.maximum(e0, 0), 0)
            U_p1 = U_p1 + jnp.where((~row0) & multi1,
                                    jnp.maximum(e1, 0), 0)

            # carry line state for the next pair + zero our entries
            ls0 = jnp.where(row0, ls0, ls_q2)
            lstate = jax.lax.dynamic_update_slice_in_dim(
                lstate, jnp.zeros((2, lstate.shape[1]), lstate.dtype),
                q + 1, axis=0)

            # ---- sample decode (MagSgn) + line-state writes ----
            (m0, s0, ms_off, bl_e0, br_e0, bl_s0, br_s0) = _decode_quad(
                jnp, qf0, U_p0, ms_words, ms_off)
            (m1, s1, ms_off, bl_e1, br_e1, bl_s1, br_s1) = _decode_quad(
                jnp, qf1, U_p1, ms_words, ms_off)

            # entry q: fold quad0's bottom-left; entry q+1: quad0's
            # bottom-right then quad1's bottom-left fold; entry q+2:
            # quad1's bottom-right
            ent_q = jax.lax.dynamic_slice_in_dim(lstate, q, 1, axis=0)[0]
            ent_q = jnp.where(
                bl_s0,
                (ent_q & 0x80) | 0x80
                | jnp.maximum(ent_q & 0x7F, bl_e0), ent_q)
            e_q1 = jnp.where(br_s0, 0x80 | br_e0, 0)
            e_q1 = jnp.where(
                bl_s1, (e_q1 & 0x80) | 0x80
                | jnp.maximum(e_q1 & 0x7F, bl_e1), e_q1)
            e_q2 = jnp.where(br_s1 & has_q1, 0x80 | br_e1, 0)
            upd = jnp.stack([ent_q, e_q1, e_q2])
            lstate = jax.lax.dynamic_update_slice_in_dim(
                lstate, upd, q, axis=0)

            mags = jnp.stack(m0 + m1)    # (8, B)
            signs = jnp.stack(s0 + s1)
            carry = (vlc_off, mel_off, mel_k, mel_run, ms_off, c_p, ls0,
                     lstate)
            return carry, (mags, signs)

        lstate0 = jnp.zeros((qw + 4, B), jnp.int32)
        carry0 = (zi, mel_off, mel_k, run0, zi, zi, zi, lstate0)
        xs = (jnp.asarray(xs_x), jnp.asarray(xs_first),
              jnp.asarray(xs_row0))
        _, (mags, signs) = jax.lax.scan(step, carry0, xs)
        # (T, 8, B) -> padded sample grid (B, 2*ny, 4*nx).
        # step order: row-pair-major; within a step: quad(2) x col(2) x
        # row(2) in native n-order (dx={0,0,1,1}, dy={0,1,0,1}).

        def to_grid(a):
            a = a.reshape(ny, nx, 2, 2, 2, B)      # (iy, ix, q, col, row)
            a = a.transpose(5, 0, 4, 1, 2, 3)      # (B, iy, row, ix, q, col)
            return a.reshape(B, 2 * ny, 4 * nx)

        return to_grid(mags), to_grid(signs)

    return run


@functools.lru_cache(maxsize=64)
def _jitted_decode(w: int, h: int, wm_mel: int, wm_vlc: int, wm_ms: int):
    """Jitted standalone group decoder (word widths in the cache key so
    retraces stay bounded)."""
    import jax
    return jax.jit(decode_group_core(w, h))


# ---------------------------------------------------------------------------
# Public batch API
# ---------------------------------------------------------------------------


def ht_decode_blocks(blocks) -> List[Optional[Tuple[np.ndarray,
                                                    np.ndarray]]]:
    """blocks: [(segment bytes, w, h, missing_msbs), ...] ->
    [(mag uint32 (h, w), neg uint8 (h, w)) or None] per block.

    Bit-exact with native grok_ht_decode (magnitudes in the decoder's
    centered fixed-point form: (v+2)>>1 with v = 2*|coeff'| oriented at
    bit 30-missing_msbs — identical to the native SinkU32 output).
    Blocks whose segment is structurally invalid return None.
    """
    import jax.numpy as jnp

    groups = {}
    metas = []
    for i, (seg, w, h, miss) in enumerate(blocks):
        lcup = len(seg)
        if lcup < 2:
            metas.append(None)
            continue
        scup = (seg[lcup - 1] << 4) + (seg[lcup - 2] & 0xF)
        if scup > lcup or scup < 2:
            metas.append(None)
            continue
        metas.append((scup,))
        groups.setdefault((w, h), []).append(i)

    out: List[Optional[Tuple[np.ndarray, np.ndarray]]] = [None] * len(
        blocks)
    for (w, h), idxs in sorted(groups.items()):
        segs = [bytes(blocks[i][0]) for i in idxs]
        lcups = [len(s) for s in segs]
        scups = [metas[i][0] for i in idxs]
        # word buffers sized to the real streams (+pad columns), rounded
        # to the bucket ladder so compiles are shared; reads past the
        # end clamp to the pad words (infinite 0xFF / zeros)
        wm_mel = bucket_words((8 * (max(scups) + 7)) // 32 + 4)
        wm_vlc = bucket_words((8 * (max(scups) + 7)) // 32 + 4)
        wm_ms = bucket_words(
            (8 * (max(lc - sc for lc, sc in zip(lcups, scups)) + 8))
            // 32 + 4)
        # pad the lane count to power-of-2 buckets as well (another jit
        # signature axis); pad lanes hold all-zero streams and decode
        # to discarded garbage
        B = len(segs)
        b_pad = ht_jax._pad_batch(B)

        def _padded(a):
            if a.shape[1] == b_pad:
                return a
            return np.pad(a, ((0, 0), (0, b_pad - a.shape[1])))

        mel_np, vlc_np, ms_np = prepass_all(segs, lcups, scups,
                                            wm_mel, wm_vlc, wm_ms)
        mel_w = jnp.asarray(_padded(mel_np))
        vlc_w = jnp.asarray(_padded(vlc_np))
        ms_w = jnp.asarray(_padded(ms_np))
        fn = _jitted_decode(w, h, wm_mel, wm_vlc, wm_ms)
        mags, signs = fn(mel_w, vlc_w, ms_w)
        mags = np.asarray(mags)[:B, :h, :w]
        signs = np.asarray(signs)[:B, :h, :w]
        for k, i in enumerate(idxs):
            out[i] = (mags[k].astype(np.uint32),
                      signs[k].astype(np.uint8))
    return out


def decode_group_backend(w: int, h: int, backend: str = "xla"):
    """Group decoder selected by plan backend: the Pallas window-refill
    kernel on real TPU hardware (ops/ht_dec_pallas.py, ~35x the scan) or
    the lax.scan core everywhere else."""
    if backend == "pallas":
        from . import ht_dec_pallas
        return ht_dec_pallas.decode_group_pallas(w, h)
    return decode_group_core(w, h)
