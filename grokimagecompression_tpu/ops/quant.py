"""Quantization (ISO/IEC 15444-1 Annex E).

Stepsize derivation, (expn, mant) wire coding, quantize/dequantize, and the
wavelet basis L2 norms used for default stepsizes and PCRD distortion
weighting. Analog of the reference Quantizer
(reference: src/lib/jp2/codestream/Quantizer.cpp setBandStepSizeAndBps) with
the spec formulas: delta_b = 2^(R_b - eps_b) * (1 + mu_b / 2^11),
M_b = G + eps_b - 1.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


# L2 norms of the synthesis basis vectors per [orient][level] — standard
# constants for the 5/3 and 9/7 filter banks (identical tables appear in all
# JPEG 2000 codecs; they derive from the filter taps).
DWT_NORMS_53 = (
    (1.000, 1.500, 2.750, 5.375, 10.68, 21.34, 42.67, 85.33, 170.7, 341.3),
    (1.038, 1.592, 2.919, 5.703, 11.33, 22.64, 45.25, 90.48, 180.9, 362.0),
    (1.038, 1.592, 2.919, 5.703, 11.33, 22.64, 45.25, 90.48, 180.9, 362.0),
    (0.7186, 0.9218, 1.586, 3.043, 6.019, 12.01, 24.00, 47.97, 95.93, 191.9),
)
DWT_NORMS_97 = (
    (1.000, 1.965, 4.177, 8.403, 16.90, 33.84, 67.69, 135.3, 270.6, 540.9),
    (2.022, 3.989, 8.355, 17.04, 34.27, 68.63, 137.3, 274.6, 549.0, 1098.0),
    (2.022, 3.989, 8.355, 17.04, 34.27, 68.63, 137.3, 274.6, 549.0, 1098.0),
    (2.080, 3.865, 8.307, 17.18, 34.42, 68.85, 137.7, 275.4, 550.8, 1101.6),
)


def band_norm(orient: int, level: int, reversible: bool) -> float:
    table = DWT_NORMS_53 if reversible else DWT_NORMS_97
    level = min(level, len(table[orient]) - 1)
    return table[orient][level]


def encode_stepsize(stepsize: float, numbps: int) -> Tuple[int, int]:
    """Float stepsize -> (expn, mant) per E.1.1 with R_b = numbps."""
    s8192 = max(1, int(math.floor(stepsize * 8192.0)))
    p = s8192.bit_length() - 1 - 13
    n = 11 - (s8192.bit_length() - 1)
    mant = ((s8192 >> -n) if n < 0 else (s8192 << n)) & 0x7FF
    expn = numbps - p
    return expn, mant


def decode_stepsize(expn: int, mant: int, numbps: int) -> float:
    """(expn, mant) -> float stepsize: 2^(R_b - eps) * (1 + mu/2048)."""
    return float(2.0 ** (numbps - expn) * (1.0 + mant / 2048.0))


def default_irrev_stepsize(orient: int, level: int) -> float:
    """Default encoder stepsize for an irreversible band: 1/norm (gain 0)."""
    return 1.0 / band_norm(orient, level, reversible=False)


def quantize(a: np.ndarray, stepsize: float) -> Tuple[np.ndarray, np.ndarray]:
    """Deadzone scalar quantizer: q = sign(a) * floor(|a| / delta).
    Returns (mag uint32, neg uint8)."""
    mag = np.floor(np.abs(a) / np.float64(stepsize)).astype(np.uint32)
    neg = (a < 0).astype(np.uint8)
    return mag, neg


def quantize_signed(a: np.ndarray, stepsize: float) -> np.ndarray:
    """Deadzone quantizer as signed int32: sign(a) * floor(|a| / delta).
    abs/sign of the result reproduces quantize() exactly."""
    q = np.floor(np.abs(a) / np.float64(stepsize)).astype(np.int32)
    return np.where(a < 0, -q, q)


def trunc_plane(numbps: int, numpasses: int) -> int:
    """Lowest bit-plane reached by `numpasses` decoded passes of a block
    with `numbps` magnitude planes: pass 0 is the MSB cleanup, then
    (sig, ref, cln) triplets per plane (Annex D pass schedule). The
    mid-point reconstruction offset belongs at THIS plane, not plane 0
    — the reference decoder embeds the half at each sample's
    last-touched plane (reference: t1.cpp oneplushalf/poshalf decode
    updates, scaled out in T1Part1.cpp post_decode), so a truncated
    block reconstructs at the center of its actual decision interval.
    """
    if numbps <= 0 or numpasses <= 0:
        return 0
    return max(0, numbps - 1 - ((numpasses + 1) // 3))


def dequantize(mag: np.ndarray, neg: np.ndarray, stepsize: float,
               half_bit: bool = True, p_min: int = 0) -> np.ndarray:
    """Mid-point reconstruction: (q + 0.5 * 2^p_min) * delta for q > 0,
    where p_min is the block's lowest decoded bit-plane (trunc_plane);
    0 for fully decoded blocks."""
    m = mag.astype(np.float32)
    if half_bit:
        half = np.float32(0.5 * (1 << p_min))
        m = np.where(mag > 0, m + half, m)
    v = m * np.float32(stepsize)
    return np.where(neg > 0, -v, v).astype(np.float32)


def dequantize_signed(coef: np.ndarray, stepsize: float,
                      half_bit: bool = True, p_min: int = 0) -> np.ndarray:
    """Mid-point reconstruction from signed integer coefficients."""
    m = np.abs(coef).astype(np.float32)
    if half_bit:
        half = np.float32(0.5 * (1 << p_min))
        m = np.where(coef != 0, m + half, m)
    v = m * np.float32(stepsize)
    return np.where(coef < 0, -v, v).astype(np.float32)


def rev_trunc_bias(coef: np.ndarray, p_min: int) -> np.ndarray:
    """Reversible-path reconstruction for a TRUNCATED block: place the
    nonzero coefficients at the center of their decoded interval,
    mirroring the reference's one-fractional-bit working data + /2
    truncation (T1Part1.cpp post_decode qmfbid==1). Identity when
    p_min == 0 (full decode stays bit-exact)."""
    if p_min <= 0:
        return coef
    half = np.int32(1 << (p_min - 1))
    mag = np.abs(coef) + np.where(coef != 0, half, 0).astype(np.int32)
    return np.where(coef < 0, -mag, mag).astype(np.int32)


def to_sign_magnitude(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Reversible path: integer coefficients -> (mag, neg)."""
    return np.abs(a).astype(np.uint32), (a < 0).astype(np.uint8)


def from_sign_magnitude(mag: np.ndarray, neg: np.ndarray) -> np.ndarray:
    v = mag.astype(np.int64)
    return np.where(neg > 0, -v, v).astype(np.int32)
