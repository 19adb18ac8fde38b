"""Multiple-component transforms and DC level shift — numpy reference.

RCT (reversible, Annex G.2) and ICT (irreversible) plus DC level shifting,
mirroring the reference (reference: src/lib/jp2/mct/mct.cpp:85 encode_rev,
:143 decode_rev, :195 encode_irrev, :352 decode_irrev) as pure functions.
"""

from __future__ import annotations

import numpy as np

# MCT component norms used by PCRD distortion weighting
# (reference: src/lib/jp2/mct/mct.cpp:67-72).
MCT_NORMS_REV = (1.732, 0.8292, 0.8292)
MCT_NORMS_IRREV = (1.732, 1.805, 1.573)


def rct_fwd(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    """Reversible color transform (int): Y=(R+2G+B)>>2, U=B-G, V=R-G."""
    y = (r + 2 * g + b) >> 2
    u = b - g
    v = r - g
    return y, u, v


def rct_inv(y: np.ndarray, u: np.ndarray, v: np.ndarray):
    g = y - ((u + v) >> 2)
    r = v + g
    b = u + g
    return r, g, b


_ICT_FWD = np.array([[0.299, 0.587, 0.114],
                     [-0.16875, -0.331260, 0.5],
                     [0.5, -0.41869, -0.08131]], dtype=np.float32)


def ict_fwd(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    """Irreversible color transform (float): RGB -> YCbCr. One BLAS
    matmul instead of 15 elementwise temporaries."""
    shape = np.asarray(r).shape
    stack = np.stack([np.asarray(p, np.float32).ravel()
                      for p in (r, g, b)], axis=0)
    out = _ICT_FWD @ stack
    return (out[0].reshape(shape), out[1].reshape(shape),
            out[2].reshape(shape))


def ict_inv(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    y = np.asarray(y, np.float32)
    cb = np.asarray(cb, np.float32)
    cr = np.asarray(cr, np.float32)
    r = y + 1.402 * cr
    g = y - 0.34413 * cb - 0.71414 * cr
    b = y + 1.772 * cb
    return (r.astype(np.float32), g.astype(np.float32), b.astype(np.float32))


def dc_shift_fwd(a: np.ndarray, prec: int, signed: bool) -> np.ndarray:
    if signed:
        return a
    return a - (1 << (prec - 1))


def dc_shift_inv(a: np.ndarray, prec: int, signed: bool) -> np.ndarray:
    if signed:
        lo, hi = -(1 << (prec - 1)), (1 << (prec - 1)) - 1
        return np.clip(a, lo, hi)
    a = a + (1 << (prec - 1))
    return np.clip(a, 0, (1 << prec) - 1)


def custom_fwd(arrays, matrix):
    """Arbitrary-matrix MCT forward (Part 2): out_j = sum_k M[j,k] in_k
    (reference: src/lib/jp2/mct/mct.cpp encode_custom:429)."""
    import numpy as _np
    stack = _np.stack([a.astype(_np.float32) for a in arrays], axis=0)
    out = _np.einsum("jk,k...->j...", _np.asarray(matrix, _np.float32),
                     stack)
    return [out[j].astype(_np.float32) for j in range(out.shape[0])]


def custom_inv(arrays, decode_matrix):
    """Arbitrary-matrix MCT inverse: the codestream carries the DECODING
    matrix, applied directly (reference: mct.cpp decode_custom:477)."""
    return custom_fwd(arrays, decode_matrix)
