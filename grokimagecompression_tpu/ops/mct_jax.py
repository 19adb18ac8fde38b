"""Device (JAX) multiple-component transforms, DC shift, and quantization.

Elementwise VPU work that XLA fuses straight into the DWT pipeline
(reference semantics: src/lib/jp2/mct/mct.cpp:85-477, the per-thread SIMD
chunking there is replaced by whole-array XLA fusion).
"""

from __future__ import annotations

import jax.numpy as jnp

C_ICT_FWD = (
    (0.299, 0.587, 0.114),
    (-0.16875, -0.331260, 0.5),
    (0.5, -0.41869, -0.08131),
)


def rct_fwd(r, g, b):
    y = (r + 2 * g + b) >> 2
    u = b - g
    v = r - g
    return y, u, v


def rct_inv(y, u, v):
    g = y - ((u + v) >> 2)
    r = v + g
    b = u + g
    return r, g, b


def ict_fwd(r, g, b):
    r = r.astype(jnp.float32)
    g = g.astype(jnp.float32)
    b = b.astype(jnp.float32)
    y = jnp.float32(0.299) * r + jnp.float32(0.587) * g + jnp.float32(0.114) * b
    cb = (jnp.float32(-0.16875) * r + jnp.float32(-0.331260) * g
          + jnp.float32(0.5) * b)
    cr = (jnp.float32(0.5) * r + jnp.float32(-0.41869) * g
          + jnp.float32(-0.08131) * b)
    return y, cb, cr


def ict_inv(y, cb, cr):
    y = y.astype(jnp.float32)
    cb = cb.astype(jnp.float32)
    cr = cr.astype(jnp.float32)
    r = y + jnp.float32(1.402) * cr
    g = y - jnp.float32(0.34413) * cb - jnp.float32(0.71414) * cr
    b = y + jnp.float32(1.772) * cb
    return r, g, b


def dc_shift_fwd(a, prec: int, signed: bool):
    if signed:
        return a
    return a - (1 << (prec - 1))


def dc_shift_inv(a, prec: int, signed: bool):
    if signed:
        lo, hi = -(1 << (prec - 1)), (1 << (prec - 1)) - 1
        return jnp.clip(a, lo, hi)
    a = a + (1 << (prec - 1))
    return jnp.clip(a, 0, (1 << prec) - 1)


def quantize(a, stepsize: float):
    """Deadzone scalar quantizer on device: (mag uint32, neg bool)."""
    mag = jnp.floor(jnp.abs(a) / jnp.float64(stepsize)).astype(jnp.uint32)
    neg = a < 0
    return mag, neg


def to_sign_magnitude(a):
    return jnp.abs(a).astype(jnp.uint32), a < 0
