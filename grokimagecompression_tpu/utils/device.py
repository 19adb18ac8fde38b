"""Default device-routing policy.

A TPU-native framework on an accelerator machine should ride the chip
by default: when the caller does not pass `device=` and GROK_TPU_DEVICE
is unset, encode/decode auto-select the device pipeline iff a non-CPU
JAX backend is present (VERDICT r3 #9). GROK_TPU_DEVICE=1/0 forces the
choice either way without touching call sites; the scope gates in the
fused paths still fall back to the host pipeline per tile when a
feature is out of device scope.
"""

from __future__ import annotations

import os


def device_default() -> bool:
    """Resolve the `device=None` default for encode/decode."""
    v = os.environ.get("GROK_TPU_DEVICE", "")
    if v == "1":
        return True
    if v == "0":
        return False
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - jax init failure
        return False
