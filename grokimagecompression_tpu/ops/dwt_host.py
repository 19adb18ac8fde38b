"""Host DWT dispatch: native C++ fast path with numpy fallback (the host
analog of the reference's Wavelet strategy selection, reference:
src/lib/jp2/transform/Wavelet.cpp:35). Set GROK_TPU_DWT=python to force
the numpy oracle."""

from __future__ import annotations

import os

from . import dwt_np

_native = None
_checked = False


def _get_native():
    global _native, _checked
    if _checked:
        return _native
    _checked = True
    if os.environ.get("GROK_TPU_DWT", "") == "python":
        return None
    try:
        from ..native import dwt_native
        _native = dwt_native
    except Exception:
        _native = None
    return _native


def fwd_dwt_2d(a, rect, numresolutions, reversible=True):
    nat = _get_native()
    if nat is not None:
        return nat.fwd_dwt_2d(a, rect, numresolutions, reversible)
    return dwt_np.fwd_dwt_2d(a, rect, numresolutions, reversible=reversible)


def inv_dwt_2d(bands, rect, numresolutions, reversible=True, max_res=None):
    nat = _get_native()
    if nat is not None:
        return nat.inv_dwt_2d(bands, rect, numresolutions, reversible,
                              max_res=max_res)
    return dwt_np.inv_dwt_2d(bands, rect, numresolutions,
                             reversible=reversible, max_res=max_res)
