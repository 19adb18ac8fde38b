"""High-level codec API — the one-stop equivalent of the reference's
public C API surface (reference: src/lib/jp2/grok.h grk_compress/
grk_decompress lifecycle) in idiomatic Python.

    from grokimagecompression_tpu import codec

    data = codec.compress(image_array, lossless=True)
    out = codec.decompress(data)

    # or with full control:
    c = codec.Codec(preset="visually_lossless")
    data = c.compress_image(img)                 # core Image object
    img2 = c.decompress_image(data)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import numpy as np

from .codestream import decoder as _decoder
from .codestream import encoder as _encoder
from .codestream import jp2 as _jp2
from .core.image import Component, Image
from .core.params import (
    CBLKSTY_HT,
    DecoderParams,
    EncoderParams,
    Progression,
    Transform,
)

PRESETS = {
    # name: EncoderParams factory
    "lossless": lambda: EncoderParams(),
    "lossless_fast": lambda: EncoderParams(cblk_style=CBLKSTY_HT),
    "visually_lossless": lambda: EncoderParams(
        transform=Transform.DWT_97, quality_psnr=(45.0,)),
    "web": lambda: EncoderParams(
        transform=Transform.DWT_97, rates=(20.0,),
        progression=Progression.RPCL),
    "archival": lambda: EncoderParams(
        numlayers=3, rates=(40.0, 10.0, 0.0)),
}


def to_image(array: np.ndarray, prec: int = 8, signed: bool = False) -> Image:
    """(H, W) or (H, W, C) array -> Image."""
    a = np.asarray(array)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    comps = [
        Component(data=np.ascontiguousarray(a[:, :, c]).astype(np.int32),
                  prec=prec, signed=signed, dx=1, dy=1)
        for c in range(nc)
    ]
    return Image(xsiz=w, ysiz=h, components=comps)


def from_image(image: Image) -> np.ndarray:
    """Image -> (H, W) or (H, W, C) array."""
    planes = [c.data for c in image.components]
    if len(planes) == 1:
        return planes[0]
    return np.stack(planes, axis=-1)


@dataclasses.dataclass
class Codec:
    """Reusable encoder/decoder configuration."""

    params: Optional[EncoderParams] = None
    preset: Optional[str] = None
    container: str = "j2k"          # "j2k" raw codestream | "jp2" boxed
    device: Optional[bool] = None   # True: transforms on the TPU

    def _params(self) -> EncoderParams:
        if self.params is not None:
            return self.params
        if self.preset is not None:
            return PRESETS[self.preset]()
        return EncoderParams()

    def compress_image(self, image: Image) -> bytes:
        cs = _encoder.encode(image, self._params(), device=self.device)
        if self.container == "jp2":
            cs = _jp2.wrap_codestream(
                cs, image.xsiz, image.ysiz,
                [(c.prec, c.signed) for c in image.components])
        return cs

    def decompress_image(self, data: bytes,
                         params: Optional[DecoderParams] = None) -> Image:
        return _decoder.decode(data, params)


def compress(array: np.ndarray, *, lossless: bool = True,
             psnr: Optional[float] = None,
             ratio: Optional[Union[float, Sequence[float]]] = None,
             ht: bool = False,
             prec: int = 8,
             tile_size: Optional[Tuple[int, int]] = None,
             container: str = "j2k",
             device: Optional[bool] = None) -> bytes:
    """One-call compression of a numpy array."""
    kw = {}
    if tile_size:
        kw["tile_size"] = tile_size
    if ht:
        kw["cblk_style"] = CBLKSTY_HT
    if psnr is not None:
        params = EncoderParams(transform=Transform.DWT_97,
                               quality_psnr=(psnr,), **kw)
    elif ratio is not None:
        rates = tuple(ratio) if isinstance(ratio, (tuple, list)) \
            else (float(ratio),)
        params = EncoderParams(transform=Transform.DWT_97, rates=rates,
                               numlayers=len(rates), **kw)
    elif lossless:
        params = EncoderParams(**kw)
    else:
        params = EncoderParams(transform=Transform.DWT_97, **kw)
    img = to_image(array, prec=prec)
    c = Codec(params=params, container=container, device=device)
    return c.compress_image(img)


def compress_batch(arrays: Sequence[np.ndarray], *,
                   workers: int = 0, **kwargs) -> list:
    """Compress a batch of arrays concurrently — the serving-path analog
    of the reference's per-image CLI loop, but with images fanned out
    over a thread pool while each image's native coding stages run with
    a proportional slice of the cores (the native batch entries release
    the GIL). Accepts the same keyword options as compress()."""
    arrays = list(arrays)
    if not arrays:
        return []
    if len(arrays) == 1:
        return [compress(arrays[0], **kwargs)]
    import os
    from concurrent.futures import ThreadPoolExecutor
    ncpu = os.cpu_count() or 1
    # Oversubscribed ~3x: a worker stalled on Python glue frees its
    # core for another image's native coding (same policy as the
    # tile-parallel encoder).
    nw = workers or min(len(arrays), 3 * ncpu)
    inner = max(1, ncpu // nw)

    def one(a):
        try:
            from .native import t1_native
            t1_native.set_thread_override(inner)
        except Exception:
            pass
        try:
            return compress(a, **kwargs)
        finally:
            try:
                t1_native.set_thread_override(None)
            except Exception:
                pass

    with ThreadPoolExecutor(max_workers=nw) as ex:
        return list(ex.map(one, arrays))


def decompress_batch(streams: Sequence[bytes], *,
                     workers: int = 0, **kwargs) -> list:
    """Decompress a batch of codestreams concurrently (see
    compress_batch)."""
    streams = list(streams)
    if not streams:
        return []
    if len(streams) == 1:
        return [decompress(streams[0], **kwargs)]
    import os
    from concurrent.futures import ThreadPoolExecutor
    ncpu = os.cpu_count() or 1
    nw = workers or min(len(streams), 3 * ncpu)
    inner = max(1, ncpu // nw)

    def one(d):
        try:
            from .native import t1_native
            t1_native.set_thread_override(inner)
        except Exception:
            pass
        try:
            return decompress(d, **kwargs)
        finally:
            try:
                t1_native.set_thread_override(None)
            except Exception:
                pass

    with ThreadPoolExecutor(max_workers=nw) as ex:
        return list(ex.map(one, streams))


def decompress(data: bytes, *, reduce: int = 0, layers: int = 0,
               window: Optional[Tuple[int, int, int, int]] = None
               ) -> np.ndarray:
    """One-call decompression to a numpy array."""
    img = _decoder.decode(data, DecoderParams(reduce=reduce, layers=layers,
                                              window=window))
    return from_image(img)
