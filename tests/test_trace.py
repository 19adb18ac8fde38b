"""Stage tracing / observability."""

import numpy as np

from grokimagecompression_tpu.codestream import decoder, encoder
from grokimagecompression_tpu.core.image import Component, Image
from grokimagecompression_tpu.core.params import EncoderParams
from grokimagecompression_tpu.utils import trace


def test_trace_collects_stages():
    trace.reset()
    trace.enable()
    try:
        rng = np.random.default_rng(0)
        img = Image(xsiz=96, ysiz=64, components=[
            Component(data=rng.integers(0, 256, (64, 96)).astype(np.int32),
                      prec=8, signed=False, dx=1, dy=1)])
        cs = encoder.encode(img, EncoderParams(numresolutions=3))
        decoder.decode(cs)
        snap = trace.snapshot()
        assert "enc.t1" in snap and snap["enc.t1"]["calls"] == 1
        assert "enc.dwt" in snap and snap["enc.dwt"]["bytes"] > 0
        assert "enc.t2" in snap
        assert "dec.t1" in snap
        rep = trace.report()
        assert "enc.t1" in rep and "MB/s" in rep
    finally:
        trace.disable()
        trace.reset()


def test_trace_disabled_is_silent():
    trace.reset()
    assert not trace.enabled() or True
    rng = np.random.default_rng(1)
    img = Image(xsiz=32, ysiz=32, components=[
        Component(data=rng.integers(0, 256, (32, 32)).astype(np.int32),
                  prec=8, signed=False, dx=1, dy=1)])
    encoder.encode(img, EncoderParams(numresolutions=2))
    assert trace.snapshot() == {}
