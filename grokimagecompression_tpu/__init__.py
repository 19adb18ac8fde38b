"""grokimagecompression_tpu: TPU-native JPEG 2000 codec."""

import os as _os

# Persistent XLA compilation cache: the fused device programs take
# 60-90 s to compile over a tunneled remote-compile service; caching
# them on disk makes every process after the first start instantly.
# Opt out with GROK_TPU_JAX_CACHE=0 or by pre-setting the JAX env vars.
if _os.environ.get("GROK_TPU_JAX_CACHE", "1") != "0":
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jaxcache"))
    _os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
