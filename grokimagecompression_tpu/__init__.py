"""grokimagecompression_tpu: TPU-native JPEG 2000 codec."""

import os as _os

# Persistent XLA compilation cache: the fused device programs take
# 60-90 s to compile over a tunneled remote-compile service; caching
# them on disk makes every process after the first start instantly.
# Opt out with GROK_TPU_JAX_CACHE=0 or by pre-setting the JAX env vars.
if _os.environ.get("GROK_TPU_JAX_CACHE", "1") != "0" \
        and "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    # jax.config.update, not env vars: the environment pre-imports jax
    # (sitecustomize), so the env route would be read too late.
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jaxcache"))
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - jax absent or too old
        pass
