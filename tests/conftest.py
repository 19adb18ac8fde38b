"""Test configuration: force an 8-device virtual CPU platform so that
multi-chip sharding tests run without TPU hardware (the driver separately
dry-runs the multichip path on its own virtual mesh, and benches run on the
real chip).

The environment pre-imports jax with the TPU ('axon') backend registered;
switching config *before any backend is initialized* still works, so this
must run at conftest import time, before any test imports touch a jax
array.  Set GROK_TPU_TESTS=1 to run the suite on the real device instead.
"""

import os

# The suite jit-compiles hundreds of XLA CPU programs; their code/data
# mappings exceed the kernel's default vm.max_map_count (65530), which
# kills the process with SIGSEGV inside mmap-ing XLA code (observed at
# ~61k maps, always at the first compile/deserialize past the cap).
# Raise the cap when we can (root in the dev container); otherwise the
# suite still runs — just keep an eye on very long sessions.
# GROK_TPU_NO_SYSCTL=1 opts out entirely (e.g. locked-down CI).
if os.environ.get("GROK_TPU_NO_SYSCTL", "") != "1":
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            if int(f.read()) < 262144:
                with open("/proc/sys/vm/max_map_count", "w") as f:
                    f.write("1048576")
    except (OSError, ValueError):
        pass

if os.environ.get("GROK_TPU_TESTS", "") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    # Persistent compilation cache: the fused decode/encode scan
    # programs take minutes to compile on the CPU backend; cache them
    # across test processes (the axon TPU plugin manages its own cache).
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


# ---- shared test helpers (import-light; numpy only) ----------------------

def psnr(a, b, peak=255.0):
    """PSNR in dB between two integer sample arrays."""
    import numpy as np
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))
                  ** 2)
    return 99.0 if mse == 0 else float(10 * np.log10(peak * peak / mse))


def natural_image(w, h, ncomp=1, seed=None, prec=8):
    """Natural-image-like content (smooth waves + noise): realistic T1
    workloads and meaningful rate-control targets, unlike max-entropy
    noise."""
    import numpy as np
    from grokimagecompression_tpu.core.image import Component, Image
    rng = np.random.default_rng(17 if seed is None else seed)
    yy, xx = np.mgrid[0:h, 0:w]
    mid = 1 << (prec - 1)
    amp = mid // 2
    comps = []
    for c in range(ncomp):
        d = (mid + amp * np.sin(yy / (13.0 + 3 * c)) * np.cos(xx / 11.0)
             + rng.normal(0, mid / 16.0, (h, w))).clip(
                 0, (1 << prec) - 1).astype(np.int32)
        comps.append(Component(data=d, prec=prec, signed=False,
                               dx=1, dy=1))
    return Image(xsiz=w, ysiz=h, components=comps)
