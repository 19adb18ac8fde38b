"""Multi-host encode: a REAL 2-process jax.distributed cluster on the
CPU backend must produce the single-process encoder's bytes exactly.

This is the test strategy SURVEY.md §4 prescribes for testing without a
real pod: the same goldens at 1-process and N-process shardings must
agree bit-for-bit."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_WORKER = r"""
import os, sys, pickle
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
sys.path.insert(0, os.environ["GROK_REPO"])
sys.path.insert(0, os.path.join(os.environ["GROK_REPO"], "tests"))
from grokimagecompression_tpu.parallel import multihost
import multihost_cases

pid = int(sys.argv[1])
multihost.init_distributed(os.environ["GROK_COORD"], 2, pid)
img, params = multihost_cases.make_case(os.environ["GROK_MH_MODE"])
cs = multihost.encode_multihost(img, params)
out = os.environ["GROK_OUT"] + f".{pid}"
open(out, "wb").write(cs)
print("proc", pid, "bytes", len(cs))
"""


def _run_two_process_case(tmp_path, mode: str) -> bytes:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out = str(tmp_path / "mh")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["GROK_REPO"] = REPO
    env["GROK_COORD"] = f"localhost:{port}"
    env["GROK_OUT"] = out
    env["GROK_MH_MODE"] = mode
    env["JAX_PLATFORMS"] = "cpu"
    script = str(tmp_path / "worker.py")
    open(script, "w").write(_WORKER)
    procs = [subprocess.Popen([sys.executable, script, str(i)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]

    cs0 = open(out + ".0", "rb").read()
    cs1 = open(out + ".1", "rb").read()
    assert cs0 == cs1 and len(cs0) > 0
    return cs0


@pytest.mark.skipif(os.environ.get("GROK_TPU_SKIP_MULTIHOST") == "1",
                    reason="multi-process test disabled")
def test_two_process_encode_byte_identical(tmp_path):
    cs0 = _run_two_process_case(tmp_path, "lossless")

    # and byte-identical to a plain single-process encode
    from grokimagecompression_tpu.codestream import encoder
    import multihost_cases
    img, params = multihost_cases.make_case("lossless")
    seq = encoder.encode(img, params, device=False)
    assert cs0 == seq


@pytest.mark.skipif(os.environ.get("GROK_TPU_SKIP_MULTIHOST") == "1",
                    reason="multi-process test disabled")
def test_two_process_global_pcrd_byte_identical(tmp_path):
    """rate_alloc='global' across 2 real processes: the PCRD collective
    (per-tile R-D summaries gathered over the process mesh, replicated
    bisection) must reproduce the single-process global allocation
    byte-for-byte."""
    cs0 = _run_two_process_case(tmp_path, "global-pcrd")

    from grokimagecompression_tpu.codestream import encoder
    import multihost_cases
    img, params = multihost_cases.make_case("global-pcrd")
    seq = encoder.encode(img, params, device=False)
    assert cs0 == seq
    # the rate target actually bound the stream
    raw = sum(c.data.size for c in img.components)
    assert len(cs0) < raw // 6
