"""Golden decode regression corpus — the md5refs.txt analog
(reference: tests/nonregression/md5refs.txt + checkmd5refs.cmake):
fixed codestreams committed under tests/corpus/ must decode to planes
with the recorded MD5s, pinning decoder behavior across rounds."""

import hashlib
import json
import os

import numpy as np
import pytest

from grokimagecompression_tpu.codestream import decoder

CORPUS = os.path.join(os.path.dirname(__file__), "corpus")
GOLDENS = json.load(open(os.path.join(CORPUS, "md5refs.json")))


def _plane_md5(img) -> str:
    h = hashlib.md5()
    for c in img.components:
        h.update(np.ascontiguousarray(c.data).tobytes())
    return h.hexdigest()


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden_decode(name):
    data = open(os.path.join(CORPUS, name), "rb").read()
    out = decoder.decode(data)
    assert _plane_md5(out) == GOLDENS[name], name


@pytest.mark.parametrize("name", ["lossless_gray.j2k", "ht_lossless.j2k",
                                  "lossless_rgb_tiled_rpcl.j2k"])
def test_golden_reference_agrees(name, tmp_path):
    """The reference decoder produces the same planes for the lossless
    corpus entries."""
    import subprocess
    from grokimagecompression_tpu.io.pnm import read_pnm
    BIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin")
    dec = os.path.abspath(os.path.join(BIN, "grk_decompress"))
    if not os.path.exists(dec):
        pytest.skip("reference not built")
    src = os.path.join(CORPUS, name)
    data = open(src, "rb").read()
    ours = decoder.decode(data)
    ext = ".ppm" if len(ours.components) == 3 else ".pgm"
    tmp_in = str(tmp_path / ("c" + name.replace(".", "_") + ".j2k"))
    open(tmp_in, "wb").write(data)
    out = str(tmp_path / ("o" + ext))
    r = subprocess.run([dec, "-i", tmp_in, "-o", out], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:300]
    ref = read_pnm(out)
    assert _plane_md5(ref) == GOLDENS[name]
