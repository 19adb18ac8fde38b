#!/usr/bin/env python
"""Regenerate the golden decode corpus (tests/corpus/).

The reference pins decoder behavior with 306 MD5 golden hashes over the
nonregression corpus (reference: tests/nonregression/md5refs.txt +
checkmd5refs.cmake). This is our analog: a style-matrix sweep of
codestreams produced by OUR encoder, each decoded once at generation
time to record the plane MD5; tests/test_goldens.py re-decodes every
file each run and compares. Lossless entries are additionally
cross-checked against the reference decoder at generation time when
.refbuild exists (bit-exactness is the interop invariant, so a golden
that the reference can't reproduce fails generation rather than
landing in the corpus).

Run from the repo root:  python tests/tools/gen_corpus.py
Deterministic: fixed seeds, parameters only from the table below.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)

from grokimagecompression_tpu.codestream import decoder, encoder  # noqa
from grokimagecompression_tpu.codestream.markers import PocEntry  # noqa
from grokimagecompression_tpu.core.image import Component, Image  # noqa
from grokimagecompression_tpu.core.params import (  # noqa
    CBLKSTY_HT,
    CBLKSTY_LAZY,
    CBLKSTY_PTERM,
    CBLKSTY_RESET,
    CBLKSTY_SEGSYM,
    CBLKSTY_TERMALL,
    CBLKSTY_VSC,
    EncoderParams,
    Progression,
    Transform,
)

CORPUS = os.path.join(ROOT, "tests", "corpus")
GRK_DECOMPRESS = os.path.join(ROOT, ".refbuild", "bin", "grk_decompress")


def synth(w, h, ncomps=1, prec=8, signed=False, seed=0, subsample=None):
    rng = np.random.default_rng(seed)
    comps = []
    for ci in range(ncomps):
        dx, dy = (1, 1)
        if subsample and ci > 0:
            dx, dy = subsample
        cw = -(-w // dx)
        ch = -(-h // dy)
        yy, xx = np.mgrid[0:ch, 0:cw]
        base = (np.sin(yy / (7.0 + 3 * ci)) * np.cos(xx / (11.0 - 2 * ci))
                * (2 ** (prec - 2)))
        noise = rng.normal(0, 2 ** (prec - 6) + 1, (ch, cw))
        data = np.round(base + noise).astype(np.int64)
        if signed:
            lo, hi = -(2 ** (prec - 1)), 2 ** (prec - 1) - 1
        else:
            data += 2 ** (prec - 1)
            lo, hi = 0, 2 ** prec - 1
        comps.append(Component(data=np.clip(data, lo, hi).astype(np.int32),
                               prec=prec, signed=signed, dx=dx, dy=dy))
    return Image(xsiz=w, ysiz=h, components=comps)


def synth_offset(w, h, x0, y0, ncomps=1, prec=8, seed=0):
    """Image on a canvas with origin (x0, y0): xsiz/ysiz are the canvas
    edges (Annex A SIZ semantics); component planes span the image
    region [XOsiz, Xsiz) x [YOsiz, Ysiz)."""
    rng = np.random.default_rng(seed)
    comps = []
    for _ in range(ncomps):
        cw = -(-(x0 + w) // 1) - x0
        ch = -(-(y0 + h) // 1) - y0
        data = rng.integers(0, 256, (ch, cw)).astype(np.int32)
        comps.append(Component(data=data, prec=prec, signed=False,
                               dx=1, dy=1))
    return Image(x0=x0, y0=y0, xsiz=x0 + w, ysiz=y0 + h, components=comps)


def _plane_md5(img) -> str:
    h = hashlib.md5()
    for c in img.components:
        h.update(np.ascontiguousarray(c.data).tobytes())
    return h.hexdigest()


def _entries():
    """(name, image, params, container, lossless) table.

    Matrix axes (VERDICT round-1 item 8): block styles x progressions x
    subsampling x precision x tile-parts x precincts x POC x ROI x HT.
    """
    E = []

    # --- block-style matrix (Part-1 mode switches + HT), MQ 32x32 ---
    styles = {
        "default": 0,
        "lazy": CBLKSTY_LAZY,
        "reset": CBLKSTY_RESET,
        "termall": CBLKSTY_TERMALL,
        "vsc": CBLKSTY_VSC,
        "pterm": CBLKSTY_PTERM,
        "segsym": CBLKSTY_SEGSYM,
        "lazy_termall": CBLKSTY_LAZY | CBLKSTY_TERMALL,
        "reset_vsc_segsym": CBLKSTY_RESET | CBLKSTY_VSC | CBLKSTY_SEGSYM,
        "all_part1": (CBLKSTY_LAZY | CBLKSTY_RESET | CBLKSTY_TERMALL
                      | CBLKSTY_VSC | CBLKSTY_PTERM | CBLKSTY_SEGSYM),
        "ht": CBLKSTY_HT,
    }
    for nm, sty in styles.items():
        E.append((f"sty_{nm}.j2k", synth(137, 101, seed=1),
                  EncoderParams(cblk_style=sty, numresolutions=4,
                                cblk_w_exp=5, cblk_h_exp=5),
                  "j2k", True))

    # --- progression orders x tiling ---
    for prog in Progression:
        E.append((f"prog_{prog.name.lower()}_tiled.j2k",
                  synth(180, 140, ncomps=3, seed=2),
                  EncoderParams(progression=prog, tile_size=(96, 96),
                                numresolutions=4),
                  "j2k", True))

    # --- precision / signedness ladder ---
    for prec, signed in [(1, False), (4, False), (8, True), (12, False),
                         (14, True), (16, False), (16, True)]:
        sg = "s" if signed else "u"
        E.append((f"prec{prec}{sg}.j2k",
                  synth(90, 70, prec=prec, signed=signed, seed=3),
                  EncoderParams(numresolutions=3),
                  "j2k", True))

    # --- subsampling ---
    for (dx, dy), nm in [((2, 2), "420"), ((2, 1), "422"), ((1, 2), "440"),
                         ((4, 4), "411x")]:
        E.append((f"sub_{nm}.j2k",
                  synth(128, 96, ncomps=3, seed=4, subsample=(dx, dy)),
                  EncoderParams(numresolutions=3, mct=None),
                  "j2k", True))

    # --- precincts + SOP/EPH + PLT ---
    E.append(("precincts_sop_eph.j2k", synth(160, 120, ncomps=3, seed=5),
              EncoderParams(precincts=[(7, 7), (6, 6)], sop_markers=True,
                            eph_markers=True, plt_markers=True,
                            numresolutions=4),
              "j2k", True))
    E.append(("precincts_rpcl_32.j2k", synth(200, 160, seed=6),
              EncoderParams(precincts=[(6, 6)], cblk_w_exp=5, cblk_h_exp=5,
                            progression=Progression.RPCL,
                            numresolutions=5),
              "j2k", True))

    # --- tile-parts (R/L/C splits) + TLM ---
    for flag in ("R", "L", "C"):
        E.append((f"tp_{flag.lower()}_tlm.j2k",
                  synth(128, 128, ncomps=3, seed=7),
                  EncoderParams(tile_size=(64, 64), tp_flag=flag,
                                tlm_markers=True, numresolutions=3,
                                numlayers=2 if flag == "L" else 1,
                                rates=(8.0, 0.0) if flag == "L" else ()),
                  "j2k", True if flag != "L" else False))

    # --- packed headers ---
    E.append(("ppm_tiled.j2k", synth(128, 96, seed=8),
              EncoderParams(tile_size=(64, 48), ppm_markers=True,
                            numresolutions=3),
              "j2k", True))
    E.append(("ppt_tiled.j2k", synth(128, 96, seed=9),
              EncoderParams(tile_size=(64, 48), ppt_markers=True,
                            numresolutions=3),
              "j2k", True))

    # --- POC + ROI ---
    E.append(("poc_2seg.j2k", synth(150, 110, ncomps=3, seed=10),
              EncoderParams(numresolutions=4,
                            pocs=(PocEntry(0, 0, 1, 2, 3, Progression.RLCP),
                                  PocEntry(2, 0, 1, 4, 3,
                                           Progression.CPRL))),
              "j2k", True))
    E.append(("roi_shift6.j2k", synth(120, 90, ncomps=3, seed=11),
              EncoderParams(numresolutions=3, roi_comp=1, roi_shift=6),
              "j2k", True))

    # --- lossy 9/7 ---
    E.append(("lossy97_3layer.j2k", synth(160, 120, ncomps=3, seed=12),
              EncoderParams(transform=Transform.DWT_97,
                            rates=(32.0, 8.0, 2.0), numlayers=3),
              "j2k", False))
    E.append(("lossy97_psnr.j2k", synth(140, 100, seed=13),
              EncoderParams(transform=Transform.DWT_97,
                            quality_psnr=(30.0, 42.0), numlayers=2),
              "j2k", False))
    E.append(("lossy97_ht.j2k", synth(160, 120, seed=14),
              EncoderParams(transform=Transform.DWT_97,
                            cblk_style=CBLKSTY_HT, base_step=1 / 256.0),
              "j2k", False))
    E.append(("lossy97_globalrc.j2k", synth(192, 128, seed=27),
              EncoderParams(transform=Transform.DWT_97,
                            tile_size=(64, 64), rates=(40.0, 12.0),
                            rate_alloc="global"),
              "j2k", False))

    # --- component-heavy / COC overrides ---
    E.append(("multicomp5_coc.j2k", synth(96, 80, ncomps=5, seed=15),
              EncoderParams(numresolutions=3, mct=None,
                            comp_cblk_exps={1: (4, 4), 3: (5, 4)}),
              "j2k", True))

    # --- edge geometries ---
    E.append(("edge_1x1.j2k", synth(1, 1, seed=16),
              EncoderParams(numresolutions=1), "j2k", True))
    E.append(("edge_1wide.j2k", synth(1, 300, seed=17),
              EncoderParams(numresolutions=3), "j2k", True))
    E.append(("edge_1tall.j2k", synth(300, 1, seed=18),
              EncoderParams(numresolutions=3), "j2k", True))
    E.append(("edge_offsets.j2k", synth_offset(97, 83, 3, 5, ncomps=3,
                                               seed=19),
              EncoderParams(numresolutions=3, image_offset=(3, 5),
                            tile_size=(48, 32), tile_offset=(1, 2)),
              "j2k", True))

    # --- containers ---
    E.append(("jp2_rgb.jp2", synth(100, 80, ncomps=3, seed=20),
              EncoderParams(numresolutions=3), "jp2", True))
    E.append(("jp2_gray16.jp2", synth(80, 60, prec=16, seed=21),
              EncoderParams(numresolutions=3), "jp2", True))

    # --- HT x tiling x progression ---
    E.append(("ht_tiled_pcrl.j2k", synth(160, 160, ncomps=3, seed=22),
              EncoderParams(cblk_style=CBLKSTY_HT, tile_size=(80, 80),
                            progression=Progression.PCRL,
                            numresolutions=4),
              "j2k", True))
    E.append(("ht_prec12.j2k", synth(128, 96, prec=12, seed=23),
              EncoderParams(cblk_style=CBLKSTY_HT, numresolutions=4),
              "j2k", True))

    return E


def main():
    from grokimagecompression_tpu.codestream import jp2 as _jp2

    goldens_path = os.path.join(CORPUS, "md5refs.json")
    goldens = json.load(open(goldens_path)) if os.path.exists(
        goldens_path) else {}
    keep = set(goldens)  # never drop existing entries
    n_ref = 0
    for (name, img, params, container, lossless) in _entries():
        cs = encoder.encode(img, params)
        if container == "jp2":
            cs = _jp2.wrap_codestream(
                cs, img.xsiz, img.ysiz,
                [(c.prec, c.signed) for c in img.components])
        out = decoder.decode(cs)
        md5 = _plane_md5(out)
        if lossless:
            assert _plane_md5(img) == md5, f"{name}: lossless mismatch"
        # Cross-check lossless single/0-offset entries with the reference
        # decoder (it can't decode every Part-2 feature we write).
        if (lossless and os.path.exists(GRK_DECOMPRESS)
                and all(c.prec <= 16 for c in img.components)
                and len(img.components) in (1, 3)
                and all(c.dx == c.dy == 1 for c in img.components)
                and not (params.roi_comp is not None)
                and min(c.prec for c in img.components) >= 8
                and not any(c.signed for c in img.components)):
            with tempfile.TemporaryDirectory() as td:
                src = os.path.join(td, name if name.endswith(
                    (".j2k", ".jp2")) else name + ".j2k")
                open(src, "wb").write(cs)
                ext = ".ppm" if len(img.components) == 3 else ".pgm"
                dst = os.path.join(td, "o" + ext)
                r = subprocess.run([GRK_DECOMPRESS, "-i", src, "-o", dst],
                                   capture_output=True)
                assert r.returncode == 0, (name, r.stderr.decode()[:300])
                from grokimagecompression_tpu.io.pnm import read_pnm
                ref = read_pnm(dst)
                assert _plane_md5(ref) == md5, f"{name}: reference differs"
                n_ref += 1
        with open(os.path.join(CORPUS, name), "wb") as f:
            f.write(cs)
        goldens[name] = md5
        print(f"  {name:32s} {len(cs):7d} B  {md5[:12]}"
              + ("  [ref-ok]" if lossless else ""))
    json.dump(goldens, open(goldens_path, "w"), indent=1, sort_keys=True)
    print(f"{len(goldens)} goldens ({len(goldens) - len(keep)} new, "
          f"{n_ref} reference-cross-checked)")


if __name__ == "__main__":
    main()
