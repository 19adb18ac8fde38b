"""Shared CLI helpers: format dispatch by extension, logging.

Analog of the reference app common layer (reference: src/bin/common/,
src/bin/jp2/ImageFormat.cpp) with formats dispatched by file suffix.
"""

from __future__ import annotations

import os
import sys

from ..core.image import Image
from ..io import pgx, pnm


def read_image(path: str) -> Image:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pgm", ".ppm", ".pnm"):
        return pnm.read_pnm(path)
    if ext == ".pgx":
        return pgx.read_pgx(path)
    if ext in (".bmp",):
        from ..io import bmp
        return bmp.read_bmp(path)
    if ext in (".raw", ".rawl"):
        raise SystemExit(
            f"raw input needs -F <w>,<h>,<ncomp>,<prec>,[us]@<dx>x<dy>: {path}")
    raise SystemExit(f"unsupported input format: {path}")


def write_image(path: str, image: Image) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pgm", ".ppm", ".pnm"):
        pnm.write_pnm(path, image)
        return
    if ext == ".pgx":
        pgx.write_pgx(path, image)
        return
    if ext == ".bmp":
        from ..io import bmp
        bmp.write_bmp(path, image)
        return
    raise SystemExit(f"unsupported output format: {path}")


def fail(msg: str) -> "SystemExit":
    print(f"error: {msg}", file=sys.stderr)
    raise SystemExit(1)
