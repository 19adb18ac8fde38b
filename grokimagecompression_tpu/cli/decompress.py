"""grk_decompress-compatible decoder CLI.

Mirrors the reference decoder CLI's core options (reference:
src/bin/jp2/grk_decompress.cpp main:1122): -i/-o, -r reduce, -l layers,
-d decode window, -t tile index. Run as
`python -m grokimagecompression_tpu.cli.decompress`.
"""

from __future__ import annotations

import argparse
import sys
import time

from ..core.params import DecoderParams
from ..codestream import decoder
from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="grk_decompress",
        description="TPU-native JPEG 2000 decoder (Grok-compatible CLI)")
    p.add_argument("-i", "--in-file", required=True)
    p.add_argument("-o", "--out-file", required=True)
    p.add_argument("-r", "--reduce", type=int, default=0,
                   help="discard this many highest resolution levels")
    p.add_argument("-l", "--layers", type=int, default=0,
                   help="decode only the first N quality layers (0 = all)")
    p.add_argument("-d", "--decode-window",
                   help="window x0,y0,x1,y1 in canvas coordinates")
    p.add_argument("-t", "--tile", type=int, default=None,
                   help="decode a single tile by index")
    p.add_argument("--force-rgb", action="store_true",
                   help="convert grayscale output to RGB")
    p.add_argument("--upsample", action="store_true",
                   help="replicate subsampled components to the full grid")
    p.add_argument("--no-color", action="store_true",
                   help="skip automatic sYCC/eYCC/CMYK -> RGB conversion")
    p.add_argument("--split-pnm", action="store_true",
                   help="write each component to its own PGM file "
                        "(out_0.pgm, out_1.pgm, ...)")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    with open(args.in_file, "rb") as f:
        data = f.read()
    window = None
    if args.decode_window:
        parts = [int(v) for v in args.decode_window.split(",")]
        if len(parts) != 4:
            common.fail("-d expects x0,y0,x1,y1")
        window = tuple(parts)
    params = DecoderParams(reduce=args.reduce, layers=args.layers,
                           window=window, tile_index=args.tile)
    t0 = time.perf_counter()
    image = decoder.decode(data, params)
    dt = time.perf_counter() - t0
    # Post-decode color policy (reference: grk_decompress.cpp:1585-1622).
    from ..codestream import jp2 as _jp2
    from ..io import color as _color
    cs = None
    icc_profile = None
    if _jp2.is_jp2(data):
        hdr, _ = _jp2.read_jp2(data)
        cs = hdr.colourspace
        icc_profile = hdr.icc_profile
    if icc_profile and not args.no_color:
        # Embedded ICC (JP2 colr meth=2): matrix-shaper profiles convert
        # to sRGB here (reference: color_apply_icc_profile via lcms);
        # LUT-based profiles pass through untouched.
        from ..io import icc as _icc
        converted = _icc.apply_icc(image, icc_profile)
        if converted is not None:
            image = converted
    if args.upsample:
        image = _color.upsample(image)
    if not args.no_color:
        image = _color.apply_color(image, colourspace=cs,
                                   force_rgb=args.force_rgb)
    elif args.force_rgb and len(image.components) < 3:
        image = _color.gray_to_rgb(image)
    if args.split_pnm:
        import os as _os
        from ..core.image import Image as _Image
        base, ext = _os.path.splitext(args.out_file)
        for ci, comp in enumerate(image.components):
            common.write_image(
                f"{base}_{ci}.pgm",
                _Image(x0=image.x0, y0=image.y0, xsiz=image.xsiz,
                       ysiz=image.ysiz, components=[comp]))
    else:
        common.write_image(args.out_file, image)
    if args.verbose:
        c0 = image.components[0].data
        print(f"decoded {len(data)} bytes -> {c0.shape[1]}x{c0.shape[0]}"
              f"x{len(image.components)} in {dt*1000:.1f} ms", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
