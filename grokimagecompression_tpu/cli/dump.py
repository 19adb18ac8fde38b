"""grk_dump-compatible codestream inspector.

Prints the main-header structure and tile-part index of a J2K codestream
(reference: src/bin/jp2/grk_dump.cpp main:360, library dump
src/lib/jp2/codestream/j2k_dump.cpp:127). Run as
`python -m grokimagecompression_tpu.cli.dump`.
"""

from __future__ import annotations

import argparse
import struct
import sys

from ..core.params import Progression, QuantStyle, Transform
from ..codestream import decoder, markers


def dump_codestream(data: bytes, out=None) -> None:
    out = out if out is not None else sys.stdout
    hdr = decoder.read_header(data)
    siz, cod, qcd = hdr.siz, hdr.cod, hdr.qcd
    w = out.write
    w("Image info {\n")
    w(f"\t x0={siz.xosiz}, y0={siz.yosiz}\n")
    w(f"\t x1={siz.xsiz}, y1={siz.ysiz}\n")
    w(f"\t numcomps={len(siz.comps)}\n")
    for i, c in enumerate(siz.comps):
        w(f"\t component {i} {{ dx={c.dx}, dy={c.dy}, prec={c.prec},"
          f" sgnd={int(c.signed)} }}\n")
    w("}\n")
    w("Codestream info {\n")
    w(f"\t tx0={siz.xtosiz}, ty0={siz.ytosiz}\n")
    w(f"\t tdx={siz.xtsiz}, tdy={siz.ytsiz}\n")
    from ..core.geometry import tile_grid_size
    ntx, nty = tile_grid_size(siz.xsiz, siz.ysiz, siz.xosiz, siz.yosiz,
                              siz.xtsiz, siz.ytsiz, siz.xtosiz, siz.ytosiz)
    w(f"\t tw={ntx}, th={nty}\n")
    w("\t coding parameters {\n")
    w(f"\t\t prog={Progression(cod.progression).name}\n")
    w(f"\t\t numlayers={cod.numlayers}\n")
    w(f"\t\t mct={cod.mct}\n")
    w(f"\t\t numresolutions={cod.numresolutions}\n")
    w(f"\t\t cblkw=2^{cod.cblk_w_exp}, cblkh=2^{cod.cblk_h_exp}\n")
    w(f"\t\t cblksty={cod.cblk_style}\n")
    xform = "5-3 reversible" if cod.transform == Transform.DWT_53 \
        else "9-7 irreversible"
    w(f"\t\t qmfbid={xform}\n")
    if cod.precincts:
        pstr = " ".join(f"({px},{py})" for (px, py) in cod.precincts)
        w(f"\t\t precincts={pstr}\n")
    w(f"\t\t sop={int(cod.sop)}, eph={int(cod.eph)}\n")
    qs = {QuantStyle.NONE: "none (reversible)",
          QuantStyle.SCALAR_DERIVED: "scalar derived",
          QuantStyle.SCALAR_EXPOUNDED: "scalar expounded"}[qcd.style]
    w(f"\t\t quantization style={qs}, guard bits={qcd.num_guard_bits}\n")
    w("\t }\n")
    w("}\n")
    for com in hdr.comments:
        w(f"Comment: {com}\n")
    w("Tile-part index {\n")
    pos = hdr.main_header_end
    i = 0
    for tp in decoder.iter_tile_parts(data, pos):
        w(f"\t tile-part {i}: tile={tp.tile_index},"
          f" body_bytes={len(tp.body)}\n")
        i += 1
    w("}\n")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="grk_dump",
        description="Dump JPEG 2000 codestream structure")
    p.add_argument("-i", "--in-file", required=True)
    p.add_argument("-o", "--out-file", default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    with open(args.in_file, "rb") as f:
        data = f.read()
    if data[:4] == b"\x00\x00\x00\x0c":
        # JP2 container: locate the jp2c box.
        from ..codestream import jp2
        data = jp2.extract_codestream(data)
    if args.out_file:
        with open(args.out_file, "w") as f:
            dump_codestream(data, f)
    else:
        dump_codestream(data)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
