import numpy as np
import pytest

from grokimagecompression_tpu.core.geometry import (
    Rect,
    band_rect,
    build_tile_component_layout,
    ceil_div,
    num_precincts,
    resolution_rect,
    tile_grid_size,
    tile_rect,
)


def test_tile_grid_single():
    assert tile_grid_size(512, 512, 0, 0, 512, 512, 0, 0) == (1, 1)
    assert tile_rect(0, 512, 512, 0, 0, 512, 512, 0, 0) == Rect(0, 0, 512, 512)


def test_tile_grid_8k():
    ntx, nty = tile_grid_size(8192, 8192, 0, 0, 1024, 1024, 0, 0)
    assert (ntx, nty) == (8, 8)
    assert tile_rect(9, 8192, 8192, 0, 0, 1024, 1024, 0, 0) == Rect(1024, 1024, 2048, 2048)


def test_tile_grid_ragged():
    # 1000x700 image, 512 tiles => 2x2 grid with ragged edges
    ntx, nty = tile_grid_size(1000, 700, 0, 0, 512, 512, 0, 0)
    assert (ntx, nty) == (2, 2)
    assert tile_rect(3, 1000, 700, 0, 0, 512, 512, 0, 0) == Rect(512, 512, 1000, 700)


def test_resolution_rects_512():
    tc = Rect(0, 0, 512, 512)
    # 6 resolutions => NL = 5
    assert resolution_rect(tc, 6, 5) == Rect(0, 0, 512, 512)
    assert resolution_rect(tc, 6, 0) == Rect(0, 0, 16, 16)


def test_band_rects_partition_resolution():
    """HL+LL widths must equal the next resolution's width, etc."""
    for tc in [Rect(0, 0, 512, 512), Rect(3, 5, 517, 401), Rect(1, 1, 2, 2),
               Rect(7, 7, 8, 8)]:
        numres = 4
        for r in range(1, numres):
            res = resolution_rect(tc, numres, r)
            prev = resolution_rect(tc, numres, r - 1)
            hl = band_rect(tc, numres, r, 1)
            lh = band_rect(tc, numres, r, 2)
            hh = band_rect(tc, numres, r, 3)
            assert prev.w + hl.w == res.w
            assert prev.h + lh.h == res.h
            assert hl.w == hh.w and lh.h == hh.h
            assert hl.h == prev.h and lh.w == prev.w


def test_layout_cblk_partition():
    """Code-blocks must exactly tile each band (area preserved, no overlap)."""
    tc = Rect(0, 0, 512, 512)
    layout = build_tile_component_layout(tc, 6, 6, 6)
    for res in layout.resolutions:
        for band in res.bands:
            total = 0
            for p in band.precincts:
                for cb in p.cblks:
                    assert not cb.rect.is_empty()
                    assert cb.rect.clip(band.rect) == cb.rect
                    total += cb.rect.area
            assert total == band.rect.area


def test_layout_precincts_cinema():
    """32x32 cblks with 128 precincts => r>0 bands get 64-wide precinct cells."""
    tc = Rect(0, 0, 2048, 1080)
    exps = tuple((7, 7) for _ in range(6))
    layout = build_tile_component_layout(tc, 6, 5, 5, exps)
    r5 = layout.resolutions[5]
    assert r5.num_precincts_w == ceil_div(2048, 128)
    for band in r5.bands:
        for p in band.precincts:
            if not p.rect.is_empty():
                assert p.rect.w <= 64 and p.rect.h <= 64
                for cb in p.cblks:
                    assert cb.rect.w <= 32 and cb.rect.h <= 32


def test_num_precincts_empty_res():
    assert num_precincts(Rect(4, 4, 4, 8), 15, 15) == (0, 0)
