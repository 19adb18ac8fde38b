"""Block-allocated 2-D array — the analog of the reference's sparse
array backing windowed decode (reference:
src/lib/jp2/transform/sparse_array.h, read:326 write:343): only chunks
that are written allocate memory; reads of untouched regions return
zeros. Used so a region decode of a huge tile costs O(window), not
O(tile).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


class SparseArray:
    """Logical (h, w) array stored as a dict of fixed-size chunks."""

    def __init__(self, w: int, h: int, dtype=np.int32, chunk: int = 64):
        self.w = w
        self.h = h
        self.dtype = np.dtype(dtype)
        self.chunk = chunk
        self._chunks: Dict[Tuple[int, int], np.ndarray] = {}

    @property
    def allocated_chunks(self) -> int:
        return len(self._chunks)

    @property
    def allocated_bytes(self) -> int:
        return sum(c.nbytes for c in self._chunks.values())

    def write(self, x0: int, y0: int, data: np.ndarray) -> None:
        """Store `data` at logical position (y0, x0)."""
        h, w = data.shape
        x1, y1 = x0 + w, y0 + h
        if x0 < 0 or y0 < 0 or x1 > self.w or y1 > self.h:
            raise ValueError("sparse write out of bounds")
        cs = self.chunk
        for cy in range(y0 // cs, (y1 + cs - 1) // cs):
            for cx in range(x0 // cs, (x1 + cs - 1) // cs):
                key = (cy, cx)
                blk = self._chunks.get(key)
                if blk is None:
                    blk = np.zeros((cs, cs), dtype=self.dtype)
                    self._chunks[key] = blk
                gx0 = max(x0, cx * cs)
                gy0 = max(y0, cy * cs)
                gx1 = min(x1, (cx + 1) * cs)
                gy1 = min(y1, (cy + 1) * cs)
                blk[gy0 - cy * cs:gy1 - cy * cs,
                    gx0 - cx * cs:gx1 - cx * cs] = \
                    data[gy0 - y0:gy1 - y0, gx0 - x0:gx1 - x0]

    def read(self, x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
        """Return the rectangle [x0,x1) x [y0,y1); untouched chunks read
        as zeros. The rect may extend beyond the logical bounds (padded
        with zeros) to simplify margin reads."""
        w, h = x1 - x0, y1 - y0
        out = np.zeros((h, w), dtype=self.dtype)
        cs = self.chunk
        rx0, ry0 = max(0, x0), max(0, y0)
        rx1, ry1 = min(self.w, x1), min(self.h, y1)
        if rx1 <= rx0 or ry1 <= ry0:
            return out
        for cy in range(ry0 // cs, (ry1 + cs - 1) // cs):
            for cx in range(rx0 // cs, (rx1 + cs - 1) // cs):
                blk = self._chunks.get((cy, cx))
                if blk is None:
                    continue
                gx0 = max(rx0, cx * cs)
                gy0 = max(ry0, cy * cs)
                gx1 = min(rx1, (cx + 1) * cs)
                gy1 = min(ry1, (cy + 1) * cs)
                out[gy0 - y0:gy1 - y0, gx0 - x0:gx1 - x0] = \
                    blk[gy0 - cy * cs:gy1 - cy * cs,
                        gx0 - cx * cs:gx1 - cx * cs]
        return out
