"""Native (C++) kernels: T1/MQ, HT, DWT, T2 — built on first import.

Importing this package also raises glibc's mmap threshold so the 1-4 MB
numpy buffers the pipeline churns through are served from the reusable
heap instead of fresh mmap/munmap pairs (each of which costs a page-fault
sweep on first touch — ~1 ms per 4 MB).
"""

import ctypes
import ctypes.util


def _tune_malloc() -> None:
    try:
        libc = ctypes.CDLL(None)
        M_MMAP_THRESHOLD = -3
        M_TRIM_THRESHOLD = -1
        libc.mallopt(M_MMAP_THRESHOLD, 64 * 1024 * 1024)
        libc.mallopt(M_TRIM_THRESHOLD, 128 * 1024 * 1024)
    except Exception:
        pass  # non-glibc platforms: harmless no-op


_tune_malloc()
