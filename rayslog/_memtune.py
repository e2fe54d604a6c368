"""Allocator tuning for lazy-page-fault environments.

On this sandbox's microVM kernel, first-touch page faults cost ~35 ms/MB,
so every *fresh* large allocation (glibc serves them with mmap and
returns the pages on free) re-pays the fault storm: numpy kernels run
~100x slower than warm-memory speed.  Keeping freed pages resident fixes
it:

- glibc: ``mallopt(M_MMAP_MAX, 0)`` (serve large blocks from the brk
  heap) + a huge ``M_TRIM_THRESHOLD`` (never return heap to the OS);
- Arrow: disable jemalloc's dirty-page decay so the Arrow memory pool
  retains its arenas.

Harmless on normal kernels (slightly higher steady-state RSS, which a
long-running Ray worker wants anyway).  Imported for its side effect by
``rayslog.__init__`` so every Ray worker process is tuned on first use.
"""

from __future__ import annotations

_done = False


def tune() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_MAX = -1, -4
        libc.mallopt(M_MMAP_MAX, 0)
        libc.mallopt(M_TRIM_THRESHOLD, 2**30)
    except Exception:
        pass
    try:
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass
