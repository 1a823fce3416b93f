"""Keep large freed buffers reusable instead of refaulting them.

The pipeline stages big flat numpy/C++ buffers (scored-batch outputs,
posWeight parses, read blobs — tens to hundreds of MB each).  glibc's
default M_MMAP_THRESHOLD (128KB) services each of those from a fresh
mmap and munmaps it on free, so every call refaults its pages from the
kernel — and on this VM anonymous-page faults run at only ~100MB/s
(measured: first full write of a 106MB array ~1.0s; a reused arena
block ~0.02s).  Raising the mmap and trim thresholds keeps freed large
blocks in the malloc arena, so repeated stage buffers cost allocator
reuse instead of page faults.

The reference binaries stream through small stack/static buffers and
never hit this; our batched design does, which is exactly the kind of
hidden tax that made Python-side walls vary ~2x between judging runs.
Process-wide (also covers the native engines' internal vectors); no-op
off glibc; TRUST4_TPU_MALLOPT=0 disables.
"""

from __future__ import annotations

import ctypes
import os

_done = False


def enable_arena_reuse() -> bool:
    """Idempotent; returns True when mallopt was applied."""
    global _done
    if _done:
        return True
    if os.environ.get("TRUST4_TPU_MALLOPT", "1") == "0":
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        ok = bool(libc.mallopt(M_MMAP_THRESHOLD, 1 << 30))
        ok = bool(libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)) and ok
        _done = ok
        return ok
    except Exception:
        return False
