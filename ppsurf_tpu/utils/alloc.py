"""Host allocator tuning for sandboxed kernels.

On this class of container the kernel services first-touch page faults at
~10 MB/s (measured: a 142 MB `np.full` took 15.8 s cold, 0.04 s warm), so
any multi-MB numpy buffer that glibc hands back to the OS and re-mmaps is
catastrophically expensive. Keeping freed pages in the process (no trim,
no mmap'd large blocks) makes every allocation after the first warm.

The reference has no analogue — it never runs on such kernels; this is
infrastructure for the reconstruction path's large transient arrays
(volume grids, Morton buffers, marching-cubes outputs).
"""
from __future__ import annotations

_done = False


def tune_host_allocator() -> None:
    """Tell glibc to keep freed memory: trim never, mmap never.

    Idempotent, best-effort (silently a no-op on non-glibc platforms).
    With 128 GB of host RAM the unreleased heap high-water mark (a few GB
    for the largest reconstruction) is a non-issue.
    """
    global _done
    if _done:
        return
    _done = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD, M_MMAP_MAX = -1, -3, -4
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_MMAP_MAX, 0)
    except Exception:
        pass
