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
_gc_done = False


def freeze_gc(debug: bool = False) -> None:
    """Move the current object graph out of GC tracking and stretch the
    gen-2 threshold.

    After JAX has compiled the reconstruction programs the process holds
    millions of long-lived Python objects (jaxprs, caches, tracer types);
    a single gen-2 collection then costs SECONDS of CPU, and it fires in
    whatever numpy-allocating call crosses the threshold — measured as
    2-16 s spikes wandering between mesh-cleanup steps on identical
    inputs (cpu==wall, no page faults). gc.freeze() takes the live graph
    out of every future collection; the raised gen-2 threshold bounds
    full collections over whatever accumulates afterwards. Collection
    stays ENABLED — cycles created later are still reclaimed.

    Call after warmup / program compilation. Idempotent; PPSURF_NO_GC_TUNE=1
    disables. debug=True (or PPSURF_EVAL_DEBUG=1) logs collections >50 ms.
    """
    global _gc_done
    import gc
    import os
    import time

    if os.environ.get("PPSURF_NO_GC_TUNE") == "1":
        return
    if debug or os.environ.get("PPSURF_EVAL_DEBUG") == "1":
        state = {}

        def _cb(phase, info):
            if phase == "start":
                state["t"] = time.perf_counter()
            elif "t" in state:
                dt = time.perf_counter() - state.pop("t")
                if dt > 0.05:
                    print(
                        f"#     gc[gen{info['generation']}]: {dt:6.2f}s",
                        flush=True,
                    )

        if not any(getattr(c, "__name__", "") == "_cb" for c in gc.callbacks):
            gc.callbacks.append(_cb)
    # freeze() is cheap (no collection pass) and incremental: each call
    # moves everything currently tracked into the permanent generation,
    # so calling once per shape keeps newly compiled programs out of
    # future collections too
    gc.freeze()
    if not _gc_done:
        _gc_done = True
        g0, g1, _ = gc.get_threshold()
        gc.set_threshold(g0, g1, 1000)


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
