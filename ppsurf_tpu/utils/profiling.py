"""Profiling utilities (parity: reference `source/base/profiling.py` plus
TPU-native jax.profiler traces, SURVEY.md §5)."""
from __future__ import annotations

import contextlib
import datetime
import gc
import os
import time
import tracemalloc
import typing


def init_profiling() -> None:
    tracemalloc.start()


def print_duration(func, params: dict, name: str):
    """Time one call (reference `profiling.py:46-52`)."""
    start = time.time()
    result = func(**params)
    print(f"{name} took: {time.time() - start}")
    return result


def print_memory(min_size_mb: float = 0.1) -> None:
    """Largest live objects by size (reference `profiling.py:55-72`)."""
    import sys

    objects = gc.get_objects()
    sizes = [(sys.getsizeof(o) / 1024**2, type(o).__name__) for o in objects]
    big = sorted((s for s in sizes if s[0] > min_size_mb), reverse=True)[:20]
    for size_mb, name in big:
        print(f"{size_mb:8.2f} MB  {name}")


def print_malloc_top(count: int = 10) -> None:
    if not tracemalloc.is_tracing():
        return
    snapshot = tracemalloc.take_snapshot()
    for stat in snapshot.statistics("lineno")[:count]:
        print(stat)


def get_now_str() -> str:
    return str(datetime.datetime.now())


@contextlib.contextmanager
def jax_trace(log_dir: str = "profiles", enabled: bool = True):
    """TPU-native replacement for the reference's PyTorchProfiler preset
    (`configs/profiler.yaml`): captures an xplane/Perfetto trace of the
    enclosed steps viewable in TensorBoard or ui.perfetto.dev."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
