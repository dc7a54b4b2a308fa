"""Worker-pool helpers (parity: reference `source/base/mp.py`).

The reference spawns a process pool per metric batch
(`mp.py:23-52`) and computes multi-GPU DDP arguments (`mp.py:74-94`).
Here heavy metric math runs on the accelerator, so the pool degrades to a
thread pool for IO-bound work; the multi-device helper reports the mesh
configuration instead of DDP flags.
"""
from __future__ import annotations

import threading
import typing
from concurrent.futures import ThreadPoolExecutor


def start_process_pool(
    worker_function: typing.Callable,
    parameters: typing.Sequence[typing.Sequence],
    num_processes: int = 1,
) -> typing.Optional[list]:
    """Run worker_function(*params) for each parameter tuple.

    IO-bound work parallelizes over threads; accelerator work must stay in
    the main thread's TPU context, so num_processes <= 1 runs serially.
    """
    if len(parameters) == 0:
        return []
    if num_processes <= 1:
        return [worker_function(*p) for p in parameters]
    with ThreadPoolExecutor(max_workers=num_processes) as pool:
        futures = [pool.submit(worker_function, *p) for p in parameters]
        return [f.result() for f in futures]


def start_thread(func: typing.Callable, args: typing.Sequence = ()) -> threading.Thread:
    t = threading.Thread(target=func, args=args, daemon=True)
    t.start()
    return t


def get_multi_device_params(batch_size_total: int = 50) -> dict:
    """Per-device batch sizing over the data mesh (replaces the reference's
    DDP argument emitter `mp.py:74-94`, which kept global batch ~50)."""
    import jax

    n = max(1, len(jax.devices()))
    per_device = max(1, batch_size_total // n)
    return {
        "num_devices": n,
        "batch_size": per_device * n,
        "per_device_batch": per_device,
    }
