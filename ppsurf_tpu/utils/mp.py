"""Worker-pool helpers (parity: reference `source/base/mp.py`).

The reference spawns a spawn-context process pool per metric batch
(`mp.py:23-52`) and computes multi-GPU DDP arguments (`mp.py:74-94`).
CPU-bound batch work (mesh metrics, renders) runs in a real process pool
like the reference; IO-bound or unpicklable work falls back to threads,
and accelerator work stays serial in the main thread's device context.
"""
from __future__ import annotations

import pickle
import threading
import typing
from concurrent.futures import ThreadPoolExecutor


def _picklable(worker_function, parameters) -> bool:
    # probe every tuple: one unpicklable parameter mid-batch would crash
    # the spawn pool's starmap instead of falling back to threads
    try:
        pickle.dumps(worker_function)
        for p in parameters:
            pickle.dumps(p)
        return True
    except Exception:
        return False


def start_process_pool(
    worker_function: typing.Callable,
    parameters: typing.Sequence[typing.Sequence],
    num_processes: int = 1,
) -> typing.Optional[list]:
    """Run worker_function(*params) for each parameter tuple.

    num_processes <= 1 runs serially (required for accelerator work —
    the TPU context lives in the main thread). CPU-bound picklable work
    gets the reference's spawn-context process pool
    (`mp.py:23-52`, maxtasksperchild=1); closures and other unpicklable
    workers use a thread pool instead.
    """
    if len(parameters) == 0:
        return []
    if num_processes <= 1:
        return [worker_function(*p) for p in parameters]
    if _picklable(worker_function, parameters):
        import multiprocessing

        ctx = multiprocessing.get_context("spawn")
        with ctx.Pool(processes=num_processes, maxtasksperchild=1) as pool:
            return pool.starmap(worker_function, parameters)
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
