"""Isolate the cost driver of the kNN kernel's extraction passes.

The extraction stage is ~90% of kernel time (tools/profile_knn_stages.py)
at ~27 us per pass, yet op-count models predict ~2-4 us — and three
structurally different implementations (flat in-place, two-level slab,
gather-on-demand) all landed within 10% of the same floor. This bench
times stripped-down pallas kernels that run k passes over a resident
(ncand, tq) slab with PARTS of the real pass body removed, so the cost
attributes to specific primitives (cross-sublane min reduce, masked-iota
argmin, mask write-back, (tq,)->broadcast relayouts, fori_loop overhead).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_extract.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(variant: str, k: int, ncand: int, tq: int):
    def kernel(cand_in_ref, out_ref, cand_ref):
        cand_ref[:] = cand_in_ref[:]
        crow = jax.lax.broadcasted_iota(jnp.int32, (ncand, tq), 0)
        BIG = jnp.float32(4e12)

        if variant == "noop":
            out_ref[:] = jnp.zeros((k, tq), jnp.float32)
            return

        def body(i, _):
            cand = cand_ref[:]
            if variant == "min_only":
                m = jnp.min(cand, axis=0)
                out_ref[i, :] = m
                return 0
            if variant == "min_argmin":
                m = jnp.min(cand, axis=0, keepdims=True)
                pos = jnp.min(jnp.where(cand <= m, crow, ncand), axis=0)
                out_ref[i, :] = pos.astype(jnp.float32)
                return 0
            if variant == "min_mask":
                m = jnp.min(cand, axis=0, keepdims=True)
                cand_ref[:] = jnp.where(cand <= m, BIG, cand)
                out_ref[i, :] = m[0, :]
                return 0
            if variant == "full":
                m = jnp.min(cand, axis=0, keepdims=True)
                pos = jnp.min(jnp.where(cand <= m, crow, ncand), axis=0)
                cand_ref[:] = jnp.where(crow == pos[None, :], BIG, cand)
                out_ref[i, :] = pos.astype(jnp.float32)
                return 0
            if variant == "sum_only":
                # no reduction-to-scalar-row: plain elementwise+row sum
                out_ref[i, :] = jnp.sum(cand, axis=0)
                return 0
            if variant == "elementwise":
                # one elementwise op over the slab, writes back; no reduce
                cand_ref[:] = cand + 1.0
                out_ref[i, :] = cand[0, :]
                return 0
            raise ValueError(variant)

        jax.lax.fori_loop(0, k, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "k", "tq"))
def run(cand, variant: str, k: int, tq: int):
    """Returns a SCALAR checksum: transferring the full (k, Q) output to
    host costs ~200 ms at the degraded tunnel bandwidth (~55 MB/s) and
    was misattributed as kernel time in the first version of this bench
    (the do-nothing variant measured 18.8 us/pass!). All timing transfers
    must be O(bytes)-tiny."""
    ncand = cand.shape[0]
    grid = cand.shape[1] // tq
    out = pl.pallas_call(
        make_kernel(variant, k, ncand, tq),
        grid=(grid,),
        in_specs=[pl.BlockSpec((ncand, tq), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, tq), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, cand.shape[1]), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ncand, tq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(cand)
    return jnp.sum(out, dtype=jnp.float32)


def main() -> int:
    rng = np.random.RandomState(0)
    ncand, q, k, tq = 1536, 49152, 64, 256
    cand = jnp.asarray(rng.rand(ncand, q).astype(np.float32))
    ntiles = q // tq
    passes = k * ntiles

    for variant in ("noop", "elementwise", "sum_only", "min_only",
                    "min_argmin", "min_mask", "full"):
        try:
            np.asarray(run(cand, variant, k, tq))  # compile + settle
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(cand, variant, k, tq))
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            print(f"{variant:12s} best={best*1e3:8.2f} ms  "
                  f"per-pass={best/passes*1e6:6.2f} us  "
                  f"all={[f'{t*1e3:.1f}' for t in ts]}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{variant:12s} FAILED: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:160]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
