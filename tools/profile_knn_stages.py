"""Empirical stage split of the Pallas kNN kernel on the real TPU.

The kernel's three stages scale along different axes:
- stage 1 (brute block minima) ~ nb (cloud size), independent of k/kb
- stage 2 (block pick)         ~ kb * nb, tiny
- stage 3 gather               ~ kb (one-hot matmul slots)
- stage 3 extraction           ~ k * (kb * S)

Timing kernel variants along k and kb isolates the slopes:
  t(k, kb) ~ C1 + C2*kb + C3*k*kb
so   extraction/tile = C3 * k * kb,  gather = C2 * kb,  stage1+fixed = C1.

Production point: N=60031, Q=49152, k=64, kb=12 (matches
tools/validate_kb12.py and the res-257 chunk shape).

Timing rule (ROADMAP "Hardware/toolchain lessons"): block_until_ready does
not actually wait on this platform — time an np.asarray round trip,
best-of-3 back-to-back in one window, and the transferred value must be
O(bytes)-TINY: a device-side checksum of ids, NOT ids itself. The full
(Q, k) ids array is 12.6 MB at k=64, which costs ~210 ms at the degraded
tunnel bandwidth (~55 MB/s) and dominated the "kernel time" in r5's
first measurements (a do-nothing kernel measured 18.8 us/pass; the
"extraction ~90%" attribution was mostly output-transfer scaling with k).
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


def main() -> int:
    from ppsurf_tpu.ops.knn_pallas import knn_pallas_single
    from ppsurf_tpu.ops.morton import morton_order

    rng = np.random.RandomState(0)
    n, nq = 60031, 49152
    # surface-like cloud: points on a wiggled sphere (what ABC clouds look
    # like locally), queries in a thin shell around it (grid crust queries)
    u = rng.randn(n, 3).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts = u * (1.0 + 0.05 * np.sin(7 * u[:, :1]) * np.cos(5 * u[:, 1:2]))
    uq = rng.randn(nq, 3).astype(np.float32)
    uq /= np.linalg.norm(uq, axis=1, keepdims=True)
    q = (uq * (1.0 + 0.08 * rng.randn(nq, 1))).astype(np.float32)
    pts = pts.astype(np.float32)

    lo, hi = pts.min(0), pts.max(0)
    pts = pts[morton_order(pts, lo, hi)]
    q = q[morton_order(q, lo, hi)]
    pd, qd = jnp.asarray(pts), jnp.asarray(q)

    variants = [
        ("prod k=64 kb=12 tq=256", dict(k=64, tq=256, kb=12)),
        ("k=8  kb=12 tq=256      ", dict(k=8, tq=256, kb=12)),
        ("k=32 kb=12 tq=256      ", dict(k=32, tq=256, kb=12)),
        ("k=64 kb=6  tq=256      ", dict(k=64, tq=256, kb=6)),
        ("k=64 kb=24 tq=256      ", dict(k=64, tq=256, kb=24)),
        ("k=8  kb=2  tq=256      ", dict(k=8, tq=256, kb=2)),
        ("k=64 kb=12 tq=512      ", dict(k=64, tq=512, kb=12)),
        ("k=64 kb=12 tq=1024     ", dict(k=64, tq=1024, kb=12)),
        ("k=192 kb=24 tq=256     ", dict(k=192, tq=256, kb=24)),
        ("k=192 kb=24 tq=512     ", dict(k=192, tq=512, kb=24)),
        ("k=64 kb=0 (full band)  ", dict(k=64, tq=256, kb=0)),
    ]
    stats_kw = dict(return_stats=True)

    @functools.partial(jax.jit, static_argnames=("k", "tq", "kb"))
    def run_summed(pd, qd, k, tq, kb):
        ids, okf = knn_pallas_single(pd, qd, None, k=k, tq=tq, kb=kb,
                                     return_stats=True)
        return jnp.sum(ids, dtype=jnp.int32), okf

    results = {}
    for name, kw in variants:
        try:
            chk, okf = run_summed(pd, qd, **kw)
            np.asarray(chk)  # compile + settle
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                chk, okf = run_summed(pd, qd, **kw)
                np.asarray(chk)
                ts.append(time.perf_counter() - t0)
            okf_np = np.asarray(okf[:, ::512])
            fb = float(okf_np[1].mean())
            results[name] = (min(ts), fb)
            print(f"{name}  best={min(ts)*1e3:8.2f} ms  "
                  f"all={[f'{t*1e3:.1f}' for t in ts]}  tile_fb={fb:.4f}",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}  FAILED: {type(exc).__name__}: {exc}", flush=True)

    if "prod k=64 kb=12 tq=256" in results and "k=8  kb=12 tq=256      " in results:
        t64 = results["prod k=64 kb=12 tq=256"][0]
        t8 = results["k=8  kb=12 tq=256      "][0]
        # extraction ~ k*kb: the k-slope at fixed kb isolates extraction
        extr = (t64 - t8) * 64 / (64 - 8)
        print(f"\n# extraction share at k=64/kb=12: ~{extr/t64*100:.0f}% "
              f"({extr*1e3:.1f} of {t64*1e3:.1f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
