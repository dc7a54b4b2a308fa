"""Same-window A/B of the fused Pallas decoder/PointNet kernels on TPU.

Builds the bench network (random weights), then times the full fused
50k-query chunk with the kernels toggled via FieldEvaluator._fused:
0 = XLA path, 1 = decoder tail, 2 = PointNet, 3 = both. Also checks that
field values agree across paths at bf16 resolution.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.recon.field import FieldEvaluator
    from ppsurf_tpu.train.model import ppsurf_spec

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    spec = ppsurf_spec(dtype=dtype)
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}")

    pts = load_ply(
        "/root/reference/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    n = pts.shape[0]

    net = spec.make_network()
    key = jax.random.key(0)
    init_batch = {
        "pts_ms": jnp.asarray(pts[None, :2048]),
        "pts_query_ms": jnp.asarray(pts[None, :256]),
        "pts_raw_ms": jnp.asarray(pts[None, :2048]),
        "raw_valid": jnp.ones((1, 2048), bool),
    }
    variables = jax.jit(net.init)(
        key, spec.assemble_step_data(init_batch, key, knn_tile=256)
    )
    latents = np.random.RandomState(0).rand(n, spec.network_latent_size)
    latents = latents.astype(np.float32)

    rng = np.random.RandomState(1)
    c = int(os.environ.get("AB_CHUNK", "50000"))
    q = (rng.rand(c, 3).astype(np.float32) - 0.5) * 0.5

    results = {}
    vals = {}
    for mask in (0, 3, 1, 2):
        ev = FieldEvaluator(
            net, spec, variables, pts, latents, pts_raw=pts, knn_tile=512
        )
        ev._fused = mask
        # rebuild the chunk program with the override
        from ppsurf_tpu.recon import field as F

        ev._eval_chunk = F._make_eval_chunk(
            ev.net, spec.is_ppsurf, spec.num_pts_local, ev._spec_k,
            ev.shared_cloud, ev.knn_tile, None, ev._projected, mask,
        )
        t0 = time.perf_counter()
        vals[mask] = ev(q)
        compile_t = time.perf_counter() - t0
        results[mask] = best_of(lambda: ev(q))
        print(
            f"fused={mask}: chunk {c} = {results[mask] * 1e3:7.1f} ms "
            f"(first call incl. compile {compile_t:.1f} s)",
            flush=True,
        )

    for mask in (1, 2, 3):
        d = np.abs(vals[mask] - vals[0])
        print(
            f"fused={mask} vs XLA: max|dv|={d.max():.3e} "
            f"p99={np.quantile(d, 0.99):.3e} "
            f"sign flips={(np.sign(vals[mask]) != np.sign(vals[0])).sum()}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
