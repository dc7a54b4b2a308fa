"""Break down reconstruction field-eval cost on the real TPU.

Times, per component (best of `reps` after warmup):
  - null dispatch round trip (host<->device latency over the tunnel)
  - Pallas kNN k=64 alone at the production chunk sizes
  - the full fused eval_chunk (kNN + decoder + PointNet + MLP)
  - from_latent alone (decoder + PointNet + MLP, proj_ids precomputed)

Usage: python tools/profile_field.py [chunk ...]
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
    from ppsurf_tpu.ops.graph import build_proj_ids
    from ppsurf_tpu.ops.patches import patch_space
    from ppsurf_tpu.recon.field import FieldEvaluator
    from ppsurf_tpu.train.model import ppsurf_spec

    chunks = [int(a) for a in sys.argv[1:]] or [50000, 6250]

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    spec = ppsurf_spec(dtype=dtype)
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}")

    pts = load_ply(
        "/root/reference/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    n = pts.shape[0]
    print(f"cloud: {n} points")

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
    latents = np.random.RandomState(0).rand(n, spec.network_latent_size).astype(
        np.float32
    )

    # --- null dispatch ---
    tiny = jax.jit(lambda x: x + 1.0)
    xd = jnp.zeros((8, 128), jnp.float32)
    np.asarray(tiny(xd))
    t = best_of(lambda: np.asarray(tiny(xd)), reps=10)
    print(f"null dispatch round trip: {t * 1e3:.1f} ms")

    evaluator = FieldEvaluator(
        net, spec, variables, pts, latents, pts_raw=pts, knn_tile=512
    )
    pts_dev = evaluator.pts
    lat_dev = evaluator.latents

    # --- from_latent alone (jit with proj_ids as input) ---
    @jax.jit
    def from_latent_only(variables, pts_all, lat, queries, proj_ids):
        patch_ids = proj_ids[..., : spec.num_pts_local]
        patches = jnp.take_along_axis(
            pts_all[:, None, :, :], patch_ids[..., None], axis=2
        )
        data = {
            "pts": pts_all,
            "pts_query": queries,
            "latents": lat,
            "proj_ids": proj_ids,
            "pts_local_ps": patch_space(patches, queries),
        }
        logits = net.apply(variables, data, method=net.from_latent)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs[0, :, 0] - probs[0, :, 1]

    rng = np.random.RandomState(1)
    for c in chunks:
        q = (rng.rand(c, 3).astype(np.float32) - 0.5) * 0.5
        qd = jnp.asarray(q)[None]

        # kNN alone
        ids = build_proj_ids(pts_dev, qd, k=spec.k, tile=512)
        jax.block_until_ready(ids)
        t_knn = best_of(
            lambda: jax.block_until_ready(
                build_proj_ids(pts_dev, qd, k=spec.k, tile=512)
            )
        )

        # from_latent alone
        v = from_latent_only(variables, pts_dev, lat_dev, qd, ids)
        jax.block_until_ready(v)
        t_fl = best_of(
            lambda: jax.block_until_ready(
                from_latent_only(variables, pts_dev, lat_dev, qd, ids)
            )
        )

        # full fused chunk (pads internally to a bucket)
        evaluator(q)
        t_full = best_of(lambda: evaluator(q))

        print(
            f"chunk {c:6d}: knn={t_knn * 1e3:7.1f} ms  "
            f"from_latent={t_fl * 1e3:7.1f} ms  full={t_full * 1e3:7.1f} ms  "
            f"({c / t_full / 1e3:.0f}k q/s)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
