"""Cumulative ablation of the fused field-eval chunk program on TPU.

The component microbenchmarks (tools/bench_kernels.py) sum to ~100 ms but
the full 50k chunk runs ~270 ms — this tool attributes the gap by timing
jitted PREFIXES of the exact chunk composition (recon/field.py
_make_chunk_body), each on the same inputs:

  A  kNN only (build_proj_ids)
  B  A + decoder branch (latent gather + pallas tail + fc8)
  C  B + shared-kNN patch extraction (gather + patch_space)
  D  C + fused PointNet branch
  E  full chunk program (reference composition incl. MLP head + softmax)

Every stage returns a small reduction so XLA cannot dead-code the work,
but beware: a reduction can also let XLA SKIP output materialization it
would otherwise do; treat small deltas as noise.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(label, fn, reps=4):
    t0 = time.perf_counter()
    np.asarray(fn())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(ts) * 1e3:8.1f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return min(ts)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.ops.graph import build_proj_ids
    from ppsurf_tpu.ops.patches import patch_space
    from ppsurf_tpu.ops.decoder_pallas import decoder_tail_pallas
    from ppsurf_tpu.ops.pointnet_pallas import pointnet_att_pallas
    from ppsurf_tpu.models.fkaconv import gather_neighbors
    from ppsurf_tpu.recon.field import FieldEvaluator, KNN_BAND
    from ppsurf_tpu.train.model import ppsurf_spec

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    spec = ppsurf_spec(dtype=dtype)
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}")

    pts = load_ply(
        "/root/reference/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    net = spec.make_network()
    rng = np.random.RandomState(0)
    init_batch = {
        "pts_ms": jnp.asarray(pts[None, :2048]),
        "pts_query_ms": jnp.asarray(pts[None, :256]),
        "pts_raw_ms": jnp.asarray(pts[None, :2048]),
        "raw_valid": jnp.ones((1, 2048), bool),
    }
    variables = jax.jit(net.init)(
        jax.random.key(0), spec.assemble_step_data(init_batch, jax.random.key(0), knn_tile=256)
    )
    latents = rng.randn(pts.shape[0], spec.network_latent_size).astype(np.float32)

    ev = FieldEvaluator(net, spec, variables, pts, jnp.asarray(latents),
                       pts_raw=pts, knn_tile=512)
    C = spec.rec_batch_size
    queries = (rng.rand(C, 3).astype(np.float32) - 0.5) * 0.6
    from ppsurf_tpu.ops.morton import morton_order

    q = queries[morton_order(queries, *ev._bbox)]
    qd = jnp.asarray(q)[None]

    pts_all, lat, var = ev.pts, ev.latents, ev.variables
    k, P, tile = ev._spec_k, spec.num_pts_local, ev.knn_tile
    pp = var["params"]["projection"]

    def knn_only(qd):
        ids = build_proj_ids(pts_all, qd, k=k, tile=tile, kb=KNN_BAND)
        return ids.sum()

    def decoder(qd):
        ids = build_proj_ids(pts_all, qd, k=k, tile=tile, kb=KNN_BAND)
        x = gather_neighbors(lat, ids)[0]
        neigh = gather_neighbors(pts_all, ids)[0]
        rel = (qd[0][:, None, :] - neigh).astype(lat.dtype)
        pooled = decoder_tail_pallas(
            x, rel, pp["fc1"]["kernel"], pp["fc2"]["kernel"], pp["fc2"]["bias"],
            pp["fc3"]["kernel"], pp["fc3"]["bias"],
            pp["fc_query"]["kernel"], pp["fc_query"]["bias"],
            pp["fc_value"]["kernel"], pp["fc_value"]["bias"], k=k, heads=64,
        )
        feat = jnp.dot(pooled, pp["fc8"]["kernel"].astype(lat.dtype),
                       preferred_element_type=jnp.float32).astype(lat.dtype)
        return feat.sum(), ids

    def patches(qd):
        s, ids = decoder(qd)
        patch_ids = ids[..., :P]
        pl_ps = patch_space(
            jnp.take_along_axis(pts_all[:, None, :, :], patch_ids[..., None],
                                axis=2), qd)
        return s + pl_ps.sum(), pl_ps

    def pointnet(qd):
        s, pl_ps = patches(qd)
        feat_pn = pointnet_att_pallas(
            pl_ps[0].astype(lat.dtype), var["params"]["point_net"],
            var["batch_stats"]["point_net"], p_real=pl_ps.shape[2])
        return s + feat_pn.sum()

    timeit("A kNN", jax.jit(lambda: knn_only(qd)))
    timeit("B A+decoder(gather+tail+fc8)", jax.jit(lambda: decoder(qd)[0]))
    timeit("C B+patch extract", jax.jit(lambda: patches(qd)[0]))
    timeit("D C+pointnet", jax.jit(lambda: pointnet(qd)))
    timeit("E full chunk", lambda: ev._eval_chunk(
        var, pts_all, lat, qd, ev.pts_raw, ev.raw_valid))
    return 0


if __name__ == "__main__":
    sys.exit(main())
