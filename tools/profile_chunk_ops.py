"""Per-op attribution of the fused field-eval chunk on the real TPU.

Times each component of the production 50k-query PPSurf chunk body
(recon/field.py _make_chunk_body) in isolation, all under the checksum
timing rule (ROADMAP "Hardware/toolchain lessons"): block_until_ready
does not wait on this platform and large output transfers masquerade as
kernel time, so every timed program reduces its result to a scalar on
device and the host transfers ~4 bytes.

Components:
  knn            banded Pallas kNN (k=64, kb=12, tq=512)
  body_full      the shipped chunk body (kNN inside)
  body_noknn     chunk body with proj_ids precomputed
  gather_lat     (C, k, L) latent gather + (C, k, 3) pts gather + rel
  decoder_tail   Pallas decoder kernel on pre-gathered x/rel (+fc8)
  patch_gather   shared-path patch ids gather + patch_space
  pointnet       Pallas PointNet on pre-extracted patches
  mlp_tail       from_latent fusion MLP + softmax on fake features

body_noknn - (gather+decoder+patch+pointnet+mlp) = XLA glue/pads/copies.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_chunk_ops.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps: int = 3, depth: int = 10):
    """Compile+settle, then per-call device time with the dispatch floor
    amortized: submit `depth` async calls back-to-back and sync ONCE (the
    remote platform has a ~26 ms per-round-trip latency that a single
    submit-sync window misattributes to the kernel), best of `reps`."""
    np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = None
        for _ in range(depth):
            r = fn(*args)
        np.asarray(r)
        ts.append((time.perf_counter() - t0) / depth)
    return min(ts)


def main() -> int:
    from ppsurf_tpu.cli import load_checkpoint_variables
    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.ops.graph import build_proj_ids
    from ppsurf_tpu.ops.morton import morton_order
    from ppsurf_tpu.recon import field as field_mod
    from ppsurf_tpu.recon.field import FieldEvaluator
    from ppsurf_tpu.train.model import ppsurf_spec

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    spec = ppsurf_spec(dtype=dtype)
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 50048  # 128-aligned bucket
    kb = field_mod.KNN_BAND

    pts = load_ply(
        "/root/reference/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    n = pts.shape[0]
    npz = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models_pretrained",
        "ppsurf_mini_infer.npz")
    variables = load_checkpoint_variables(npz)
    latents = np.random.RandomState(0).rand(
        n, spec.network_latent_size).astype(np.float32)
    net = spec.make_network()

    ev = FieldEvaluator(net, spec, variables, pts, latents, pts_raw=pts,
                        knn_tile=512)
    print(f"backend={jax.default_backend()} dtype={dtype.__name__} "
          f"chunk={c} k={spec.k} kb={kb} L={spec.network_latent_size} "
          f"P={spec.num_pts_local} fused={ev._fused} "
          f"projected={ev._projected}", flush=True)

    # near-surface queries, Morton-sorted like the evaluator does
    rng = np.random.RandomState(1)
    base = pts[rng.randint(0, n, c)]
    q = (base + 0.01 * rng.randn(c, 3)).astype(np.float32)
    q = q[morton_order(q, *ev._bbox)]
    qd = jnp.asarray(q)[None]

    pts_dev, lat_dev = ev.pts, ev.latents
    var_dev = ev.variables
    raw, rawv = ev.pts_raw, ev.raw_valid
    L, k, P, H = spec.network_latent_size, spec.k, spec.num_pts_local, 64
    results = {}

    def rec(name, t):
        results[name] = t
        print(f"{name:14s} {t * 1e3:8.2f} ms", flush=True)

    # --- knn alone ---
    @jax.jit
    def knn_only(pa, qa):
        ids = build_proj_ids(pa, qa, k=spec.k, tile=512, kb=kb)
        return jnp.sum(ids, dtype=jnp.int32)

    rec("knn", timed(knn_only, pts_dev, qd))
    ids = build_proj_ids(pts_dev, qd, k=spec.k, tile=512, kb=kb)
    ids = jax.block_until_ready(ids)

    # --- full shipped body (kNN inside) vs proj_ids precomputed ---
    from ppsurf_tpu.recon.field import _make_chunk_body

    body = _make_chunk_body(net, spec.is_ppsurf, spec.num_pts_local,
                            ev._spec_k, ev.shared_cloud, 512, None,
                            ev._projected, ev._fused)

    @jax.jit
    def body_full(v, pa, la, qa, ra, rv):
        return jnp.sum(body(v, pa, la, qa, ra, rv).astype(jnp.float32))

    @jax.jit
    def body_noknn(v, pa, la, qa, ra, rv, pids):
        return jnp.sum(
            body(v, pa, la, qa, ra, rv, proj_ids=pids).astype(jnp.float32))

    rec("body_full", timed(body_full, var_dev, pts_dev, lat_dev, qd, raw, rawv))
    rec("body_noknn", timed(body_noknn, var_dev, pts_dev, lat_dev, qd, raw,
                            rawv, ids))

    # --- latent + pts gathers + rel ---
    from ppsurf_tpu.models.fkaconv import gather_neighbors

    @jax.jit
    def gather_lat(la, pa, qa, pids):
        x = gather_neighbors(la, pids)[0]  # (C, k, L)
        neigh = gather_neighbors(pa, pids)[0]  # (C, k, 3)
        rel = (qa[0][:, None, :] - neigh).astype(la.dtype)
        return (jnp.sum(x.astype(jnp.float32))
                + jnp.sum(rel.astype(jnp.float32)))

    rec("gather_lat", timed(gather_lat, lat_dev, pts_dev, qd, ids))

    # --- decoder tail Pallas on pre-gathered operands (+fc8) ---
    if ev._fused & 1:
        from ppsurf_tpu.ops.decoder_pallas import decoder_tail_pallas

        x_pre = jax.block_until_ready(gather_neighbors(lat_dev, ids)[0])
        neigh = gather_neighbors(pts_dev, ids)[0]
        rel_pre = jax.block_until_ready(
            (qd[0][:, None, :] - neigh).astype(lat_dev.dtype))
        pp = var_dev["params"]["projection"]

        @jax.jit
        def dec_tail(x, rel):
            pooled = decoder_tail_pallas(
                x, rel, pp["fc1"]["kernel"],
                pp["fc2"]["kernel"], pp["fc2"]["bias"],
                pp["fc3"]["kernel"], pp["fc3"]["bias"],
                pp["fc_query"]["kernel"], pp["fc_query"]["bias"],
                pp["fc_value"]["kernel"], pp["fc_value"]["bias"],
                k=spec.k, heads=H,
            )
            feat = jnp.dot(pooled, pp["fc8"]["kernel"].astype(x.dtype),
                           preferred_element_type=jnp.float32)
            return jnp.sum(feat)

        rec("decoder_tail", timed(dec_tail, x_pre, rel_pre))

    # --- patch gather + patch_space (shared-kNN path) ---
    from ppsurf_tpu.ops.patches import patch_space

    @jax.jit
    def patch_g(pa, qa, pids):
        patch_ids = pids[..., :P]
        patches = jnp.take_along_axis(
            pa[:, None, :, :], patch_ids[..., None], axis=2)
        return jnp.sum(patch_space(patches, qa).astype(jnp.float32))

    rec("patch_gather", timed(patch_g, pts_dev, qd, ids))

    # --- PointNet Pallas on pre-extracted patches ---
    if ev._fused & 2:
        from ppsurf_tpu.ops.pointnet_pallas import pointnet_att_pallas

        patch_ids = ids[..., :P]
        patches = jnp.take_along_axis(
            pts_dev[:, None, :, :], patch_ids[..., None], axis=2)
        pl_ps = jax.block_until_ready(
            patch_space(patches, qd)[0].astype(lat_dev.dtype))

        @jax.jit
        def pn(x):
            f = pointnet_att_pallas(
                x, var_dev["params"]["point_net"],
                var_dev["batch_stats"]["point_net"], p_real=P)
            return jnp.sum(f.astype(jnp.float32))

        rec("pointnet", timed(pn, pl_ps))

    # --- residual ---
    known = sum(v for n2, v in results.items()
                if n2 in ("gather_lat", "decoder_tail", "patch_gather",
                          "pointnet"))
    print(f"\nbody_noknn={results['body_noknn'] * 1e3:.1f} ms, "
          f"sum(parts)={known * 1e3:.1f} ms, "
          f"glue/pads={max(0.0, results['body_noknn'] - known) * 1e3:.1f} ms"
          f"\nknn-in-context={max(0.0, results['body_full'] - results['body_noknn']) * 1e3:.1f}"
          f" ms (alone: {results['knn'] * 1e3:.1f} ms)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
