"""Attribute the refine phase's per-chunk cost on the real TPU.

Refine at res 257 is ~16 s for ~487k verts (10 chunks x 10 scanned
bisection iterations) — as large as the whole grow phase. The candidate
path (recon/field.py _make_refine_cand_chunk) splits per chunk into:

  A  candidate kNN: one kc=192 / kb=24 banded query at the edge midpoints
  B  per-iter selection: d2 over (C, kc) + top_k(spec_k) + id gather
  C  per-iter field body with precomputed proj_ids (latent gather +
     decoder tail + patches + PointNet + head)
  D  full candidate refine chunk (10 iters)   [= A + 10*(B + C) + eps]
  E  full plain refine chunk (10 iters)       [= 10 * full-kNN body]

Timing rule (ROADMAP): np.asarray round trips, best-of-N back-to-back.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(label, fn, reps=3):
    t0 = time.perf_counter()
    np.asarray(fn())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} {min(ts) * 1e3:8.1f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return min(ts)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.ops.graph import build_proj_ids
    from ppsurf_tpu.recon.field import (
        KNN_BAND, REFINE_CAND_K, FieldEvaluator, _make_chunk_body,
        _make_refine_cand_chunk, _make_refine_chunk,
    )
    from ppsurf_tpu.train.model import ppsurf_spec

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    spec = ppsurf_spec(dtype=dtype)
    print(f"backend={jax.default_backend()} dtype={dtype.__name__} "
          f"kc={REFINE_CAND_K} kb={KNN_BAND}")

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
        jax.random.key(0),
        spec.assemble_step_data(init_batch, jax.random.key(0), knn_tile=256),
    )
    latents = rng.randn(pts.shape[0], spec.network_latent_size).astype(
        np.float32)

    ev = FieldEvaluator(net, spec, variables, pts, jnp.asarray(latents),
                        pts_raw=pts, knn_tile=512)
    C = ev.chunk
    iters = spec.gen_refine_iter
    # synthetic res-257-like bisection state: vertices near the cloud with
    # tiny edges (the refine workload's geometry)
    vi = rng.randint(0, pts.shape[0], C)
    h = 1.0 / 256
    v1 = pts[vi] + (rng.rand(C, 3).astype(np.float32) - 0.5) * h
    v2 = v1 + (rng.rand(C, 3).astype(np.float32) - 0.5) * h
    v = 0.5 * (v1 + v2)
    p1 = np.ones(C, np.float32)
    p2 = -np.ones(C, np.float32)
    from ppsurf_tpu.ops.morton import morton_order

    o = morton_order(v, *ev._bbox)
    v, v1, v2 = v[o], v1[o], v2[o]

    pts_all, lat, var = ev.pts, ev.latents, ev.variables
    raw, rawv = ev.pts_raw, ev.raw_valid
    args = tuple(jnp.asarray(a) for a in (v, v1, v2, p1, p2))
    k = ev._spec_k
    kc = REFINE_CAND_K
    md = jnp.asarray(0.5 * (v1 + v2))

    def cand_knn():
        return build_proj_ids(pts_all, md[None], k=kc, tile=ev.knn_tile,
                              kb=2 * KNN_BAND).sum()

    ids_c = jax.jit(lambda: build_proj_ids(
        pts_all, md[None], k=kc, tile=ev.knn_tile, kb=2 * KNN_BAND)[0])()
    np.asarray(ids_c)
    cpts = jnp.take(pts_all[0], ids_c, axis=0)

    def select_iter():
        d2 = jnp.sum((md[:, None, :].astype(jnp.float32)
                      - cpts.astype(jnp.float32)) ** 2, -1)
        _, loc = jax.lax.top_k(-d2, k)
        return jnp.take_along_axis(ids_c, loc, axis=1).sum()

    def select_iter_pallas():
        from ppsurf_tpu.ops.knn_pallas import topk_rows_pallas

        d2 = jnp.sum((md[:, None, :].astype(jnp.float32)
                      - cpts.astype(jnp.float32)) ** 2, -1)
        loc = topk_rows_pallas(d2.T, k=k).T
        return jnp.take_along_axis(ids_c, loc, axis=1).sum()

    if on_tpu:
        # device equality at the SHIPPED config (VERDICT r4 #6): the
        # interpret-mode test runs tq=128; this is tq=512 on real Mosaic
        from ppsurf_tpu.ops.knn_pallas import topk_rows_pallas

        d2dev = jax.jit(lambda: jnp.sum(
            (md[:, None, :].astype(jnp.float32)
             - cpts.astype(jnp.float32)) ** 2, -1))()
        got = np.asarray(topk_rows_pallas(d2dev.T, k=k, tq=512).T)
        ref = np.asarray(jax.lax.top_k(-d2dev, k)[1])
        eq = np.array_equal(got, ref)
        print(f"topk_rows_pallas(tq=512) vs lax.top_k at "
              f"(C={d2dev.shape[0]}, kc={kc}, k={k}): "
              f"{'EXACT' if eq else 'MISMATCH'}", flush=True)
        assert eq

    ids_k = jax.jit(lambda: jnp.take_along_axis(
        ids_c, jax.lax.top_k(-jnp.sum(
            (md[:, None, :].astype(jnp.float32)
             - cpts.astype(jnp.float32)) ** 2, -1), k)[1], axis=1))()
    np.asarray(ids_k)

    body = _make_chunk_body(net, spec.is_ppsurf, spec.num_pts_local, k,
                            ev.shared_cloud, ev.knn_tile, None,
                            ev._projected, ev._fused)

    def body_preids():
        return body(var, pts_all, lat, md[None], raw, rawv,
                    proj_ids=ids_k[None]).sum()

    def body_fullknn():
        return body(var, pts_all, lat, md[None], raw, rawv).sum()

    refine_cand = _make_refine_cand_chunk(
        net, spec.is_ppsurf, spec.num_pts_local, k, ev.shared_cloud,
        ev.knn_tile, None, iters, kc, ev._projected, ev._fused)
    refine_full = _make_refine_chunk(
        net, spec.is_ppsurf, spec.num_pts_local, k, ev.shared_cloud,
        ev.knn_tile, None, iters, ev._projected, ev._fused)

    ta = timeit("A cand kNN kc=192 kb=24 (once/chunk)", jax.jit(cand_knn))
    tb = timeit("B per-iter select (d2+top_k+take)", jax.jit(select_iter))
    if on_tpu:
        timeit("B2 per-iter select (topk_rows_pallas)",
               jax.jit(select_iter_pallas))
    tc = timeit("C per-iter body w/ precomputed ids", jax.jit(body_preids))
    tf = timeit("F per-iter body w/ full kNN", jax.jit(body_fullknn))
    td = timeit(f"D cand refine chunk ({iters} iters)",
                lambda: refine_cand(var, pts_all, lat, raw, rawv, *args)[0])
    te = timeit(f"E plain refine chunk ({iters} iters)",
                lambda: refine_full(var, pts_all, lat, raw, rawv, *args))
    print(f"\n# model: A + {iters}*(B+C) = "
          f"{(ta + iters * (tb + tc)) * 1e3:.1f} ms vs D {td * 1e3:.1f} ms; "
          f"{iters}*F = {iters * tf * 1e3:.1f} ms vs E {te * 1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
