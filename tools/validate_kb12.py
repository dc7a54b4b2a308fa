"""On-device validation for the kb=12 banded-kNN default + aligned buckets.

1. Exactness at production sizes (skill gotcha: interpret mode is NOT
   sufficient — Mosaic has silent-precision traps): N=60031 real ABC
   cloud, Q=49152 grid-like queries, k=50 and k=64, kb=12 and kb=16,
   checked against a chunked numpy brute force on the host.
2. Same-window A/B of the fused 50k chunk at KNN_BAND 12 vs 16 (fresh
   FieldEvaluator per setting; the env var is read at import, so pass
   band explicitly through a private remake).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    # this host first-touches fresh pages at ~10 MB/s (ROADMAP): without
    # allocator tuning the brute force's ~0.5 GB per-chunk temporaries
    # cost minutes instead of seconds
    from ppsurf_tpu.utils.alloc import tune_host_allocator

    tune_host_allocator()

    import jax
    import jax.numpy as jnp

    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.ops.morton import morton_order
    from ppsurf_tpu.ops.knn_pallas import knn_pallas_single

    pts = load_ply(
        "/root/reference/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    lo, hi = pts.min(0), pts.max(0)
    pts = pts[morton_order(pts, lo, hi)]
    rng = np.random.RandomState(0)
    nq = 49152
    base = pts[rng.choice(len(pts), nq)]
    step = float(hi.max() - lo.min()) / 256
    q = (np.round(base / step) * step
         + step * rng.randint(-2, 3, (nq, 3))).astype(np.float32)
    q = q[morton_order(q, lo, hi)]
    pd, qd = jnp.asarray(pts), jnp.asarray(q)

    print("brute force on host (chunked, one pass)...", flush=True)
    kmax = 192
    out = np.empty((nq, kmax), np.float32)
    # GEMM formulation: |q-p|^2 = |q|^2 - 2 q.p + |p|^2. The broadcast
    # (chunk, N, 3) difference tensor is ~1.4 GB per chunk and this host
    # first-touches pages at ~10 MB/s (ROADMAP) — the dot stays in cache.
    # the kernel (and `got` below) use direct f32 differences, and the
    # comparison is atol=0 — so the GEMM only SELECTS candidates (with a
    # tie margin), and the kept distances are recomputed with the exact
    # same direct-f32 formula
    p2 = (pts.astype(np.float64) ** 2).sum(-1)
    ptsT = pts.T.astype(np.float64)
    sel = kmax + 16
    for s in range(0, nq, 2048):
        qc = q[s:s + 2048].astype(np.float64)
        d2g = (qc ** 2).sum(-1)[:, None] - 2.0 * (qc @ ptsT) + p2[None, :]
        cand = np.argpartition(d2g, sel - 1, axis=1)[:, :sel]
        # ADVICE r4: the GEMM keeps only `sel` = kmax+16 candidates before
        # the exact f32 recompute; verify the safety margin is real — the
        # gap between the kmax-th and sel-th GEMM distances must exceed
        # the f32 rounding bound, else a >16-slot f64-vs-f32 rank swap at
        # the kmax boundary could silently corrupt the reference. Fail
        # loudly instead of silently.
        csort = np.sort(np.take_along_axis(d2g, cand, axis=1), axis=1)
        gap = csort[:, sel - 1] - csort[:, kmax - 1]
        bound = 1e-6 * np.maximum(csort[:, kmax - 1], 1e-12)
        bad = int((gap <= bound).sum())
        assert bad == 0, (
            f"brute-force candidate margin too thin for {bad} queries in "
            f"chunk @{s}: raise `sel` (gap_min={gap.min():.3e})")
        d2 = ((q[s:s + 2048, None, :] - pts[cand]) ** 2).sum(-1,
                                                             dtype=np.float32)
        out[s:s + 2048] = np.sort(d2, axis=1)[:, :kmax]
    ref_d = {k: out[:, :k] for k in (50, 64, 192)}
    print("  done", flush=True)

    from ppsurf_tpu.ops.knn_pallas import default_tile

    ok_all = True
    for k, kbs in ((50, (12, 16)), (64, (12, 16)), (192, (24,))):
        for kb in kbs:
            tq = default_tile(k)
            ids, okf = knn_pallas_single(pd, qd, None, k, tq=tq, kb=kb,
                                         return_stats=True)
            ids = np.asarray(ids)
            d2 = ((q[:, None, :] - pts[ids]) ** 2).sum(-1)
            got = np.sort(d2, axis=1)
            exact = np.allclose(got, ref_d[k], rtol=0, atol=0)
            uniq = all(len(np.unique(r)) == k for r in ids[::1024])
            okf_np = np.asarray(okf)
            fb = okf_np[1].mean()
            print(f"k={k} kb={kb}: exact={exact} "
                  f"unique_ids={uniq} tile_fallback={fb:.4f}", flush=True)
            ok_all &= exact and uniq

    # ---- same-window chunk A/B: band 12 vs 16 ----
    from ppsurf_tpu.recon import field as field_mod
    from ppsurf_tpu.recon.field import FieldEvaluator
    from ppsurf_tpu.train.model import ppsurf_spec

    spec = ppsurf_spec(dtype=jnp.bfloat16)
    net = spec.make_network()
    ib = {"pts_ms": jnp.asarray(pts[None, :2048]),
          "pts_query_ms": jnp.asarray(pts[None, :256]),
          "pts_raw_ms": jnp.asarray(pts[None, :2048]),
          "raw_valid": jnp.ones((1, 2048), bool)}
    variables = jax.jit(net.init)(
        jax.random.key(0),
        spec.assemble_step_data(ib, jax.random.key(0), knn_tile=256))
    lat = rng.randn(pts.shape[0], spec.network_latent_size).astype(np.float32)
    qc = (rng.rand(50048, 3).astype(np.float32) - 0.5) * 0.6

    vals = {}
    for band in (16, 12):
        field_mod.KNN_BAND = band
        # KNN_BAND is read at trace time and is NOT part of the lru_cache
        # key — clear the program caches so each setting really compiles
        field_mod._make_chunk_body.cache_clear()
        field_mod._make_eval_chunk.cache_clear()
        ev = FieldEvaluator(net, spec, variables, pts, jnp.asarray(lat),
                            pts_raw=pts, knn_tile=512)
        v = ev(qc)  # compile + warm
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            v = ev(qc)
            ts.append(time.perf_counter() - t0)
        vals[band] = v
        print(f"chunk 50048 @ band={band}: {min(ts) * 1e3:7.1f} ms",
              flush=True)
    dv = np.abs(vals[12] - vals[16]).max()
    print(f"band 12 vs 16 field values: max|dv|={dv:.2e} "
          f"(0 expected — identical exact ids)", flush=True)
    print("ALL OK" if ok_all and dv == 0 else "FAILURES — see above")
    return 0 if ok_all and dv == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
