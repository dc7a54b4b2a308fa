"""Device smoke gate: compile every Pallas kernel at production shapes.

Run this on the real TPU before ANY commit that touches `ops/` or
`recon/field.py` (VERDICT r4 #8): the pytest suite is CPU-only
(interpret mode) by design and cannot catch a TPU-only Mosaic
compile failure — the r4 round shipped a k=192/tq=256 tile bump that
OOMed scoped VMEM (105.65 MB vs the 100 MiB cap) only at compile time
on device, inside the measured bench window.

Checks (each also exactness-spot-checked against a small host brute
force where applicable):
  1. kNN grow config:      k=64,  kb=12, tq=default (clamped), N=60031
  2. kNN candidate config: k=192, kb=24, tq=default (clamped)
  3. topk_rows_pallas at the shipped config (kc=192, k=64, tq=512)
  4. one fused 50k field-evaluation chunk (decoder tail + PointNet
     Pallas kernels inside)
Flags:
  --refine  also compile the full-size candidate-refinement program
            (the exact program that OOMed in r4; adds ~3-5 min)

Exit 0 = all compiles + exactness checks green. Prints per-step wall
times so regressions in compile cost are visible too.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _brute_ids_check(pts, q, ids, k):
    """Exactness: sorted distances of returned ids == brute-force k-NN."""
    d2 = ((q[:, None, :] - pts[np.asarray(ids)]) ** 2).sum(-1)
    got = np.sort(d2, axis=1)
    dg = ((q[:, None, :].astype(np.float32)
           - pts[None, :, :].astype(np.float32)) ** 2).sum(-1)
    ref = np.sort(dg, axis=1)[:, :k]
    return np.array_equal(got, ref)


def main() -> int:
    from ppsurf_tpu.utils.alloc import tune_host_allocator

    tune_host_allocator()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("device_smoke requires a TPU backend; got "
              f"{jax.default_backend()}", file=sys.stderr)
        return 2

    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.ops.morton import morton_order
    from ppsurf_tpu.ops.knn_pallas import (clamp_tile, default_tile,
                                           knn_pallas_single,
                                           topk_rows_pallas)

    pts = load_ply(
        "/root/reference/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    lo, hi = pts.min(0), pts.max(0)
    pts = pts[morton_order(pts, lo, hi)]
    rng = np.random.RandomState(0)
    nq = 2048  # small Q: same compiled kernel (the program is shaped by
    # (k, nb, tq, kb), not the grid count), cheap exactness check
    q = pts[rng.choice(len(pts), nq)] + rng.randn(nq, 3).astype(np.float32) * 0.01
    q = q[morton_order(q, lo, hi)].astype(np.float32)
    pd, qd = jnp.asarray(pts), jnp.asarray(q)

    ok_all = True

    def step(label, fn):
        nonlocal ok_all
        t0 = time.perf_counter()
        try:
            ok = fn()
        except Exception as exc:  # noqa: BLE001 — report and fail the gate
            print(f"[FAIL] {label}: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}"
                  f"  ({time.perf_counter() - t0:.1f}s)", flush=True)
            ok_all = False
            return
        state = "ok" if ok else "EXACTNESS-FAIL"
        ok_all &= bool(ok)
        print(f"[{state:>4}] {label}  ({time.perf_counter() - t0:.1f}s)",
              flush=True)

    for k, kb in ((64, 12), (192, 24)):
        tq = default_tile(k)
        tq_eff = clamp_tile(k, pts.shape[0], tq)
        def knn_step(k=k, kb=kb, tq=tq):
            ids = knn_pallas_single(pd, qd, None, k, tq=tq, kb=kb)
            return _brute_ids_check(pts, q, ids, k)
        step(f"knn_pallas k={k} kb={kb} tq={tq}->(clamped){tq_eff} "
             f"nb={(pts.shape[0] + (-pts.shape[0]) % 1024) // 128}", knn_step)

    def topk_step():
        c = 50176
        d2 = rng.rand(192, c).astype(np.float32)
        got = topk_rows_pallas(jnp.asarray(d2), k=64, tq=512)
        ref = jax.lax.top_k(-jnp.asarray(d2).T, 64)[1].T
        return np.array_equal(np.asarray(got), np.asarray(ref))
    step("topk_rows_pallas kc=192 k=64 tq=512 C=50176", topk_step)

    # fused 50k chunk: compiles the decoder-tail + PointNet Pallas kernels
    # and the banded kNN inside the production chunk program
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
    ev = FieldEvaluator(net, spec, variables, pts, jnp.asarray(lat),
                        pts_raw=pts, knn_tile=512)
    qc = (rng.rand(ev.chunk, 3).astype(np.float32) - 0.5) * 0.6

    def chunk_step():
        v = ev(qc)
        return bool(np.isfinite(v).all()) and ev._fused == 3
    step(f"fused field chunk C={ev.chunk} (decoder+pointnet+knn)", chunk_step)

    if "--refine" in sys.argv:
        def refine_step():
            z3 = np.zeros((ev.chunk, 3), np.float32)
            z1 = np.ones((ev.chunk,), np.float32)
            r = ev.refine_bisection(z3, z3, z3, z1, -z1,
                                    spec.gen_refine_iter)
            from ppsurf_tpu.recon import field as fm
            return (np.isfinite(r).all()
                    and ev._cand_key not in fm._CAND_BROKEN)
        step(f"candidate refine program C={ev.chunk} kc=192 "
             f"(the r4 OOM program)", refine_step)

    print("DEVICE SMOKE " + ("OK" if ok_all else "FAILED"))
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
