"""Device-side microbenchmarks of the fused-chunk components on TPU.

Times, best-of-N with np.asarray round trips (block_until_ready is a no-op
on this platform), each stage at production size (C=50k, N=60k, k=64,
L=256, P=50):

  - null dispatch
  - kNN (banded pallas)
  - XLA gather of (C, k, L) neighbor latents
  - decoder tail: fused pallas kernel vs XLA per-layer matmuls,
    both consuming the SAME pre-gathered x
  - pointnet: fused pallas pair vs flax XLA, same patches

This separates "is the kernel faster than XLA on the same inputs" from
"does the end-to-end chunk win" (tools/ab_fused.py).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(label, fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:42s} {min(ts) * 1e3:8.1f} ms", flush=True)
    return min(ts)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.models.decoder import InterpAttentionKHeadsNet
    from ppsurf_tpu.models.fkaconv import gather_neighbors
    from ppsurf_tpu.models.pointnet import PointNetfeat
    from ppsurf_tpu.ops.decoder_pallas import decoder_tail_pallas
    from ppsurf_tpu.ops.graph import build_proj_ids
    from ppsurf_tpu.ops.pointnet_pallas import pointnet_att_pallas

    dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    print(f"backend={jax.default_backend()} dtype={dt.__name__}")

    C, L, K, P = 50000, 256, 64, 50
    pts = load_ply(
        "/root/reference/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    n = pts.shape[0]
    rng = np.random.RandomState(0)

    from ppsurf_tpu.ops.morton import morton_order

    order = morton_order(pts, pts.min(0), pts.max(0))
    pts = pts[order]
    q = pts[rng.choice(n, C)] + rng.randn(C, 3).astype(np.float32) * 0.01
    q = q[morton_order(q, pts.min(0), pts.max(0))]

    pts_d = jnp.asarray(pts)[None]
    q_d = jnp.asarray(q)[None]
    lat = jnp.asarray(rng.randn(n, L).astype(np.float32)).astype(dt)[None]

    tiny = jax.jit(lambda x: x + 1.0)
    xd = jnp.zeros((8, 128), jnp.float32)
    timeit("null dispatch", lambda: tiny(xd), reps=10)

    # every timed program returns a SCALAR summary: host transfers of the
    # real outputs (up to 1.6 GB) would otherwise dominate through the
    # tunnel, and block_until_ready does not actually wait here
    knn_s = jax.jit(lambda p, qq: build_proj_ids(
        p, qq, k=K, tile=512, kb=16).sum())
    knn = jax.jit(lambda p, qq: build_proj_ids(p, qq, k=K, tile=512, kb=16))
    ids = knn(pts_d, q_d)
    timeit("kNN banded kb=16 (50k x 60k, k=64)", lambda: knn_s(pts_d, q_d))

    gath_s = jax.jit(
        lambda l, i: gather_neighbors(l, i).astype(jnp.float32).sum()
    )
    gath = jax.jit(lambda l, i: gather_neighbors(l, i)[0])
    x = gath(lat, ids)
    timeit("XLA gather (C, 64, 256) latents", lambda: gath_s(lat, ids))

    # decoder tail on the same pre-gathered x
    net = InterpAttentionKHeadsNet(L, L, k=K, dtype=dt)
    key = jax.random.key(0)
    variables = net.init(key, lat, pts_d, q_d[:, :128], ids[:, :128])
    p = variables["params"]
    # projected form: fold fc1's latent half
    k1 = np.asarray(p["fc1"]["kernel"], np.float32)
    b1 = np.asarray(p["fc1"]["bias"], np.float32)
    w1r = jnp.asarray(k1[L:])
    pp = dict(p)
    pp["fc1"] = {"kernel": w1r}

    neigh = jax.jit(lambda pd, i: gather_neighbors(pd, i)[0])(pts_d, ids)
    rel = (q_d[0][:, None, :] - neigh).astype(dt)
    xp = ((x.astype(jnp.float32) @ k1[:L] + b1)).astype(dt)

    # full flax decoder (gather + tail), the production XLA path
    flax_full = jax.jit(
        lambda l, i: net.apply(
            {"params": pp}, l, pts_d, q_d, i, last_layer=False,
            latents_projected=True,
        ).astype(jnp.float32).sum()
    )
    lat_p = ((lat[0].astype(jnp.float32) @ k1[:L] + b1)).astype(dt)[None]
    timeit("decoder XLA full (gather + tail)",
           lambda: flax_full(lat_p, ids))

    # plain-jnp tail on the SAME pre-gathered x (what XLA schedules
    # after the gather, decoder.py:50-69 math)
    def xla_tail(xp_, rel_):
        def dn(a, w, b=None):
            y = jnp.dot(a, w.astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
            return y if b is None else y + b.astype(dt)

        h = jnp.maximum(xp_ + dn(rel_, w1r), 0)
        h = jnp.maximum(dn(h, pp["fc2"]["kernel"], pp["fc2"]["bias"]), 0)
        h = jnp.maximum(dn(h, pp["fc3"]["kernel"], pp["fc3"]["bias"]), 0)
        qv = dn(h, pp["fc_query"]["kernel"], pp["fc_query"]["bias"])
        vv = dn(h, pp["fc_value"]["kernel"], pp["fc_value"]["bias"])
        att = jax.nn.softmax(qv, axis=1).mean(axis=-1)
        return jnp.einsum("ck,ckl->cl", att, vv,
                          preferred_element_type=jnp.float32)

    xla_tail_j = jax.jit(
        lambda a, b: xla_tail(a, b).astype(jnp.float32).sum())
    timeit("decoder tail XLA jnp (pre-gathered)",
           lambda: xla_tail_j(xp, rel))

    def pallas_tail(xp_, rel_, tq):
        return decoder_tail_pallas(
            xp_, rel_, w1r, pp["fc2"]["kernel"], pp["fc2"]["bias"],
            pp["fc3"]["kernel"], pp["fc3"]["bias"],
            pp["fc_query"]["kernel"], pp["fc_query"]["bias"],
            pp["fc_value"]["kernel"], pp["fc_value"]["bias"],
            k=K, heads=64, tq=tq,
        )

    for tq in (128, 256):
        pj = jax.jit(
            lambda a, b, tq=tq: pallas_tail(a, b, tq).astype(
                jnp.float32).sum()
        )
        timeit(f"decoder tail pallas tq={tq}", lambda: pj(xp, rel))

    # pointnet branch
    patches = jnp.asarray(
        rng.randn(C, P, 3).astype(np.float32) * 0.3
    ).astype(dt)
    pn = PointNetfeat(
        net_size_max=256, output_size=L, use_point_stn=False,
        use_feat_stn=True, sym_op="att", dim=3, dtype=dt,
    )
    pvars = pn.init(jax.random.key(1), patches[:128])

    flax_pn = jax.jit(
        lambda x_: pn.apply(pvars, x_, train=False)[0].astype(
            jnp.float32).sum()
    )
    timeit("pointnet XLA (flax)", lambda: flax_pn(patches))

    for tq in (128, 256):
        ppj = jax.jit(
            lambda x_, tq=tq: pointnet_att_pallas(
                x_, pvars["params"], pvars["batch_stats"], p_real=P, tq=tq
            ).astype(jnp.float32).sum()
        )
        timeit(f"pointnet pallas tq={tq}", lambda: ppj(patches))
    return 0


if __name__ == "__main__":
    sys.exit(main())
