"""Cumulative stage timings of the fused chunk + latent encoder on TPU.

Each program returns a scalar (transfers would dominate; block_until_ready
is a no-op on this platform). Stages build on each other so differences
attribute device time to each piece of the real chunk body
(recon/field.py _make_chunk_body) and of the latent scan
(LatentEncoder._make_encode_all).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(label, fn, reps=4):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:46s} {min(ts) * 1e3:8.1f} ms", flush=True)
    return min(ts)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.ops.graph import build_fkaconv_graph, build_proj_ids
    from ppsurf_tpu.ops.patches import patch_space
    from ppsurf_tpu.recon import field as F
    from ppsurf_tpu.recon.field import FieldEvaluator, LatentEncoder
    from ppsurf_tpu.train.model import ppsurf_spec

    dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    spec = ppsurf_spec(dtype=dt)
    print(f"backend={jax.default_backend()}")

    pts = load_ply(
        "/root/reference/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    n = pts.shape[0]
    rng = np.random.RandomState(0)

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

    # ---- latent encoder decomposition ----
    pts_d = jnp.asarray(pts)
    s = spec.gen_subsample_manifold  # 10000
    chunk_pts = pts_d[None, :s]

    graph_j = jax.jit(
        lambda p, k_: sum(
            v.astype(jnp.float32).sum()
            for v in build_fkaconv_graph(p, k_, segmentation=True,
                                         tile=512).values()
        )
    )
    timeit("encoder graph build (10k pts)",
           lambda: graph_j(chunk_pts, jax.random.key(1)))

    def latent_once(p, k_):
        data = {"pts": p}
        data.update(build_fkaconv_graph(p, k_, segmentation=True, tile=512))
        lat = net.apply(variables, data, False, method=net.get_latent)
        return lat.astype(jnp.float32).sum()

    latent_j = jax.jit(latent_once)
    timeit("encoder graph + U-Net fwd (10k pts)",
           lambda: latent_j(chunk_pts, jax.random.key(1)))

    enc = LatentEncoder(net, spec, knn_tile=512)
    lat_full = enc(variables, pts, jax.random.key(2))
    timeit(
        "full latent phase (10 passes x 60k pts)",
        lambda: enc(variables, pts, jax.random.key(2)).astype(
            jnp.float32).sum(),
        reps=3,
    )

    # ---- chunk stage decomposition (C = 50000) ----
    C = 50000
    ev = FieldEvaluator(net, spec, variables, pts, np.asarray(lat_full),
                        pts_raw=pts, knn_tile=512)
    q = pts[rng.choice(n, C)] + rng.randn(C, 3).astype(np.float32) * 0.01
    from ppsurf_tpu.ops.morton import morton_order

    q = np.ascontiguousarray(q[morton_order(q, *ev._bbox)])
    q_d = jnp.asarray(q)[None]
    pts_all, lat_dev = ev.pts, ev.latents
    vv = ev.variables
    spec_k = ev._spec_k

    knn_j = jax.jit(
        lambda p, qq: build_proj_ids(p, qq, k=spec_k, tile=512,
                                     kb=F.KNN_BAND).sum()
    )
    timeit("stage knn", lambda: knn_j(pts_all, q_d))

    def to_feat_proj(p, qq, lat):
        from ppsurf_tpu.models.fkaconv import gather_neighbors
        from ppsurf_tpu.ops.decoder_pallas import decoder_tail_pallas

        ids = build_proj_ids(p, qq, k=spec_k, tile=512, kb=F.KNN_BAND)
        pp = vv["params"]["projection"]
        x = gather_neighbors(lat, ids)[0]
        neigh = gather_neighbors(p, ids)[0]
        rel = (qq[0][:, None, :] - neigh).astype(dt)
        pooled = decoder_tail_pallas(
            x, rel, pp["fc1"]["kernel"],
            pp["fc2"]["kernel"], pp["fc2"]["bias"],
            pp["fc3"]["kernel"], pp["fc3"]["bias"],
            pp["fc_query"]["kernel"], pp["fc_query"]["bias"],
            pp["fc_value"]["kernel"], pp["fc_value"]["bias"],
            k=spec_k, heads=64,
        )
        feat = jnp.dot(pooled, pp["fc8"]["kernel"].astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        return ids, feat + pp["fc8"]["bias"].astype(dt)

    fp_j = jax.jit(
        lambda p, qq, lat: to_feat_proj(p, qq, lat)[1].astype(
            jnp.float32).sum()
    )
    timeit("stage knn+decoder(fused)", lambda: fp_j(pts_all, q_d, lat_dev))

    def to_patches(p, qq, lat):
        ids, feat = to_feat_proj(p, qq, lat)
        patch_ids = ids[..., : spec.num_pts_local]
        patches = jnp.take_along_axis(
            p[:, None, :, :], patch_ids[..., None], axis=2
        )
        return feat, patch_space(patches, qq)

    pt_j = jax.jit(
        lambda p, qq, lat: to_patches(p, qq, lat)[1].astype(
            jnp.float32).sum()
    )
    timeit("stage knn+decoder+patches", lambda: pt_j(pts_all, q_d, lat_dev))

    def full(p, qq, lat):
        from ppsurf_tpu.ops.pointnet_pallas import pointnet_att_pallas

        feat, pl_ps = to_patches(p, qq, lat)
        feat_pn = pointnet_att_pallas(
            pl_ps[0].astype(dt), vv["params"]["point_net"],
            vv["batch_stats"]["point_net"], p_real=spec.num_pts_local,
        )
        data = {
            "pts": p, "pts_query": qq, "latents": lat,
            "proj_ids": jnp.zeros((1, 1, 1), jnp.int32),
            "feat_proj": feat[None], "feat_pn": feat_pn[None],
            "pts_local_ps": jnp.zeros((1, 1, 1, 3), dt),
        }
        logits = net.apply(vv, data, method=net.from_latent)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return (probs[0, :, 0] - probs[0, :, 1]).sum()

    full_j = jax.jit(full)
    timeit("stage full chunk body", lambda: full_j(pts_all, q_d, lat_dev))

    # the production chunk program via the evaluator (incl host sort,
    # padding, transfers)
    ev(q)
    timeit("evaluator __call__ (host+device)", lambda: ev(q).sum(), reps=3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
