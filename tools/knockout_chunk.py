"""In-context attribution of the chunk body by progressive knockout.

profile_chunk_ops.py times each component in ISOLATION; the isolated sum
(~66 ms) does not explain the shipped body (~165 ms), so something about
the composition is expensive. This tool jits progressively larger
prefixes of the REAL body dataflow (same inputs, same dtypes, same
dependency chain) and attributes cost by consecutive deltas.

Stages (each includes all previous):
  s0_knn        banded Pallas kNN -> ids checksum
  s1_gather     + latent gather (C,k,L) + pts gather + rel
  s2_decoder    + decoder_tail_pallas + fc8
  s3_patch      + patch gather + patch_space
  s4_pointnet   + pointnet_att_pallas
  s5_mlp        + sum fusion + MLP + softmax (== full body)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/knockout_chunk.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps: int = 3, depth: int = 10):
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
    from ppsurf_tpu.models.fkaconv import gather_neighbors
    from ppsurf_tpu.ops.decoder_pallas import decoder_tail_pallas
    from ppsurf_tpu.ops.graph import build_proj_ids
    from ppsurf_tpu.ops.morton import morton_order
    from ppsurf_tpu.ops.patches import patch_space
    from ppsurf_tpu.ops.pointnet_pallas import pointnet_att_pallas
    from ppsurf_tpu.recon import field as field_mod
    from ppsurf_tpu.recon.field import FieldEvaluator
    from ppsurf_tpu.train.model import ppsurf_spec

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    spec = ppsurf_spec(dtype=dtype)
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 50048
    kb = field_mod.KNN_BAND
    P, H = spec.num_pts_local, 64

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
          f"chunk={c} fused={ev._fused} projected={ev._projected}",
          flush=True)

    rng = np.random.RandomState(1)
    base = pts[rng.randint(0, n, c)]
    q = (base + 0.01 * rng.randn(c, 3)).astype(np.float32)
    q = q[morton_order(q, *ev._bbox)]
    qd = jnp.asarray(q)[None]
    var_dev, pts_dev, lat_dev = ev.variables, ev.pts, ev.latents

    def stages(v, pa, la, qa, upto):
        acc = []
        proj_ids = build_proj_ids(pa, qa, k=spec.k, tile=512, kb=kb)
        acc.append(jnp.sum(proj_ids, dtype=jnp.int32).astype(jnp.float32))
        if upto >= 1:
            dt = la.dtype
            x = gather_neighbors(la, proj_ids)[0]
            neigh = gather_neighbors(pa, proj_ids)[0]
            rel = (qa[0][:, None, :] - neigh).astype(dt)
            acc.append(jnp.sum(x.astype(jnp.float32))
                       + jnp.sum(rel.astype(jnp.float32)))
        if upto >= 2:
            pp = v["params"]["projection"]
            pooled = decoder_tail_pallas(
                x, rel, pp["fc1"]["kernel"],
                pp["fc2"]["kernel"], pp["fc2"]["bias"],
                pp["fc3"]["kernel"], pp["fc3"]["bias"],
                pp["fc_query"]["kernel"], pp["fc_query"]["bias"],
                pp["fc_value"]["kernel"], pp["fc_value"]["bias"],
                k=spec.k, heads=H)
            feat_proj = (jnp.dot(pooled, pp["fc8"]["kernel"].astype(dt),
                                 preferred_element_type=jnp.float32)
                         .astype(dt) + pp["fc8"]["bias"].astype(dt))[None]
            acc.append(jnp.sum(feat_proj.astype(jnp.float32)))
        if upto >= 3:
            patch_ids = proj_ids[..., :P]
            patches = jnp.take_along_axis(
                pa[:, None, :, :], patch_ids[..., None], axis=2)
            pl_ps = patch_space(patches, qa)
            acc.append(jnp.sum(pl_ps.astype(jnp.float32)))
        if upto >= 4:
            feat_pn = pointnet_att_pallas(
                pl_ps[0].astype(dt), v["params"]["point_net"],
                v["batch_stats"]["point_net"], p_real=P)[None]
            acc.append(jnp.sum(feat_pn.astype(jnp.float32)))
        if upto >= 5:
            data = {"pts": pa, "pts_query": qa, "latents": la,
                    "proj_ids": proj_ids, "latents_projected": True,
                    "feat_proj": feat_proj, "feat_pn": feat_pn}
            logits = net.apply(v, data, method=net.from_latent)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            acc.append(jnp.sum(probs[0, :, 0] - probs[0, :, 1]))
        return sum(acc)

    names = ["s0_knn", "s1_gather", "s2_decoder", "s3_patch", "s4_pointnet",
             "s5_mlp"]
    prev = 0.0
    for i, nm in enumerate(names):
        f = jax.jit(lambda v, pa, la, qa, _i=i: stages(v, pa, la, qa, _i))
        t = timed(f, var_dev, pts_dev, lat_dev, qd)
        print(f"{nm:12s} {t * 1e3:8.2f} ms   (+{(t - prev) * 1e3:7.2f})",
              flush=True)
        prev = t
    return 0


if __name__ == "__main__":
    sys.exit(main())
