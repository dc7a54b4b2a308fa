"""Sign-level reconstruction parity vs the ACTUAL torch reference.

BASELINE.md's bar is "bit-for-bit at the sign level": the extracted mesh
depends only on (a) which voxels get evaluated, (b) the field's sign at
them, (c) the bisection refinement. This harness transplants identical
weights into the reference's own torch modules (like
test_reference_parity.py), builds the reference's own predict-time field
closure, runs the reference's own `_create_volume` region grower
(`source/poco_utils.py:178-254`, imported from /root/reference with only
its unused heavyweight imports stubbed), and checks against our
TPU-native engine (`recon/engine.py` + `recon/field.py`):

  1. identical evaluated-voxel sets (finite mask of the volume),
  2. 100% sign agreement on them (up to f32 noise at |v| ~ 1e-5),
  3. bisection-refined vertices within 1e-4 when each stack's field
     drives the same refinement rule.

Two configs: "small" (N=2000, res 65, latent 64, k=16, P=10) keeps the
CPU runtime in tens of seconds; "production" (slow-marked) runs the
flagship 50NN network shape — latent 256, k=64, P=50, res 129, projected-
latents path active — so parity evidence covers the production program
shapes, not just the mini ones.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import test_reference_parity as trp  # noqa: E402  (reference loader + transplants)

REF = "/root/reference"


def _load_poco_utils():
    """Import the reference's real poco_utils (region grower) with its
    unused heavyweight imports stubbed (trimesh / lightning progress bar /
    base.mesh are touched only by the mesh-export wrapper, not by
    `_create_volume`)."""
    trp._load_reference()  # torch network modules + source.* package stubs
    if "source.poco_utils_real" in sys.modules:
        return sys.modules["source.poco_utils_real"]

    for name in ("trimesh",):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.Trimesh = object
            sys.modules[name] = m
    pl_mod = sys.modules["pytorch_lightning"]
    if not hasattr(pl_mod, "callbacks"):
        cb = types.ModuleType("pytorch_lightning.callbacks")
        prog = types.ModuleType("pytorch_lightning.callbacks.progress")
        tq = types.ModuleType(
            "pytorch_lightning.callbacks.progress.tqdm_progress"
        )
        tq.TQDMProgressBar = object
        sys.modules["pytorch_lightning.callbacks"] = cb
        sys.modules["pytorch_lightning.callbacks.progress"] = prog
        sys.modules["pytorch_lightning.callbacks.progress.tqdm_progress"] = tq
        pl_mod.callbacks = cb
    if "source.base.mesh" not in sys.modules:
        m = types.ModuleType("source.base.mesh")
        m.clean_simple_inplace = None
        m.remove_small_connected_components = None
        sys.modules["source.base.mesh"] = m

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "source.poco_utils_real", f"{REF}/source/poco_utils.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["source.poco_utils_real"] = mod
    spec.loader.exec_module(mod)
    return mod


def _exact_knn_np(pts: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """Exact nearest-first kNN ids (numpy), the semantics of the
    reference's kd-tree queries (`base/proximity.py:58-64`)."""
    d2 = ((queries[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    part = np.argpartition(d2, kth=min(k, d2.shape[1] - 1), axis=1)[:, :k]
    pd = np.take_along_axis(d2, part, axis=1)
    order = np.argsort(pd, axis=1, kind="stable")
    return np.take_along_axis(part, order, axis=1)


class _ProgBarStub:
    class _Bar:
        def set_postfix_str(self, *a, **k):
            pass

    predict_progress_bar = _Bar()


def _normalize_patches_np(pts_local_ms, pts_query_ms):
    """Reference `PPSurfDataset.normalize_patches`
    (`ppsurf_data_loader.py:91-123`): center on the query, divide by the
    patch radius (max distance)."""
    dist = np.linalg.norm(
        pts_local_ms - pts_query_ms[:, None, :], axis=-1
    )
    radius = np.max(dist, axis=-1)
    ps = pts_local_ms - pts_query_ms[:, None, :]
    return ps / radius[:, None, None]


CONFIGS = {
    # latent, k, P (num_pts_local), N points, resolution, blend analytic SDF
    "small": dict(latent=64, k=16, n_local=10, n_pts=2000, res=65,
                  blend=None),
    # the flagship 50NN network shape (reference configs/ppsurf.yaml /
    # poco.yaml defaults: latent 256, k 64, P 50) at res 129. Random
    # weights produce a noise field whose region growing would evaluate
    # the full volume; blending a small network term over an analytic
    # sphere keeps the band realistic while the full network (projected
    # latents path included) still runs for every query on both stacks.
    "production": dict(latent=256, k=64, n_local=50, n_pts=10000, res=129,
                       blend=0.05),
}


@pytest.fixture(
    scope="module",
    params=["small", pytest.param("production", marks=pytest.mark.slow)],
)
def stacks(request):
    """Build both stacks with identical transplanted weights."""
    cfg = CONFIGS[request.param]
    poco_utils = _load_poco_utils()
    _, poco_model_mod, pps_ref = (
        sys.modules["source.base.nn"],
        sys.modules["source.poco_model"],
        sys.modules["source.ppsurf_model"],
    )

    latent, k, n_local = cfg["latent"], cfg["k"], cfg["n_local"]
    rng = np.random.RandomState(7)

    # cloud: a real ABC shape subsample so the field has interesting topology
    from ppsurf_tpu.io import load_ply

    pts = load_ply(
        f"{REF}/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    pts = pts[rng.choice(pts.shape[0], cfg["n_pts"], replace=False)].astype(
        np.float32
    )
    n = pts.shape[0]
    latents_np = (rng.rand(n, latent).astype(np.float32) - 0.5) * 2.0

    # identical analytic blend on BOTH stacks (f32 sphere SDF): scales the
    # random-weight network term down so the sign boundary is a wiggled
    # sphere instead of full-volume noise
    blend_w = cfg["blend"]
    sphere_r = float(0.5 * np.abs(pts).max())

    def np_blend(vals, q):
        if blend_w is None:
            return vals
        return np.float32(blend_w) * vals + (
            np.sqrt(np.sum(q.astype(np.float32) ** 2, axis=-1)) - sphere_r
        )

    if blend_w is None:
        jnp_blend = None
    else:
        def jnp_blend(vals, q):
            return jnp.float32(blend_w) * vals + (
                jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=-1))
                - sphere_r
            )

    torch.manual_seed(3)
    t = trp.randomize(
        pps_ref.PPSurfNetwork(3, latent, 2, k, n_local, latent)
    ).eval()

    # the module-level get_proj_ids was stubbed out at reference load
    # (pykdtree is absent); inject exact numpy kNN with the reference's
    # call convention (`poco_data_loader.py:212-240`)
    def get_proj_ids(data, kk):
        p = data["pts"][0].detach().numpy()
        p = p.T if p.shape[0] == 3 else p
        q = data["pts_query"][0].detach().numpy()
        q = q.T if q.shape[0] == 3 else q
        ids = _exact_knn_np(p, q, kk)
        return {"proj_ids": torch.from_numpy(ids).long().unsqueeze(0)}

    poco_model_mod.get_proj_ids = get_proj_ids

    # ---- torch reference field closure (poco_utils.py:63-82) ----
    latent_base = {
        "pts": torch.from_numpy(pts).unsqueeze(0),  # (1, N, 3)
        "latents": torch.from_numpy(latents_np.T).unsqueeze(0),  # (1, L, N)
        "pts_ms": torch.zeros(1, 1, 3),
    }

    def get_pts_local_ps(pts_query: np.ndarray):
        ids = _exact_knn_np(pts, pts_query, n_local)
        pts_local_ms = pts[ids]
        ps = _normalize_patches_np(pts_local_ms, pts_query)
        return torch.from_numpy(ps.astype(np.float32)).unsqueeze(0)

    def predict_from_latent(d):
        with torch.no_grad():
            occ = t.from_latent(d)
        occ = torch.nn.functional.softmax(occ, dim=1)
        occ = occ[:, 0] - occ[:, 1]
        vals = occ.squeeze(0).detach().cpu().numpy()
        q = d["pts_query"][0].detach().cpu().numpy()  # (Q, 3)
        return np_blend(vals, q)

    def torch_field(q: np.ndarray) -> np.ndarray:
        out = []
        for chunk in np.array_split(q, max(1, -(-q.shape[0] // 10000))):
            d = dict(latent_base)
            d["pts_query"] = torch.from_numpy(
                chunk.astype(np.float32)
            ).unsqueeze(0)
            d["pts_local_ps"] = get_pts_local_ps(chunk.astype(np.float32))
            out.append(predict_from_latent(d))
        return np.concatenate(out, axis=0)

    # ---- our stack with the same weights ----
    from ppsurf_tpu.models.ppsurf import PPSurfNetwork
    from ppsurf_tpu.recon.field import FieldEvaluator
    from ppsurf_tpu.train.model import ppsurf_spec

    params = {
        "mlp": trp.mlp_vars(t.mlp, 3)[0],
        "projection": trp.interp_attention_vars(t.projection)[0],
        "point_net": trp.pointnetfeat_vars(t.point_net)[0],
    }
    stats = {
        "mlp": trp.mlp_vars(t.mlp, 3)[1],
        "point_net": trp.pointnetfeat_vars(t.point_net)[1],
    }
    net = PPSurfNetwork(
        in_channels=3, latent_size=latent, out_channels=2, k=k,
        num_pts_local=n_local, pointnet_latent_size=latent,
    )
    spec = ppsurf_spec(
        dtype=jnp.float32, k=k, num_pts_local=n_local,
        network_latent_size=latent, pointnet_latent_size=latent,
        rec_batch_size=10000,
    )
    evaluator = FieldEvaluator(
        net, spec, {"params": params, "batch_stats": stats}, pts,
        latents_np, pts_raw=pts, transform=jnp_blend,
    )

    return types.SimpleNamespace(
        poco_utils=poco_utils, torch_field=torch_field,
        get_pts_local_ps=get_pts_local_ps,
        predict_from_latent=predict_from_latent, latent_base=latent_base,
        pts=pts, ours_field=evaluator, res=cfg["res"], n_local=n_local,
    )


def _our_volume(s):
    from ppsurf_tpu.recon.engine import create_volume_region_growing

    return create_volume_region_growing(
        lambda q: s.ours_field(q), s.pts, s.res, padding=1, dilation_size=2
    )


def _ref_volume(s):
    bmin = s.pts.min()
    bmax = s.pts.max()
    step = (bmax - bmin) / (s.res - 1)
    bmin_pad = bmin - 1 * step
    pts_ids = ((s.pts - bmin) / step + 1).astype(np.int32)
    vol = s.poco_utils._create_volume(
        s.get_pts_local_ps, s.predict_from_latent, 2, bmin_pad,
        dict(s.latent_base), 10000, s.n_local, 1.0, 1, "x", _ProgBarStub(),
        pts_ids, s.res, step,
    )
    return vol, step, bmin_pad


def test_volume_sign_parity(stacks):
    vol_ours, step, bmin_pad = _our_volume(stacks)
    vol_ref, step_r, bmin_pad_r = _ref_volume(stacks)

    assert abs(step - step_r) < 1e-12 and abs(bmin_pad - bmin_pad_r) < 1e-12

    fin_ours = np.isfinite(vol_ours)
    fin_ref = np.isfinite(vol_ref)
    # identical evaluated-voxel sets
    assert (fin_ours == fin_ref).all(), (
        f"evaluated sets differ: ours {fin_ours.sum()} vs ref "
        f"{fin_ref.sum()}, sym-diff {(fin_ours ^ fin_ref).sum()}"
    )

    a = vol_ours[fin_ours]
    b = vol_ref[fin_ref]
    same_sign = np.sign(a) == np.sign(b)
    near_zero = np.minimum(np.abs(a), np.abs(b)) < 1e-5
    bad = ~(same_sign | near_zero)
    assert not bad.any(), (
        f"{bad.sum()} / {a.size} sign disagreements; "
        f"worst |v| pair: {a[bad][:5]} vs {b[bad][:5]}"
    )
    # values themselves agree to f32 noise
    np.testing.assert_allclose(a, b, atol=5e-4)

    stacks.vol = vol_ours
    stacks.grid = (step, bmin_pad)


def test_refined_vertex_parity(stacks):
    from ppsurf_tpu.recon.engine import refine_vertices
    from ppsurf_tpu.recon.marching_cubes import marching_cubes

    vol = getattr(stacks, "vol", None)
    if vol is None:
        vol, step, bmin_pad = _our_volume(stacks)
    else:
        step, bmin_pad = stacks.grid

    verts, faces = marching_cubes(vol, 0.0)
    assert verts.shape[0] > 100
    if verts.shape[0] > 8192:
        # vertices refine independently; a fixed subsample is full evidence
        # at a fraction of the torch-side CPU cost (production config)
        sel = np.random.RandomState(0).choice(verts.shape[0], 8192,
                                              replace=False)
        verts = verts[sel]

    # same refinement rule (reference poco_utils.py:111-168 ==
    # engine.refine_vertices, established by test_recon), each stack's
    # field driving it
    v_ref = refine_vertices(
        verts.astype(np.float64), vol, stacks.torch_field, step, bmin_pad,
        refine_iter=10,
    )
    v_ours = refine_vertices(
        verts.astype(np.float64), vol, lambda q: stacks.ours_field(q),
        step, bmin_pad, refine_iter=10,
    )
    d = np.abs(v_ref - v_ours).max()
    assert d <= 1e-4, f"refined vertices diverge: max |dv| = {d}"
