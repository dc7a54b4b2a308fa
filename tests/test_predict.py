"""End-to-end reconstruction: train a tiny model briefly, then run the full
predict path (latents -> region growing -> MC -> refine -> PLY export) on
abc_minimal. This is the mini-pipeline integration test mirroring the
reference's `full_run_pps_mini.py` smoke strategy (SURVEY.md §4)."""
import os

import jax
import numpy as np
import pytest

from ppsurf_tpu.data import OccupancyDataModule
from ppsurf_tpu.io import load_ply
from ppsurf_tpu.recon.predict import Predictor
from ppsurf_tpu.train import TrainConfig, Trainer, ppsurf_spec


@pytest.fixture(scope="module")
def trained_tiny(abc_minimal_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("models")
    spec = ppsurf_spec(
        name="ppsurf_tiny", network_latent_size=16, pointnet_latent_size=16,
        num_pts_local=8, k=8,
        gen_subsample_manifold=256, gen_subsample_manifold_iter=2,
        gen_resolution_global=33, rec_batch_size=4096, gen_refine_iter=2,
    )
    dm = OccupancyDataModule(
        in_file=os.path.join(abc_minimal_dir, "testset.txt"),
        batch_size=2, manifold_points=256, patches_per_shape=64, seed=42,
    )
    cfg = TrainConfig(
        max_epochs=1, batch_size=2, num_devices=1, knn_tile=64,
        default_root_dir=str(tmp),
    )
    trainer = Trainer(spec, cfg)
    state = trainer.fit(dm)
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    return spec, variables, dm


def test_predict_runs_end_to_end(trained_tiny, tmp_path):
    spec, variables, dm = trained_tiny
    predictor = Predictor(spec, variables, knn_tile=64, verbose=False)

    ds = dm.predict_dataset()
    # subsample the raw cloud for test speed: reconstruct from 2k points
    pts_raw, _ = ds.load_raw_shape(0)
    rng = np.random.RandomState(0)
    pts = pts_raw[rng.choice(pts_raw.shape[0], 2000, replace=False)]

    mesh = predictor.reconstruct_shape(pts, resolution=33)
    # an undertrained net may or may not cross zero; both are valid outcomes,
    # but the pipeline itself must complete and produce a well-formed mesh
    if mesh is not None:
        assert mesh.vertices.shape[1] == 3
        assert mesh.faces.shape[1] == 3
        assert np.isfinite(mesh.vertices).all()
        assert mesh.faces.max() < mesh.vertices.shape[0]
        out = str(tmp_path / "rec.ply")
        mesh.export(out)
        re_read = load_ply(out)
        assert re_read.vertices.shape == mesh.vertices.shape


def test_latent_encoder_covers_all_points(trained_tiny):
    spec, variables, dm = trained_tiny
    predictor = Predictor(spec, variables, knn_tile=64, verbose=False)
    rng = np.random.RandomState(1)
    pts = rng.rand(300, 3).astype(np.float32) - 0.5
    latents = predictor.encoder(variables, pts, jax.random.key(0))
    assert latents.shape == (300, spec.network_latent_size)
    assert np.isfinite(latents).all()


def test_device_refinement_matches_host_loop(trained_tiny):
    """FieldEvaluator.refine_bisection == the host bisection loop.

    Parity: reference `poco_utils.py:111-168`; the device path is the same
    update rule inside one scanned program per chunk."""
    from ppsurf_tpu.recon.engine import reconstruct_mesh
    from ppsurf_tpu.recon.field import FieldEvaluator, LatentEncoder

    spec, variables, dm = trained_tiny
    rng = np.random.RandomState(2)
    # sphere-ish cloud so the blended field below has a guaranteed crossing
    u = rng.randn(1500, 3).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts = 0.4 * u

    import jax.numpy as jnp

    def blend(vals, q):
        return 0.1 * vals + (
            jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)) - 0.4
        )

    net = spec.make_network()
    encoder = LatentEncoder(net, spec, knn_tile=64)
    latents = encoder(variables, pts, jax.random.key(3))
    evaluator = FieldEvaluator(
        net, spec, variables, pts, latents, pts_raw=pts, knn_tile=64,
        transform=blend,
    )

    kwargs = dict(
        input_points=pts, resolution=17, refine_iter=3, progress=None
    )
    mesh_host = reconstruct_mesh(evaluator, **kwargs)
    mesh_dev = reconstruct_mesh(
        evaluator, refine_device=evaluator.refine_bisection, **kwargs
    )
    assert mesh_host is not None and mesh_dev is not None
    assert mesh_host.vertices.shape == mesh_dev.vertices.shape
    np.testing.assert_allclose(
        mesh_dev.vertices, mesh_host.vertices, rtol=0, atol=1e-5
    )
    np.testing.assert_array_equal(mesh_dev.faces, mesh_host.faces)

    # candidate-based refinement (the default for clouds > kc) must match
    # the full-kNN path; also exercise the certificate-failure fallback by
    # shrinking the candidate set to spec.k + 1 (certificate ~never holds)
    import ppsurf_tpu.recon.field as field_mod

    rngq = np.random.RandomState(5)
    n = 500
    v1 = (rngq.rand(n, 3).astype(np.float32) - 0.5) * 0.7
    step = 0.05
    v2 = v1.copy()
    v2[np.arange(n), rngq.randint(0, 3, n)] += step
    p1 = np.asarray(evaluator(v1))
    p2 = np.asarray(evaluator(v2))
    v = 0.5 * (v1 + v2)
    ref = evaluator.refine_bisection(v, v1, v2, p1, p2, 3, force_full=True)
    got = evaluator.refine_bisection(v, v1, v2, p1, p2, 3)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)

    old_kc = field_mod.REFINE_CAND_K
    try:
        field_mod.REFINE_CAND_K = spec.k + 1
        got_fb = evaluator.refine_bisection(v, v1, v2, p1, p2, 3)
    finally:
        field_mod.REFINE_CAND_K = old_kc
    np.testing.assert_allclose(got_fb, ref, rtol=0, atol=1e-5)


def test_sharded_field_eval_matches_single_device(trained_tiny):
    """Query chunks sharded over the 8-device mesh produce identical field
    values (SURVEY §2.2: the reference is restricted to devices=1)."""
    from ppsurf_tpu.parallel.mesh import get_data_mesh
    from ppsurf_tpu.recon.field import FieldEvaluator, LatentEncoder

    spec, variables, dm = trained_tiny
    rng = np.random.RandomState(5)
    pts = rng.rand(1000, 3).astype(np.float32) - 0.5

    net = spec.make_network()
    encoder = LatentEncoder(net, spec, knn_tile=64)
    latents = encoder(variables, pts, jax.random.key(1))

    n_dev = len(jax.devices())
    assert n_dev >= 2, "conftest should provide 8 virtual CPU devices"
    mesh = get_data_mesh(n_dev)

    # enough queries for one sharded dispatch (n_dev full chunks) + tail
    q = rng.rand(spec.rec_batch_size * n_dev + 777, 3).astype(np.float32) - 0.5

    ev_single = FieldEvaluator(
        net, spec, variables, pts, latents, pts_raw=pts, knn_tile=64
    )
    ev_sharded = FieldEvaluator(
        net, spec, variables, pts, latents, pts_raw=pts, knn_tile=64,
        mesh=mesh,
    )
    vals_single = ev_single(q)
    vals_sharded = ev_sharded(q)
    np.testing.assert_allclose(vals_sharded, vals_single, rtol=0, atol=1e-6)


def test_single_file_rec_output_naming(trained_tiny, tmp_path, monkeypatch):
    """Single-file predict writes {results_dir}/{basename}/{basename}.ply —
    basename KEEPS its extension (reference `poco_model.py:196-199`:
    'cloud.xyz.ply' -> 'out/cloud.xyz.ply/cloud.xyz.ply.ply')."""
    import shutil

    from ppsurf_tpu.data.datasets import ShapeDataset
    from ppsurf_tpu.recon.predict import Predictor

    spec, variables, dm = trained_tiny
    src = os.path.join(
        "/root/reference/datasets/abc_minimal/04_pts_vis",
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply",
    )
    in_file = str(tmp_path / "cloud.xyz.ply")
    shutil.copy(src, in_file)

    ds = ShapeDataset(in_file, manifold_points=None,
                      padding_factor=spec.padding_factor)
    predictor = Predictor(spec, variables, knn_tile=64, verbose=False)
    out_dir = str(tmp_path / "rec_out")
    results = predictor.predict_dataset(ds, results_dir=out_dir)
    assert len(results) == 1
    name, out_file, _ = results[0]
    expected = os.path.join(out_dir, "cloud.xyz.ply", "cloud.xyz.ply.ply")
    if out_file is not None:  # undertrained nets may not cross zero
        assert out_file == expected
        assert os.path.isfile(expected)


def test_projected_latents_match_plain_decoder(trained_tiny):
    """Folding the decoder fc1 latent rows into per-shape projected
    latents is a pure reassociation: field values match the plain path."""
    from ppsurf_tpu.recon.field import FieldEvaluator, LatentEncoder

    spec, variables, dm = trained_tiny
    rng = np.random.RandomState(9)
    pts = rng.rand(900, 3).astype(np.float32) - 0.5
    net = spec.make_network()
    encoder = LatentEncoder(net, spec, knn_tile=64)
    latents = encoder(variables, pts, jax.random.key(4))
    q = rng.rand(3000, 3).astype(np.float32) - 0.5

    ev_fast = FieldEvaluator(net, spec, variables, pts, latents,
                             pts_raw=pts, knn_tile=64)
    ev_plain = FieldEvaluator(net, spec, variables, pts, latents,
                              pts_raw=pts, knn_tile=64,
                              project_latents=False)
    assert ev_fast._projected and not ev_plain._projected
    np.testing.assert_allclose(ev_fast(q), ev_plain(q), rtol=0, atol=2e-5)


def test_cand_downgrade_is_shared_across_evaluators(trained_tiny, monkeypatch):
    """A candidate-path failure must downgrade FRESH evaluator instances
    too (module-level sticky record): the r4 bench built one evaluator per
    rep, and a per-instance flag re-paid a ~2.5 min failed Mosaic compile
    inside every measured rep (VERDICT r4 weak #1)."""
    import ppsurf_tpu.recon.field as field_mod
    from ppsurf_tpu.recon.field import FieldEvaluator, LatentEncoder

    spec, variables, dm = trained_tiny
    rng = np.random.RandomState(7)
    pts = rng.rand(700, 3).astype(np.float32) - 0.5
    net = spec.make_network()
    latents = LatentEncoder(net, spec, knn_tile=64)(
        variables, pts, jax.random.key(2))

    calls = {"n": 0}
    real = field_mod._make_refine_cand_chunk

    def boom(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("synthetic Mosaic failure")

    monkeypatch.setattr(field_mod, "_make_refine_cand_chunk", boom)
    field_mod._reset_cand_broken()
    try:
        kc = field_mod.REFINE_CAND_K
        monkeypatch.setattr(field_mod, "REFINE_CAND_K",
                            min(kc, pts.shape[0] - spec.k - 1))
        n = 200
        v1 = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.7
        v2 = v1 + 0.03
        ev_a = FieldEvaluator(net, spec, variables, pts, latents,
                              pts_raw=pts, knn_tile=64)
        p1 = np.asarray(ev_a(v1))
        p2 = np.asarray(ev_a(v2))
        v = 0.5 * (v1 + v2)
        out_a = ev_a.refine_bisection(v, v1, v2, p1, p2, 2)
        assert np.isfinite(out_a).all()
        assert calls["n"] == 1  # failed once, fell back to full kNN
        assert ev_a._cand_key in field_mod._CAND_BROKEN

        # a FRESH evaluator with the same kernel config must skip the
        # candidate path without re-attempting the failed build
        ev_b = FieldEvaluator(net, spec, variables, pts, latents,
                              pts_raw=pts, knn_tile=64)
        out_b = ev_b.refine_bisection(v, v1, v2, p1, p2, 2)
        assert np.isfinite(out_b).all()
        assert calls["n"] == 1  # not called again
        np.testing.assert_allclose(out_b, out_a, rtol=0, atol=1e-6)
    finally:
        field_mod._reset_cand_broken()
        monkeypatch.setattr(field_mod, "_make_refine_cand_chunk", real)
