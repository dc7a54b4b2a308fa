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
