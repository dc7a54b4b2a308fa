"""Figure-suite tooling: renderer, prepare_figures, fix_imls, ablations.

Parity targets: reference `source/figures/*` + `source/base/visualization.py`.
"""
import os

import numpy as np
import pytest

from ppsurf_tpu.io.ply import Mesh, load_ply, save_ply


def _cube_mesh():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32
    )
    f = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]],
        np.int64,
    )
    return Mesh(vertices=v - 0.5, faces=f)


def test_render_scene_mesh_and_points(tmp_path):
    from PIL import Image

    from ppsurf_tpu.utils.visualization import render_scene

    mesh_file = str(tmp_path / "cube.ply")
    _cube_mesh().export(mesh_file)
    out = str(tmp_path / "cube.png")
    render_scene(mesh_file, out, resolution=(128, 128))
    img = np.asarray(Image.open(out))
    assert img.shape == (128, 128, 3)
    # something non-background rendered near the center
    assert (img[32:96, 32:96] < 250).any()

    # point-cloud npy input path
    pts_file = str(tmp_path / "cloud.npy")
    np.save(pts_file, np.random.RandomState(0).rand(500, 3).astype(np.float32))
    out2 = str(tmp_path / "cloud.png")
    render_scene(pts_file, out2, resolution=(96, 96))
    img2 = np.asarray(Image.open(out2))
    assert (img2 < 250).any()


def test_render_numpy_fallback_matches_shape(tmp_path):
    """The numpy fallback renderer draws the same silhouette region."""
    from PIL import Image

    from ppsurf_tpu import native
    from ppsurf_tpu.utils import visualization as vz

    mesh_file = str(tmp_path / "cube.ply")
    _cube_mesh().export(mesh_file)
    out_native = str(tmp_path / "native.png")
    vz.render_scene(mesh_file, out_native, resolution=(96, 96))

    available = native.available
    try:
        native.available = lambda: False
        out_np = str(tmp_path / "numpy.png")
        vz.render_scene(mesh_file, out_np, resolution=(96, 96))
    finally:
        native.available = available
    a = np.asarray(Image.open(out_native)).mean(axis=2) < 250
    b = np.asarray(Image.open(out_np)).mean(axis=2) < 250
    # same silhouette up to edge antialiasing differences
    agree = (a == b).mean()
    assert agree > 0.97, agree


def test_prepare_figures_assembles_and_dist_npz(tmp_path, monkeypatch):
    from ppsurf_tpu.figures.prepare_figures import assemble_figure_data

    data_dir = tmp_path / "datasets" / "dset" / "03_meshes"
    pc_dir = tmp_path / "datasets" / "dset" / "04_pts_vis"
    res_dir = tmp_path / "results" / "meth" / "dset" / "meshes"
    for d in (data_dir, pc_dir, res_dir):
        os.makedirs(d)
    cube = _cube_mesh()
    cube.export(str(data_dir / "shapeA.ply"))
    save_ply(str(pc_dir / "shapeA.xyz.ply"),
             np.random.RandomState(0).rand(100, 3).astype(np.float32) - 0.5)
    # "reconstruction": the same cube, slightly shifted
    rec = Mesh(vertices=cube.vertices + 0.01, faces=cube.faces)
    rec.export(str(res_dir / "shapeA.xyz.ply"))

    fig_dir = str(tmp_path / "figs")
    assemble_figure_data(
        fig_dir, [("dset", "shapeA")],
        datasets_path=str(tmp_path / "datasets"),
        results_path=str(tmp_path / "results"),
        methods=["meth"], workers=0, min_vertex_count=100,
    )
    base = os.path.join(fig_dir, "dset", "shapeA")
    assert os.path.isfile(os.path.join(base, "gt.ply"))
    assert os.path.isfile(os.path.join(base, "pc.ply"))
    assert os.path.isfile(os.path.join(base, "meth.ply"))
    npz = np.load(os.path.join(base, "meth_dist.npz"))
    assert npz["vertices"].shape[0] >= 100  # subdivided
    assert npz["distances"].shape[0] == npz["vertices"].shape[0]
    # shifted cube: distances are small but nonzero
    assert 0 < npz["distances"].mean() < 0.05
    assert os.path.isfile(os.path.join(base, "meth_dist_col.ply"))


def test_fix_imls_reverts_normalization(tmp_path):
    from ppsurf_tpu.figures.fix_imls import revert_normalization

    gt = _cube_mesh()  # extents 1, centered at origin
    gt_verts = gt.vertices * 2.0 + np.array([3.0, -1.0, 0.5], np.float32)
    gt_file = str(tmp_path / "gt.ply")
    Mesh(vertices=gt_verts, faces=gt.faces).export(gt_file)

    # normalized copy (unit cube at origin)
    src_file = str(tmp_path / "src.ply")
    _cube_mesh().export(src_file)
    dst_file = str(tmp_path / "out" / "dst.ply")
    revert_normalization(src_file, gt_file, dst_file)
    out = load_ply(dst_file)
    np.testing.assert_allclose(out.vertices, gt_verts, atol=1e-5)


def test_ablation_configs_importable():
    import importlib

    for name in (
        "comp_ablation_all", "comp_ablation_dense", "comp_ablation_noisefree",
        "comp_ablation_noisy", "comp_ablation_original",
        "comp_ablation_sparse", "comp_ablation_abc_maxnoise",
        "comp_ablation_abc_varnoise", "comp_ablation_nn",
    ):
        mod = importlib.import_module(f"ppsurf_tpu.figures.{name}")
        assert mod.DATASETS and mod.METHODS


def test_render_figures_driver(tmp_path):
    from ppsurf_tpu.figures.render_figures import main

    base = tmp_path / "figs" / "d" / "s"
    os.makedirs(base)
    _cube_mesh().export(str(base / "gt.ply"))
    v = _cube_mesh()
    np.savez(str(base / "meth_dist.npz"), vertices=v.vertices, faces=v.faces,
             distances=np.random.RandomState(0).rand(8).astype(np.float32) * 0.02)
    rc = main(["--figures_dir", str(tmp_path / "figs"), "--workers", "0",
               "--resolution", "64"])
    assert rc == 0
    assert os.path.isfile(str(base / "gt.png"))
    assert os.path.isfile(str(base / "meth_dist.png"))
