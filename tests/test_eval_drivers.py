"""End-to-end test of the standalone evaluation/comparison/figure drivers
on a synthetic dataset+results tree (reference `make_evaluation.py`,
`make_comparison.py`, `figures/comp_*.py`)."""
import os

import numpy as np
import pytest

from tests.test_mesh_metrics import make_sphere_mesh


@pytest.fixture()
def synthetic_tree(tmp_path):
    """datasets/<ds>/{03_meshes,testset.txt} + results/<m>/<ds>/meshes."""
    data_dir = tmp_path / "datasets"
    results_dir = tmp_path / "results"
    names = ["sa", "sb"]
    ds = "synth"
    (data_dir / ds / "03_meshes").mkdir(parents=True)
    (data_dir / ds).joinpath("testset.txt").write_text("\n".join(names))
    for m, r in (("m1", 0.29), ("m2", 0.26)):
        (results_dir / m / ds / "meshes").mkdir(parents=True)
        for n in names:
            make_sphere_mesh(r).export(str(results_dir / m / ds / "meshes" / f"{n}.xyz.ply"))
    for n in names:
        make_sphere_mesh(0.3).export(str(data_dir / ds / "03_meshes" / f"{n}.ply"))
    return str(data_dir), str(results_dir), ds, names


def test_make_evaluation_and_comparison(synthetic_tree, tmp_path):
    from ppsurf_tpu.eval.make_evaluation import evaluate_method_on_dataset
    from ppsurf_tpu.eval.make_comparison import comparison_main
    from ppsurf_tpu.figures.comp_base import merge_comps

    data_dir, results_dir, ds, names = synthetic_tree

    for m in ("m1", "m2"):
        out = evaluate_method_on_dataset(
            m, ds, results_dir=results_dir, data_dir=data_dir, num_samples=1500
        )
        assert out is not None and set(out) == {"chamfer", "f1", "iou", "normals"}
    # idempotence: second call skips via the mtime cache
    assert (
        evaluate_method_on_dataset(
            "m1", ds, results_dir=results_dir, data_dir=data_dir, num_samples=1500
        )
        is None
    )

    comp_dir = str(tmp_path / "comp")
    comparison_main(
        data_dir=data_dir, results_dir=results_dir, dataset=ds,
        comp_dir=comp_dir, comp_name="test_comp",
    )
    assert os.path.isfile(os.path.join(comp_dir, ds, "comp_mean.csv"))
    assert os.path.isfile(os.path.join(comp_dir, ds, "chamfer_distance.csv"))
    html = [f for f in os.listdir(os.path.join(comp_dir, "reports")) if f.endswith(".html")]
    assert html

    merged = merge_comps("test_comp", [ds], comp_dir)
    assert merged is not None and os.path.isfile(merged)

    # the m1 spheres (r=0.29) are closer to GT (r=0.30) than m2 (r=0.26)
    from ppsurf_tpu.eval.reports import read_metrics_table

    cd = read_metrics_table(os.path.join(results_dir, "m1", ds, "chamfer_distance.csv"))
    cd2 = read_metrics_table(os.path.join(results_dir, "m2", ds, "chamfer_distance.csv"))
    assert cd.values.mean() < cd2.values.mean()
