import os

import numpy as np
import pandas as pd
import pytest

from ppsurf_tpu.eval.reports import (
    export_table,
    make_dataset_comparison,
    make_html_report,
    make_quantitative_comparison,
    make_test_report,
    read_metrics_table,
)
from ppsurf_tpu.io.ply import Mesh
from ppsurf_tpu.utils.container import aggregate_dicts_np, flatten_dicts
from ppsurf_tpu.utils.fs import call_necessary


class TestExportTable:
    def test_stats_rows(self, tmp_path):
        df = pd.DataFrame(
            {"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]},
            index=["s1", "s2", "s3"],
        )
        df.index.name = "Shape"
        out = export_table(df, str(tmp_path / "metrics.xlsx"))
        assert out.endswith(".csv")
        raw = pd.read_csv(out, index_col=0)
        assert list(raw.index[-3:]) == ["AVERAGE", "MEDIAN", "STDEV"]
        assert raw.loc["AVERAGE", "a"] == 2.0
        # reader drops the stat rows
        df2 = read_metrics_table(out)
        assert df2.shape == (3, 2)

    def test_read_accepts_xlsx_name(self, tmp_path):
        df = pd.DataFrame({"x": [1.0]}, index=["s"])
        export_table(df, str(tmp_path / "f1.xlsx"))
        got = read_metrics_table(str(tmp_path / "f1.xlsx"))  # csv fallback
        assert got.shape == (1, 1)


class TestTestReport:
    def test_make_test_report(self, tmp_path):
        results = {
            "loss": np.array([0.5, 0.7]),
            "loss_components_mean": np.array([0.5, 0.7]),
            "abs_dist_rms": np.array([np.nan, np.nan]),
            "accuracy": np.array([0.9, 0.8]),
            "precision": np.array([0.9, 0.8]),
            "recall": np.array([0.9, 0.8]),
            "f1_score": np.array([0.9, 0.8]),
        }
        loss_mean, rmse_mean, f1_mean = make_test_report(
            ["shape_a", "shape_b"], results, str(tmp_path / "metrics_m.xlsx"),
            ["imp_surf_sign"],
        )
        np.testing.assert_allclose(loss_mean, 0.6)
        np.testing.assert_allclose(f1_mean, 0.85)
        assert os.path.isfile(tmp_path / "metrics_m.csv")


class TestComparisonPipeline:
    def test_quantitative_comparison_and_dataset_summary(self, tmp_path):
        # build two sphere meshes as GT + one method's results
        from tests.test_mesh_metrics import make_sphere_mesh

        gt_dir = tmp_path / "gt"
        res_dir = tmp_path / "results" / "m1" / "ds"
        (res_dir / "meshes").mkdir(parents=True)
        gt_dir.mkdir()
        names = ["s0", "s1"]
        for n in names:
            make_sphere_mesh(0.3).export(str(gt_dir / f"{n}.ply"))
            make_sphere_mesh(0.29).export(str(res_dir / "meshes" / f"{n}.xyz.ply"))

        written = make_quantitative_comparison(
            shape_names=names,
            gt_mesh_files=[str(gt_dir / f"{n}.ply") for n in names],
            result_headers=["m1"],
            result_file_templates=[str(res_dir / "meshes" / "{}.xyz.ply")],
            comp_output_dir=str(res_dir),
            num_samples=2000,
        )
        assert set(written) == {"chamfer", "f1", "iou", "normals"}
        cd = read_metrics_table(written["chamfer"])
        assert cd.shape == (2, 1)
        assert (cd.values < 0.05).all()

        out = make_dataset_comparison(
            [[
                str(res_dir / "chamfer_distance.xlsx"),
                str(res_dir / "iou.xlsx"),
                str(res_dir / "normal_error.xlsx"),
                str(res_dir / "f1.xlsx"),
            ]],
            str(tmp_path / "comp_mean.xlsx"),
        )
        summary = pd.read_csv(out, index_col=0)
        assert "Mean chamfer_distance" in summary.columns

    def test_html_report(self, tmp_path):
        out = make_html_report(
            str(tmp_path / "report.html"), "comp", ["s0"], ["m1"],
            np.array([[0.01]]), np.array([[0.9]]), np.array([[0.1]]),
        )
        html = open(out).read()
        assert "comp" in html and "s0" in html and "0.9" in html


class TestUtils:
    def test_flatten_and_aggregate(self):
        dicts = [
            {"loss": 1.0, "metrics": {"f1": 0.5}},
            {"loss": 3.0, "metrics": {"f1": 0.7}},
        ]
        flat = flatten_dicts(dicts)
        assert flat[0] == {"loss": 1.0, "f1": 0.5}
        agg = aggregate_dicts_np(flat, "mean")
        assert agg["loss"] == 2.0
        stacked = aggregate_dicts_np(flat, "stack")
        assert stacked["f1"].shape == (2,)

    def test_call_necessary(self, tmp_path):
        src = tmp_path / "in.txt"
        dst = tmp_path / "out.txt"
        src.write_text("x")
        assert call_necessary(str(src), str(dst))  # missing output
        import time

        time.sleep(0.01)
        dst.write_text("y")
        assert not call_necessary(str(src), str(dst))  # up to date
        time.sleep(0.01)
        src.write_text("xx")
        assert call_necessary(str(src), str(dst))  # stale output


def test_first_party_xlsx_roundtrip(tmp_path):
    """export_table writes a real .xlsx (first-party OOXML writer with
    color scales, reference `evaluation.py:252-353`) that the
    openpyxl-free reader recovers exactly."""
    import zipfile

    import pandas as pd

    from ppsurf_tpu.eval.reports import export_table, read_metrics_table
    from ppsurf_tpu.eval.xlsx import read_xlsx

    df = pd.DataFrame(
        {"chamfer_distance": [0.01, 0.02, 0.005], "iou": [0.9, 0.8, 0.95]},
        index=["shape_a", "shape_b", "shape c & d"],
    )
    out = str(tmp_path / "metrics.xlsx")
    export_table(df, out, low_metrics_better=[True, False])
    assert zipfile.is_zipfile(out)
    with zipfile.ZipFile(out) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "colorScale" in sheet and "shape c &amp; d" in sheet

    header, index, rows = read_xlsx(out)
    assert header == ["chamfer_distance", "iou"]
    assert index[:3] == ["shape_a", "shape_b", "shape c & d"]
    assert index[3:] == ["AVERAGE", "MEDIAN", "STDEV"]
    np.testing.assert_allclose(np.array(rows[:3], float), df.to_numpy())

    got = read_metrics_table(out)  # drops stat rows
    np.testing.assert_allclose(got.to_numpy(), df.to_numpy())
    assert list(got.columns) == list(df.columns)
