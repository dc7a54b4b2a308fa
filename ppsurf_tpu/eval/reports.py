"""Quantitative evaluation reports.

Parity targets: reference `source/base/evaluation.py` — per-shape metric
tables with AVERAGE/MEDIAN/STDEV rows (`export_xlsx`, `:252-353`), the test
report (`make_test_report`, `:209-249`), the per-metric comparison tables
(`make_quantitative_comparison`, `:32-59`), cross-method dataset comparison
(`make_dataset_comparison`, `:364-422`) and assembly/LaTeX export
(`:425-604`).

This environment has no openpyxl, so tables are written as CSV (same base
names, `.csv` extension) with the stat rows computed numerically; when
openpyxl is importable an `.xlsx` with color scales is written too. Readers
accept either extension.
"""
from __future__ import annotations

import os
import typing

import numpy as np
import pandas as pd

from ppsurf_tpu.metrics.mesh_metrics import get_metric_meshes

STAT_ROWS = ("AVERAGE", "MEDIAN", "STDEV")


def _csv_path(output_file: str) -> str:
    return os.path.splitext(output_file)[0] + ".csv"


def export_table(
    df: pd.DataFrame,
    output_file: str,
    low_metrics_better: typing.Union[None, bool, typing.Sequence[bool]] = True,
    add_stats: bool = True,
) -> str:
    """Write a metrics table with stat rows; returns the path written.

    Mirrors reference `export_xlsx` (`evaluation.py:252-353`): same layout
    (index column, one row per shape, AVERAGE/MEDIAN/STDEV footer), but the
    stats are materialized values instead of spreadsheet formulas.
    """
    out = df.copy()
    if add_stats:
        numeric = df.select_dtypes(include=[np.number])
        stats = pd.DataFrame(
            [numeric.mean(axis=0), numeric.median(axis=0), numeric.std(axis=0)],
            index=list(STAT_ROWS),
        )
        out = pd.concat([out, stats.reindex(columns=df.columns)], axis=0)
        out.index.name = df.index.name

    csv_file = _csv_path(output_file)
    os.makedirs(os.path.dirname(os.path.abspath(csv_file)), exist_ok=True)
    out.to_csv(csv_file)

    if output_file.endswith(".xlsx"):
        # reference's native format with per-column color scales
        # (`evaluation.py:252-353`), via the first-party writer
        from ppsurf_tpu.eval.xlsx import write_xlsx

        numeric_rows = [
            [v if isinstance(v, (int, float, np.number)) else np.nan
             for v in row]
            for row in out.to_numpy().tolist()
        ]
        write_xlsx(
            output_file,
            header=[str(c) for c in out.columns],
            index=[str(i) for i in out.index],
            rows=numeric_rows,
            low_metrics_better=low_metrics_better,
            color_rows=len(df),  # exclude the stat footer, like the ref
        )
    return csv_file


def read_metrics_table(path: str) -> pd.DataFrame:
    """Read a table written by export_table (.csv or .xlsx), dropping
    the stat rows (reference `_drop_stats_rows`, `evaluation.py:355-361`)."""
    if not os.path.isfile(path):
        path_csv = _csv_path(path)
        if os.path.isfile(path_csv):
            path = path_csv
        else:
            raise FileNotFoundError(path)
    if path.endswith(".xlsx"):
        try:
            df = pd.read_excel(path, header=0, index_col=0)
        except ImportError:  # no openpyxl: first-party reader
            from ppsurf_tpu.eval.xlsx import read_xlsx

            header, index, rows = read_xlsx(path)
            df = pd.DataFrame(rows, index=index, columns=header)
            df.index.name = None
    else:
        df = pd.read_csv(path, header=0, index_col=0)
    for stat in ("AVG", "AVERAGE", "MEAN", "MEDIAN", "STDEV.P", "STDEV"):
        df = df.drop(stat, errors="ignore")
    return df


def make_test_report(
    shape_names: typing.Sequence[str],
    results: typing.Dict[str, np.ndarray],
    output_file: str,
    output_names: typing.Sequence[str],
) -> typing.Tuple[float, float, float]:
    """Per-shape test table -> (loss_mean, rmse_mean, f1_mean).

    Parity: reference `make_test_report` (`evaluation.py:209-249`).
    `results` maps keys ('loss', 'loss_components_mean', 'abs_dist_rms',
    'accuracy', 'precision', 'recall', 'f1_score') to per-shape arrays.
    """
    metrics_keys = ["abs_dist_rms", "accuracy", "precision", "recall", "f1_score"]
    headers = ["Loss total"] + list(output_names) + metrics_keys

    loss_total = np.asarray(results["loss"], np.float64)
    loss_components = np.asarray(results["loss_components_mean"], np.float64)
    if loss_components.ndim == 1:
        loss_components = loss_components[:, None]
    metrics = np.stack(
        [np.asarray(results[k], np.float64) for k in metrics_keys], axis=1
    )

    data = np.concatenate([loss_total[:, None], loss_components, metrics], axis=1)
    df = pd.DataFrame(data=data, columns=headers, index=list(shape_names))
    df.index.name = "Shape"
    export_table(df, output_file, add_stats=True)

    return (
        float(np.mean(loss_total)),
        float(np.nanmean(metrics[:, 0])),
        float(np.nanmean(metrics[:, -1])),
    )


_METRIC_FILES = {
    "chamfer": ("chamfer_distance.xlsx", True),
    "f1": ("f1.xlsx", False),
    "iou": ("iou.xlsx", False),
    "normals": ("normal_error.xlsx", True),
}


def make_quantitative_comparison(
    shape_names: typing.Sequence[str],
    gt_mesh_files: typing.Sequence[str],
    result_headers: typing.Sequence[str],
    result_file_templates: typing.Sequence[str],
    comp_output_dir: str,
    num_samples: int = 10000,
    num_processes: int = 0,
) -> typing.Dict[str, str]:
    """CD/F1/IoU/NC tables per method (reference `evaluation.py:32-59`)."""
    written = {}
    for metric, (file_name, _low_better) in _METRIC_FILES.items():
        values = get_metric_meshes(
            result_file_template=result_file_templates,
            shape_list=shape_names,
            gt_mesh_files=gt_mesh_files,
            num_samples=num_samples,
            metric=metric,
        )
        arr = np.asarray(values, np.float64).T  # (shapes, methods)
        df = pd.DataFrame(data=arr, columns=list(result_headers), index=list(shape_names))
        df.index.name = "Shape"
        out = os.path.join(comp_output_dir, file_name)
        written[metric] = export_table(df, out, add_stats=True)
    return written


def make_dataset_comparison(
    results_reports: typing.Sequence[typing.Sequence[str]], output_file: str
) -> str:
    """Cross-method mean/median/stdev table (reference `evaluation.py:364-422`)."""
    rows = []
    for reports_model in results_reports:
        row: typing.Dict[str, float] = {}
        model_name = None
        for report_file in reports_model:
            metrics_type = os.path.splitext(os.path.basename(report_file))[0]
            try:
                df = read_metrics_table(report_file)
            except FileNotFoundError:
                model_name = model_name or os.path.basename(
                    os.path.split(os.path.split(report_file)[0])[0]
                )
                row[f"Mean {metrics_type}"] = np.nan
                row[f"Median {metrics_type}"] = np.nan
                row[f"Stdev {metrics_type}"] = np.nan
                continue
            if len(df.columns) == 1:
                model_name = model_name or str(df.columns[0])
                col = df.iloc[:, 0]
                row[f"Mean {metrics_type}"] = float(col.mean())
                row[f"Median {metrics_type}"] = float(col.median())
                row[f"Stdev {metrics_type}"] = float(col.std())
            else:  # test-report style: multiple metric columns
                model_name = model_name or os.path.splitext(
                    os.path.basename(report_file).split("metrics_")[-1]
                )[0]
                row["Count"] = float(df.shape[0])
                for c in df.columns:
                    row[str(c)] = float(df[c].mean())
        rows.append(pd.Series(row, name=model_name))

    df_all = pd.DataFrame(rows)
    df_all.index.name = "Model"
    sort_col = "Mean chamfer_distance"
    if sort_col in df_all.columns:
        df_all = df_all.sort_values(sort_col, ascending=False)
    return export_table(df_all, output_file, add_stats=False)


def assemble_quantitative_comparison(
    comp_output_dir: str,
    report_path_templates: typing.Sequence[str],
    metrics: typing.Sequence[str] = ("chamfer_distance", "iou", "normal_error", "f1"),
) -> typing.Dict[str, str]:
    """Concatenate per-method single-column tables side by side
    (reference `evaluation.py:425-461`)."""
    written = {}
    for metric in metrics:
        frames = []
        for template in report_path_templates:
            path = template.format(metric)
            try:
                df = read_metrics_table(path)
            except FileNotFoundError:
                continue
            method = os.path.basename(os.path.dirname(os.path.dirname(path)))
            df.columns = [method] if len(df.columns) == 1 else df.columns
            frames.append(df)
        if not frames:
            continue
        df_cat = pd.concat(frames, axis=1)
        out = os.path.join(comp_output_dir, f"{metric}.xlsx")
        written[metric] = export_table(df_cat, out, add_stats=True)
    return written


def table_to_latex(path: str, output_file: str, float_format: str = "%.3f") -> str:
    """Simplified LaTeX export of a metrics table
    (reference `xslx_to_latex`, `evaluation.py:464-...`)."""
    df = read_metrics_table(path)
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w") as fp:
        fp.write(df.to_latex(float_format=lambda x: float_format % x))
    return output_file


def make_html_report(
    report_file_out: str,
    comp_name: str,
    shape_names: typing.Sequence[str],
    methods: typing.Sequence[str],
    metrics_cd: np.ndarray,  # (methods, shapes)
    metrics_iou: np.ndarray,
    metrics_nc: np.ndarray,
    renders: typing.Optional[dict] = None,
    pc_renders: typing.Optional[typing.Sequence[str]] = None,
    gt_renders: typing.Optional[typing.Sequence[str]] = None,
    img_size: int = 300,
) -> str:
    """Qualitative/quantitative HTML gallery (reference `evaluation.py:62-206`).

    Layout follows the reference: one row per shape with sticky
    name/point-cloud/GT columns, then one column per method showing its
    CD-colored render and CD/IoU/NCE numbers. Render paths (relative to
    the report file) come from the comparison driver's render pass; a
    numbers-only matrix is emitted when renders are absent.
    """
    report_dir = os.path.dirname(os.path.abspath(report_file_out))

    def rel(p):
        return os.path.relpath(os.path.abspath(p), report_dir).replace(
            "\\", "/"
        )

    def img(path):
        return (
            f"<img src='{rel(path)}' alt='{os.path.basename(path)}' "
            f"width='{img_size}' height='{img_size}'/>"
        )

    rows = []
    for si, shape in enumerate(shape_names):
        cells = [f"<td class='sticky'>{shape.replace('_', ' ')}</td>"]
        if pc_renders is not None:
            cells.append(f"<td class='sticky'>{img(pc_renders[si])}</td>")
        if gt_renders is not None:
            cells.append(f"<td class='sticky'>{img(gt_renders[si])}</td>")
        for mi, method in enumerate(methods):
            cd = metrics_cd[mi][si]
            iou = metrics_iou[mi][si]
            nc = metrics_nc[mi][si]
            pic = ""
            if renders and (method, shape) in renders:
                pic = img(renders[(method, shape)]) + "<br/>"
            cells.append(
                f"<td>{pic}CD: {cd * 100.0:.2f}, IoU: {iou:.2f}, "
                f"NCE: {nc:.2f}</td>"
            )
        rows.append("<tr>" + "".join(cells) + "</tr>")

    heads = ["Shape Name"]
    if pc_renders is not None:
        heads.append("Point Cloud")
    if gt_renders is not None:
        heads.append("GT Object")
    heads += [m.replace("_", " ") for m in methods]
    head_cells = "".join(f"<th>{h}</th>" for h in heads)
    html = f"""<!DOCTYPE html>
<html><head><title>{comp_name}</title>
<style>
 td {{ border: 1px solid #000; vertical-align: top; }}
 table {{ width: 100%; border-collapse: collapse; }}
 th {{ border: 1px solid #000; background: #EEE; position: sticky; top: 0; z-index: 2; }}
 tr:hover {{ background-color: #D6EEEE; }}
 td.sticky {{ position: sticky; left: 0; background: #FFF; z-index: 1; }}
</style></head>
<body><h1>{comp_name}</h1>
<table><tr>{head_cells}</tr>
{''.join(rows)}
</table></body></html>"""
    os.makedirs(report_dir, exist_ok=True)
    with open(report_file_out, "w") as fp:
        fp.write(html)
    return report_file_out
