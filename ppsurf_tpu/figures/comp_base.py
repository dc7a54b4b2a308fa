"""Shared driver for the comparison-figure scripts.

Parity: reference `source/figures/comp_*.py` — each script fixes a method
set + dataset set, runs the cross-method comparison, and merges the
resulting tables into one report (`figures/comp_all.py:16-69`,
`evaluation.py:549-604` merge_comps).
"""
from __future__ import annotations

import os
import typing

import pandas as pd

from ppsurf_tpu.eval.make_comparison import comparison_main
from ppsurf_tpu.eval.reports import export_table, read_metrics_table


def run_comparison(
    name: str,
    datasets: typing.Sequence[str],
    methods: typing.Optional[typing.Sequence[str]] = None,
    data_dir: str = "datasets",
    results_dir: str = "results",
    comp_dir: str = "results/comp",
    workers: int = 8,
    render: bool = True,
) -> None:
    for dataset in datasets:
        try:
            comparison_main(
                data_dir=data_dir, results_dir=results_dir, dataset=dataset,
                workers=workers, comp_name=name, comp_dir=comp_dir,
                methods=methods, html_name=f"{name}.html", render=render,
            )
        except Exception as exc:  # keep going like figures/comp_all.py:60-63
            print(f"comparison failed for {dataset}: {exc}")
    merge_comps(name, datasets, comp_dir)


def merge_comps(
    name: str, datasets: typing.Sequence[str], comp_dir: str = "results/comp"
) -> typing.Optional[str]:
    """Merge per-dataset mean tables into results/comp/reports/{name}.{csv,tex}
    (parity: reference merge_comps, `evaluation.py:549-604`)."""
    frames = []
    for dataset in datasets:
        path = os.path.join(comp_dir, dataset, "comp_mean.xlsx")
        try:
            df = read_metrics_table(path)
        except FileNotFoundError:
            continue
        df.insert(0, "Dataset", dataset)
        frames.append(df)
    if not frames:
        return None
    merged = pd.concat(frames, axis=0)
    out = os.path.join(comp_dir, "reports", f"{name}.xlsx")
    written = export_table(merged, out, add_stats=False)
    try:
        tex = os.path.join(comp_dir, "reports", f"{name}.tex")
        with open(tex, "w") as fp:
            fp.write(merged.to_latex(float_format=lambda x: "%.3f" % x))
    except Exception:
        pass
    return written
