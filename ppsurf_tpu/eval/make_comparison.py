"""Cross-method comparison driver: tables + CD-colored meshes + HTML report.

Parity: reference `source/make_comparison.py` (`:43-109`): per-dataset
comparison of multiple methods' result dirs — assembled metric tables,
dataset mean/median/stdev summary, Chamfer-distance vertex coloring, HTML
gallery.
"""
from __future__ import annotations

import argparse
import os
import typing

import numpy as np

from ppsurf_tpu.data.datasets import read_shape_list
from ppsurf_tpu.eval.reports import (
    assemble_quantitative_comparison,
    make_dataset_comparison,
    make_html_report,
    read_metrics_table,
)
from ppsurf_tpu.utils.visualization import visualize_chamfer_distance_pool


def comparison_main(
    data_dir: str,
    results_dir: str,
    dataset: str,
    workers: int = 8,
    dist_cut_off: float = 0.03,
    comp_name: str = "comp",
    comp_dir: str = "results/comp",
    html_name: str = "comp_all.html",
    methods: typing.Optional[typing.Sequence[str]] = None,
    render: bool = True,  # the reference always renders the gallery
    # columns (`make_comparison.py:60-88`); outputs are cached by
    # call_necessary, so re-runs are cheap
) -> None:
    in_file = os.path.join(data_dir, dataset, "testset.txt")
    if not os.path.isfile(in_file):
        print(f"skip {dataset}: no testset")
        return
    shape_names = read_shape_list(in_file)
    gt_dir = os.path.join(data_dir, dataset, "03_meshes")

    if methods is None:
        methods = sorted(
            d for d in os.listdir(results_dir)
            if os.path.isdir(os.path.join(results_dir, d, dataset))
        )

    comp_ds_dir = os.path.join(comp_dir, dataset)
    os.makedirs(comp_ds_dir, exist_ok=True)

    # assemble per-metric cross-method tables
    templates = [
        os.path.join(results_dir, m, dataset, "{}.xlsx") for m in methods
    ]
    assemble_quantitative_comparison(comp_ds_dir, templates)

    # dataset summary: one row per method
    reports = [
        [
            os.path.join(results_dir, m, dataset, f"{metric}.xlsx")
            for metric in ("chamfer_distance", "iou", "normal_error", "f1")
        ]
        for m in methods
    ]
    make_dataset_comparison(reports, os.path.join(comp_ds_dir, "comp_mean.xlsx"))

    # CD-colored meshes + PNG renders for the qualitative gallery
    # (reference `make_comparison.py:60-88`: visualize_chamfer_distance_pool
    # then render_meshes for GT / input clouds / per-method CD meshes)
    renders: typing.Optional[dict] = None
    pc_renders = gt_renders = None
    if render:
        from ppsurf_tpu.utils.visualization import render_meshes

        gts = [os.path.join(gt_dir, f"{n}.ply") for n in shape_names]
        gt_renders = [
            os.path.join(comp_ds_dir, "renders", "gt", f"{n}.png")
            for n in shape_names
        ]
        render_meshes(gts, gt_renders, workers)

        pc_dir = os.path.join(data_dir, dataset, "04_pts_vis")
        pcs = [os.path.join(pc_dir, f"{n}.xyz.ply") for n in shape_names]
        if not all(os.path.isfile(p) for p in pcs):
            pcs = [os.path.join(pc_dir, f"{n}.ply") for n in shape_names]
        pc_renders = [
            os.path.join(comp_ds_dir, "renders", "pc", f"{n}.png")
            for n in shape_names
        ]
        render_meshes(pcs, pc_renders, workers)

        renders = {}
        for m in methods:
            rec_dir = os.path.join(results_dir, m, dataset, "meshes")
            out_dir = os.path.join(results_dir, m, dataset, "cd_vis")
            recs = [os.path.join(rec_dir, f"{n}.xyz.ply") for n in shape_names]
            outs = [os.path.join(out_dir, f"{n}.xyz.ply") for n in shape_names]
            visualize_chamfer_distance_pool(recs, gts, outs, dist_cut_off, workers)
            pngs = [
                os.path.join(results_dir, m, dataset, "cd_vis_renders", f"{n}.png")
                for n in shape_names
            ]
            render_meshes(
                [o for o in outs if os.path.isfile(o)],
                [p for o, p in zip(outs, pngs) if os.path.isfile(o)],
                workers,
            )
            for n, p in zip(shape_names, pngs):
                if os.path.isfile(p):
                    renders[(m, n)] = p

    # HTML gallery with the metric matrix
    def metric_matrix(metric_file: str) -> np.ndarray:
        rows = []
        for m in methods:
            path = os.path.join(results_dir, m, dataset, metric_file)
            try:
                df = read_metrics_table(path)
                rows.append(df.iloc[:, 0].to_numpy())
            except (FileNotFoundError, IndexError):
                rows.append(np.full(len(shape_names), np.nan))
        return np.asarray(rows)

    make_html_report(
        os.path.join(comp_dir, "reports", html_name.replace(".html", f"_{dataset}.html")),
        comp_name=f"{comp_name} — {dataset}",
        shape_names=shape_names,
        methods=list(methods),
        metrics_cd=metric_matrix("chamfer_distance.xlsx"),
        metrics_iou=metric_matrix("iou.xlsx"),
        metrics_nc=metric_matrix("normal_error.xlsx"),
        renders=renders,
        pc_renders=pc_renders,
        gt_renders=gt_renders,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="datasets")
    parser.add_argument("--results_dir", type=str, default="results")
    parser.add_argument("--dataset_names", type=str, nargs="+", required=True)
    parser.add_argument("--methods", type=str, nargs="*", default=None)
    parser.add_argument("--comp_dir", type=str, default="results/comp")
    parser.add_argument("--comp_name", type=str, default="comp")
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--dist_cut_off", type=float, default=0.03)
    parser.add_argument("--render", action="store_true")
    args = parser.parse_args(argv)

    for dataset in args.dataset_names:
        comparison_main(
            data_dir=args.data_dir,
            results_dir=args.results_dir,
            dataset=dataset,
            workers=args.workers,
            dist_cut_off=args.dist_cut_off,
            comp_name=args.comp_name,
            comp_dir=args.comp_dir,
            methods=args.methods,
            render=args.render,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
