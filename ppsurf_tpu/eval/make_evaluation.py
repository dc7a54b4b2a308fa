"""Standalone per-method evaluation driver.

Parity: reference `source/make_evaluation.py` — recompute CD/F1/IoU/NC
tables for any method's result directory against a dataset's GT meshes.

Usage:
    python -m ppsurf_tpu.eval.make_evaluation \
        --model_names ppsurf_50nn --dataset_names abc_minimal \
        [--results_dir results] [--data_dir datasets] [--num_samples 100000]
"""
from __future__ import annotations

import argparse
import os
import typing

from ppsurf_tpu.data.datasets import read_shape_list
from ppsurf_tpu.eval.reports import make_quantitative_comparison
from ppsurf_tpu.utils.fs import call_necessary


def evaluate_method_on_dataset(
    model_name: str,
    dataset_name: str,
    results_dir: str = "results",
    data_dir: str = "datasets",
    num_samples: int = 100000,
    workers: int = 8,
    force: bool = False,
) -> typing.Optional[dict]:
    in_file = os.path.join(data_dir, dataset_name, "testset.txt")
    if not os.path.isfile(in_file):
        print(f"skip {dataset_name}: no {in_file}")
        return None
    shape_names = read_shape_list(in_file)
    gt_dir = os.path.join(data_dir, dataset_name, "03_meshes")
    gt_meshes = [os.path.join(gt_dir, f"{n}.ply") for n in shape_names]
    method_dir = os.path.join(results_dir, model_name, dataset_name)
    template = os.path.join(method_dir, "meshes/{}.xyz.ply")

    outputs = [
        os.path.join(method_dir, f) for f in
        ("chamfer_distance.csv", "f1.csv", "iou.csv", "normal_error.csv")
    ]
    rec_meshes = [template.format(n) for n in shape_names]
    if not force and not call_necessary(gt_meshes + rec_meshes, outputs):
        print(f"skip {model_name}/{dataset_name}: up to date")
        return None

    return make_quantitative_comparison(
        shape_names=shape_names,
        gt_mesh_files=gt_meshes,
        result_headers=[model_name],
        result_file_templates=[template],
        comp_output_dir=method_dir,
        num_samples=num_samples,
        num_processes=workers,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_names", type=str, nargs="+", required=True)
    parser.add_argument("--dataset_names", type=str, nargs="+", required=True)
    parser.add_argument("--results_dir", type=str, default="results")
    parser.add_argument("--data_dir", type=str, default="datasets")
    parser.add_argument("--num_samples", type=int, default=100000)
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args(argv)

    for model in args.model_names:
        for dataset in args.dataset_names:
            print(f"evaluating {model} on {dataset}")
            evaluate_method_on_dataset(
                model, dataset, args.results_dir, args.data_dir,
                args.num_samples, args.workers,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
