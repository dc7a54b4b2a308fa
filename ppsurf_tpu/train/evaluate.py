"""`test` subcommand: per-shape classification eval + report.

Parity target: reference `PocoModel.test_step` / `on_test_epoch_end`
(`source/poco_model.py:134-181`): batch size 1 over the testset, per-shape
loss + confusion metrics, aggregated into `metrics_{name}.xlsx` (we emit
CSV alongside; see ppsurf_tpu.eval.reports).
"""
from __future__ import annotations

import os
import typing

import jax
import jax.numpy as jnp
import numpy as np

from ppsurf_tpu.data.datasets import ShapeDataset, get_results_dir, read_shape_list
from ppsurf_tpu.eval.reports import make_test_report
from ppsurf_tpu.metrics.classification import (
    compare_predictions_binary_arrays,
)
from ppsurf_tpu.train.loop import cross_entropy_loss
from ppsurf_tpu.train.model import ModelSpec


def run_test(
    spec: ModelSpec,
    variables: dict,
    dataset: ShapeDataset,
    results_dir: typing.Optional[str] = None,
    knn_tile: int = 512,
    seed: int = 42,
) -> typing.Tuple[float, float, float]:
    """Evaluate the classifier on GT query points for every test shape."""
    net = spec.make_network()

    @jax.jit
    def forward(batch, key):
        data = spec.assemble_step_data(batch, key, knn_tile=knn_tile)
        return net.apply(variables, data, False)

    key = jax.random.key(seed)
    per_shape: typing.Dict[str, list] = {
        "loss": [], "loss_components_mean": [], "abs_dist_rms": [],
        "accuracy": [], "precision": [], "recall": [], "f1_score": [],
    }

    for idx in range(len(dataset)):
        item = dataset[idx]
        batch = {
            k: jnp.asarray(v)[None]
            for k, v in item.items()
            if k in ("pts_ms", "pts_query_ms", "occ", "pts_raw_ms", "raw_valid")
        }
        key, step_key = jax.random.split(key)
        logits = forward(batch, step_key)
        loss = float(cross_entropy_loss(logits, batch["occ"]))
        pred = np.asarray(jnp.argmax(logits, axis=-1))[0]
        occ = item["occ"]
        m = compare_predictions_binary_arrays(occ, pred, dataset.shape_names[idx])

        per_shape["loss"].append(loss)
        per_shape["loss_components_mean"].append(loss)
        per_shape["abs_dist_rms"].append(np.nan)  # reference logs NaN here
        for k in ("accuracy", "precision", "recall", "f1_score"):
            per_shape[k].append(m[k])
        print(
            f"test [{idx + 1}/{len(dataset)}] {dataset.shape_names[idx]}: "
            f"loss={loss:.4f} f1={m['f1_score']:.4f}"
        )

    rdir = results_dir or get_results_dir(spec.results_dir, spec.name, dataset.in_file)
    os.makedirs(rdir, exist_ok=True)
    output_file = os.path.join(rdir, f"metrics_{spec.name}.xlsx")
    results_np = {k: np.asarray(v) for k, v in per_shape.items()}
    loss_mean, rmse_mean, f1_mean = make_test_report(
        shape_names=dataset.shape_names,
        results=results_np,
        output_file=output_file,
        output_names=list(spec.output_names),
    )
    print(
        f"Test results (mean): Loss={loss_mean}, RMSE={rmse_mean}, F1={f1_mean}"
    )
    return loss_mean, rmse_mean, f1_mean


def evaluate_reconstructions(
    spec: ModelSpec,
    in_file: str,
    results_dir: typing.Optional[str] = None,
    num_samples: int = 100000,
) -> typing.Optional[typing.Dict[str, str]]:
    """Post-predict quantitative eval (reference `on_predict_epoch_end`,
    `poco_model.py:275-300`)."""
    from ppsurf_tpu.data.datasets import get_meshes_dir, in_file_is_dataset
    from ppsurf_tpu.eval.reports import make_quantitative_comparison

    if not in_file_is_dataset(in_file):
        return None
    rdir = results_dir or get_results_dir(spec.results_dir, spec.name, in_file)
    shape_names = read_shape_list(in_file)
    gt_dir = get_meshes_dir(in_file)
    if not os.path.exists(gt_dir):
        print(f"Warning: {gt_dir} not found. Skipping evaluation.")
        return None
    gt_meshes = [os.path.join(gt_dir, f"{n}.ply") for n in shape_names]
    os.makedirs(rdir, exist_ok=True)
    return make_quantitative_comparison(
        shape_names=shape_names,
        gt_mesh_files=gt_meshes,
        result_headers=[spec.name],
        result_file_templates=[os.path.join(rdir, "meshes/{}.xyz.ply")],
        comp_output_dir=rdir,
        num_samples=num_samples,
        num_processes=spec.workers,
    )
