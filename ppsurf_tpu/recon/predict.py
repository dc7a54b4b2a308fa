"""Per-shape reconstruction driver (the `predict`/`rec` subcommands).

Parity target: reference `PocoModel.predict_step`
(`source/poco_model.py:183-273`): latent accumulation over the full cloud,
region-grown field evaluation, marching cubes, vertex refinement,
denormalization for single-file inputs, PLY export.
"""
from __future__ import annotations

import os
import time
import typing

import jax
import numpy as np

from ppsurf_tpu.data.datasets import (
    ShapeDataset,
    get_results_dir,
    in_file_is_dataset,
)
from ppsurf_tpu.io.ply import Mesh
from ppsurf_tpu.recon.engine import reconstruct_mesh
from ppsurf_tpu.recon.field import FieldEvaluator, LatentEncoder
from ppsurf_tpu.train.model import ModelSpec
from ppsurf_tpu.utils import math3d


class Predictor:
    def __init__(
        self,
        spec: ModelSpec,
        variables: dict,
        knn_tile: int = 512,
        verbose: bool = True,
        devices: typing.Optional[int] = None,
    ):
        """devices: shard reconstruction query chunks over this many local
        devices (data-parallel inference — the reference is restricted to
        one GPU, `poco_model.py:189-190`). None/1 = single device; values
        above the local device count are clamped."""
        self.spec = spec
        self.net = spec.make_network()
        self.variables = variables
        self.knn_tile = knn_tile
        self.verbose = verbose
        self.encoder = LatentEncoder(self.net, spec, knn_tile=knn_tile)
        self.mesh = None
        n_dev = len(jax.devices())
        if devices is not None and min(devices, n_dev) > 1:
            from ppsurf_tpu.parallel.mesh import get_data_mesh

            self.mesh = get_data_mesh(min(devices, n_dev))

    def _progress(self, msg: str):
        if self.verbose:
            print(f"  [rec] {msg}", flush=True)

    def reconstruct_shape(
        self,
        pts_raw: np.ndarray,
        seed: int = 42,
        resolution: typing.Optional[int] = None,
    ) -> typing.Optional[Mesh]:
        """Reconstruct one (normalized) cloud -> mesh in normalized space."""
        spec = self.spec
        key = jax.random.key(seed)

        # manifold cloud for the encoder/decoder support: the reference
        # encodes the *full* cloud via random 10k subsets and keeps one
        # latent per input point (`poco_model.py:200-236`)
        t0 = time.time()
        latents = self.encoder(self.variables, pts_raw, key)
        self._progress(
            f"latents for {pts_raw.shape[0]} pts in {time.time() - t0:.2f}s"
        )

        evaluator = FieldEvaluator(
            self.net, spec, self.variables, pts_raw, latents,
            pts_raw=pts_raw if spec.is_ppsurf else None, knn_tile=self.knn_tile,
            mesh=self.mesh,
        )

        # keep the (large) object graph of freshly compiled programs out
        # of gen-2 GC passes — they otherwise fire mid-reconstruction as
        # multi-second spikes inside numpy allocations
        from ppsurf_tpu.utils.alloc import freeze_gc

        freeze_gc()

        mesh = reconstruct_mesh(
            evaluator,
            input_points=pts_raw,
            resolution=resolution or spec.gen_resolution_global,
            padding=1,
            mc_value=0.0,
            refine_iter=spec.gen_refine_iter,
            out_value=1.0,
            progress=self._progress if self.verbose else None,
            refine_device=evaluator.refine_bisection,
            # speculative prefill stays off for trained fields: growth
            # terminates in ~7 rounds and the seed-crust round already
            # batches millions of queries into a few grouped dispatches,
            # so bands mostly evaluate voxels no later round consumes
            # (bench.py A/B; the engine machinery remains for degenerate
            # many-round fields via prefill_radius > dilation_size)
            prefill_radius=0,
        )
        return mesh

    def predict_dataset(
        self,
        dataset: ShapeDataset,
        results_dir: typing.Optional[str] = None,
        seed: int = 42,
    ) -> typing.List[typing.Tuple[str, typing.Optional[str], float]]:
        """Reconstruct every shape; returns (name, out_file|None, seconds)."""
        spec = self.spec
        in_file = dataset.in_file
        results = []
        for idx, name in enumerate(dataset.shape_names):
            t0 = time.time()
            pts_raw, _ = dataset.load_raw_shape(idx)

            if in_file_is_dataset(in_file):
                rdir = results_dir or get_results_dir(
                    spec.results_dir, spec.name, in_file
                )
                out_file = os.path.join(
                    rdir, "meshes", os.path.basename(name) + ".xyz.ply"
                )
            else:
                base = os.path.basename(in_file)
                out_file = os.path.join(
                    results_dir or spec.results_dir, base, base + ".ply"
                )

            mesh = self.reconstruct_shape(pts_raw, seed=seed)

            if mesh is None:
                print(f"No reconstruction for {name}")
                results.append((name, None, time.time() - t0))
                continue

            if not in_file_is_dataset(in_file):
                # de-normalize single-file inputs (`poco_model.py:256-265`)
                from ppsurf_tpu.io.point_cloud import load_pts, pre_process_pts

                pts_orig, _ = pre_process_pts(load_pts(in_file))
                center, scale = math3d.get_points_normalization_info(
                    pts_orig, spec.padding_factor
                )
                mesh = Mesh(
                    vertices=math3d.denormalize_points_with_info(
                        mesh.vertices.astype(np.float64), center, scale
                    ).astype(np.float32),
                    faces=mesh.faces,
                )

            os.makedirs(os.path.dirname(out_file), exist_ok=True)
            mesh.export(out_file)
            dt = time.time() - t0
            self._progress(f"{name}: {dt:.2f}s -> {out_file}")
            results.append((name, out_file, dt))
        return results
