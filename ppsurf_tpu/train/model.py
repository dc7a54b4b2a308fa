"""Model specifications: network factory + step-side data assembly.

Mirrors the configuration surface of the reference `PocoModel` /
`PPSurfModel` LightningModules (`source/poco_model.py:19-52`,
`source/ppsurf_model.py:10-36`) as plain dataclasses; the step logic itself
is pure-functional in `ppsurf_tpu.train.loop`.
"""
from __future__ import annotations

import dataclasses
import typing

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppsurf_tpu.models import PocoNetwork, PPSurfNetwork
from ppsurf_tpu.ops.graph import build_fkaconv_graph, build_proj_ids
from ppsurf_tpu.ops.patches import extract_local_patches

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static model configuration (reference `configs/poco.yaml:41-59` +
    `configs/ppsurf.yaml:4-13`)."""

    name: str = "ppsurf"
    kind: str = "ppsurf"  # 'poco' | 'ppsurf'
    in_channels: int = 3
    out_channels: int = 2
    k: int = 64  # decoder neighborhood
    network_latent_size: int = 256
    pointnet_latent_size: int = 256
    num_pts_local: typing.Optional[int] = 50  # None for POCO
    gen_subsample_manifold: int = 10000
    gen_subsample_manifold_iter: int = 10
    gen_resolution_global: int = 257
    rec_batch_size: int = 50000
    gen_refine_iter: int = 10
    lambda_l1: float = 0.0
    output_names: typing.Tuple[str, ...] = ("imp_surf_sign",)
    workers: int = 8
    results_dir: str = "results"
    padding_factor: float = 0.05
    dtype: typing.Any = jnp.float32

    @property
    def is_ppsurf(self) -> bool:
        return self.kind == "ppsurf"

    def make_network(self) -> nn.Module:
        if self.is_ppsurf:
            return PPSurfNetwork(
                in_channels=self.in_channels,
                latent_size=self.network_latent_size,
                out_channels=self.out_channels,
                k=self.k,
                num_pts_local=self.num_pts_local,
                pointnet_latent_size=self.pointnet_latent_size,
                dtype=self.dtype,
            )
        return PocoNetwork(
            in_channels=self.in_channels,
            latent_size=self.network_latent_size,
            out_channels=self.out_channels,
            k=self.k,
            dtype=self.dtype,
        )

    def assemble_step_data(
        self, batch: typing.Dict[str, Array], key: Array, knn_tile: int = 512
    ) -> typing.Dict[str, Array]:
        """Build all on-device spatial inputs for one training/eval step.

        Replaces the reference's CPU DataLoader-worker hot path
        (`poco_data_loader.py:243-270` get_data_poco +
        `ppsurf_data_loader.py:61-89` patch queries) with jit-side ops.
        """
        pts = batch["pts_ms"]
        pts_query = batch["pts_query_ms"]
        data: typing.Dict[str, Array] = {"pts": pts, "pts_query": pts_query}
        data.update(build_fkaconv_graph(pts, key, segmentation=True, tile=knn_tile))
        data["proj_ids"] = build_proj_ids(pts, pts_query, k=self.k, tile=knn_tile)
        if self.is_ppsurf:
            data["pts_local_ps"] = extract_local_patches(
                batch["pts_raw_ms"],
                batch["raw_valid"],
                pts_query,
                num_pts_local=self.num_pts_local,
                tile=knn_tile,
            )
        return data


def poco_spec(**overrides) -> ModelSpec:
    """POCO baseline configuration (reference `configs/poco.yaml`)."""
    defaults = dict(
        name="poco", kind="poco", network_latent_size=32, num_pts_local=None
    )
    defaults.update(overrides)
    return ModelSpec(**defaults)


def ppsurf_spec(**overrides) -> ModelSpec:
    """PPSurf configuration (reference `configs/ppsurf.yaml` +
    `configs/ppsurf_50nn.yaml`)."""
    defaults = dict(
        name="ppsurf_50nn", kind="ppsurf", network_latent_size=256,
        pointnet_latent_size=256, num_pts_local=50,
    )
    defaults.update(overrides)
    return ModelSpec(**defaults)
