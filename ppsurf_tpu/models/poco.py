"""POCO network: FKAConv encoder + interpolation-attention decoder.

Re-implements reference `PocoNetwork` (`source/poco_model.py:332-359`).
The graph ids are expected in `data` (built on device by
`ppsurf_tpu.ops.graph`); the network itself is a pure function of
(params, data).
"""
from __future__ import annotations

import typing

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppsurf_tpu.models.decoder import InterpAttentionKHeadsNet
from ppsurf_tpu.models.fkaconv import FKAConvNetwork

Array = jax.Array


class PocoNetwork(nn.Module):
    in_channels: int = 3
    latent_size: int = 32
    out_channels: int = 2
    k: int = 64
    dtype: typing.Any = jnp.float32

    def setup(self):
        # x4d_bug_fixed=False replicates the reference POCO configuration
        # (`poco_model.py:337`).
        self.encoder = FKAConvNetwork(
            self.in_channels,
            self.latent_size,
            segmentation=True,
            dropout=0.0,
            x4d_bug_fixed=False,
            dtype=self.dtype,
            name="encoder",
        )
        self.projection = InterpAttentionKHeadsNet(
            self.latent_size, self.out_channels, self.k, dtype=self.dtype,
            name="projection",
        )

    def __call__(self, data: typing.Dict[str, Array], train: bool = False) -> Array:
        """Full forward: (B, Q, out_channels) logits at the query points."""
        latents = self.encoder(data, train)
        return self.projection(
            latents, data["pts"], data["pts_query"], data["proj_ids"], last_layer=True
        )

    def get_latent(self, data: typing.Dict[str, Array], train: bool = False) -> Array:
        """Encoder only -> per-point latents (B, N, L)."""
        return self.encoder(data, train)

    def from_latent(self, data: typing.Dict[str, Array]) -> Array:
        """Decoder only, for reconstruction-time field evaluation.

        A precomputed `feat_proj` (fused Pallas decoder tail,
        ops/decoder_pallas.py) replaces the projection call."""
        if "feat_proj" in data:
            return data["feat_proj"]
        return self.projection(
            data["latents"], data["pts"], data["pts_query"], data["proj_ids"],
            last_layer=True,
            latents_projected=bool(data.get("latents_projected", False)),
        )
