"""PPSurf network: global POCO branch + local PointNet branch, sum-fused.

Re-implements reference `PPSurfNetwork` (`source/ppsurf_model.py:39-117`):
- FKAConv encoder with SiLU kernel-net activation and the x4d bug fixed,
- InterpAttentionKHeadsNet projecting latents (latent -> latent),
- PointNetfeat over per-query local patches (feature-STN only, attention
  pooling), with the (B*Q) flattening of patches as the batch axis,
- sum fusion + 3-layer constant-width MLP with dropout 0.3 -> 2 logits.
"""
from __future__ import annotations

import typing

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppsurf_tpu.models.decoder import InterpAttentionKHeadsNet
from ppsurf_tpu.models.fkaconv import FKAConvNetwork
from ppsurf_tpu.models.pointnet import MLP, PointNetfeat

Array = jax.Array


class PPSurfNetwork(nn.Module):
    in_channels: int = 3
    latent_size: int = 256
    out_channels: int = 2
    k: int = 64
    num_pts_local: int = 50
    pointnet_latent_size: int = 256
    dtype: typing.Any = jnp.float32

    def setup(self):
        self.encoder = FKAConvNetwork(
            self.in_channels,
            self.latent_size,
            segmentation=True,
            dropout=0.0,
            activation=nn.silu,  # `ppsurf_model.py:50`
            x4d_bug_fixed=True,
            dtype=self.dtype,
            name="encoder",
        )
        self.projection = InterpAttentionKHeadsNet(
            self.latent_size, self.latent_size, self.k, dtype=self.dtype,
            name="projection",
        )
        self.point_net = PointNetfeat(
            net_size_max=self.pointnet_latent_size,
            output_size=self.latent_size,
            use_point_stn=False,
            use_feat_stn=True,
            sym_op="att",
            dim=3,
            dtype=self.dtype,
            name="point_net",
        )
        self.mlp = MLP(
            output_size=self.out_channels,
            num_layers=3,
            halving_size=False,
            dropout=0.3,
            dtype=self.dtype,
            name="mlp",
        )

    def __call__(self, data: typing.Dict[str, Array], train: bool = False) -> Array:
        latents = self.encoder(data, train)
        data = dict(data)
        data["latents"] = latents
        return self.from_latent(data, train)

    def get_latent(self, data: typing.Dict[str, Array], train: bool = False) -> Array:
        return self.encoder(data, train)

    def from_latent(self, data: typing.Dict[str, Array], train: bool = False) -> Array:
        """Decoder + local branch from precomputed latents.

        Needs: latents (B, N, L), pts (B, N, 3), pts_query (B, Q, 3),
        proj_ids (B, Q, k), pts_local_ps (B, Q, P, 3).
        Returns (B, Q, out_channels) logits.

        A precomputed `feat_proj` (e.g. from the fused Pallas decoder tail,
        ops/decoder_pallas.py) replaces the projection call.
        """
        if "feat_proj" in data:
            feat_proj = data["feat_proj"]
        else:
            feat_proj = self.projection(
                data["latents"], data["pts"], data["pts_query"],
                data["proj_ids"], last_layer=True,
                latents_projected=bool(data.get("latents_projected", False)),
            )  # (B, Q, L)

        if "feat_pn" in data:  # fused Pallas branch (ops/pointnet_pallas.py)
            feat_pn = data["feat_pn"]
        else:
            pts_local = data["pts_local_ps"]  # (B, Q, P, 3)
            b, q, p, _ = pts_local.shape
            flat = pts_local.reshape(b * q, p, 3)
            feat_pn_flat, _, _, _ = self.point_net(flat, train=train)
            feat_pn = feat_pn_flat.reshape(b, q, -1)  # (B, Q, L)

        feat_all = feat_proj + feat_pn  # sum fusion (`ppsurf_model.py:100`)

        b, q, _ = feat_all.shape
        logits_flat = self.mlp(feat_all.reshape(b * q, -1), train=train)
        return logits_flat.reshape(b, q, -1)
