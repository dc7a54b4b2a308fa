"""Interpolation-attention decoder (POCO projection head).

Re-implements the reference `InterpAttentionKHeadsNet`
(`source/poco_model.py:362-419`): for each query point, gather the k=64
nearest per-point latents and relative positions, run a 3-layer 1x1-conv
stack, and blend neighbor values with a 64-head softmax attention averaged
over heads. Channels-last; the gathers use on-device `proj_ids` from
`ppsurf_tpu.ops.graph.build_proj_ids`.
"""
from __future__ import annotations

import typing

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppsurf_tpu.models.fkaconv import gather_neighbors

Array = jax.Array


class InterpAttentionKHeadsNet(nn.Module):
    latent_size: int
    out_channels: int
    k: int = 64
    num_heads: int = 64
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        latents: Array,  # (B, N, L)
        pts: Array,  # (B, N, 3)
        pts_query: Array,  # (B, Q, 3)
        proj_ids: Array,  # (B, Q, k)
        last_layer: bool = True,
        latents_projected: bool = False,
    ) -> Array:
        """latents_projected=True: `latents` already hold
        fc1_kernel[:L] @ latent + fc1_bias per point (computed once per
        shape by FieldEvaluator), so fc1 here only contributes the tiny
        relative-position term — the (Q*k, L, L) matmul disappears from
        every reconstruction chunk. Identical math, reassociated."""
        dt = self.dtype
        x = gather_neighbors(latents, proj_ids)  # (B, Q, k, L)
        neigh = gather_neighbors(pts, proj_ids)  # (B, Q, k, 3)
        rel = (pts_query[:, :, None, :] - neigh).astype(dt)

        if latents_projected:
            rel_term = nn.Dense(
                self.latent_size, name="fc1", use_bias=False, dtype=dt
            )(rel)
            x = nn.relu(x.astype(dt) + rel_term)
        else:
            x = jnp.concatenate([x.astype(dt), rel], axis=-1)
            x = nn.relu(nn.Dense(self.latent_size, name="fc1", dtype=dt)(x))
        x = nn.relu(nn.Dense(self.latent_size, name="fc2", dtype=dt)(x))
        x = nn.relu(nn.Dense(self.latent_size, name="fc3", dtype=dt)(x))

        query = nn.Dense(self.num_heads, name="fc_query", dtype=dt)(x)  # (B, Q, k, H)
        value = nn.Dense(self.latent_size, name="fc_value", dtype=dt)(x)  # (B, Q, k, L)

        # softmax over neighbors per head, then mean over heads
        # (`poco_model.py:412`)
        attention = jax.nn.softmax(query, axis=2).mean(axis=-1)  # (B, Q, k)
        out = jnp.einsum(
            "bqk,bqkl->bql", attention, value, preferred_element_type=jnp.float32
        ).astype(dt)

        if last_layer:
            out = nn.Dense(self.out_channels, name="fc8", dtype=dt)(out)
        return out
