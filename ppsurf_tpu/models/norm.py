"""Normalization layers matching the reference's torch semantics.

- `BatchNorm`: torch BatchNorm1d over channels-last tensors (normalizes over
  all non-channel axes, running stats with torch momentum 0.1). Stats are
  *local* to the device under data parallelism, matching Lightning DDP's
  unsynced BatchNorm in the reference (SURVEY.md §7 hard part 5): no
  `axis_name` is passed, so no cross-device collective is generated.
- `InstanceNorm`: torch InstanceNorm2d (affine) — per (batch, channel)
  statistics over the spatial axes, no running stats. Used by the FKAConv
  kernel-weight net (`source/base/nn.py:586-587`).
"""
from __future__ import annotations

import typing

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNorm(nn.Module):
    """Channels-last BatchNorm with torch-style defaults (first-party).

    Statistics reduce over all non-channel axes in f32; running stats use
    torch momentum 0.1 (new = 0.9*old + 0.1*batch). The eval path folds the
    running stats into one multiply-add — flax's eval-mode BatchNorm fusion
    crashed XLA's TransformWindow pass on v5e for (B, 40, 1024) encoder
    activations; this formulation compiles cleanly and is numerically
    identical.
    """

    momentum: float = 0.9  # flax convention; == torch momentum 0.1
    epsilon: float = 1e-5
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        num_ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (num_ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (num_ch,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((num_ch,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((num_ch,), jnp.float32)
        )

        out_dtype = x.dtype if self.dtype is None else self.dtype
        if train:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            if not self.is_initializing():
                ra_mean.value = ra_mean.value * self.momentum + mean * (
                    1.0 - self.momentum
                )
                ra_var.value = ra_var.value * self.momentum + var * (
                    1.0 - self.momentum
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        y = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return y.astype(out_dtype)


class InstanceNorm(nn.Module):
    """Affine instance norm over all axes except batch (0) and channel (-1)."""

    epsilon: float = 1e-5
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x):
        num_ch = x.shape[-1]
        reduce_axes = tuple(range(1, x.ndim - 1))
        # stats in f32 for stability regardless of compute dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=reduce_axes, keepdims=True)
        var = jnp.var(x32, axis=reduce_axes, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (num_ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (num_ch,), jnp.float32)
        y = (x32 - mean) / jnp.sqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype if self.dtype is None else self.dtype)
