"""FKAConv point-convolution encoder, channels-last for the MXU.

Re-implements the reference's `FKAConvLayer`, `ResidualBlock` and
`FKAConvNetwork` (`source/base/nn.py:420-652`) as pure-functional flax
modules. Design changes for TPU:

- channels-last (B, N, C) layout: the two hot contractions per layer
  (neighbor-features x kernel-weights and the (C x K) output projection) are
  expressed as einsums that XLA maps straight onto the MXU.
- the learned-normalization radius EMA (`nn.py:608-613`) lives in the
  `batch_stats` collection and is updated only when `train=True`.
- all gathers are `take_along_axis` over static-shape id tensors produced by
  `ppsurf_tpu.ops.graph` (on device), not CPU kd-trees.
"""
from __future__ import annotations

import typing

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppsurf_tpu.models.norm import BatchNorm, InstanceNorm

Array = jax.Array


def gather_neighbors(values: Array, ids: Array) -> Array:
    """Gather per-point values for neighbor ids.

    values: (B, N, C); ids: (B, M, K) -> (B, M, K, C).
    Replaces reference `batch_gather` (`nn.py:655-674`).
    """
    b, m, k = ids.shape
    flat = ids.reshape(b, m * k)
    out = jnp.take_along_axis(values, flat[..., None], axis=1)
    return out.reshape(b, m, k, values.shape[-1])


def max_pool_neighbors(values: Array, ids: Array) -> Array:
    """Max over gathered neighbors (reference `max_pool`, `nn.py:677-680`).

    Implemented as argmax + take_along_axis: same values and subgradient as
    jnp.max, but the backward pass lowers to a scatter instead of the
    reduce-window gradient that crashes XLA's TransformWindow fusion on
    v5e for (B, 39, 1024)-shaped downsample shortcuts.
    """
    gathered = gather_neighbors(values, ids)  # (B, M, K, C)
    idx = jax.lax.stop_gradient(jnp.argmax(gathered, axis=2, keepdims=True))
    return jnp.take_along_axis(gathered, idx, axis=2)[:, :, 0, :]


def interpolate(values: Array, ids: Array) -> Array:
    """Mean over k gathered neighbors (reference `interpolate`, `nn.py:684-697`).

    ids: (B, M, K); negative ids (absent in our static pipeline) would be
    clamped to 0 like the reference masks them.
    """
    ids = jnp.maximum(ids, 0)
    gathered = gather_neighbors(values, ids)
    if ids.shape[-1] > 1:
        return jnp.mean(gathered, axis=2)
    return gathered[:, :, 0, :]


class FKAConvLayer(nn.Module):
    """Feature-Kernel-Alignment convolution (reference `nn.py:557-652`)."""

    out_channels: int
    kernel_size: int = 16
    activation: typing.Callable = nn.relu
    norm_radius_momentum: float = 0.1
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,  # (B, N, C)
        pts: Array,  # (B, N, 3)
        support_points: Array,  # (B, M, 3)
        neighbors_indices: Array,  # (B, M, K)
        train: bool = False,
    ) -> Array:
        ksize = self.kernel_size
        in_channels = x.shape[-1]

        ptsg = gather_neighbors(pts, neighbors_indices)  # (B, M, K, 3)
        xg = gather_neighbors(x, neighbors_indices)  # (B, M, K, C)

        # local coordinates centered on the support point
        local = ptsg - support_points[:, :, None, :]
        distances = jnp.sqrt(
            jnp.maximum(jnp.sum(jax.lax.stop_gradient(local) ** 2, axis=-1), 0.0)
        )  # (B, M, K)

        # EMA-learned normalization radius (`nn.py:608-616`)
        norm_radius = self.variable(
            "batch_stats", "norm_radius", lambda: jnp.ones((), jnp.float32)
        )
        if train and not self.is_initializing():
            mean_radius = jnp.mean(jnp.max(distances, axis=2))
            norm_radius.value = (
                norm_radius.value * (1.0 - self.norm_radius_momentum)
                + mean_radius * self.norm_radius_momentum
            )
        local = (local / norm_radius.value).astype(self.dtype)

        # sigmoid distance weights (`nn.py:619-624`)
        alpha = self.param("alpha", nn.initializers.ones, (), jnp.float32)
        beta = self.param("beta", nn.initializers.ones, (), jnp.float32)
        dw = jax.nn.sigmoid(-alpha * distances + beta)
        dw_sum = jnp.sum(dw, axis=2, keepdims=True)
        dw_sum = dw_sum + (dw_sum == 0.0) + 1e-6
        dw = (dw / dw_sum * distances.shape[2]).astype(self.dtype)  # (B, M, K)

        act = self.activation
        num_k = neighbors_indices.shape[-1]

        def fc(name, features):
            return nn.Dense(ksize, use_bias=False, name=name, dtype=self.dtype)(features)

        # kernel-weight estimation net (`nn.py:627-643`)
        mat = fc("fc1", local)
        mat = act(mat if num_k == 1 else InstanceNorm(name="bn1", dtype=self.dtype)(mat))
        mp1 = jnp.max(mat * dw[..., None], axis=2, keepdims=True)
        mat = jnp.concatenate([mat, jnp.broadcast_to(mp1, mat.shape)], axis=-1)
        mat = fc("fc2", mat)
        mat = act(mat if num_k == 1 else InstanceNorm(name="bn2", dtype=self.dtype)(mat))
        mp2 = jnp.max(mat * dw[..., None], axis=2, keepdims=True)
        mat = jnp.concatenate([mat, jnp.broadcast_to(mp2, mat.shape)], axis=-1)
        mat = act(fc("fc3", mat)) * dw[..., None]  # (B, M, K, ksize)

        # features = (x^T · mat) then (1, K)-conv == two MXU einsums
        # (`nn.py:647-650`)
        xg = xg.astype(self.dtype)
        feats = jnp.einsum(
            "bmkc,bmkj->bmcj", xg, mat, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        w_cv = self.param(
            "cv",
            nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2),
            (in_channels, ksize, self.out_channels),
            jnp.float32,
        )
        out = jnp.einsum(
            "bmcj,cjo->bmo", feats, w_cv.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return out.astype(self.dtype)


class ResidualBlock(nn.Module):
    """Bottleneck residual block around FKAConv (reference `nn.py:420-450`)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 16
    activation: typing.Callable = nn.relu  # inner FKAConv kernel-net activation
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, pts, support_points, neighbors_indices, train: bool = False):
        half = self.in_channels // 2
        relu = nn.relu  # block-level activation is always ReLU (`nn.py:432`)

        h = nn.Dense(half, name="cv0", dtype=self.dtype)(x)
        h = relu(BatchNorm(name="bn0", dtype=self.dtype)(h, train))
        h = FKAConvLayer(
            half, self.kernel_size, activation=self.activation, name="cv1",
            dtype=self.dtype,
        )(h, pts, support_points, neighbors_indices, train)
        h = relu(BatchNorm(name="bn1", dtype=self.dtype)(h, train))
        h = nn.Dense(self.out_channels, name="cv2", dtype=self.dtype)(h)
        h = BatchNorm(name="bn2", dtype=self.dtype)(h, train)

        x_short = x
        if self.in_channels != self.out_channels:
            x_short = nn.Dense(self.out_channels, name="shortcut", dtype=self.dtype)(x_short)
            x_short = BatchNorm(name="bn_shortcut", dtype=self.dtype)(x_short, train)
        if x_short.shape[1] != h.shape[1]:  # downsampling level
            x_short = max_pool_neighbors(x_short, neighbors_indices)

        return relu(h + x_short)


class FKAConvNetwork(nn.Module):
    """Residual FKAConv U-Net (reference `nn.py:453-554`).

    segmentation=True gives the per-point latent head used by POCO/PPSurf.
    `x4d_bug_fixed=False` reproduces the reference POCO quirk where the
    global-max bottleneck (cv5) output is discarded (`nn.py:530-534`).
    """

    in_channels: int = 3
    out_channels: int = 256
    segmentation: bool = True
    hidden: int = 64
    dropout: float = 0.0
    activation: typing.Callable = nn.relu  # FKAConv kernel-net activation
    x4d_bug_fixed: bool = True
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, data: typing.Dict[str, Array], train: bool = False) -> Array:
        hd = self.hidden
        relu = nn.relu
        dt = self.dtype

        pts = data["pts"]  # (B, N, 3)
        x = jnp.ones_like(pts, dtype=dt)  # reference feeds ones (`nn.py:517`)

        def res(name, cin, cout):
            return ResidualBlock(
                cin, cout, 16, activation=self.activation, name=name, dtype=dt
            )

        x0 = FKAConvLayer(hd, 16, activation=self.activation, name="cv0", dtype=dt)(
            x, pts, pts, data["ids00"], train
        )
        x0 = relu(BatchNorm(name="bn0", dtype=dt)(x0, train))
        x0 = res("resnetb01", hd, hd)(x0, pts, pts, data["ids00"], train)
        x1 = res("resnetb10", hd, 2 * hd)(x0, pts, data["support1"], data["ids01"], train)
        x1 = res("resnetb11", 2 * hd, 2 * hd)(
            x1, data["support1"], data["support1"], data["ids11"], train
        )
        x2 = res("resnetb20", 2 * hd, 4 * hd)(
            x1, data["support1"], data["support2"], data["ids12"], train
        )
        x2 = res("resnetb21", 4 * hd, 4 * hd)(
            x2, data["support2"], data["support2"], data["ids22"], train
        )
        x3 = res("resnetb30", 4 * hd, 8 * hd)(
            x2, data["support2"], data["support3"], data["ids23"], train
        )
        x3 = res("resnetb31", 8 * hd, 8 * hd)(
            x3, data["support3"], data["support3"], data["ids33"], train
        )
        x4 = res("resnetb40", 8 * hd, 16 * hd)(
            x3, data["support3"], data["support4"], data["ids34"], train
        )
        x4 = res("resnetb41", 16 * hd, 16 * hd)(
            x4, data["support4"], data["support4"], data["ids44"], train
        )

        if self.segmentation:
            # global max in f32: the bf16 select-and-scatter gradient hits an
            # XLA TransformWindow compiler crash on v5e (odd spatial size)
            x5 = jnp.broadcast_to(
                jnp.max(x4.astype(jnp.float32), axis=1, keepdims=True), x4.shape
            ).astype(x4.dtype)
            x4d = nn.Dense(16 * hd, name="cv5", dtype=dt)(
                jnp.concatenate([x4, x5], axis=-1)
            )
            x4d = relu(BatchNorm(name="bn5", dtype=dt)(x4d, train))
            if not self.x4d_bug_fixed:
                x4d = x4  # reference POCO bug path (`nn.py:533-534`)

            x3d = interpolate(x4d, data["ids43"])
            x3d = nn.Dense(8 * hd, name="cv3d", dtype=dt)(
                jnp.concatenate([x3d, x3], axis=-1)
            )
            x3d = relu(BatchNorm(name="bn3d", dtype=dt)(x3d, train))

            x2d = interpolate(x3d, data["ids32"])
            x2d = nn.Dense(4 * hd, name="cv2d", dtype=dt)(
                jnp.concatenate([x2d, x2], axis=-1)
            )
            x2d = relu(BatchNorm(name="bn2d", dtype=dt)(x2d, train))

            x1d = interpolate(x2d, data["ids21"])
            x1d = nn.Dense(2 * hd, name="cv1d", dtype=dt)(
                jnp.concatenate([x1d, x1], axis=-1)
            )
            x1d = relu(BatchNorm(name="bn1d", dtype=dt)(x1d, train))

            xout = interpolate(x1d, data["ids10"])
            xout = nn.Dense(hd, name="cv0d", dtype=dt)(
                jnp.concatenate([xout, x0], axis=-1)
            )
            xout = relu(BatchNorm(name="bn0d", dtype=dt)(xout, train))
            xout = nn.Dropout(self.dropout, deterministic=not train)(xout)
            xout = nn.Dense(self.out_channels, name="fcout", dtype=dt)(xout)
        else:
            xout = nn.Dropout(self.dropout, deterministic=not train)(x4)
            xout = nn.Dense(self.out_channels, name="fcout", dtype=dt)(xout)
            xout = jnp.mean(xout, axis=1)
        return xout
