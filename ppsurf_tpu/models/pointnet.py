"""PointNet local-patch encoder with STN and attention pooling.

Re-implements the reference `STN`, `QSTN`, `AttentionPoco` and
`PointNetfeat` (`source/base/nn.py:72-373`) channels-last. The PPSurf
configuration (feature-STN only, attention symmetric op,
`source/ppsurf_model.py:52-53`) is the primary path; max/sum/wsum sym-ops
and the quaternion point-STN are kept for full parity with the reference's
options.
"""
from __future__ import annotations

import typing

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppsurf_tpu.models.norm import BatchNorm

Array = jax.Array


def batch_quat_to_rotmat(q: Array) -> Array:
    """Quaternion [a,b,c,d] batch -> rotation matrices (reference `nn.py:99-130`)."""
    s = 2.0 / jnp.sum(q * q, axis=1)  # (B,)
    h = jnp.einsum("bi,bj->bij", q, q)  # Hamilton products

    def e(i, j):
        return h[:, i, j]

    row0 = jnp.stack(
        [1 - (e(2, 2) + e(3, 3)) * s, (e(1, 2) - e(3, 0)) * s, (e(1, 3) + e(2, 0)) * s],
        axis=1,
    )
    row1 = jnp.stack(
        [(e(1, 2) + e(3, 0)) * s, 1 - (e(1, 1) + e(3, 3)) * s, (e(2, 3) - e(1, 0)) * s],
        axis=1,
    )
    row2 = jnp.stack(
        [(e(1, 3) - e(2, 0)) * s, (e(2, 3) + e(1, 0)) * s, 1 - (e(1, 1) + e(2, 2)) * s],
        axis=1,
    )
    return jnp.stack([row0, row1, row2], axis=1)


class STN(nn.Module):
    """Feature spatial-transformer: predicts a (dim x dim) matrix.

    Reference `nn.py:133-190`. Input (B, num_scales*num_points, dim)
    channels-last; with num_scales > 1 the per-scale max-pooled features are
    concatenated and merged through fc0 (reference `nn.py:158-181`).
    """

    net_size_max: int = 1024
    dim: int = 3
    num_scales: int = 1
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        dt = self.dtype
        h = nn.relu(BatchNorm(name="bn1", dtype=dt)(nn.Dense(64, name="conv1", dtype=dt)(x), train))
        h = nn.relu(BatchNorm(name="bn2", dtype=dt)(nn.Dense(128, name="conv2", dtype=dt)(h), train))
        h = nn.relu(
            BatchNorm(name="bn3", dtype=dt)(
                nn.Dense(self.net_size_max, name="conv3", dtype=dt)(h), train
            )
        )
        if self.num_scales == 1:
            h = jnp.max(h, axis=1)  # symmetric op over points
        else:
            num_points = h.shape[1] // self.num_scales
            h = jnp.max(
                h.reshape(h.shape[0], self.num_scales, num_points, -1), axis=2
            ).reshape(h.shape[0], -1)
            h = nn.relu(
                BatchNorm(name="bn0", dtype=dt)(
                    nn.Dense(self.net_size_max, name="fc0", dtype=dt)(h), train
                )
            )

        half, quarter = self.net_size_max // 2, self.net_size_max // 4
        h = nn.relu(BatchNorm(name="bn4", dtype=dt)(nn.Dense(half, name="fc1", dtype=dt)(h), train))
        h = nn.relu(BatchNorm(name="bn5", dtype=dt)(nn.Dense(quarter, name="fc2", dtype=dt)(h), train))
        h = nn.Dense(self.dim * self.dim, name="fc3", dtype=dt)(h)

        iden = jnp.eye(self.dim, dtype=h.dtype).reshape(1, -1)
        return (h + iden).reshape(-1, self.dim, self.dim)


class QSTN(nn.Module):
    """Quaternion point-transformer (reference `nn.py:193-252`)."""

    net_size_max: int = 1024
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        dt = self.dtype
        h = nn.relu(BatchNorm(name="bn1", dtype=dt)(nn.Dense(64, name="conv1", dtype=dt)(x), train))
        h = nn.relu(BatchNorm(name="bn2", dtype=dt)(nn.Dense(128, name="conv2", dtype=dt)(h), train))
        h = nn.relu(
            BatchNorm(name="bn3", dtype=dt)(
                nn.Dense(self.net_size_max, name="conv3", dtype=dt)(h), train
            )
        )
        h = jnp.max(h, axis=1)
        half, quarter = self.net_size_max // 2, self.net_size_max // 4
        h = nn.relu(BatchNorm(name="bn4", dtype=dt)(nn.Dense(half, name="fc1", dtype=dt)(h), train))
        h = nn.relu(BatchNorm(name="bn5", dtype=dt)(nn.Dense(quarter, name="fc2", dtype=dt)(h), train))
        h = nn.Dense(4, name="fc3", dtype=dt)(h)
        quat = h + jnp.array([1.0, 0.0, 0.0, 0.0], dtype=h.dtype)
        return batch_quat_to_rotmat(quat.astype(jnp.float32)), quat


class AttentionPool(nn.Module):
    """Scalar-logit attention pooling over points (reference `AttentionPoco`,
    `nn.py:72-96`, as used with reduce=True)."""

    channels: int
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, N, C) -> (B, C)
        dt = self.dtype
        query = nn.Dense(1, name="fc_query", dtype=dt)(x)[..., 0]  # (B, N)
        value = nn.Dense(self.channels, name="fc_value", dtype=dt)(x)  # (B, N, C)
        weights = jax.nn.softmax(query, axis=-1)
        return jnp.einsum(
            "bn,bnc->bc", weights, value, preferred_element_type=jnp.float32
        ).astype(dt)


class PointNetfeat(nn.Module):
    """PointNet feature extractor (reference `nn.py:255-373`).

    Input: (B, N, dim) channels-last patches. Returns (features, trans,
    trans_quat, trans2) like the reference.
    """

    net_size_max: int = 1024
    output_size: int = 100
    use_point_stn: bool = True
    use_feat_stn: bool = True
    sym_op: str = "max"
    dim: int = 3
    num_scales: int = 1
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        pts_weights: typing.Optional[Array] = None,
        train: bool = False,
    ):
        dt = self.dtype
        trans = trans_quat = trans2 = None

        if self.use_point_stn:
            trans, trans_quat = QSTN(self.net_size_max, name="stn1", dtype=dt)(
                x[..., :3], train
            )
            x_rot = jnp.einsum("bij,bnj->bni", trans.astype(dt), x[..., :3].astype(dt))
            x = jnp.concatenate([x_rot, x[..., 3:].astype(dt)], axis=-1)

        x = x.astype(dt)
        x = nn.relu(BatchNorm(name="bn0a", dtype=dt)(nn.Dense(64, name="conv0a", dtype=dt)(x), train))
        x = nn.relu(BatchNorm(name="bn0b", dtype=dt)(nn.Dense(64, name="conv0b", dtype=dt)(x), train))

        if self.use_feat_stn:
            trans2 = STN(
                self.net_size_max, dim=64, num_scales=self.num_scales,
                name="stn2", dtype=dt,
            )(x, train)
            x = jnp.einsum("bij,bnj->bni", trans2.astype(dt), x)

        x = nn.relu(BatchNorm(name="bn1", dtype=dt)(nn.Dense(64, name="conv1", dtype=dt)(x), train))
        x = nn.relu(BatchNorm(name="bn2", dtype=dt)(nn.Dense(128, name="conv2", dtype=dt)(x), train))
        x = BatchNorm(name="bn3", dtype=dt)(
            nn.Dense(self.output_size, name="conv3", dtype=dt)(x), train
        )

        if self.num_scales > 1:
            # per-scale expansion then per-scale pooling
            # (reference `nn.py:290-292, 357-369`; max/sum only)
            x = BatchNorm(name="bn4", dtype=dt)(
                nn.Dense(self.output_size * self.num_scales, name="conv4", dtype=dt)(
                    nn.relu(x)
                ),
                train,
            )
            num_points = x.shape[1] // self.num_scales
            xs = x.reshape(x.shape[0], self.num_scales, num_points, -1)
            if self.sym_op == "max":
                feat = jnp.max(xs, axis=2)
            elif self.sym_op == "sum":
                feat = jnp.sum(xs, axis=2)
            else:
                raise ValueError(
                    f"Unsupported multi-scale symmetric operation: {self.sym_op}"
                )
            feat = feat.reshape(x.shape[0], -1)  # output_size * num_scales^2
            return feat, trans, trans_quat, trans2

        if self.sym_op == "max":
            feat = jnp.max(x, axis=1)
        elif self.sym_op == "sum":
            feat = jnp.sum(x, axis=1)
        elif self.sym_op == "wsum":
            feat = jnp.sum(x * pts_weights[..., None], axis=1)
        elif self.sym_op == "att":
            feat = AttentionPool(self.output_size, name="att", dtype=dt)(x)
        else:
            raise ValueError(f"Unsupported symmetric operation: {self.sym_op}")

        return feat, trans, trans_quat, trans2


class MLP(nn.Module):
    """Dense stack with BN + ReLU + dropout (reference `nn.py:376-417`).

    halving_size=False keeps constant width (the PPSurf head uses this with
    3 layers, dropout 0.3 — `ppsurf_model.py:58-59`).
    """

    output_size: int
    num_layers: int
    halving_size: bool = False
    dropout: float = 0.0
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        dt = self.dtype
        input_size = x.shape[-1]
        if self.halving_size:
            sizes = [input_size // (2**i) for i in range(self.num_layers)]
        else:
            sizes = [input_size] * self.num_layers
        for i in range(self.num_layers - 1):
            x = nn.Dense(sizes[i + 1], name=f"fc{i}", dtype=dt)(x)
            x = nn.relu(BatchNorm(name=f"bn{i}", dtype=dt)(x, train))
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_size, name="fc_final", dtype=dt)(x)
