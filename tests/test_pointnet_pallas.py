"""Exactness of the fused Pallas PointNet branch vs the flax XLA path.

The kernel (ops/pointnet_pallas.py) must reproduce
PointNetfeat(use_point_stn=False, use_feat_stn=True, sym_op='att') —
the PPSurf configuration (`ppsurf_model.py:52-57`) — in eval mode at
compute-dtype resolution. Interpret mode on CPU; the real-TPU A/B lives in
tools/profile_field.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppsurf_tpu.models.pointnet import PointNetfeat
from ppsurf_tpu.ops.pointnet_pallas import pointnet_att_pallas


def _setup(c=260, p=50, out=256, seed=0):
    rng = np.random.RandomState(seed)
    patches = (rng.rand(c, p, 3).astype(np.float32) - 0.5) * 2.0

    net = PointNetfeat(
        net_size_max=out, output_size=out, use_point_stn=False,
        use_feat_stn=True, sym_op="att", dim=3, dtype=jnp.float32,
    )
    variables = net.init(jax.random.key(1), jnp.asarray(patches[:4]))
    # randomize batch_stats so the eval-BN affine is non-trivial
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.rand(*x.shape).astype(np.float32) * 0.5 + 0.5
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    return net, variables, patches


@pytest.mark.parametrize("c,tq", [(260, 128), (64, 64)])
def test_pointnet_matches_flax(c, tq):
    net, variables, patches = _setup(c=c)
    ref, _, _, _ = net.apply(
        variables, jnp.asarray(patches), train=False
    )  # (C, out)

    out = pointnet_att_pallas(
        jnp.asarray(patches), variables["params"],
        variables["batch_stats"], p_real=patches.shape[1], tq=tq,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
    )


def test_pointnet_bf16_close():
    net, variables, patches = _setup(c=128)
    ref, _, _, _ = net.apply(variables, jnp.asarray(patches), train=False)

    out = pointnet_att_pallas(
        jnp.asarray(patches).astype(jnp.bfloat16), variables["params"],
        variables["batch_stats"], p_real=patches.shape[1], tq=128,
        interpret=True,
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    scale = np.maximum(np.abs(np.asarray(ref)), 1e-2)
    assert np.quantile(err / scale, 0.99) < 0.15  # bf16 accumulation noise
