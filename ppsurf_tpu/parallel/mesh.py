"""Device-mesh helpers for data-parallel training and sharded inference.

Replaces the reference's Lightning DDP/NCCL stack
(`configs/device_server.yaml:2`, `occupancy_data_module.py:115-124`
DistributedSampler, `base/mp.py:74-94` multi-GPU arg helper) with the JAX
SPMD model: one `Mesh` axis `data` over ICI; gradients are reduced with
`lax.pmean` inside `shard_map`; input batches are sharded over the axis
with `jax.device_put` + `NamedSharding`.
"""
from __future__ import annotations

import typing

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_data_mesh(num_devices: typing.Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Shard every leaf's leading (batch) axis over the mesh's data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
