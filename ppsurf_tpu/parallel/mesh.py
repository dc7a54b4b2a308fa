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


def maybe_init_distributed() -> bool:
    """Multi-host (DCN) entry: initialize jax.distributed from env.

    The reference's analogue is Lightning spawning one DDP rank per GPU
    with NCCL (`configs/device_server.yaml:2`); on TPU pods each HOST runs
    this process once and XLA spans ICI+DCN automatically afterwards.
    Activation is env-gated so single-host runs (and the CPU test mesh)
    never touch it:

      PPSURF_DIST=1                      use TPU-pod auto-detection, or
      JAX_COORDINATOR_ADDRESS=host:port  explicit coordinator with
      JAX_NUM_PROCESSES / JAX_PROCESS_ID for CPU/GPU clusters.

    Returns True when distributed mode was initialized.
    """
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not (coord or os.environ.get("PPSURF_DIST")):
        return False
    kwargs = {}
    if coord:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    return True


def process_batch_slice(global_batch: int) -> typing.Tuple[int, int]:
    """This host's [start, stop) share of a global batch.

    Per-host input sharding replacing the reference's DistributedSampler
    (`occupancy_data_module.py:115-124`): each process loads only its
    contiguous slice; `shard_batch` then lays the local slice onto the
    process's addressable devices.
    """
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    extra = global_batch % n
    start = i * per + min(i, extra)
    stop = start + per + (1 if i < extra else 0)
    return start, stop


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Shard every leaf's leading (batch) axis over the mesh's data axis.

    Multi-host (DCN) mode: each process holds the GLOBAL batch in host
    memory (deterministic loaders produce the same batch on every host,
    seeded like the reference's rank-seeded samplers,
    `poco_data_loader.py:292-299`); this keeps only the process's slice
    and assembles the global array from per-process shards.
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )

    def put(x):
        x = np.asarray(x)
        n_dev = mesh.devices.size
        if x.shape[0] % n_dev != 0:
            # make_array_from_process_local_data needs shards consistent
            # with even per-device sharding; fail with a clear message
            # instead of an opaque runtime sharding error
            raise ValueError(
                f"global batch {x.shape[0]} not divisible by the mesh's "
                f"{n_dev} devices; adjust data.batch_size"
            )
        start, stop = process_batch_slice(x.shape[0])
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(x[start:stop])
        )

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
