"""Two-process CPU dryrun of the multi-host (DCN) training path.

Launches 2 processes, each with 4 virtual CPU devices, that join one
jax.distributed world (coordinator on localhost), build the GLOBAL 8-device
data mesh, assemble a global batch from per-process shards
(`parallel.mesh.shard_batch` multi-host path), and run one data-parallel
train step. The psum gradient reduction spans both processes, exercising
the cross-host collective path that a TPU pod would run over DCN
(SURVEY.md §2.2 comm-backend row; the reference's analogue is Lightning
DDP/NCCL, `configs/device_server.yaml:2`).

Usage: python tools/dryrun_multihost.py            # launcher
       (spawns itself with PPSURF_MH_RANK set)
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
PORT = 12765


def worker(rank: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    ).strip()
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{PORT}"
    os.environ["JAX_NUM_PROCESSES"] = str(N_PROC)
    os.environ["JAX_PROCESS_ID"] = str(rank)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from ppsurf_tpu.parallel.mesh import (
        get_data_mesh,
        maybe_init_distributed,
        replicate,
        shard_batch,
    )
    from ppsurf_tpu.train.loop import (
        TrainConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from ppsurf_tpu.train.model import ppsurf_spec

    assert maybe_init_distributed(), "distributed init did not trigger"
    assert jax.process_count() == N_PROC, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == N_PROC * DEV_PER_PROC, n_global

    spec = ppsurf_spec(
        network_latent_size=32, pointnet_latent_size=32, num_pts_local=8, k=8
    )
    net = spec.make_network()
    cfg = TrainConfig(batch_size=n_global, num_devices=n_global, knn_tile=64)
    mesh = get_data_mesh(n_global)

    rng = np.random.RandomState(0)  # same seed on every host: identical
    # global batch, each host keeps its slice (parallel/mesh.shard_batch)
    b, n, q, raw = n_global, 128, 32, 256
    batch_np = {
        "pts_ms": rng.rand(b, n, 3).astype(np.float32) - 0.5,
        "pts_query_ms": rng.rand(b, q, 3).astype(np.float32) - 0.5,
        "occ": (rng.rand(b, q) > 0.5).astype(np.int32),
        "pts_raw_ms": rng.rand(b, raw, 3).astype(np.float32) - 0.5,
        "raw_valid": np.ones((b, raw), bool),
    }
    batch = shard_batch(batch_np, mesh)

    key = jax.random.key(0)
    data0 = spec.assemble_step_data(
        {k: jnp.asarray(v[:1]) for k, v in batch_np.items()}, key, knn_tile=64
    )
    variables = net.init(jax.random.key(1), data0)
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    state = replicate(state, mesh)

    step_fn = make_train_step(net, spec, tx, mesh, knn_tile=64)
    new_state, loss, conf = step_fn(state, batch, key)
    jax.block_until_ready(new_state.params)
    loss_val = float(jax.device_get(loss))
    assert np.isfinite(loss_val)
    print(
        f"[rank {rank}] multihost step ok: processes={jax.process_count()} "
        f"devices={n_global} loss={loss_val:.4f}",
        flush=True,
    )


def main() -> int:
    rank = os.environ.get("PPSURF_MH_RANK")
    if rank is not None:
        worker(int(rank))
        return 0

    procs = []
    for r in range(N_PROC):
        env = dict(os.environ, PPSURF_MH_RANK=str(r))
        procs.append(
            subprocess.Popen([sys.executable, os.path.abspath(__file__)], env=env)
        )
    rc = 0
    for p in procs:
        rc |= p.wait()
    print("multihost dryrun:", "OK" if rc == 0 else f"FAILED rc={rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
