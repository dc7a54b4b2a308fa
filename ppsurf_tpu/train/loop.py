"""jit-compiled training loop with shard_map data parallelism.

Replaces the reference's PyTorch-Lightning Trainer + DDP stack
(`configs/poco.yaml:4-25`, `source/cli.py`, NCCL via
`configs/device_server.yaml:2`) with:

- one jit-compiled `train_step` containing on-device graph building, the
  forward/backward pass, `lax.pmean` gradient reduction over the mesh's
  `data` axis, and the optax update — XLA emits the ICI collectives;
- AdamW + MultiStep LR (reference `configs/poco.yaml:60-77`) via optax;
- BatchNorm/EMA statistics averaged across devices with one extra pmean
  (the reference keeps them rank-local; averaging is strictly more
  consistent and checkpoint-stable);
- orbax checkpointing into the reference's `models/{name}/version_{v}/
  checkpoints` layout (`configs/poco.yaml:22-25`);
- TensorBoard scalars with the reference's tag names
  (`poco_model.py:302-322`).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
import typing

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ppsurf_tpu.metrics.classification import binary_confusion_jax, metrics_from_confusion
from ppsurf_tpu.parallel.mesh import get_data_mesh, replicate, shard_batch
from ppsurf_tpu.train.model import ModelSpec

Array = jax.Array


@dataclasses.dataclass
class TrainConfig:
    """Trainer/optimizer configuration (reference `configs/poco.yaml`)."""

    max_epochs: int = 150
    lr: float = 1e-3
    weight_decay: float = 1e-2
    betas: typing.Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-5
    lr_milestones: typing.Tuple[int, ...] = (75, 125)  # epochs
    lr_gamma: float = 0.1
    batch_size: int = 10
    seed: int = 42
    log_every_n_steps: int = 1
    default_root_dir: str = "models/ppsurf"
    num_devices: typing.Optional[int] = None
    knn_tile: int = 512
    debug: bool = False  # enables jax NaN-checking (reference --debug)
    profiler: typing.Optional[str] = None  # 'jax' -> trace early steps
    # False (default) = BatchNorm running stats / norm_radius EMAs come
    # from device 0's local batches only, matching the reference's
    # UNSYNCED per-rank BN under Lightning DDP, whose checkpoints carry
    # rank 0's stats (SURVEY.md §7 hard part 5: "do not sync").
    # True = average stats across the mesh (statistically better).
    sync_batch_stats: bool = False


class TrainState(flax.struct.PyTreeNode):
    step: Array
    params: typing.Any
    batch_stats: typing.Any
    opt_state: typing.Any


def make_optimizer(config: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW + MultiStepLR (reference `configs/poco.yaml:60-77`)."""
    boundaries = {
        int(m) * steps_per_epoch: config.lr_gamma for m in config.lr_milestones
    }
    schedule = optax.piecewise_constant_schedule(config.lr, boundaries)
    return optax.adamw(
        learning_rate=schedule,
        b1=config.betas[0],
        b2=config.betas[1],
        eps=config.eps,
        weight_decay=config.weight_decay,
    ), schedule


def cross_entropy_loss(logits: Array, occ: Array) -> Array:
    """2-class CE on the occupancy sign (reference `poco_model.py:75-88`)."""
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), occ
        )
    )


def _loss_and_aux(net, spec: ModelSpec, params, batch_stats, batch, key, train: bool,
                  knn_tile: int):
    graph_key, dropout_key = jax.random.split(key)
    data = spec.assemble_step_data(batch, graph_key, knn_tile=knn_tile)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        logits, mutated = net.apply(
            variables, data, True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        new_stats = mutated["batch_stats"]
    else:
        logits = net.apply(variables, data, False)
        new_stats = batch_stats
    loss = cross_entropy_loss(logits, batch["occ"])
    pred = jnp.argmax(logits, axis=-1)
    conf = binary_confusion_jax(pred, batch["occ"])
    return loss, (conf, new_stats)


def make_train_step(net, spec: ModelSpec, tx, mesh, knn_tile: int = 512,
                    sync_batch_stats: bool = False):
    """Data-parallel train step: graph build + fwd/bwd + psum + update."""

    def local_step(state: TrainState, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))

        grad_fn = jax.value_and_grad(
            lambda p: _loss_and_aux(
                net, spec, p, state.batch_stats, batch, key, True, knn_tile
            ),
            has_aux=True,
        )
        (loss, (conf, new_stats)), grads = grad_fn(state.params)

        # gradient + metric reduction over ICI; XLA emits psums
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        conf = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, "data"), conf)
        if sync_batch_stats:
            new_stats = jax.lax.pmean(new_stats, "data")
        else:
            # reference parity: rank-local BN; checkpoints carry rank 0's
            # stats (Lightning DDP saves rank 0). Selecting device 0's
            # values keeps the replicated-state invariant.
            is0 = (jax.lax.axis_index("data") == 0).astype(jnp.float32)
            new_stats = jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x * is0.astype(x.dtype), "data"),
                new_stats,
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss, conf

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(net, spec: ModelSpec, mesh, knn_tile: int = 512):
    def local_step(state: TrainState, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))

        # per-sample evaluation: eval-mode (running-stats) forward passes
        # with batch >= 2 hit an XLA TransformWindow compiler crash on v5e
        # (re-probed 2026-08: `Check failed: chunk_counts[new_window_dim]
        # == 1 ... TransformWindow: Loop will not make progress ...
        # bf16[4,40,1024]` SIGABRT in the reduce-window over the encoder
        # bottleneck); B=1 compiles and per-shape metrics aggregate
        # identically
        def one(item):
            sample = jax.tree_util.tree_map(lambda x: x[None], item)
            return _loss_and_aux(
                net, spec, state.params, state.batch_stats, sample, key,
                False, knn_tile,
            )

        losses, (confs, _) = jax.lax.map(one, batch)
        loss = jnp.mean(losses)
        conf = jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), confs)

        loss = jax.lax.pmean(loss, "data")
        conf = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, "data"), conf)
        return loss, conf

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )
    return jax.jit(sharded)


def find_version_dir(root_dir: str, resume: bool = False) -> str:
    """Auto-incrementing version_{v} run dirs (reference `README.md:231-234`)."""
    v = 0
    while os.path.isdir(os.path.join(root_dir, f"version_{v}")):
        v += 1
    if resume and v > 0:
        v -= 1
    return os.path.join(root_dir, f"version_{v}")


class Trainer:
    """fit/validate driver (replaces the Lightning Trainer for our stack)."""

    def __init__(self, spec: ModelSpec, config: TrainConfig):
        self.spec = spec
        self.config = config
        self.net = spec.make_network()
        self.mesh = get_data_mesh(config.num_devices)
        self.n_dev = self.mesh.devices.size
        if config.batch_size % self.n_dev != 0:
            raise ValueError(
                f"batch_size {config.batch_size} must divide over {self.n_dev} devices"
            )
        if config.debug:
            jax.config.update("jax_debug_nans", True)

        self.version_dir = find_version_dir(config.default_root_dir)
        self.ckpt_dir = os.path.join(self.version_dir, "checkpoints")
        self._writer = None
        self._steps_per_epoch = 1

    # --- state management ---

    def init_state(self, example_batch: dict) -> TrainState:
        key = jax.random.key(self.config.seed)
        data = self.spec.assemble_step_data(
            jax.tree_util.tree_map(jnp.asarray, example_batch), key,
            knn_tile=self.config.knn_tile,
        )
        # jit the initializer: unjitted flax init dispatches op-by-op, which
        # is pathologically slow through a remote-device transport
        variables = jax.jit(self.net.init)(key, data)
        self.tx, self.schedule = make_optimizer(self.config, self._steps_per_epoch)
        opt_state = self.tx.init(variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state,
        )
        return replicate(state, self.mesh)

    def save_checkpoint(self, state: TrainState, name: str = "last") -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.ckpt_dir, name))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, state: TrainState, path: str) -> TrainState:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path), jax.device_get(state))
        return replicate(restored, self.mesh)

    # --- logging (reference tag names, `poco_model.py:302-322`) ---

    def _log_scalars(self, log_type: str, step: int, loss: float, metrics: dict):
        if self._writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir=self.version_dir)
            except Exception:
                self._writer = False
        if self._writer:
            self._writer.add_scalar(f"loss/{log_type}/00_all", loss, step)
            for k in ("accuracy", "precision", "recall", "f1_score"):
                v = metrics.get(k, float("nan"))
                if np.isnan(v):
                    v = 0.0
                self._writer.add_scalar(f"metrics/{log_type}/{k}", v, step)
            if log_type == "train":
                self._writer.add_scalar(
                    "lr-AdamW", float(self.schedule(step)), step
                )

    # --- fit ---

    def fit(self, datamodule, ckpt_path: typing.Optional[str] = None) -> TrainState:
        cfg = self.config
        train_ds = datamodule.train_dataset()
        val_ds = datamodule.val_dataset()
        n_batches = max(1, -(-len(train_ds) // cfg.batch_size))
        self._steps_per_epoch = n_batches

        rng = np.random.RandomState(cfg.seed)
        example = datamodule.epoch_batches(train_ds, np.random.RandomState(0), False)
        example_batch = next(iter(example))
        state = self.init_state(example_batch)
        if ckpt_path:
            state = self.restore_checkpoint(state, ckpt_path)

        train_step = make_train_step(
            self.net, self.spec, self.tx, self.mesh, cfg.knn_tile,
            sync_batch_stats=cfg.sync_batch_stats,
        )
        eval_step = make_eval_step(self.net, self.spec, self.mesh, cfg.knn_tile)

        os.makedirs(self.ckpt_dir, exist_ok=True)
        key = jax.random.key(cfg.seed)
        global_step = int(jax.device_get(state.step))
        t_start = time.time()

        # profiler preset: trace steps 2-4 of the first epoch into the run
        # dir (replaces the reference's PyTorchProfiler, `configs/profiler.yaml`)
        profile_window = (2, 5) if cfg.profiler == "jax" else None
        profiling = False

        # resume at the epoch implied by the restored step (Lightning's
        # `--ckpt_path` resume restores the trainer epoch too)
        start_epoch = min(global_step // n_batches, cfg.max_epochs)

        for epoch in range(start_epoch, cfg.max_epochs):
            for batch in datamodule.epoch_batches(train_ds, rng, shuffle=True):
                if profile_window and global_step == profile_window[0]:
                    jax.profiler.start_trace(os.path.join(self.version_dir, "profile"))
                    profiling = True
                key, step_key = jax.random.split(key)
                sharded = shard_batch(
                    {k: v for k, v in batch.items() if k != "dist_ms"}, self.mesh
                )
                state, loss, conf = train_step(state, sharded, step_key)
                global_step += 1
                if profiling and global_step >= profile_window[1]:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    profiling = False
                    profile_window = None
                if global_step % cfg.log_every_n_steps == 0:
                    metrics = metrics_from_confusion(jax.device_get(conf))
                    self._log_scalars(
                        "train", global_step, float(jax.device_get(loss)), metrics
                    )

            # validation epoch
            val_losses, val_confs = [], []
            for batch in datamodule.epoch_batches(val_ds, rng, shuffle=False):
                key, step_key = jax.random.split(key)
                sharded = shard_batch(
                    {k: v for k, v in batch.items() if k != "dist_ms"}, self.mesh
                )
                loss, conf = eval_step(state, sharded, step_key)
                val_losses.append(float(jax.device_get(loss)))
                val_confs.append(jax.device_get(conf))
            if val_confs:
                total = {
                    k: float(np.sum([c[k] for c in val_confs])) for k in val_confs[0]
                }
                metrics = metrics_from_confusion(total)
                self._log_scalars(
                    "val", global_step, float(np.mean(val_losses)), metrics
                )
                print(
                    f"epoch {epoch}: val_loss={np.mean(val_losses):.4f} "
                    f"F1={metrics['f1_score']:.4f} "
                    f"({time.time() - t_start:.1f}s elapsed)"
                )

            self.save_checkpoint(state, "last")

        if self._writer:
            self._writer.close()
        return state
