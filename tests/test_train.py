import os

import jax
import numpy as np
import pytest

from ppsurf_tpu.data import OccupancyDataModule
from ppsurf_tpu.train import ModelSpec, TrainConfig, Trainer, poco_spec, ppsurf_spec
from ppsurf_tpu.train.loop import cross_entropy_loss, find_version_dir


def tiny_ppsurf_spec(**kw):
    return ppsurf_spec(
        name="ppsurf_test", network_latent_size=16, pointnet_latent_size=16,
        num_pts_local=8, k=8, **kw,
    )


def tiny_datamodule(abc_minimal_dir, batch_size=2):
    return OccupancyDataModule(
        in_file=os.path.join(abc_minimal_dir, "testset.txt"),
        batch_size=batch_size,
        manifold_points=128,
        patches_per_shape=32,
        seed=42,
    )


class TestData:
    def test_dataset_items(self, abc_minimal_dir):
        dm = tiny_datamodule(abc_minimal_dir)
        ds = dm.train_dataset()
        assert len(ds) == 7  # trainset.txt
        item = ds[0]
        assert item["pts_ms"].shape == (128, 3)
        assert item["pts_query_ms"].shape == (32, 3)
        assert item["occ"].shape == (32,)
        assert set(np.unique(item["occ"])) <= {0, 1}
        assert item["pts_raw_ms"].shape[0] == ds.raw_pad_size
        assert item["raw_valid"].sum() > 0

    def test_epoch_batches_static_shapes(self, abc_minimal_dir):
        dm = tiny_datamodule(abc_minimal_dir, batch_size=4)
        ds = dm.test_dataset()  # 2 shapes -> wraps to fill batch of 4
        batches = list(dm.epoch_batches(ds, np.random.RandomState(0), shuffle=False))
        assert len(batches) == 1
        assert batches[0]["pts_ms"].shape == (4, 128, 3)

    def test_prefetch_workers_deterministic(self, abc_minimal_dir):
        """Multi-worker prefetch yields bit-identical batches to serial:
        augmentation seeds are drawn serially at submission."""
        ref = None
        for workers in (0, 1, 4):
            dm = tiny_datamodule(abc_minimal_dir)
            dm.workers = workers
            ds = dm.train_dataset()  # fresh dataset: fresh seed stream
            batches = list(
                dm.epoch_batches(ds, np.random.RandomState(0), shuffle=True)
            )
            if ref is None:
                ref = batches
            else:
                assert len(batches) == len(ref)
                for b, r in zip(batches, ref):
                    for key in r:
                        np.testing.assert_array_equal(b[key], r[key])

    def test_augmentation_rotates(self, abc_minimal_dir):
        dm = tiny_datamodule(abc_minimal_dir)
        ds_aug = dm.train_dataset()
        item1 = ds_aug[0]
        item2 = ds_aug[0]
        # different random rotations per visit
        assert not np.allclose(item1["pts_ms"], item2["pts_ms"])


class TestTrainStep:
    def test_fit_sharded_with_checkpoint_roundtrip(self, abc_minimal_dir, tmp_path):
        """One sharded fit covers: step counting, checkpoint layout,
        and orbax restore equality (compiles once — the XLA CPU compile
        dominates this suite's runtime)."""
        dm = tiny_datamodule(abc_minimal_dir)
        spec = tiny_ppsurf_spec()
        cfg = TrainConfig(
            max_epochs=1, batch_size=2, num_devices=2, knn_tile=64,
            default_root_dir=str(tmp_path / "models"),
        )
        trainer = Trainer(spec, cfg)
        state = trainer.fit(dm)
        assert int(jax.device_get(state.step)) == 4  # ceil(7 shapes / bs 2)
        # checkpoint written in the reference layout
        assert os.path.isdir(os.path.join(trainer.ckpt_dir, "last"))
        restored = trainer.restore_checkpoint(
            state, os.path.join(trainer.ckpt_dir, "last")
        )
        p0 = jax.device_get(jax.tree_util.tree_leaves(state.params)[0])
        p1 = jax.device_get(jax.tree_util.tree_leaves(restored.params)[0])
        np.testing.assert_allclose(p0, p1)

    def test_poco_spec_fit_smoke(self, abc_minimal_dir, tmp_path):
        dm = tiny_datamodule(abc_minimal_dir)
        spec = poco_spec(name="poco_test", network_latent_size=16, k=8)
        cfg = TrainConfig(
            max_epochs=1, batch_size=2, num_devices=1, knn_tile=64,
            default_root_dir=str(tmp_path / "models"),
        )
        trainer = Trainer(spec, cfg)
        state = trainer.fit(dm)
        assert int(jax.device_get(state.step)) == 4


class TestLoss:
    def test_cross_entropy_matches_manual(self):
        import jax.numpy as jnp

        logits = jnp.asarray([[[2.0, -1.0], [0.5, 0.5]]])
        occ = jnp.asarray([[0, 1]])
        loss = float(cross_entropy_loss(logits, occ))
        p = np.exp([2.0, -1.0]) / np.exp([2.0, -1.0]).sum()
        manual = (-np.log(p[0]) + -np.log(0.5)) / 2
        np.testing.assert_allclose(loss, manual, rtol=1e-5)


def test_find_version_dir(tmp_path):
    root = str(tmp_path)
    assert find_version_dir(root).endswith("version_0")
    os.makedirs(os.path.join(root, "version_0"))
    assert find_version_dir(root).endswith("version_1")
    assert find_version_dir(root, resume=True).endswith("version_0")


def test_fit_resume_from_checkpoint(abc_minimal_dir, tmp_path):
    """`fit --ckpt_path` resumes at the restored epoch instead of epoch 0."""
    dm = tiny_datamodule(abc_minimal_dir)
    spec = tiny_ppsurf_spec()
    cfg = TrainConfig(
        max_epochs=1, batch_size=2, num_devices=1, knn_tile=64,
        default_root_dir=str(tmp_path / "models"),
    )
    t1 = Trainer(spec, cfg)
    state1 = t1.fit(dm)
    steps_after_1 = int(jax.device_get(state1.step))

    # resume with max_epochs=2: exactly one more epoch should run
    cfg2 = TrainConfig(
        max_epochs=2, batch_size=2, num_devices=1, knn_tile=64,
        default_root_dir=str(tmp_path / "models"),
    )
    t2 = Trainer(spec, cfg2)
    state2 = t2.fit(dm, ckpt_path=os.path.join(t1.ckpt_dir, "last"))
    assert int(jax.device_get(state2.step)) == 2 * steps_after_1

    # resuming a finished run performs no extra steps
    t3 = Trainer(spec, cfg)
    state3 = t3.fit(dm, ckpt_path=os.path.join(t1.ckpt_dir, "last"))
    assert int(jax.device_get(state3.step)) == steps_after_1


def test_rank_local_batch_stats_match_device0(tmp_path):
    """Default (unsynced) BN: running stats equal a single-device run over
    device 0's sub-batch — the reference's per-rank DDP BN whose
    checkpoints carry rank 0's stats (SURVEY.md §7 hard part 5)."""
    import jax
    import jax.numpy as jnp

    from ppsurf_tpu.parallel.mesh import get_data_mesh, replicate, shard_batch
    from ppsurf_tpu.train.loop import (
        TrainConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from ppsurf_tpu.train.model import ppsurf_spec

    spec = ppsurf_spec(
        network_latent_size=16, pointnet_latent_size=16, num_pts_local=8, k=8
    )
    net = spec.make_network()
    rng = np.random.RandomState(0)
    b, n, q, raw = 2, 64, 16, 128
    batch_np = {
        "pts_ms": rng.rand(b, n, 3).astype(np.float32) - 0.5,
        "pts_query_ms": rng.rand(b, q, 3).astype(np.float32) - 0.5,
        "occ": (rng.rand(b, q) > 0.5).astype(np.int32),
        "pts_raw_ms": rng.rand(b, raw, 3).astype(np.float32) - 0.5,
        "raw_valid": np.ones((b, raw), bool),
    }
    key = jax.random.key(0)
    data0 = spec.assemble_step_data(
        {k: jnp.asarray(v[:1]) for k, v in batch_np.items()}, key, knn_tile=64
    )
    variables = net.init(jax.random.key(1), data0)

    def one_step(num_devices, batch_slice):
        cfg = TrainConfig(batch_size=num_devices, num_devices=num_devices,
                          knn_tile=64)
        mesh = get_data_mesh(num_devices)
        tx, _ = make_optimizer(cfg, steps_per_epoch=1)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, variables.get("batch_stats", {})
            ),
            opt_state=tx.init(variables["params"]),
        )
        state = replicate(state, mesh)
        step_fn = make_train_step(net, spec, tx, mesh, knn_tile=64)
        batch = shard_batch(
            {k: v[batch_slice] for k, v in batch_np.items()}, mesh
        )
        new_state, _, _ = step_fn(state, batch, key)
        return jax.device_get(new_state.batch_stats)

    stats_2dev = one_step(2, slice(0, 2))
    stats_dev0 = one_step(1, slice(0, 1))
    jax.tree_util.tree_map(
        lambda a, b2: np.testing.assert_allclose(a, b2, rtol=1e-5, atol=1e-6),
        stats_2dev, stats_dev0,
    )
