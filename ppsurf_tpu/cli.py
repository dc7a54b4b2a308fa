"""Command-line interface: fit / test / predict / rec with YAML stacking.

Parity target: the reference's LightningCLI surface
(`source/cli.py:43-118`, `pps.py:27-72`, `poco.py:16-31`):

- subcommands {fit, test, predict}, plus `rec in.ply out_dir/` rewritten to
  a predict invocation (`pps.py:34-72`);
- ordered config stacking `-c a.yaml -c b.yaml` with later-wins deep merge;
- dotted CLI overrides `--section.init_args.key value`;
- `--print_config` to dump the resolved configuration;
- `--debug` enabling NaN checking (the reference sets CUDA debug envs,
  `cli.py:91-95`; here it maps to `jax_debug_nans`);
- reads the reference's own YAML schema (class_path/init_args) so existing
  config files keep working.
"""
from __future__ import annotations

import argparse
import copy
import os
import sys
import typing

# persistent XLA compile cache (same default as bench.py): res-257
# reconstruction programs take minutes to build on this host; without
# this every fresh `predict`/`rec` process re-pays them all
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import yaml


def deep_merge(base: dict, override: dict) -> dict:
    """Later-wins recursive dict merge (jsonargparse config stacking)."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def set_dotted(cfg: dict, dotted_key: str, value: str) -> None:
    """Apply `--a.b.c value` override with YAML-typed parsing."""
    keys = dotted_key.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = yaml.safe_load(value)


def parse_cli(argv: typing.Sequence[str]):
    """Split argv into (subcommand, config files, dotted overrides, flags)."""
    if not argv:
        raise SystemExit(
            "usage: {fit,test,predict,rec} [-c config.yaml ...] "
            "[--dotted.key value ...]"
        )
    subcommand = argv[0]
    configs: typing.List[str] = []
    overrides: typing.List[typing.Tuple[str, str]] = []
    positional: typing.List[str] = []
    flags = {"print_config": False}
    i = 1
    while i < len(argv):
        a = argv[i]
        if a in ("-c", "--config"):
            configs.append(argv[i + 1])
            i += 2
        elif a == "--print_config":
            flags["print_config"] = True
            i += 1
        elif a.startswith("--"):
            overrides.append((a[2:], argv[i + 1]))
            i += 2
        else:
            positional.append(a)
            i += 1
    return subcommand, configs, overrides, positional, flags


_MODEL_KIND_BY_CLASS = {
    "source.poco_model.PocoModel": "poco",
    "source.ppsurf_model.PPSurfModel": "ppsurf",
    "ppsurf_tpu.PocoModel": "poco",
    "ppsurf_tpu.PPSurfModel": "ppsurf",
    "poco": "poco",
    "ppsurf": "ppsurf",
}


def resolve_config(configs: typing.Sequence[str], overrides, subcommand: str) -> dict:
    cfg: dict = {}
    for path in configs:
        with open(path) as fp:
            cfg = deep_merge(cfg, yaml.safe_load(fp) or {})
    for key, value in overrides:
        set_dotted(cfg, key, value)
    cfg.setdefault("subcommand", subcommand)
    return cfg


def build_components(cfg: dict):
    """Translate a (reference-schema) config into our spec/config/data."""
    import jax.numpy as jnp

    from ppsurf_tpu.data.datasets import OccupancyDataModule
    from ppsurf_tpu.train.loop import TrainConfig
    from ppsurf_tpu.train.model import ModelSpec

    trainer = cfg.get("trainer", {}) or {}
    data_sec = cfg.get("data", {}) or {}
    model_sec = cfg.get("model", {}) or {}
    opt_sec = cfg.get("optimizer", {}) or {}
    sched_sec = cfg.get("lr_scheduler", {}) or {}

    data_args = data_sec.get("init_args", data_sec) or {}
    model_args = model_sec.get("init_args", model_sec) or {}
    opt_args = opt_sec.get("init_args", opt_sec) or {}
    sched_args = sched_sec.get("init_args", sched_sec) or {}

    kind = _MODEL_KIND_BY_CLASS.get(
        model_sec.get("class_path", model_args.get("kind", "ppsurf")), "ppsurf"
    )

    # mixed precision: the reference trains with Lightning '16-mixed'
    # (`configs/poco.yaml:10`); on TPU that maps to bfloat16 compute
    precision = str(trainer.get("precision", "16-mixed"))
    dtype = jnp.bfloat16 if ("16" in precision and "32" not in precision) else jnp.float32
    try:
        import jax

        if jax.default_backend() == "cpu":
            dtype = jnp.float32  # bf16 emulation on CPU is slow and unneeded
    except Exception:
        pass

    spec_fields = dict(
        name=model_args.get("name", "ppsurf"),
        kind=kind,
        in_channels=model_args.get("in_channels", 3),
        out_channels=model_args.get("out_channels", 2),
        k=model_args.get("k", 64),
        network_latent_size=model_args.get("network_latent_size", 256 if kind == "ppsurf" else 32),
        pointnet_latent_size=model_args.get("pointnet_latent_size", 256),
        num_pts_local=model_args.get("num_pts_local", 50 if kind == "ppsurf" else None),
        gen_subsample_manifold=model_args.get("gen_subsample_manifold", 10000),
        gen_subsample_manifold_iter=model_args.get("gen_subsample_manifold_iter", 10),
        gen_resolution_global=model_args.get("gen_resolution_global", 257),
        rec_batch_size=model_args.get("rec_batch_size", 50000),
        gen_refine_iter=model_args.get("gen_refine_iter", 10),
        lambda_l1=model_args.get("lambda_l1", 0.0),
        output_names=tuple(model_args.get("output_names", ["imp_surf_sign"])),
        workers=model_args.get("workers", 8),
        results_dir=model_args.get("results_dir", "results"),
        padding_factor=data_args.get("padding_factor", 0.05),
        dtype=dtype,
    )
    spec = ModelSpec(**spec_fields)

    train_cfg = TrainConfig(
        max_epochs=trainer.get("max_epochs", 150),
        lr=opt_args.get("lr", 1e-3),
        weight_decay=float(opt_args.get("weight_decay", 1e-2)),
        betas=tuple(opt_args.get("betas", (0.9, 0.999))),
        eps=float(opt_args.get("eps", 1e-5)),
        lr_milestones=tuple(sched_args.get("milestones", (75, 125))),
        lr_gamma=sched_args.get("gamma", 0.1),
        batch_size=data_args.get("batch_size", 10),
        seed=cfg.get("seed_everything", 42),
        log_every_n_steps=trainer.get("log_every_n_steps", 1),
        default_root_dir=trainer.get("default_root_dir", f"models/{spec.name}"),
        # `trainer.devices` is a first-class knob in the reference
        # (`configs/device_server.yaml:2`, `base/mp.py:74-94`); None/'auto'
        # means all local devices
        num_devices=_none_if_auto(trainer.get("devices")),
        debug=bool(cfg.get("debug", False) or model_args.get("debug", False)),
        profiler=trainer.get("profiler"),
    )

    datamodule = OccupancyDataModule(
        in_file=data_args.get("in_file", "datasets/abc_train/testset.txt"),
        batch_size=train_cfg.batch_size,
        manifold_points=data_args.get("manifold_points", 10000),
        padding_factor=data_args.get("padding_factor", 0.05),
        seed=data_args.get("seed", train_cfg.seed),
        do_data_augmentation=bool(data_args.get("do_data_augmentation", True)),
        patches_per_shape=_none_if_neg(data_args.get("patches_per_shape", -1)),
        with_raw_cloud=spec.is_ppsurf,
        workers=data_args.get("workers", 8),
    )
    return spec, train_cfg, datamodule


def _none_if_neg(v):
    if v is None or (isinstance(v, int) and v <= 0):
        return None
    return v


def _none_if_auto(v):
    if v in (None, "auto", -1):
        return None
    return int(v)


def load_checkpoint_variables(ckpt_path: str) -> dict:
    """Load {'params', 'batch_stats'} from an orbax checkpoint dir, or from
    an inference-only .npz snapshot (convert/infer_npz.py)."""
    if ckpt_path.endswith(".npz"):
        from ppsurf_tpu.convert.infer_npz import load_infer_npz

        return load_infer_npz(ckpt_path)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(ckpt_path))
    return {
        "params": restored["params"],
        "batch_stats": restored.get("batch_stats", {}),
    }


def find_last_checkpoint(root_dir: str) -> typing.Optional[str]:
    """Latest version_{v}/checkpoints/last under a model root."""
    if not os.path.isdir(root_dir):
        return None
    versions = sorted(
        (d for d in os.listdir(root_dir) if d.startswith("version_")),
        key=lambda d: int(d.split("_")[1]),
        reverse=True,
    )
    for v in versions:
        cand = os.path.join(root_dir, v, "checkpoints", "last")
        if os.path.isdir(cand):
            return cand
    return None


def rewrite_rec_args(positional, overrides):
    """`rec in.ply out_dir/` -> predict configuration (reference
    `pps.py:27-72`)."""
    if len(positional) < 2:
        raise SystemExit("usage: rec <in_file.ply> <out_dir> [overrides]")
    in_file, out_dir = positional[0], positional[1]
    extra = [
        ("data.init_args.in_file", in_file),
        ("model.init_args.results_dir", out_dir),
    ]
    return list(overrides) + extra


def save_resolved_config(cfg: dict, version_dir: str, subcommand: str) -> None:
    """Snapshot the fully resolved (stacked + overridden) config into the
    run dir so every run is reproducible from its artifacts — parity with
    the reference's `save_config_kwargs={'overwrite': True}`
    (`source/cli.py:50`). fit writes `config.yaml`; test/predict write
    `config_{subcommand}.yaml` next to it so they never clobber the
    training record."""
    try:
        import jax

        if jax.process_count() > 1 and jax.process_index() != 0:
            return
    except Exception:
        pass
    name = "config.yaml" if subcommand == "fit" else f"config_{subcommand}.yaml"
    os.makedirs(version_dir, exist_ok=True)
    with open(os.path.join(version_dir, name), "w") as fp:
        yaml.safe_dump(cfg, fp, sort_keys=False)


def main(argv=None, default_configs=()):
    from ppsurf_tpu.utils.alloc import tune_host_allocator

    tune_host_allocator()
    argv = list(sys.argv[1:] if argv is None else argv)

    # multi-host (DCN) entry, env-gated: PPSURF_DIST=1 or
    # JAX_COORDINATOR_ADDRESS=... (see parallel/mesh.py). Must run FIRST:
    # jax.distributed.initialize() raises once the backend is up, and
    # build_components() below queries jax.default_backend()
    from ppsurf_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()

    subcommand, configs, overrides, positional, flags = parse_cli(argv)

    if subcommand == "rec":
        overrides = rewrite_rec_args(positional, overrides)
        subcommand = "predict"

    all_configs = [c for c in default_configs if os.path.isfile(c)] + configs
    cfg = resolve_config(all_configs, overrides, subcommand)

    if flags["print_config"]:
        print(yaml.safe_dump(cfg, sort_keys=False))
        return 0

    spec, train_cfg, datamodule = build_components(cfg)

    if train_cfg.debug:
        import jax

        jax.config.update("jax_debug_nans", True)

    if subcommand == "fit":
        from ppsurf_tpu.train.loop import Trainer

        trainer = Trainer(spec, train_cfg)
        save_resolved_config(cfg, trainer.version_dir, subcommand)
        trainer.fit(datamodule, ckpt_path=cfg.get("ckpt_path"))
        return 0

    ckpt_path = cfg.get("ckpt_path") or find_last_checkpoint(
        train_cfg.default_root_dir
    )
    if ckpt_path is None:
        raise SystemExit(
            f"no checkpoint found under {train_cfg.default_root_dir}; "
            "pass --ckpt_path"
        )
    variables = load_checkpoint_variables(ckpt_path)
    # snapshot into the run dir the checkpoint came from
    # (.../version_{v}/checkpoints/<ckpt> -> .../version_{v}); npz
    # snapshots are repo artifacts, not run dirs — skip those
    if not ckpt_path.endswith(".npz"):
        save_resolved_config(
            cfg, os.path.dirname(os.path.dirname(os.path.abspath(ckpt_path))),
            subcommand,
        )

    if subcommand == "test":
        from ppsurf_tpu.train.evaluate import run_test

        run_test(spec, variables, datamodule.test_dataset())
        return 0

    if subcommand == "predict":
        from ppsurf_tpu.recon.predict import Predictor
        from ppsurf_tpu.train.evaluate import evaluate_reconstructions

        # unlike the reference (restricted to --trainer.devices 1,
        # `poco_model.py:189-190`), reconstruction shards query chunks
        # over all requested local devices
        devices = (cfg.get("trainer", {}) or {}).get("devices")
        devices = None if devices in (None, "auto") else int(devices)
        predictor = Predictor(spec, variables, devices=devices)
        predictor.predict_dataset(datamodule.predict_dataset())
        evaluate_reconstructions(spec, datamodule.paths.in_file)
        return 0

    raise SystemExit(f"unknown subcommand: {subcommand}")
