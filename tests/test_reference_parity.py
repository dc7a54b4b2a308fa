"""Golden numerics against the ACTUAL reference torch modules.

Loads `/root/reference/source/base/nn.py` (pure torch once
pytorch_lightning is stubbed with `LightningModule = torch.nn.Module`) and
the network classes from `poco_model.py`/`ppsurf_model.py`, transplants
identical weights into the flax re-implementations, and asserts output
agreement to f32 tolerance on identical inputs. Neighbor-id tensors are
random-valid rather than true kNN — parity only requires both sides to
consume the same ids.

Parity targets (VERDICT round 1, "golden numerics"):
  FKAConvLayer            reference nn.py:557-652
  ResidualBlock           reference nn.py:420-450
  FKAConvNetwork          reference nn.py:453-554 (both x4d paths)
  STN / QSTN              reference nn.py:133-252
  PointNetfeat            reference nn.py:255-373 (max/sum/att sym-ops)
  MLP                     reference nn.py:376-417
  InterpAttentionKHeadsNet reference poco_model.py:362-419
  PPSurfNetwork           reference ppsurf_model.py:39-117 (full forward)
"""
from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"


# ---------------------------------------------------------------------------
# reference loading (read-only import; nothing is copied)
# ---------------------------------------------------------------------------


def _load_reference():
    """Import the reference torch modules with heavyweight deps stubbed."""
    if "pytorch_lightning" not in sys.modules:
        stub = types.ModuleType("pytorch_lightning")
        stub.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = stub

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    if "source.base.nn" not in sys.modules:
        pkg = types.ModuleType("source")
        pkg.__path__ = [f"{REF}/source"]
        sys.modules.setdefault("source", pkg)
        base = types.ModuleType("source.base")
        base.__path__ = [f"{REF}/source/base"]
        sys.modules.setdefault("source.base", base)
        _load("source.base.nn", f"{REF}/source/base/nn.py")
        # poco_model pulls in the CPU data pipeline (torch_geometric,
        # pykdtree) that this environment doesn't ship; the network
        # classes under test never touch those symbols.
        for name, attrs in {
            "source.base.fs": ["make_dir_for_file", "call_necessary"],
            "source.base.metrics": ["compare_predictions_binary_tensors"],
            "source.base.evaluation": ["make_test_report"],
            "source.poco_data_loader": ["get_proj_ids", "get_data_poco",
                                        "get_fkaconv_ids"],
            "source.poco_utils": ["export_mesh_and_refine_vertices_region_growing_v3",
                                  "knn"],
        }.items():
            if name in sys.modules:
                continue
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, None)
            if name == "source.poco_data_loader":
                # PPSurfNetwork.from_latent always asks for proj ids
                # (poco_model.py:385); the tests pre-populate data with
                # them, so the lookup is a no-op here.
                m.get_proj_ids = lambda data, k: {}
            sys.modules[name] = m
        _load("source.poco_model", f"{REF}/source/poco_model.py")
        _load("source.ppsurf_model", f"{REF}/source/ppsurf_model.py")
    return (
        sys.modules["source.base.nn"],
        sys.modules["source.poco_model"],
        sys.modules["source.ppsurf_model"],
    )


@pytest.fixture(scope="module")
def ref():
    torch.manual_seed(0)
    return _load_reference()


# ---------------------------------------------------------------------------
# weight transplant helpers (torch -> flax)
# ---------------------------------------------------------------------------


def conv_w(m):
    """1x1 Conv1d/Conv2d weight (out, in, 1[, 1]) -> Dense kernel (in, out)."""
    w = m.weight.detach().numpy()
    return np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T)


def lin_w(m):
    return np.ascontiguousarray(m.weight.detach().numpy().T)


def dense_p(m, weight_fn=conv_w):
    p = {"kernel": weight_fn(m)}
    if m.bias is not None:
        p["bias"] = m.bias.detach().numpy()
    return p


def bn_p(m):
    return {
        "params": {
            "scale": m.weight.detach().numpy(),
            "bias": m.bias.detach().numpy(),
        },
        "stats": {
            "mean": m.running_mean.detach().numpy(),
            "var": m.running_var.detach().numpy(),
        },
    }


def in_p(m):
    return {"scale": m.weight.detach().numpy(), "bias": m.bias.detach().numpy()}


def randomize(module):
    """Perturb params + BN stats so eval-mode defaults can't mask bugs."""
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in module.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.add_(0.1 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.mul_(
                    1.0 + 0.2 * torch.rand(m.running_var.shape, generator=g)
                )
    return module


def fkaconv_layer_vars(t):
    """FKAConvLayer torch -> flax {params, batch_stats} subtrees."""
    w_cv = t.cv.weight.detach().numpy()  # (out, in, 1, K)
    params = {
        "alpha": t.alpha.detach().numpy().reshape(()),
        "beta": t.beta.detach().numpy().reshape(()),
        "cv": np.ascontiguousarray(np.transpose(w_cv[:, :, 0, :], (1, 2, 0))),
        "fc1": {"kernel": conv_w(t.fc1)},
        "fc2": {"kernel": conv_w(t.fc2)},
        "fc3": {"kernel": conv_w(t.fc3)},
        "bn1": in_p(t.bn1),
        "bn2": in_p(t.bn2),
    }
    stats = {"norm_radius": t.norm_radius.detach().numpy().reshape(())}
    return params, stats


def residual_block_vars(t):
    cv1_p, cv1_s = fkaconv_layer_vars(t.cv1)
    params = {
        "cv0": dense_p(t.cv0),
        "cv1": cv1_p,
        "cv2": dense_p(t.cv2),
        "bn0": bn_p(t.bn0)["params"],
        "bn1": bn_p(t.bn1)["params"],
        "bn2": bn_p(t.bn2)["params"],
    }
    stats = {
        "cv1": cv1_s,
        "bn0": bn_p(t.bn0)["stats"],
        "bn1": bn_p(t.bn1)["stats"],
        "bn2": bn_p(t.bn2)["stats"],
    }
    if not isinstance(t.shortcut, torch.nn.Identity):
        params["shortcut"] = dense_p(t.shortcut)
        params["bn_shortcut"] = bn_p(t.bn_shortcut)["params"]
        stats["bn_shortcut"] = bn_p(t.bn_shortcut)["stats"]
    return params, stats


def fkaconv_network_vars(t):
    cv0_p, cv0_s = fkaconv_layer_vars(t.cv0)
    params = {"cv0": cv0_p, "bn0": bn_p(t.bn0)["params"]}
    stats = {"cv0": cv0_s, "bn0": bn_p(t.bn0)["stats"]}
    for name in (
        "resnetb01", "resnetb10", "resnetb11", "resnetb20", "resnetb21",
        "resnetb30", "resnetb31", "resnetb40", "resnetb41",
    ):
        p, s = residual_block_vars(getattr(t, name))
        params[name] = p
        stats[name] = s
    for cv, bn in (
        ("cv5", "bn5"), ("cv3d", "bn3d"), ("cv2d", "bn2d"),
        ("cv1d", "bn1d"), ("cv0d", "bn0d"),
    ):
        params[cv] = dense_p(getattr(t, cv))
        params[bn] = bn_p(getattr(t, bn))["params"]
        stats[bn] = bn_p(getattr(t, bn))["stats"]
    params["fcout"] = dense_p(t.fcout)
    return params, stats


def stn_vars(t, with_fc0=False):
    params = {
        "conv1": dense_p(t.conv1), "conv2": dense_p(t.conv2),
        "conv3": dense_p(t.conv3),
        "fc1": dense_p(t.fc1, lin_w), "fc2": dense_p(t.fc2, lin_w),
        "fc3": dense_p(t.fc3, lin_w),
    }
    stats = {}
    for bn in ("bn1", "bn2", "bn3", "bn4", "bn5"):
        params[bn] = bn_p(getattr(t, bn))["params"]
        stats[bn] = bn_p(getattr(t, bn))["stats"]
    if with_fc0:
        params["fc0"] = dense_p(t.fc0, lin_w)
        params["bn0"] = bn_p(t.bn0)["params"]
        stats["bn0"] = bn_p(t.bn0)["stats"]
    return params, stats


def pointnetfeat_vars(t):
    params, stats = {}, {}
    for conv in ("conv0a", "conv0b", "conv1", "conv2", "conv3"):
        params[conv] = dense_p(getattr(t, conv))
    for bn in ("bn0a", "bn0b", "bn1", "bn2", "bn3"):
        params[bn] = bn_p(getattr(t, bn))["params"]
        stats[bn] = bn_p(getattr(t, bn))["stats"]
    if t.use_point_stn:
        params["stn1"], stats["stn1"] = stn_vars(t.stn1)
    if t.use_feat_stn:
        params["stn2"], stats["stn2"] = stn_vars(t.stn2)
    if t.sym_op == "att":
        params["att"] = {
            "fc_query": dense_p(t.att.fc_query),
            "fc_value": dense_p(t.att.fc_value),
        }
    return params, stats


def mlp_vars(t, num_layers):
    params, stats = {}, {}
    for i in range(num_layers - 1):
        seq = t.layers[i]
        params[f"fc{i}"] = dense_p(seq[0], lin_w)
        params[f"bn{i}"] = bn_p(seq[1])["params"]
        stats[f"bn{i}"] = bn_p(seq[1])["stats"]
    params["fc_final"] = dense_p(t.layers[num_layers - 1][0], lin_w)
    return params, stats


def interp_attention_vars(t):
    params = {
        name: dense_p(getattr(t, name))
        for name in ("fc1", "fc2", "fc3", "fc8", "fc_query", "fc_value")
    }
    return params, {}


def assert_close(got, want, atol, what):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    err = np.max(np.abs(got - want)) if got.size else 0.0
    assert got.shape == want.shape, f"{what}: {got.shape} vs {want.shape}"
    assert err <= atol, f"{what}: max abs err {err:.3e} > {atol:g}"


# ---------------------------------------------------------------------------
# shared random inputs
# ---------------------------------------------------------------------------

B, N0 = 2, 128
LEVELS = [128, 64, 32, 16, 16]
K = 16


def _graph_numpy(rng):
    """Random-valid FKAConv pyramid in the flax dict layout."""
    sup = [rng.rand(B, n, 3).astype(np.float32) - 0.5 for n in LEVELS]
    ids = {
        "ids00": (0, 0), "ids01": (0, 1), "ids11": (1, 1), "ids12": (1, 2),
        "ids22": (2, 2), "ids23": (2, 3), "ids33": (3, 3), "ids34": (3, 4),
        "ids44": (4, 4),
    }
    data = {"pts": sup[0]}
    for lvl in range(1, 5):
        data[f"support{lvl}"] = sup[lvl]
    for name, (src, dst) in ids.items():
        data[name] = rng.randint(0, LEVELS[src], (B, LEVELS[dst], K)).astype(np.int32)
    for name, (src, dst) in {
        "ids43": (4, 3), "ids32": (3, 2), "ids21": (2, 1), "ids10": (1, 0)
    }.items():
        data[name] = rng.randint(0, LEVELS[src], (B, LEVELS[dst], 1)).astype(np.int32)
    return data


def _to_torch_graph(data):
    out = {}
    for k, v in data.items():
        t = torch.from_numpy(np.asarray(v))
        if k == "pts" or k.startswith("support"):
            t = t.transpose(1, 2).contiguous()  # (B, 3, M)
        else:
            t = t.long()
        out[k] = t
    return out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_k", [16, 1])
def test_fkaconv_layer_parity(ref, num_k):
    nn_ref, _, _ = ref
    from ppsurf_tpu.models.fkaconv import FKAConvLayer

    rng = np.random.RandomState(3)
    cin, cout, m = 8, 12, 32
    t = randomize(nn_ref.FKAConvLayer(cin, cout, 16)).eval()
    with torch.no_grad():
        t.norm_radius.fill_(0.8)

    x = rng.rand(B, N0, cin).astype(np.float32)
    pts = rng.rand(B, N0, 3).astype(np.float32) - 0.5
    sup = rng.rand(B, m, 3).astype(np.float32) - 0.5
    ids = rng.randint(0, N0, (B, m, num_k)).astype(np.int32)

    with torch.no_grad():
        want = t(
            torch.from_numpy(x).transpose(1, 2),
            torch.from_numpy(pts).transpose(1, 2),
            torch.from_numpy(sup).transpose(1, 2),
            torch.from_numpy(ids).long(),
        ).transpose(1, 2).numpy()

    params, stats = fkaconv_layer_vars(t)
    got = FKAConvLayer(cout, 16).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(pts), jnp.asarray(sup), jnp.asarray(ids),
        False,
    )
    assert_close(got, want, 2e-5, f"FKAConvLayer num_k={num_k}")


@pytest.mark.parametrize("cin,cout,down", [(16, 16, False), (16, 32, True)])
def test_residual_block_parity(ref, cin, cout, down):
    nn_ref, _, _ = ref
    from ppsurf_tpu.models.fkaconv import ResidualBlock

    rng = np.random.RandomState(4)
    m = 32 if down else N0
    t = randomize(nn_ref.ResidualBlock(cin, cout, 16)).eval()

    x = rng.rand(B, N0, cin).astype(np.float32)
    pts = rng.rand(B, N0, 3).astype(np.float32) - 0.5
    sup = rng.rand(B, m, 3).astype(np.float32) - 0.5
    ids = rng.randint(0, N0, (B, m, K)).astype(np.int32)

    with torch.no_grad():
        want = t(
            torch.from_numpy(x).transpose(1, 2),
            torch.from_numpy(pts).transpose(1, 2),
            torch.from_numpy(sup).transpose(1, 2),
            torch.from_numpy(ids).long(),
        ).transpose(1, 2).numpy()

    params, stats = residual_block_vars(t)
    got = ResidualBlock(cin, cout, 16).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(pts), jnp.asarray(sup), jnp.asarray(ids),
        False,
    )
    assert_close(got, want, 5e-5, f"ResidualBlock {cin}->{cout}")


@pytest.mark.parametrize("fixed", [True, False])
def test_fkaconv_network_parity(ref, fixed):
    nn_ref, _, _ = ref
    from ppsurf_tpu.models.fkaconv import FKAConvNetwork

    rng = np.random.RandomState(5)
    t = randomize(
        nn_ref.FKAConvNetwork(3, 32, segmentation=True, dropout=0,
                              hidden=16, x4d_bug_fixed=fixed)
    ).eval()

    data = _graph_numpy(rng)
    tdata = _to_torch_graph(data)
    with torch.no_grad():
        want = t(tdata, spectral_only=True).transpose(1, 2).numpy()

    params, stats = fkaconv_network_vars(t)
    got = FKAConvNetwork(3, 32, segmentation=True, hidden=16,
                         x4d_bug_fixed=fixed).apply(
        {"params": params, "batch_stats": stats},
        {k: jnp.asarray(v) for k, v in data.items()}, False,
    )
    assert_close(got, want, 5e-4, f"FKAConvNetwork fixed={fixed}")


def test_stn_parity(ref):
    nn_ref, _, _ = ref
    from ppsurf_tpu.models.pointnet import STN

    rng = np.random.RandomState(6)
    n = 50
    t = randomize(nn_ref.STN(net_size_max=64, num_points=n, dim=8)).eval()
    x = rng.rand(4, n, 8).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x).transpose(1, 2)).numpy()
    params, stats = stn_vars(t)
    got = STN(net_size_max=64, dim=8).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    assert_close(got, want, 2e-5, "STN")


def test_qstn_parity(ref):
    nn_ref, _, _ = ref
    from ppsurf_tpu.models.pointnet import QSTN

    rng = np.random.RandomState(7)
    n = 50
    t = randomize(nn_ref.QSTN(net_size_max=64, num_points=n, dim=3)).eval()
    x = rng.rand(4, n, 3).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x).transpose(1, 2))[0].numpy()
    params, stats = stn_vars(t)
    got, _ = QSTN(net_size_max=64).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    assert_close(got, want, 2e-5, "QSTN rotation")


@pytest.mark.parametrize("sym_op,point_stn", [("att", False), ("max", True),
                                              ("sum", False)])
def test_pointnetfeat_parity(ref, sym_op, point_stn):
    nn_ref, _, _ = ref
    from ppsurf_tpu.models.pointnet import PointNetfeat

    rng = np.random.RandomState(8)
    n = 50
    t = randomize(
        nn_ref.PointNetfeat(net_size_max=64, num_points=n, output_size=32,
                            use_point_stn=point_stn, use_feat_stn=True,
                            sym_op=sym_op, dim=3)
    ).eval()
    x = rng.rand(6, n, 3).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x).transpose(1, 2), None)[0].numpy()
    params, stats = pointnetfeat_vars(t)
    got, _, _, _ = PointNetfeat(
        net_size_max=64, output_size=32, use_point_stn=point_stn,
        use_feat_stn=True, sym_op=sym_op, dim=3,
    ).apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False)
    assert_close(got, want, 5e-5, f"PointNetfeat {sym_op}")


def test_mlp_parity(ref):
    nn_ref, _, _ = ref
    from ppsurf_tpu.models.pointnet import MLP

    rng = np.random.RandomState(9)
    t = randomize(
        nn_ref.MLP(input_size=32, output_size=2, num_layers=3,
                   halving_size=False, dropout=0.3)
    ).eval()
    x = rng.rand(64, 32).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x)).numpy()
    params, stats = mlp_vars(t, 3)
    got = MLP(output_size=2, num_layers=3, halving_size=False, dropout=0.3).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    assert_close(got, want, 2e-5, "MLP")


def test_interp_attention_parity(ref):
    _, poco_ref, _ = ref
    from ppsurf_tpu.models.decoder import InterpAttentionKHeadsNet

    rng = np.random.RandomState(10)
    latent, q, k = 32, 40, 8
    t = randomize(poco_ref.InterpAttentionKHeadsNet(latent, latent, k)).eval()

    lat = rng.rand(B, N0, latent).astype(np.float32)
    pts = rng.rand(B, N0, 3).astype(np.float32) - 0.5
    ptsq = rng.rand(B, q, 3).astype(np.float32) - 0.5
    ids = rng.randint(0, N0, (B, q, k)).astype(np.int32)

    tdata = {
        "latents": torch.from_numpy(lat).transpose(1, 2),
        "pts": torch.from_numpy(pts).transpose(1, 2),
        "pts_query": torch.from_numpy(ptsq).transpose(1, 2),
        "proj_ids": torch.from_numpy(ids).long(),
    }
    with torch.no_grad():
        want = t(tdata, has_proj_ids=True).transpose(1, 2).numpy()

    params, _ = interp_attention_vars(t)
    got = InterpAttentionKHeadsNet(latent, latent, k, num_heads=64).apply(
        {"params": params},
        jnp.asarray(lat), jnp.asarray(pts), jnp.asarray(ptsq), jnp.asarray(ids),
    )
    assert_close(got, want, 5e-5, "InterpAttentionKHeadsNet")


def test_ppsurf_network_parity(ref):
    """Full PPSurfNetwork forward (encoder graph ids provided identically)."""
    _, _, pps_ref = ref
    from ppsurf_tpu.models.ppsurf import PPSurfNetwork

    rng = np.random.RandomState(11)
    latent, q, k, n_local = 32, 24, 8, 10
    t = randomize(
        pps_ref.PPSurfNetwork(3, latent, 2, k, n_local, latent)
    ).eval()

    data = _graph_numpy(rng)
    data["pts_query"] = rng.rand(B, q, 3).astype(np.float32) - 0.5
    data["proj_ids"] = rng.randint(0, N0, (B, q, k)).astype(np.int32)
    data["pts_local_ps"] = rng.rand(B, q, n_local, 3).astype(np.float32) - 0.5

    tdata = _to_torch_graph({k2: v for k2, v in data.items()
                             if k2 not in ("pts_query", "proj_ids", "pts_local_ps")})
    tdata["pts_query"] = torch.from_numpy(data["pts_query"]).transpose(1, 2)
    tdata["proj_ids"] = torch.from_numpy(data["proj_ids"]).long()
    tdata["pts_local_ps"] = torch.from_numpy(data["pts_local_ps"])
    with torch.no_grad():
        want = t(tdata).transpose(1, 2).numpy()

    params = {
        "mlp": mlp_vars(t.mlp, 3)[0],
        "projection": interp_attention_vars(t.projection)[0],
        "point_net": pointnetfeat_vars(t.point_net)[0],
        "encoder": fkaconv_network_vars(t.encoder)[0],
    }
    stats = {
        "mlp": mlp_vars(t.mlp, 3)[1],
        "point_net": pointnetfeat_vars(t.point_net)[1],
        "encoder": fkaconv_network_vars(t.encoder)[1],
    }
    net = PPSurfNetwork(in_channels=3, latent_size=latent, out_channels=2,
                        k=k, num_pts_local=n_local, pointnet_latent_size=latent)
    got = net.apply(
        {"params": params, "batch_stats": stats},
        {k2: jnp.asarray(v) for k2, v in data.items()}, False,
    )
    assert_close(got, want, 1e-3, "PPSurfNetwork full forward")


def test_torch_checkpoint_converter_roundtrip(ref, tmp_path):
    """A Lightning-style .ckpt of the reference PPSurfNetwork converts to
    flax variables whose logits match torch — the published-checkpoint
    loading path (`ppsurf_tpu/convert/torch_ckpt.py`; reference ships
    weights via `models/download_ppsurf_50nn.py`)."""
    _, _, pps_ref = ref
    from ppsurf_tpu.convert import convert_state_dict
    from ppsurf_tpu.models.ppsurf import PPSurfNetwork

    rng = np.random.RandomState(21)
    latent, q, k, n_local = 32, 24, 8, 10
    t = randomize(
        pps_ref.PPSurfNetwork(3, latent, 2, k, n_local, latent)
    ).eval()

    # Lightning checkpoints carry the model's state_dict under 'network.*'
    ckpt = {
        "state_dict": {f"network.{kk}": v for kk, v in t.state_dict().items()},
        "global_step": 1234,
    }
    ckpt_file = str(tmp_path / "last.ckpt")
    torch.save(ckpt, ckpt_file)

    loaded = torch.load(ckpt_file, map_location="cpu", weights_only=False)
    params, stats = convert_state_dict(loaded["state_dict"])

    data = _graph_numpy(rng)
    data["pts_query"] = rng.rand(B, q, 3).astype(np.float32) - 0.5
    data["proj_ids"] = rng.randint(0, N0, (B, q, k)).astype(np.int32)
    data["pts_local_ps"] = rng.rand(B, q, n_local, 3).astype(np.float32) - 0.5

    tdata = _to_torch_graph({k2: v for k2, v in data.items()
                             if k2 not in ("pts_query", "proj_ids", "pts_local_ps")})
    tdata["pts_query"] = torch.from_numpy(data["pts_query"]).transpose(1, 2)
    tdata["proj_ids"] = torch.from_numpy(data["proj_ids"]).long()
    tdata["pts_local_ps"] = torch.from_numpy(data["pts_local_ps"])
    with torch.no_grad():
        want = t(tdata).transpose(1, 2).numpy()

    net = PPSurfNetwork(in_channels=3, latent_size=latent, out_channels=2,
                        k=k, num_pts_local=n_local, pointnet_latent_size=latent)
    got = net.apply(
        {"params": params, "batch_stats": stats},
        {k2: jnp.asarray(v) for k2, v in data.items()}, False,
    )
    assert_close(got, want, 1e-3, "converted-checkpoint PPSurfNetwork")


def test_converter_on_real_lightning_layout(ref, tmp_path):
    """Full-fidelity published-checkpoint drill: the ACTUAL reference
    `PPSurfModel` LightningModule's state_dict (the exact key layout the
    published ppsurf_50nn ckpt carries — `ppsurf_model.py:10-36`), wrapped
    in a complete Lightning checkpoint dict (epoch/loops/optimizer_states/
    hyper_parameters), written with torch.save, converted through the full
    `convert_torch_checkpoint` orbax path, restored via the CLI loader,
    and checked for logit parity."""
    _, _, pps_ref = ref
    from ppsurf_tpu.cli import load_checkpoint_variables
    from ppsurf_tpu.convert.torch_ckpt import convert_torch_checkpoint
    from ppsurf_tpu.models.ppsurf import PPSurfNetwork

    rng = np.random.RandomState(23)
    latent, q, k, n_local = 32, 24, 8, 10
    model = pps_ref.PPSurfModel(
        pointnet_latent_size=latent, output_names=["imp_surf_sign"],
        in_channels=3, out_channels=2, k=k, lambda_l1=0.0, debug=False,
        in_file="x.txt", results_dir="r", padding_factor=0.05, name="pps",
        network_latent_size=latent, gen_subsample_manifold_iter=10,
        gen_subsample_manifold=10000, gen_resolution_global=257,
        num_pts_local=n_local, rec_batch_size=50000, gen_refine_iter=10,
        workers=1,
    )
    randomize(model)
    model.eval()
    t = model.network

    ckpt = {  # the full Lightning >=2.0 checkpoint structure
        "epoch": 149,
        "global_step": 55350,
        "pytorch-lightning_version": "2.1.0",
        "state_dict": model.state_dict(),
        "loops": {"fit_loop": {}},
        "callbacks": {"ModelCheckpoint": {}},
        "optimizer_states": [{"state": {}, "param_groups": []}],
        "lr_schedulers": [{}],
        "hparams_name": "kwargs",
        "hyper_parameters": {"name": "pps", "workers": 1},
    }
    ckpt_file = str(tmp_path / "last.ckpt")
    torch.save(ckpt, ckpt_file)

    out = convert_torch_checkpoint(ckpt_file, str(tmp_path / "orbax" / "last"))
    variables = load_checkpoint_variables(out)

    data = _graph_numpy(rng)
    data["pts_query"] = rng.rand(B, q, 3).astype(np.float32) - 0.5
    data["proj_ids"] = rng.randint(0, N0, (B, q, k)).astype(np.int32)
    data["pts_local_ps"] = rng.rand(B, q, n_local, 3).astype(np.float32) - 0.5

    tdata = _to_torch_graph({k2: v for k2, v in data.items()
                             if k2 not in ("pts_query", "proj_ids", "pts_local_ps")})
    tdata["pts_query"] = torch.from_numpy(data["pts_query"]).transpose(1, 2)
    tdata["proj_ids"] = torch.from_numpy(data["proj_ids"]).long()
    tdata["pts_local_ps"] = torch.from_numpy(data["pts_local_ps"])
    with torch.no_grad():
        want = t(tdata).transpose(1, 2).numpy()

    net = PPSurfNetwork(in_channels=3, latent_size=latent, out_channels=2,
                        k=k, num_pts_local=n_local, pointnet_latent_size=latent)
    got = net.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {k2: jnp.asarray(v) for k2, v in data.items()}, False,
    )
    assert_close(got, want, 1e-3, "real-layout converted checkpoint")
