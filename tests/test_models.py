import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppsurf_tpu.models import (
    FKAConvLayer,
    FKAConvNetwork,
    InterpAttentionKHeadsNet,
    PocoNetwork,
    PPSurfNetwork,
    PointNetfeat,
)
from ppsurf_tpu.models.fkaconv import gather_neighbors, interpolate, max_pool_neighbors
from ppsurf_tpu.ops.graph import build_fkaconv_graph, build_proj_ids


def make_tiny_batch(rng, b=2, n=64, q=16):
    pts = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    pts_query = jnp.asarray(rng.rand(b, q, 3).astype(np.float32))
    data = {"pts": pts, "pts_query": pts_query}
    data.update(build_fkaconv_graph(pts, jax.random.key(0), tile=32))
    data["proj_ids"] = build_proj_ids(pts, pts_query, k=8, tile=32)
    return data


class TestGather:
    def test_gather_neighbors(self):
        vals = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
        ids = jnp.asarray([[[0, 1], [4, 4]], [[2, 0], [1, 3]]])
        out = np.asarray(gather_neighbors(vals, ids))
        assert out.shape == (2, 2, 2, 3)
        np.testing.assert_array_equal(out[0, 0, 1], np.asarray(vals)[0, 1])
        np.testing.assert_array_equal(out[1, 1, 1], np.asarray(vals)[1, 3])

    def test_max_pool_and_interpolate(self):
        vals = jnp.asarray(np.arange(1 * 4 * 2, dtype=np.float32).reshape(1, 4, 2))
        ids = jnp.asarray([[[0, 1], [2, 3]]])
        mp = np.asarray(max_pool_neighbors(vals, ids))
        np.testing.assert_array_equal(mp[0, 0], [2, 3])
        it = np.asarray(interpolate(vals, ids))
        np.testing.assert_allclose(it[0, 0], [1, 2])


class TestFKAConvLayer:
    def _numpy_forward(self, params, x, pts, support, ids, norm_radius=1.0):
        """Independent numpy re-derivation of reference nn.py:592-652."""

        def gather(v, idx):  # (N,C),(M,K)->(M,K,C)
            return v[idx]

        p = {k: np.asarray(v) for k, v in params.items()}
        ptsg = gather(pts, ids)
        xg = gather(x, ids)
        local = ptsg - support[:, None, :]
        dist = np.sqrt((local**2).sum(-1))
        local = local / norm_radius
        dw = 1.0 / (1.0 + np.exp(-(-p["alpha"] * dist + p["beta"])))
        dws = dw.sum(-1, keepdims=True)
        dws = dws + (dws == 0) + 1e-6
        dw = dw / dws * dist.shape[-1]

        def inorm(v, scale, bias):  # instance norm over (M,K) per channel
            mean = v.mean(axis=(0, 1), keepdims=True)
            var = v.var(axis=(0, 1), keepdims=True)
            return (v - mean) / np.sqrt(var + 1e-5) * scale + bias

        relu = lambda v: np.maximum(v, 0)
        mat = local @ p["fc1"]
        mat = relu(inorm(mat, p["bn1_scale"], p["bn1_bias"]))
        mp1 = np.broadcast_to((mat * dw[..., None]).max(axis=1, keepdims=True), mat.shape)
        mat = np.concatenate([mat, mp1], axis=-1) @ p["fc2"]
        mat = relu(inorm(mat, p["bn2_scale"], p["bn2_bias"]))
        mp2 = np.broadcast_to((mat * dw[..., None]).max(axis=1, keepdims=True), mat.shape)
        mat = relu(np.concatenate([mat, mp2], axis=-1) @ p["fc3"]) * dw[..., None]
        feats = np.einsum("mkc,mkj->mcj", xg, mat)
        return np.einsum("mcj,cjo->mo", feats, p["cv"])

    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        n, m, k, cin, cout = 20, 10, 4, 6, 8
        x = rng.randn(1, n, cin).astype(np.float32)
        pts = rng.rand(1, n, 3).astype(np.float32)
        support = pts[:, :m]
        ids = rng.randint(0, n, size=(1, m, k))

        layer = FKAConvLayer(out_channels=cout, kernel_size=16)
        variables = layer.init(
            jax.random.key(0), jnp.asarray(x), jnp.asarray(pts),
            jnp.asarray(support), jnp.asarray(ids),
        )
        out = layer.apply(
            variables, jnp.asarray(x), jnp.asarray(pts), jnp.asarray(support),
            jnp.asarray(ids),
        )
        assert out.shape == (1, m, cout)

        p = variables["params"]
        flat = {
            "alpha": p["alpha"], "beta": p["beta"],
            "fc1": p["fc1"]["kernel"], "fc2": p["fc2"]["kernel"],
            "fc3": p["fc3"]["kernel"], "cv": p["cv"],
            "bn1_scale": p["bn1"]["scale"], "bn1_bias": p["bn1"]["bias"],
            "bn2_scale": p["bn2"]["scale"], "bn2_bias": p["bn2"]["bias"],
        }
        ref = self._numpy_forward(flat, x[0], pts[0], support[0], ids[0])
        np.testing.assert_allclose(np.asarray(out[0]), ref, atol=2e-5)

    def test_norm_radius_ema_updates_in_train(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 16, 4).astype(np.float32))
        pts = jnp.asarray(rng.rand(1, 16, 3).astype(np.float32) * 10)
        ids = jnp.asarray(rng.randint(0, 16, size=(1, 16, 4)))
        layer = FKAConvLayer(out_channels=4)
        variables = layer.init(jax.random.key(0), x, pts, pts, ids)
        assert float(variables["batch_stats"]["norm_radius"]) == 1.0
        _, mutated = layer.apply(
            variables, x, pts, pts, ids, True, mutable=["batch_stats"]
        )
        assert float(mutated["batch_stats"]["norm_radius"]) != 1.0
        # eval mode: no update
        _, mutated_eval = layer.apply(
            variables, x, pts, pts, ids, False, mutable=["batch_stats"]
        )
        assert float(mutated_eval["batch_stats"]["norm_radius"]) == 1.0


class TestNetworks:
    def test_poco_forward_shapes(self):
        rng = np.random.RandomState(0)
        data = make_tiny_batch(rng)
        net = PocoNetwork(latent_size=16, k=8)
        variables = net.init(jax.random.key(0), data)
        out = net.apply(variables, data)
        assert out.shape == (2, 16, 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_poco_get_latent_and_from_latent(self):
        rng = np.random.RandomState(1)
        data = make_tiny_batch(rng)
        net = PocoNetwork(latent_size=16, k=8)
        variables = net.init(jax.random.key(0), data)
        latents = net.apply(variables, data, method=net.get_latent)
        assert latents.shape == (2, 64, 16)
        data2 = dict(data)
        data2["latents"] = latents
        out = net.apply(variables, data2, method=net.from_latent)
        full = net.apply(variables, data)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-5)

    def test_ppsurf_forward_shapes(self):
        rng = np.random.RandomState(2)
        data = make_tiny_batch(rng)
        data["pts_local_ps"] = jnp.asarray(rng.randn(2, 16, 10, 3).astype(np.float32))
        net = PPSurfNetwork(latent_size=32, pointnet_latent_size=32, k=8)
        variables = net.init(jax.random.key(0), data)
        out = net.apply(variables, data)
        assert out.shape == (2, 16, 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_ppsurf_train_mode_mutates_stats(self):
        rng = np.random.RandomState(3)
        data = make_tiny_batch(rng)
        data["pts_local_ps"] = jnp.asarray(rng.randn(2, 16, 10, 3).astype(np.float32))
        net = PPSurfNetwork(latent_size=32, pointnet_latent_size=32, k=8)
        variables = net.init(jax.random.key(0), data)
        out, mutated = net.apply(
            variables, data, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        assert out.shape == (2, 16, 2)
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )
        assert changed


class TestDecoder:
    def test_attention_shapes_and_finite(self):
        rng = np.random.RandomState(0)
        latents = jnp.asarray(rng.randn(1, 30, 8).astype(np.float32))
        pts = jnp.asarray(rng.rand(1, 30, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 7, 3).astype(np.float32))
        ids = jnp.asarray(rng.randint(0, 30, size=(1, 7, 5)))
        net = InterpAttentionKHeadsNet(latent_size=8, out_channels=2, k=5)
        variables = net.init(jax.random.key(0), latents, pts, q, ids)
        out = net.apply(variables, latents, pts, q, ids)
        assert out.shape == (1, 7, 2)


class TestPointNet:
    def test_permutation_invariance(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(3, 20, 3).astype(np.float32)
        net = PointNetfeat(
            net_size_max=32, output_size=16, use_point_stn=False,
            use_feat_stn=True, sym_op="att",
        )
        variables = net.init(jax.random.key(0), jnp.asarray(pts))
        feat1, _, _, _ = net.apply(variables, jnp.asarray(pts))
        perm = rng.permutation(20)
        feat2, _, _, _ = net.apply(variables, jnp.asarray(pts[:, perm]))
        np.testing.assert_allclose(np.asarray(feat1), np.asarray(feat2), atol=1e-4)

    def test_sym_ops(self):
        rng = np.random.RandomState(1)
        pts = jnp.asarray(rng.randn(2, 10, 3).astype(np.float32))
        for sym_op in ["max", "sum", "att"]:
            net = PointNetfeat(
                net_size_max=16, output_size=8, use_point_stn=False,
                use_feat_stn=False, sym_op=sym_op,
            )
            variables = net.init(jax.random.key(0), pts)
            feat, _, _, _ = net.apply(variables, pts)
            assert feat.shape == (2, 8)

    def test_point_stn_rotmat_valid(self):
        rng = np.random.RandomState(2)
        pts = jnp.asarray(rng.randn(2, 15, 3).astype(np.float32))
        net = PointNetfeat(
            net_size_max=16, output_size=8, use_point_stn=True,
            use_feat_stn=False, sym_op="max",
        )
        variables = net.init(jax.random.key(0), pts)
        feat, trans, trans_quat, _ = net.apply(variables, pts)
        r = np.asarray(trans)
        for b in range(2):
            np.testing.assert_allclose(r[b] @ r[b].T, np.eye(3), atol=1e-4)


class TestMultiScalePointNet:
    def test_multiscale_shapes(self):
        rng = np.random.RandomState(0)
        num_scales, num_points, out = 2, 12, 8
        pts = jnp.asarray(rng.randn(3, num_scales * num_points, 3).astype(np.float32))
        net = PointNetfeat(
            net_size_max=16, output_size=out, use_point_stn=False,
            use_feat_stn=True, sym_op="max", num_scales=num_scales,
        )
        variables = net.init(jax.random.key(0), pts)
        feat, _, _, _ = net.apply(variables, pts)
        # reference: output_size * num_scales^2 (`nn.py:371`)
        assert feat.shape == (3, out * num_scales**2)

    def test_multiscale_sum(self):
        rng = np.random.RandomState(1)
        pts = jnp.asarray(rng.randn(2, 20, 3).astype(np.float32))
        net = PointNetfeat(
            net_size_max=16, output_size=4, use_point_stn=False,
            use_feat_stn=False, sym_op="sum", num_scales=2,
        )
        variables = net.init(jax.random.key(0), pts)
        feat, _, _, _ = net.apply(variables, pts)
        assert feat.shape == (2, 16)
