import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppsurf_tpu.ops import knn, masked_knn, voxel_subsample, random_subsample
from ppsurf_tpu.ops.graph import build_fkaconv_graph, build_proj_ids, level_sizes
from ppsurf_tpu.ops.patches import extract_local_patches, patch_space
from ppsurf_tpu.utils import math3d


def brute_force_knn(points, queries, k):
    d = np.linalg.norm(queries[:, None, :] - points[None, :, :], axis=-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k], np.sort(d, axis=1)[:, :k]


class TestKnn:
    def test_matches_brute_force(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(300, 3).astype(np.float32)
        q = rng.randn(77, 3).astype(np.float32)
        ids = np.asarray(knn(jnp.asarray(pts), jnp.asarray(q), k=8, tile=32))
        ref_ids, ref_d = brute_force_knn(pts, q, 8)
        # compare distances (ids can differ on exact ties)
        got_d = np.linalg.norm(q[:, None, :] - pts[ids], axis=-1)
        np.testing.assert_allclose(np.sort(got_d, axis=1), ref_d, atol=1e-4)
        # nearest-first ordering
        assert np.all(np.diff(got_d, axis=1) >= -1e-5)

    def test_batched(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(2, 100, 3).astype(np.float32)
        q = rng.randn(2, 10, 3).astype(np.float32)
        ids = np.asarray(knn(jnp.asarray(pts), jnp.asarray(q), k=4, tile=16))
        assert ids.shape == (2, 10, 4)
        for b in range(2):
            ref_ids, ref_d = brute_force_knn(pts[b], q[b], 4)
            got_d = np.linalg.norm(q[b][:, None, :] - pts[b][ids[b]], axis=-1)
            np.testing.assert_allclose(np.sort(got_d, axis=1), ref_d, atol=1e-4)

    def test_masked_excludes_padding(self):
        rng = np.random.RandomState(2)
        pts = rng.randn(50, 3).astype(np.float32)
        padded = np.concatenate([pts, np.zeros((14, 3), np.float32)])
        valid = np.arange(64) < 50
        q = rng.randn(20, 3).astype(np.float32)
        ids = np.asarray(
            masked_knn(jnp.asarray(padded), jnp.asarray(q), jnp.asarray(valid), k=5, tile=8)
        )
        assert ids.max() < 50
        ref_ids, ref_d = brute_force_knn(pts, q, 5)
        got_d = np.linalg.norm(q[:, None, :] - pts[ids], axis=-1)
        np.testing.assert_allclose(np.sort(got_d, axis=1), ref_d, atol=1e-4)

    def test_self_knn_returns_self_first(self):
        rng = np.random.RandomState(3)
        pts = rng.randn(40, 3).astype(np.float32)
        ids = np.asarray(knn(jnp.asarray(pts), jnp.asarray(pts), k=3, tile=8))
        np.testing.assert_array_equal(ids[:, 0], np.arange(40))


class TestSubsample:
    def test_shapes_and_uniqueness(self):
        rng = np.random.RandomState(0)
        pts = rng.rand(1000, 3).astype(np.float32)
        idx = np.asarray(voxel_subsample(jnp.asarray(pts), jax.random.key(0), 250))
        assert idx.shape == (250,)
        assert len(np.unique(idx)) == 250  # no duplicates

    def test_spatial_coverage(self):
        # two well-separated clusters: a uniform sampler must cover both
        rng = np.random.RandomState(1)
        a = rng.rand(900, 3) * 0.1
        b = rng.rand(100, 3) * 0.1 + 2.0
        pts = np.concatenate([a, b]).astype(np.float32)
        idx = np.asarray(voxel_subsample(jnp.asarray(pts), jax.random.key(1), 100))
        frac_b = np.mean(idx >= 900)
        # density-proportional sampling would give ~0.1; voxel-uniform gives more
        assert frac_b > 0.2

    def test_batched(self):
        rng = np.random.RandomState(2)
        pts = rng.rand(3, 200, 3).astype(np.float32)
        idx = np.asarray(voxel_subsample(jnp.asarray(pts), jax.random.key(2), 50))
        assert idx.shape == (3, 50)

    def test_random_subsample(self):
        idx = np.asarray(random_subsample(jax.random.key(0), 100, 30))
        assert idx.shape == (30,)
        assert len(np.unique(idx)) == 30
        idx2 = np.asarray(random_subsample(jax.random.key(0), 10, 25))
        assert idx2.shape == (25,)
        assert set(np.unique(idx2)) == set(range(10))  # full coverage w/ wrap


class TestGraph:
    def test_level_sizes(self):
        # reference ratio-0.25 pyramid, aligned up to the TPU sublane width
        assert level_sizes(10000) == [2504, 632, 160, 40]
        assert level_sizes(100) == [32, 8, 8, 8]

    def test_build_graph_shapes(self):
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
        g = build_fkaconv_graph(pts, jax.random.key(0), tile=64)
        assert g["support1"].shape == (2, 64, 3)
        assert g["support2"].shape == (2, 16, 3)
        assert g["support3"].shape == (2, 8, 3)  # aligned up to sublane width
        assert g["support4"].shape == (2, 8, 3)
        assert g["ids00"].shape == (2, 256, 16)
        assert g["ids01"].shape == (2, 64, 16)
        assert g["ids34"].shape == (2, 8, 8)  # k clamped to level size
        assert g["ids44"].shape == (2, 8, 8)
        assert g["ids10"].shape == (2, 256, 1)
        assert g["ids43"].shape == (2, 8, 1)
        # ids index into the parent level
        assert np.asarray(g["ids01"]).max() < 256
        assert np.asarray(g["ids12"]).max() < 64

    def test_proj_ids(self):
        rng = np.random.RandomState(1)
        pts = jnp.asarray(rng.rand(1, 128, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 30, 3).astype(np.float32))
        ids = build_proj_ids(pts, q, k=64, tile=16)
        assert ids.shape == (1, 30, 64)


class TestPatches:
    def test_patch_space_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        local = rng.randn(7, 5, 3).astype(np.float32)
        query = rng.randn(7, 3).astype(np.float32)
        ours = np.asarray(patch_space(jnp.asarray(local), jnp.asarray(query)))
        ref = math3d.normalize_patches(local, query)
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        # max radius is 1 after normalization
        np.testing.assert_allclose(
            np.linalg.norm(ours, axis=-1).max(axis=-1), np.ones(7), atol=1e-5
        )

    def test_extract_local_patches(self):
        rng = np.random.RandomState(1)
        raw = rng.rand(1, 64, 3).astype(np.float32)
        valid = np.ones((1, 64), bool)
        valid[0, 50:] = False
        q = rng.rand(1, 9, 3).astype(np.float32)
        patches = np.asarray(
            extract_local_patches(
                jnp.asarray(raw), jnp.asarray(valid), jnp.asarray(q), num_pts_local=8, tile=8
            )
        )
        assert patches.shape == (1, 9, 8, 3)
        # kNN must ignore padded points: recompute from first 50 only
        ref_ids, _ = brute_force_knn(raw[0, :50], q[0], 8)
        ref_patches = math3d.normalize_patches(raw[0][ref_ids], q[0])
        np.testing.assert_allclose(
            np.sort(patches[0].ravel()), np.sort(ref_patches.ravel()), atol=1e-5
        )


class TestMath3d:
    def test_normalize_roundtrip(self):
        # port of the reference's inline self-test `math.py:152-179`
        rng = np.random.RandomState(0)
        pts = (rng.rand(100, 3) * 76.0 + 123.0).astype(np.float64)
        center, scale = math3d.get_points_normalization_info(pts, padding_factor=0.05)
        norm = math3d.normalize_points_with_info(pts, center, scale)
        denorm = math3d.denormalize_points_with_info(norm, center, scale)
        np.testing.assert_allclose(denorm, pts, atol=1e-9)
        assert norm.max() <= 0.5 and norm.min() >= -0.5

    def test_random_rotation_is_orthonormal(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            rot = math3d.random_rotation_matrix(rng)
            r = rot[:3, :3]
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
            np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-10)
