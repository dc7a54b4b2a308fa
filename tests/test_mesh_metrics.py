import os

import numpy as np
import pytest

from ppsurf_tpu.io.ply import Mesh, save_ply
from ppsurf_tpu.metrics.mesh_metrics import (
    chamfer_distance,
    f1_approx,
    get_metric_meshes,
    hausdorff_distance,
    intersection_over_union,
    normal_error_approx,
)
from ppsurf_tpu.metrics.sampling import sample_surface
from ppsurf_tpu.metrics.winding import points_inside, winding_number
from ppsurf_tpu.recon.marching_cubes import marching_cubes


def make_sphere_mesh(radius=0.3, n=33, center=(0.0, 0.0, 0.0)):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float64)
    mid = (n - 1) / 2
    vol = np.sqrt(((g - mid) ** 2).sum(axis=0)) * (1.0 / mid) - radius / 0.5
    verts, faces = marching_cubes(vol, 0.0)
    world = (verts / mid - 1.0) * 0.5 + np.asarray(center)
    return Mesh(vertices=world.astype(np.float32), faces=faces)


@pytest.fixture(scope="module")
def sphere_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("meshes")
    a = make_sphere_mesh(0.3)
    b = make_sphere_mesh(0.3)
    c = make_sphere_mesh(0.24)  # smaller sphere
    fa, fb, fc = (str(tmp / f"{x}.ply") for x in "abc")
    a.export(fa)
    b.export(fb)
    c.export(fc)
    return fa, fb, fc


class TestSampling:
    def test_samples_on_surface(self):
        mesh = make_sphere_mesh(0.3)
        samples = sample_surface(mesh, 2000)
        r = np.linalg.norm(samples, axis=1)
        assert abs(r.mean() - 0.3) < 0.01
        assert samples.shape == (2000, 3)


class TestWinding:
    def test_inside_outside(self):
        mesh = make_sphere_mesh(0.3)
        queries = np.array(
            [[0, 0, 0], [0.1, 0.1, 0.0], [0.45, 0, 0], [0, 0.4, 0.2]], np.float64
        )
        inside = points_inside(mesh, queries, q_tile=4)
        np.testing.assert_array_equal(inside, [True, True, False, False])

    def test_winding_values(self):
        mesh = make_sphere_mesh(0.3)
        w = winding_number(mesh, np.array([[0.0, 0.0, 0.0], [0.49, 0.49, 0.49]]), q_tile=2)
        assert abs(w[0] - 1.0) < 0.05
        assert abs(w[1]) < 0.05


class TestMeshMetrics:
    def test_chamfer_identical_near_zero(self, sphere_files):
        fa, fb, fc = sphere_files
        _, _, cd_same = chamfer_distance(fa, fb, samples_per_model=5000)
        _, _, cd_diff = chamfer_distance(fa, fc, samples_per_model=5000)
        assert cd_same < 0.005
        assert cd_diff > 0.04  # radii differ by 0.06 -> CD ~ 0.06
        assert cd_diff < 0.08

    def test_iou(self, sphere_files):
        fa, fb, fc = sphere_files
        _, _, iou_same = intersection_over_union(fa, fb, num_samples=20000)
        _, _, iou_diff = intersection_over_union(fa, fc, num_samples=20000)
        assert iou_same > 0.97
        expected = (0.24 / 0.3) ** 3  # nested spheres: v_small / v_big
        assert abs(iou_diff - expected) < 0.05

    def test_f1(self, sphere_files):
        fa, fb, fc = sphere_files
        _, _, f1_same = f1_approx(fa, fb, num_samples=20000)
        assert f1_same > 0.98
        _, _, f1_diff = f1_approx(fa, fc, num_samples=20000)
        assert 0.5 < f1_diff < 0.95

    def test_normal_error(self, sphere_files):
        fa, fb, fc = sphere_files
        _, _, ne = normal_error_approx(fa, fb, num_samples=5000)
        assert ne < 0.3  # same sphere: small angular error (radians)

    def test_hausdorff(self, sphere_files):
        fa, fb, fc = sphere_files
        _, _, _, _, hd = hausdorff_distance(fa, fc, samples_per_model=3000)
        assert 0.04 < hd < 0.09

    def test_get_metric_meshes_missing_mesh_nan(self, sphere_files, tmp_path):
        fa, fb, _ = sphere_files
        res = get_metric_meshes(
            [os.path.join(str(tmp_path), "{}.ply")],
            ["does_not_exist"],
            [fa],
            num_samples=100,
            metric="chamfer",
        )
        assert np.isnan(res[0][0])


class TestClosestPoint:
    def test_point_triangle_projection(self):
        from ppsurf_tpu.metrics.proximity import closest_point_on_triangles

        a = np.array([[0, 0, 0]], np.float64)
        b = np.array([[1, 0, 0]], np.float64)
        c = np.array([[0, 1, 0]], np.float64)
        # interior projection
        p = np.array([[0.2, 0.2, 1.0]])
        np.testing.assert_allclose(
            closest_point_on_triangles(p, a, b, c), [[0.2, 0.2, 0.0]], atol=1e-12
        )
        # vertex region
        p = np.array([[-1.0, -1.0, 0.5]])
        np.testing.assert_allclose(
            closest_point_on_triangles(p, a, b, c), [[0, 0, 0]], atol=1e-12
        )
        # edge AB region
        p = np.array([[0.5, -1.0, 0.0]])
        np.testing.assert_allclose(
            closest_point_on_triangles(p, a, b, c), [[0.5, 0, 0]], atol=1e-12
        )

    def test_closest_point_on_sphere_mesh(self):
        from ppsurf_tpu.metrics.proximity import get_closest_point_on_mesh

        mesh = make_sphere_mesh(0.3)
        rng = np.random.RandomState(0)
        dirs = rng.randn(50, 3)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        queries = dirs * 0.45  # outside the sphere
        closest, dists, faces = get_closest_point_on_mesh(mesh, queries)
        # closest points lie on the sphere surface, distance ~ 0.15
        r = np.linalg.norm(closest, axis=1)
        assert np.abs(r - 0.3).max() < 0.01
        assert np.abs(dists - 0.15).max() < 0.01
        assert faces.max() < mesh.faces.shape[0]

    def test_exact_normal_error(self, sphere_files):
        from ppsurf_tpu.metrics.proximity import normal_error

        fa, fb, fc = sphere_files
        _, _, ne = normal_error(fa, fb, num_samples=3000)
        assert ne < 0.2  # same sphere -> small angle
