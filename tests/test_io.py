import os

import numpy as np
import pytest

from ppsurf_tpu.io import load_ply, save_ply, load_pts
from ppsurf_tpu.io.ply import Mesh


SHAPE = "00010009_d97409455fa543b3a224250f_trimesh_000"


def test_load_ply_point_cloud(abc_minimal_dir):
    pc = load_ply(os.path.join(abc_minimal_dir, "04_pts_vis", SHAPE + ".xyz.ply"))
    assert pc.vertices.shape == (60031, 3)
    assert pc.vertices.dtype == np.float32
    assert pc.faces.shape[0] == 0
    # dataset clouds are normalized near the unit cube (noise can exceed it)
    assert pc.vertices.min() >= -0.75
    assert pc.vertices.max() <= 0.75


def test_load_ply_mesh(abc_minimal_dir):
    mesh = load_ply(os.path.join(abc_minimal_dir, "03_meshes", SHAPE + ".ply"))
    assert mesh.vertices.shape == (9636, 3)
    assert mesh.faces.shape == (19268, 3)
    assert mesh.faces.min() >= 0
    assert mesh.faces.max() < mesh.vertices.shape[0]


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    verts = rng.randn(100, 3).astype(np.float32)
    faces = rng.randint(0, 100, size=(50, 3))
    path = str(tmp_path / "mesh.ply")
    save_ply(path, verts, faces)
    mesh = load_ply(path)
    np.testing.assert_allclose(mesh.vertices, verts, rtol=1e-6)
    np.testing.assert_array_equal(mesh.faces, faces)


def test_ply_roundtrip_with_normals_and_colors(tmp_path):
    rng = np.random.RandomState(1)
    verts = rng.randn(10, 3).astype(np.float32)
    normals = rng.randn(10, 3).astype(np.float32)
    colors = rng.randint(0, 255, size=(10, 3)).astype(np.uint8)
    path = str(tmp_path / "pc.ply")
    save_ply(path, verts, normals=normals, vertex_colors=colors)
    pc = load_ply(path)
    np.testing.assert_allclose(pc.vertices, verts, rtol=1e-6)
    np.testing.assert_array_equal(pc.vertex_colors, colors)


def test_load_pts_formats(tmp_path, abc_minimal_dir):
    pts = load_pts(os.path.join(abc_minimal_dir, "04_pts_vis", SHAPE + ".xyz.ply"))
    assert pts.shape == (60031, 3)

    npy = str(tmp_path / "p.npy")
    np.save(npy, pts[:10])
    np.testing.assert_allclose(load_pts(npy), pts[:10])

    xyz = str(tmp_path / "p.xyz")
    np.savetxt(xyz, pts[:10])
    np.testing.assert_allclose(load_pts(xyz), pts[:10], atol=1e-6)


def test_mesh_face_normals_and_areas():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
    faces = np.array([[0, 1, 2]])
    mesh = Mesh(vertices=verts, faces=faces)
    np.testing.assert_allclose(mesh.face_normals(), [[0, 0, 1]], atol=1e-6)
    np.testing.assert_allclose(mesh.face_areas(), [0.5], atol=1e-6)
