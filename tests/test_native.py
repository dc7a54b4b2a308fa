"""Cross-checks between the C++ native library and the Python fallbacks."""
import numpy as np
import pytest

from ppsurf_tpu import native
from ppsurf_tpu.recon.marching_cubes import marching_cubes
from ppsurf_tpu.recon.mesh_ops import face_connected_components


needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def sphere_volume(n=33, r=10.0):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float64)
    c = (n - 1) / 2
    return np.sqrt(((g - c) ** 2).sum(axis=0)) - r


@needs_native
def test_native_mc_matches_python():
    vol = sphere_volume()
    v_py, f_py = marching_cubes(vol, 0.0, use_native=False)
    v_na, f_na = marching_cubes(vol, 0.0, use_native=True)
    assert v_na.shape == v_py.shape
    assert f_na.shape == f_py.shape
    # same vertex set (order may differ)
    np.testing.assert_allclose(
        np.sort(v_na.ravel()), np.sort(v_py.ravel()), atol=1e-6
    )
    # same surface area
    def area(v, f):
        return 0.5 * np.linalg.norm(
            np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]]), axis=1
        ).sum()

    np.testing.assert_allclose(area(v_na, f_na), area(v_py, f_py), rtol=1e-5)


@needs_native
def test_native_mc_nan_handling():
    vol = sphere_volume()
    vol[vol > 2.5] = np.nan
    v_na, f_na = marching_cubes(vol, 0.0, use_native=True)
    v_py, f_py = marching_cubes(vol, 0.0, use_native=False)
    assert v_na.shape == v_py.shape
    assert np.isfinite(v_na).all()


@needs_native
def test_native_kdtree_matches_brute_force():
    rng = np.random.RandomState(0)
    pts = rng.rand(500, 3).astype(np.float32)
    q = rng.rand(40, 3).astype(np.float32)
    tree = native.NativeKdTree(pts)
    dists, ids = tree.query(q, k=5)
    ref = np.sort(np.linalg.norm(q[:, None, :] - pts[None], axis=-1), axis=1)[:, :5]
    np.testing.assert_allclose(dists, ref, atol=1e-5)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


@needs_native
def test_native_components_match_scipy():
    rng = np.random.RandomState(1)
    vol = sphere_volume()
    small = np.sqrt(((np.mgrid[0:33, 0:33, 0:33] - 3.0) ** 2).sum(axis=0)) - 1.5
    v, f = marching_cubes(np.minimum(vol, small), 0.0, use_native=False)
    n_na, lab_na = face_connected_components(f, use_native=True)
    n_py, lab_py = face_connected_components(f, use_native=False)
    assert n_na == n_py
    # same partition (labels may be permuted)
    for comp in range(n_na):
        members = lab_na == comp
        assert len(np.unique(lab_py[members])) == 1


@needs_native
def test_native_unique_rows_matches_numpy():
    rng = np.random.RandomState(0)
    key = np.round(rng.randint(0, 50, (2000, 3)).astype(np.float64) * 0.1, 10)
    first, inverse = native.unique_rows_native(key)
    order = np.lexsort(key.T[::-1])
    ks = key[order]
    new = np.ones(len(order), bool)
    new[1:] = np.any(ks[1:] != ks[:-1], axis=1)
    inv_ref = np.empty(len(order), np.int64)
    inv_ref[order] = np.cumsum(new) - 1
    np.testing.assert_array_equal(first, order[np.flatnonzero(new)])
    np.testing.assert_array_equal(inverse, inv_ref)
    # negative zero groups with positive zero
    z = np.array([[0.0, 1.0, 2.0], [-0.0, 1.0, 2.0]])
    f2, i2 = native.unique_rows_native(z)
    assert f2.shape[0] == 1 and i2[0] == i2[1]


@needs_native
def test_native_dedup_faces_matches_numpy():
    rng = np.random.RandomState(1)
    f = rng.randint(0, 300, (5000, 3)).astype(np.int64)
    f[10] = [7, 7, 9]  # degenerate
    f[20] = f[30][::-1]  # duplicate vertex set, different winding
    keep = native.dedup_faces_native(f)
    ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    ff = f[ok]
    key = np.sort(ff, axis=1)
    k1 = (key[:, 0] * 300 + key[:, 1]) * 300 + key[:, 2]
    _, first = np.unique(k1, return_index=True)
    np.testing.assert_array_equal(f[keep], ff[np.sort(first)])
