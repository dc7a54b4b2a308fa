"""Host-side 3-D math helpers (numpy).

Parity targets: reference `source/base/math.py` (bbox normalization with
padding factor, patch-space transforms, vector helpers). These run on the
host for IO/preprocessing; the jit-side equivalents live in
`ppsurf_tpu.ops.patches`.
"""
from __future__ import annotations

import typing

import numpy as np


def vector_length(vecs: np.ndarray, axis: int = 1) -> np.ndarray:
    return np.linalg.norm(vecs, axis=axis)


def normalize_vectors(vecs: np.ndarray) -> np.ndarray:
    """Unit-normalize row vectors (reference `math.py:38-45`)."""
    return vecs / np.maximum(vector_length(vecs)[:, None], 1e-30)


def cartesian_dist(vec_x: np.ndarray, vec_y: np.ndarray, axis: int = 1) -> np.ndarray:
    return np.linalg.norm(vec_x - vec_y, axis=axis)


def get_points_normalization_info(
    pts: np.ndarray, padding_factor: float = 0.05
) -> typing.Tuple[np.ndarray, float]:
    """Bbox center + isotropic scale so pts fit the padded unit cube.

    Parity: reference `source/base/math.py:111-117`.
    """
    pts_bb_min = np.min(pts, axis=0)
    pts_bb_max = np.max(pts, axis=0)
    bb_center = (pts_bb_min + pts_bb_max) * 0.5
    scale = float(np.max(pts_bb_max - pts_bb_min) * (1.0 + padding_factor))
    return bb_center, scale


def normalize_points_with_info(pts: np.ndarray, bb_center: np.ndarray, scale: float) -> np.ndarray:
    """Reference `source/base/math.py:120-126`."""
    return (pts - bb_center[None, :]) / scale


def denormalize_points_with_info(pts: np.ndarray, bb_center: np.ndarray, scale: float) -> np.ndarray:
    """Reference `source/base/math.py:129-132`."""
    return pts * scale + bb_center[None, :]


def get_patch_radii(pts_patch: np.ndarray, query_pts: np.ndarray) -> np.ndarray:
    """Max distance from each query point to its patch points.

    pts_patch: (Q, P, 3), query_pts: (Q, 3) -> (Q,)
    Parity: reference `source/ppsurf_data_loader.py:100-110`.
    """
    if pts_patch.shape[1] == 0:
        return np.zeros((pts_patch.shape[0],), dtype=pts_patch.dtype)
    dist = np.linalg.norm(pts_patch - query_pts[:, None, :], axis=2)
    return np.max(dist, axis=-1)


def model_space_to_patch_space(
    pts_to_convert_ms: np.ndarray,
    pts_patch_center_ms: np.ndarray,
    patch_radius_ms: typing.Union[float, np.ndarray],
) -> np.ndarray:
    """Center patches on query points and scale to unit radius.

    pts_to_convert_ms: (Q, P, 3); pts_patch_center_ms: (Q, 3);
    patch_radius_ms: (Q,). Parity: reference
    `source/ppsurf_data_loader.py:112-123`.
    """
    centered = pts_to_convert_ms - pts_patch_center_ms[:, None, :]
    radius = np.asarray(patch_radius_ms)[:, None, None]
    return centered / np.maximum(radius, 1e-30)


def normalize_patches(pts_local_ms: np.ndarray, pts_query_ms: np.ndarray) -> np.ndarray:
    """Reference `source/ppsurf_data_loader.py:91-97`."""
    radii = get_patch_radii(pts_local_ms, pts_query_ms)
    return model_space_to_patch_space(pts_local_ms, pts_query_ms, radii)


def lerp(a: np.ndarray, b: np.ndarray, factor) -> np.ndarray:
    return a + factor * (b - a)


def random_rotation_matrix(rng: np.random.RandomState) -> np.ndarray:
    """Uniform random rotation (4x4 homogeneous), Shoemake's method.

    Drop-in for `trimesh.transformations.random_rotation_matrix(rng.rand(3))`
    used at reference `source/poco_data_loader.py:336`: takes three uniform
    variates and produces a uniformly distributed SO(3) element.
    """
    r1, r2, r3 = rng.rand(3)
    q = np.array(
        [
            np.sqrt(1.0 - r1) * np.sin(2.0 * np.pi * r2),
            np.sqrt(1.0 - r1) * np.cos(2.0 * np.pi * r2),
            np.sqrt(r1) * np.sin(2.0 * np.pi * r3),
            np.sqrt(r1) * np.cos(2.0 * np.pi * r3),
        ]
    )
    x, y, z, w = q
    rot = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w), 0.0],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w), 0.0],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y), 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    return rot


def transform_points(pts: np.ndarray, matrix_4x4: np.ndarray) -> np.ndarray:
    """Apply homogeneous transform to (N, 3) points."""
    return pts @ matrix_4x4[:3, :3].T + matrix_4x4[:3, 3][None, :]


def rotate_points_around_pivot(
    pts: np.ndarray, rotation_mat: np.ndarray, pivot: np.ndarray
) -> np.ndarray:
    """Reference `source/base/math.py:135-149`."""
    return transform_points(pts - pivot[None, :], rotation_mat) + pivot[None, :]


def normalize_data(
    arr: np.ndarray, in_max: float, in_min: float, out_max=1.0, out_min=-1.0, clip=False
) -> np.ndarray:
    """Linear range remap (reference `source/base/math.py:87-108`)."""
    arr = arr.astype(np.float64, copy=True)
    in_range = in_max - in_min
    out_range = out_max - out_min
    if in_range == 0.0 or out_range == 0.0:
        return arr - in_max
    arr = (arr - in_min) / in_range * out_range + out_min
    if clip:
        arr = np.clip(arr, out_min, out_max)
    return arr
