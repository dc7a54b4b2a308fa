"""Visualization helpers: scalar-colored point clouds and distance-colored
meshes (parity: reference `source/base/visualization.py` minus the pyglet
GL renderer, which is optional figure tooling).

Colors use a perceptually ordered blue->green->yellow colormap sampled
procedurally (the reference embeds a parula table, `visualization.py:137-394`).
"""
from __future__ import annotations

import os
import typing

import numpy as np

from ppsurf_tpu.io.ply import Mesh, save_ply
from ppsurf_tpu.utils.math3d import normalize_data


def _colormap(values01: np.ndarray) -> np.ndarray:
    """(N,) in [0,1] -> (N, 3) uint8, viridis-like procedural map."""
    t = np.clip(values01, 0.0, 1.0)
    r = np.clip(1.63 * t - 0.38 * np.sin(6.28 * t) - 0.3, 0, 1)
    g = np.clip(0.06 + 0.92 * t, 0, 1)
    b = np.clip(0.38 + 0.7 * np.cos(3.0 * t - 0.6) - 0.25 * t, 0, 1)
    return (np.stack([r, g, b], axis=1) * 255).astype(np.uint8)


def plot_pts_scalar_data(
    pts: np.ndarray,
    data: np.ndarray,
    file_path: str,
    prop_min: float = 0.0,
    prop_max: float = 1.0,
) -> None:
    """Write a PLY point cloud colored by a scalar property
    (reference `visualization.py:8-22`)."""
    pts = np.asarray(pts).reshape(-1, 3)
    data = np.asarray(data).reshape(-1)
    norm = normalize_data(data, in_min=prop_min, in_max=prop_max, out_min=0.0,
                          out_max=1.0, clip=True)
    save_ply(file_path, pts, vertex_colors=_colormap(norm))


def visualize_chamfer_distance(
    rec_mesh_file: str,
    gt_mesh_file: str,
    output_mesh_file: str,
    min_vertex_count: int = 10000,
    dist_cut_off: float = 0.03,
) -> typing.Optional[str]:
    """Color reconstruction vertices by distance to the GT surface
    (reference `visualization.py:80-119`); writes a vertex-colored PLY and
    a .npz with raw distances for figure tooling."""
    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.metrics.mesh_metrics import _nn_dists
    from ppsurf_tpu.metrics.sampling import sample_surface

    try:
        rec = load_ply(rec_mesh_file)
        gt = load_ply(gt_mesh_file)
    except (OSError, ValueError):
        return None
    if rec.is_empty or gt.is_empty:
        return None

    gt_samples = sample_surface(gt, max(min_vertex_count, 100000))
    dists = _nn_dists(gt_samples, rec.vertices.astype(np.float64))
    norm = np.clip(dists / dist_cut_off, 0.0, 1.0)
    colored = Mesh(
        vertices=rec.vertices, faces=rec.faces, vertex_colors=_colormap(norm)
    )
    os.makedirs(os.path.dirname(os.path.abspath(output_mesh_file)), exist_ok=True)
    colored.export(output_mesh_file)
    np.savez(os.path.splitext(output_mesh_file)[0] + ".npz", distances=dists)
    return output_mesh_file


def visualize_chamfer_distance_pool(
    rec_meshes: typing.Sequence[str],
    gt_meshes: typing.Sequence[str],
    output_meshes: typing.Sequence[str],
    dist_cut_off: float = 0.03,
    num_processes: int = 1,
) -> typing.List[typing.Optional[str]]:
    """Batch variant (reference `visualization.py:103-119`); serial — the
    NN queries already use the native kd-tree."""
    return [
        visualize_chamfer_distance(r, g, o, dist_cut_off=dist_cut_off)
        for r, g, o in zip(rec_meshes, gt_meshes, output_meshes)
    ]
