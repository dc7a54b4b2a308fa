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


# ---------------------------------------------------------------------------
# headless mesh rendering (reference `visualization.py:25-63` render_scene,
# `:122-134` render_meshes) — first-party z-buffer rasterizer instead of a
# pyglet GL context, so it works on display-free hosts
# ---------------------------------------------------------------------------


def _euler_xyz(rx: float, ry: float, rz: float) -> np.ndarray:
    """Rotation matrix for static-frame XYZ Euler angles (trimesh's
    `set_camera(angles=...)` convention)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return mz @ my @ mx


def camera_view_matrix(
    vertices: np.ndarray,
    angles: typing.Tuple[float, float, float] = (np.pi * 0.25, np.pi * 0.25, 0.0),
    distance_scale: float = 2.2,
) -> np.ndarray:
    """World->camera 4x4 for the reference's standard figure viewpoint
    (`visualization.py:49`: angles (pi/4, pi/4, 0), distance 2.2, fov 45)."""
    center = 0.5 * (vertices.min(axis=0) + vertices.max(axis=0))
    extent = float(np.linalg.norm(vertices.max(axis=0) - vertices.min(axis=0)))
    rot = _euler_xyz(*angles)  # camera orientation in world space
    eye = center + rot @ np.array([0.0, 0.0, 1.0]) * distance_scale * max(
        extent, 1e-9
    ) * 0.5
    view = np.eye(4)
    view[:3, :3] = rot.T
    view[:3, 3] = -rot.T @ eye
    return view


def _render_arrays(
    vertices: np.ndarray,
    faces: typing.Optional[np.ndarray],
    colors: typing.Optional[np.ndarray],
    resolution: typing.Tuple[int, int],
    fov_deg: float,
) -> np.ndarray:
    from ppsurf_tpu import native

    w, h = int(resolution[0]), int(resolution[1])
    img = np.full((h, w, 3), 255, np.uint8)
    if vertices.shape[0] == 0:
        return img
    view = camera_view_matrix(vertices)
    if faces is not None and faces.shape[0] > 0:
        if native.available():
            return native.render_mesh_native(
                vertices, faces, colors, view, w, h, fov_deg, img
            )
        return _raster_numpy(vertices, faces, colors, view, w, h, fov_deg, img)
    if native.available():
        return native.render_points_native(
            vertices, colors, view, w, h, fov_deg, max(1, h // 512), img
        )
    return _splat_numpy(vertices, colors, view, w, h, fov_deg, img)


def _project(vertices, view, w, h, fov_deg):
    cam = vertices @ view[:3, :3].T + view[:3, 3]
    zc = np.maximum(1e-6, -cam[:, 2])
    f = 0.5 * h / np.tan(0.5 * np.deg2rad(fov_deg))
    px = 0.5 * w + f * cam[:, 0] / zc
    py = 0.5 * h - f * cam[:, 1] / zc
    return px, py, zc


def _raster_numpy(vertices, faces, colors, view, w, h, fov_deg, img):
    """Painter's-algorithm fallback (exact z-buffering lives in the C++
    renderer); fine for small meshes and test environments."""
    px, py, zc = _project(vertices, view, w, h, fov_deg)
    tri_z = zc[faces].mean(axis=1)
    order = np.argsort(-tri_z)  # far to near
    if colors is None:
        cam = vertices @ view[:3, :3].T + view[:3, 3]
        n = np.cross(cam[faces[:, 1]] - cam[faces[:, 0]],
                     cam[faces[:, 2]] - cam[faces[:, 0]])
        n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-12
        lam = np.abs(n @ np.array([0.3585, 0.3585, 0.8616]))
        base = (255 * (0.25 + 0.75 * lam))[:, None] * np.array(
            [[0.82, 0.85, 0.90]]
        )
        face_rgb = base.astype(np.uint8)
    else:
        face_rgb = colors[faces].mean(axis=1).astype(np.uint8)
    try:
        from PIL import Image, ImageDraw
    except ImportError:  # crude point splat fallback
        return _splat_numpy(vertices, colors, view, w, h, fov_deg, img)
    im = Image.fromarray(img)
    draw = ImageDraw.Draw(im)
    for t in order:
        ids = faces[t]
        draw.polygon(
            [(px[i], py[i]) for i in ids], fill=tuple(int(c) for c in face_rgb[t])
        )
    return np.asarray(im)


def _splat_numpy(vertices, colors, view, w, h, fov_deg, img):
    px, py, zc = _project(vertices, view, w, h, fov_deg)
    order = np.argsort(-zc)
    xi = np.clip(px[order].astype(int), 0, w - 1)
    yi = np.clip(py[order].astype(int), 0, h - 1)
    rgb = (
        colors[order]
        if colors is not None
        else np.tile(np.array([60, 90, 180], np.uint8), (xi.shape[0], 1))
    )
    img[yi, xi] = rgb
    return img


def render_scene(
    mesh_file: str,
    rendering_file: str,
    resolution: typing.Tuple[int, int] = (1024, 1024),
    fov_deg: float = 45.0,
) -> None:
    """Render a mesh/point-cloud file to a PNG (reference
    `visualization.py:25-63`, without the GL/display dependency)."""
    from ppsurf_tpu.io import load_pts, load_ply
    from ppsurf_tpu.utils.fs import make_dir_for_file

    if not os.path.isfile(mesh_file):
        print(f"Rendering failed, file not found: {mesh_file}")
        return
    colors = None
    if mesh_file.endswith(".npy"):
        vertices = np.load(mesh_file).astype(np.float32).reshape(-1, 3)
        faces = None
    else:
        try:
            mesh = load_ply(mesh_file)
            vertices, faces = mesh.vertices, mesh.faces
            colors = getattr(mesh, "vertex_colors", None)
            if faces is not None and faces.shape[0] == 0:
                faces = None
        except Exception:
            vertices = load_pts(mesh_file).astype(np.float32)[:, :3]
            faces = None
    img = _render_arrays(vertices, faces, colors, resolution, fov_deg)
    make_dir_for_file(rendering_file)
    try:
        from PIL import Image

        Image.fromarray(img).save(rendering_file)
    except ImportError:  # minimal PPM writer keeps the pipeline alive
        with open(rendering_file, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
            f.write(img.tobytes())


def render_meshes(
    all_meshes_in: typing.Sequence[str],
    all_renders_out: typing.Sequence[str],
    workers: int = 1,
) -> None:
    """Render many meshes, skipping up-to-date outputs (reference
    `visualization.py:122-134`)."""
    from ppsurf_tpu.utils.fs import call_necessary
    from ppsurf_tpu.utils.mp import start_process_pool

    assert len(all_meshes_in) == len(all_renders_out)
    params = [
        (m, r)
        for m, r in zip(all_meshes_in, all_renders_out)
        if call_necessary(m, r)
    ]
    start_process_pool(render_scene, params, num_processes=workers)
