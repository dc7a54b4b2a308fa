"""Multi-format point-cloud loading.

Parity target: reference `source/occupancy_data_module.py:174-225` (PLY, STL,
OBJ, XYZ, NPY, NPZ, LAS/LAZ) and `source/base/point_cloud.py` (XYZ helpers).
LAS/LAZ are gated on laspy being installed (optional, pure IO).
"""
from __future__ import annotations

import os
import typing

import numpy as np

from ppsurf_tpu.io.ply import load_ply
from ppsurf_tpu.utils import math3d


def load_xyz(file_path: str) -> np.ndarray:
    """Whitespace-separated text, first 3 columns; NaN rows dropped.

    Parity: reference `source/base/point_cloud.py:6-13`.
    """
    data = np.loadtxt(file_path).astype(np.float32)
    nan_lines = np.isnan(data).any(axis=1)
    num_nan_lines = np.sum(nan_lines)
    if num_nan_lines > 0:
        data = data[~nan_lines]
    return data


def write_xyz(file_path: str, pts: np.ndarray, normals: typing.Optional[np.ndarray] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    arr = pts if normals is None else np.concatenate([pts, normals], axis=1)
    np.savetxt(file_path, arr, fmt="%.8f")


def _load_obj_vertices(path: str) -> np.ndarray:
    verts = []
    with open(path, "r") as fp:
        for line in fp:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return np.asarray(verts, dtype=np.float32)


def _load_stl_vertices(path: str) -> np.ndarray:
    with open(path, "rb") as fp:
        head = fp.read(5)
    if head == b"solid":  # could still be binary; try ascii first
        try:
            verts = []
            with open(path, "r", errors="ignore") as fp:
                for line in fp:
                    t = line.strip().split()
                    if len(t) == 4 and t[0] == "vertex":
                        verts.append([float(t[1]), float(t[2]), float(t[3])])
            if verts:
                return np.asarray(verts, dtype=np.float32)
        except (ValueError, UnicodeDecodeError):
            pass
    with open(path, "rb") as fp:
        fp.seek(80)
        n_tri = int(np.frombuffer(fp.read(4), dtype="<u4")[0])
        rec = np.dtype([("n", "<f4", (3,)), ("v", "<f4", (3, 3)), ("attr", "<u2")])
        tris = np.frombuffer(fp.read(rec.itemsize * n_tri), dtype=rec, count=n_tri)
    return tris["v"].reshape(-1, 3).astype(np.float32)


def load_pcd(file_in: str) -> np.ndarray:
    """Blensor-scan PCD reader (ascii), parity: reference
    `source/base/point_cloud.py:107-162` `load_pcd` — reads x/y/z columns
    of an ascii PCD as produced by Blensor range scans."""
    with open(file_in, "r", errors="ignore") as fp:
        lines = fp.readlines()
    fields = ["x", "y", "z"]
    data_start = 0
    col_names: typing.List[str] = []
    for i, line in enumerate(lines):
        t = line.strip().split()
        if not t:
            continue
        if t[0].upper() == "FIELDS":
            col_names = t[1:]
        elif t[0].upper() == "DATA":
            if len(t) > 1 and t[1].lower() != "ascii":
                raise ValueError("only ascii PCD supported")
            data_start = i + 1
            break
    if not col_names:
        col_names = fields
    cols = [col_names.index(f) for f in fields if f in col_names]
    rows = []
    for line in lines[data_start:]:
        t = line.split()
        if len(t) >= 3:
            rows.append([float(t[c]) for c in cols])
    return np.asarray(rows, dtype=np.float32)


def load_pts(pts_file: str) -> np.ndarray:
    """Load points (N, >=3) from any supported format.

    Parity: reference `source/occupancy_data_module.py:174-216` `load_pts`.
    """
    file_ext = os.path.splitext(pts_file)[1].lower()
    if file_ext == ".npy":
        pts = np.load(pts_file)
    elif file_ext == ".npz":
        arrs = np.load(pts_file)
        pts = arrs["arr_0"]
    elif file_ext == ".pcd":
        pts = load_pcd(pts_file)
    elif file_ext == ".xyz":
        pts = load_xyz(pts_file)
    elif file_ext == ".ply":
        pts = load_ply(pts_file).vertices
    elif file_ext == ".obj":
        pts = _load_obj_vertices(pts_file)
    elif file_ext == ".stl":
        pts = _load_stl_vertices(pts_file)
    elif file_ext in (".las", ".laz", ".copc", ".crs"):
        try:
            import laspy  # optional dependency, pure IO
        except ImportError as exc:  # pragma: no cover
            raise ImportError(
                "laspy is required for LAS/LAZ input but is not installed"
            ) from exc
        las = laspy.read(pts_file)
        pts = las.xyz
    else:
        raise ValueError(f"Unknown point cloud type: {pts_file}")
    return np.asarray(pts)


def pre_process_pts(pts: np.ndarray) -> typing.Tuple[np.ndarray, np.ndarray]:
    """Split XYZ + (optional) normals; zero normals if absent.

    Parity: reference `source/occupancy_data_module.py:218-225`.
    """
    if pts.shape[1] > 3:
        normals = math3d.normalize_vectors(pts[:, 3:6])
        pts = pts[:, 0:3]
    else:
        normals = np.zeros_like(pts)
    return pts, normals
