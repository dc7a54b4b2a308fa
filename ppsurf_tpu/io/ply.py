"""First-party PLY reader/writer and a minimal Mesh container.

Replaces the reference's use of trimesh for mesh/point-cloud IO
(`source/base/point_cloud.py:16-60`, `occupancy_data_module.py:174-216`).
Supports binary little-endian and ascii PLY with float vertex properties and
uchar-int face lists (the formats trimesh emits and the datasets use).
"""
from __future__ import annotations

import dataclasses
import os
import typing

import numpy as np


@dataclasses.dataclass
class Mesh:
    """Minimal triangle-mesh container (vertices + faces + optional colors)."""

    vertices: np.ndarray  # (V, 3) float
    faces: np.ndarray  # (F, 3) int
    vertex_colors: typing.Optional[np.ndarray] = None  # (V, 3|4) uint8

    @property
    def is_empty(self) -> bool:
        return self.vertices.shape[0] == 0 or self.faces.shape[0] == 0

    def face_normals(self) -> np.ndarray:
        v = self.vertices
        f = self.faces
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        length = np.linalg.norm(n, axis=1, keepdims=True)
        return n / np.maximum(length, 1e-30)

    def face_areas(self) -> np.ndarray:
        v = self.vertices
        f = self.faces
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        return 0.5 * np.linalg.norm(n, axis=1)

    def export(self, file_obj: str) -> None:
        save_ply(file_obj, self.vertices, self.faces, vertex_colors=self.vertex_colors)


_PLY_DTYPES = {
    "char": "i1",
    "uchar": "u1",
    "short": "i2",
    "ushort": "u2",
    "int": "i4",
    "uint": "u4",
    "int8": "i1",
    "uint8": "u1",
    "int16": "i2",
    "uint16": "u2",
    "int32": "i4",
    "uint32": "u4",
    "float": "f4",
    "float32": "f4",
    "double": "f8",
    "float64": "f8",
}


def _parse_header(data: bytes):
    end = data.find(b"end_header")
    if end < 0:
        raise ValueError("not a PLY file (no end_header)")
    header = data[: end + len(b"end_header")].decode("ascii", errors="replace")
    body_offset = end + len(b"end_header")
    # consume exactly one newline after end_header
    if data[body_offset : body_offset + 2] == b"\r\n":
        body_offset += 2
    elif data[body_offset : body_offset + 1] in (b"\n", b"\r"):
        body_offset += 1

    lines = [ln.strip() for ln in header.splitlines() if ln.strip()]
    if lines[0] != "ply":
        raise ValueError("not a PLY file (missing magic)")

    fmt = None
    elements = []  # list of (name, count, [(prop_type, prop_name) | ('list', idx_t, val_t, name)])
    for ln in lines[1:]:
        parts = ln.split()
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
            else:
                elements[-1][2].append((parts[1], parts[2]))
    return fmt, elements, body_offset


def load_ply(path: str) -> Mesh:
    """Load a PLY mesh or point cloud into a Mesh (faces may be empty)."""
    with open(path, "rb") as fp:
        data = fp.read()
    fmt, elements, offset = _parse_header(data)

    if fmt == "ascii":
        return _load_ply_ascii(data, elements, offset)
    if fmt not in ("binary_little_endian", "binary_big_endian"):
        raise ValueError(f"unsupported PLY format: {fmt}")
    bo = "<" if fmt == "binary_little_endian" else ">"

    vertices = np.zeros((0, 3), dtype=np.float32)
    faces = np.zeros((0, 3), dtype=np.int64)
    vertex_extra: typing.Dict[str, np.ndarray] = {}

    for name, count, props in elements:
        if count == 0:
            continue
        has_list = any(p[0] == "list" for p in props)
        if not has_list:
            dtype = np.dtype([(p[1], bo + _PLY_DTYPES[p[0]]) for p in props])
            arr = np.frombuffer(data, dtype=dtype, count=count, offset=offset)
            offset += dtype.itemsize * count
            if name == "vertex":
                vertices = np.stack(
                    [arr["x"], arr["y"], arr["z"]], axis=1
                ).astype(np.float32)
                for p in props:
                    if p[1] not in ("x", "y", "z"):
                        vertex_extra[p[1]] = np.asarray(arr[p[1]])
        else:
            if len(props) != 1:
                raise ValueError("mixed list/scalar properties unsupported")
            _, idx_t, val_t, _pname = props[0]
            idx_dt = np.dtype(bo + _PLY_DTYPES[idx_t])
            val_dt = np.dtype(bo + _PLY_DTYPES[val_t])
            # fast path: uniform triangle lists
            probe_n = int(
                np.frombuffer(data, dtype=idx_dt, count=1, offset=offset)[0]
            ) if count > 0 else 0
            stride = idx_dt.itemsize + probe_n * val_dt.itemsize
            block = data[offset : offset + stride * count]
            if len(block) == stride * count:
                raw = np.frombuffer(block, dtype=np.uint8).reshape(count, stride)
                counts = raw[:, : idx_dt.itemsize].copy().view(idx_dt).ravel()
                if np.all(counts == probe_n):
                    vals = (
                        raw[:, idx_dt.itemsize :].copy().view(val_dt).reshape(count, probe_n)
                    )
                    offset += stride * count
                    if name == "face":
                        if probe_n == 3:
                            faces = vals.astype(np.int64)
                        elif probe_n == 4:  # quads -> triangles
                            faces = np.concatenate(
                                [vals[:, [0, 1, 2]], vals[:, [0, 2, 3]]], axis=0
                            ).astype(np.int64)
                    continue
            # slow path: ragged lists
            polys = []
            pos = offset
            for _ in range(count):
                n = int(np.frombuffer(data, dtype=idx_dt, count=1, offset=pos)[0])
                pos += idx_dt.itemsize
                poly = np.frombuffer(data, dtype=val_dt, count=n, offset=pos)
                pos += n * val_dt.itemsize
                polys.append(poly)
            offset = pos
            if name == "face":
                tris = []
                for poly in polys:
                    for i in range(1, len(poly) - 1):
                        tris.append([poly[0], poly[i], poly[i + 1]])
                faces = np.asarray(tris, dtype=np.int64).reshape(-1, 3)

    colors = None
    if {"red", "green", "blue"} <= set(vertex_extra):
        colors = np.stack(
            [vertex_extra["red"], vertex_extra["green"], vertex_extra["blue"]], axis=1
        ).astype(np.uint8)
    return Mesh(vertices=vertices, faces=faces, vertex_colors=colors)


def _load_ply_ascii(data: bytes, elements, offset: int) -> Mesh:
    text = data[offset:].decode("ascii", errors="replace")
    tokens = text.split("\n")
    tokens = [t for t in tokens if t.strip()]
    cursor = 0
    vertices = np.zeros((0, 3), dtype=np.float32)
    faces = np.zeros((0, 3), dtype=np.int64)
    for name, count, props in elements:
        rows = tokens[cursor : cursor + count]
        cursor += count
        if count == 0:
            continue
        if name == "vertex":
            arr = np.array([[float(x) for x in r.split()] for r in rows])
            names = [p[1] for p in props]
            ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
            vertices = arr[:, [ix, iy, iz]].astype(np.float32)
        elif name == "face":
            tris = []
            for r in rows:
                vals = [int(x) for x in r.split()]
                n = vals[0]
                poly = vals[1 : 1 + n]
                for i in range(1, n - 1):
                    tris.append([poly[0], poly[i], poly[i + 1]])
            faces = np.asarray(tris, dtype=np.int64).reshape(-1, 3)
    return Mesh(vertices=vertices, faces=faces)


def save_ply(
    path: str,
    vertices: np.ndarray,
    faces: typing.Optional[np.ndarray] = None,
    normals: typing.Optional[np.ndarray] = None,
    vertex_colors: typing.Optional[np.ndarray] = None,
) -> None:
    """Write a binary little-endian PLY (reference `point_cloud.py:16-60`)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    vertices = np.asarray(vertices, dtype=np.float32)
    n_v = vertices.shape[0]
    faces = np.zeros((0, 3), dtype=np.int32) if faces is None else np.asarray(faces, dtype=np.int32)
    n_f = faces.shape[0]

    header = ["ply", "format binary_little_endian 1.0", "comment ppsurf_tpu"]
    header.append(f"element vertex {n_v}")
    header += ["property float x", "property float y", "property float z"]
    if normals is not None:
        header += ["property float nx", "property float ny", "property float nz"]
    if vertex_colors is not None:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header.append(f"element face {n_f}")
    header.append("property list uchar int vertex_indices")
    header.append("end_header")

    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if normals is not None:
        fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    if vertex_colors is not None:
        fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    vdata = np.zeros(n_v, dtype=np.dtype(fields))
    vdata["x"], vdata["y"], vdata["z"] = vertices[:, 0], vertices[:, 1], vertices[:, 2]
    if normals is not None:
        normals = np.asarray(normals, dtype=np.float32)
        vdata["nx"], vdata["ny"], vdata["nz"] = normals[:, 0], normals[:, 1], normals[:, 2]
    if vertex_colors is not None:
        vc = np.asarray(vertex_colors)
        if vc.dtype != np.uint8:
            vc = np.clip(vc * 255.0, 0, 255).astype(np.uint8)
        vdata["red"], vdata["green"], vdata["blue"] = vc[:, 0], vc[:, 1], vc[:, 2]

    fdata = np.zeros(n_f, dtype=np.dtype([("n", "u1"), ("v", "<i4", (3,))]))
    fdata["n"] = 3
    fdata["v"] = faces

    with open(path, "wb") as fp:
        fp.write(("\n".join(header) + "\n").encode("ascii"))
        fp.write(vdata.tobytes())
        fp.write(fdata.tobytes())
