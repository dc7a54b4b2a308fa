"""First-party marching cubes (replaces skimage.measure.marching_cubes,
reference `source/poco_utils.py:96`).

The 256-case tables are *generated* at import time from the cube topology
instead of being transcribed: for every sign configuration we trace the
iso-surface polygons by pairing cut edges on each cube face ("separate the
inside corners" rule for ambiguous faces — deterministic and purely a
function of the shared face's signs, so adjacent cubes always agree and the
extracted surface is watertight), then fan-triangulate each traced cycle.
Extraction itself is fully vectorized numpy over active cells; the C++
native path (ppsurf_tpu.recon.native) accelerates the same algorithm for
large grids.

Conventions (matching skimage for drop-in parity):
- vertex (i, j, k) is grid index space; the caller scales by `step` and
  offsets by the padded bbox origin (reference `poco_utils.py:130,170`).
- "inside" is value < level; triangles are oriented so normals point toward
  decreasing values (outside for the reference's p0-p1 field).
"""
from __future__ import annotations

import typing

import numpy as np

# cube corners in (x, y, z) offsets; bit i of the cube index = corner i inside
_CORNERS = np.array(
    [
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    ],
    dtype=np.int64,
)

# the 12 edges as corner index pairs
_EDGES = np.array(
    [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
    dtype=np.int64,
)

# faces as cyclic corner loops, CCW when viewed from OUTSIDE the cube
_FACES = [
    (0, 3, 2, 1),  # z = 0 (viewed from -z)
    (4, 5, 6, 7),  # z = 1
    (0, 1, 5, 4),  # y = 0
    (2, 3, 7, 6),  # y = 1
    (0, 4, 7, 3),  # x = 0
    (1, 2, 6, 5),  # x = 1
]

_EDGE_OF_PAIR = {}
for _ei, (_a, _b) in enumerate(_EDGES):
    _EDGE_OF_PAIR[(_a, _b)] = _ei
    _EDGE_OF_PAIR[(_b, _a)] = _ei


def _build_tables() -> typing.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Generate (edge_cut_table, tri_table, tri_counts).

    tri_table: (256, 15) edge indices (-1 padded), max 5 triangles/cell.
    """
    tri_table = -np.ones((256, 15), dtype=np.int64)
    tri_counts = np.zeros(256, dtype=np.int64)
    edge_cut = np.zeros((256, 12), dtype=bool)

    for config in range(256):
        inside = [(config >> i) & 1 == 1 for i in range(8)]

        # directed segments on faces: cut-edge -> cut-edge with the inside
        # region on the left (viewed from outside)
        nxt: typing.Dict[int, int] = {}
        for face in _FACES:
            # runs of consecutive inside corners along the cyclic boundary
            for s in range(4):
                a, b = face[s], face[(s + 1) % 4]
                if inside[a] and not inside[b]:
                    # exiting the inside region: cut on edge (a, b)
                    exit_edge = _EDGE_OF_PAIR[(a, b)]
                    # walk backwards to find where this run was entered
                    t = s
                    while inside[face[t % 4]]:
                        t -= 1
                    entry_edge = _EDGE_OF_PAIR[(face[t % 4], face[(t + 1) % 4])]
                    # inside-on-left: segment runs entry -> exit on this face
                    nxt[entry_edge] = exit_edge

        # trace cycles
        tris: typing.List[typing.Tuple[int, int, int]] = []
        remaining = dict(nxt)
        while remaining:
            # lowest edge id: the SAME deterministic fan apex the native
            # table builder picks (ppsurf_native.cpp McTables) — both paths
            # must emit identical triangles, not just equivalent ones
            start = min(remaining)
            cycle = [start]
            cur = remaining.pop(start)
            while cur != start:
                cycle.append(cur)
                cur = remaining.pop(cur)
            for i in range(1, len(cycle) - 1):
                tris.append((cycle[0], cycle[i], cycle[i + 1]))

        tri_counts[config] = len(tris)
        for t, tri in enumerate(tris):
            tri_table[config, 3 * t : 3 * t + 3] = tri
        for e in set(nxt) | set(nxt.values()):
            edge_cut[config, e] = True

    return edge_cut, tri_table, tri_counts


_EDGE_CUT, _TRI_TABLE, _TRI_COUNTS = _build_tables()


def marching_cubes(
    volume: np.ndarray, level: float = 0.0, use_native: bool = True
) -> typing.Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a dense 3-D scalar field.

    Returns (verts (V, 3) float32 in index space, faces (F, 3) int64).
    NaN cells are treated as above-level (outside), matching how the
    reference's region-grown volume behaves under skimage
    (`poco_utils.py:87-96`). Dispatches to the C++ implementation
    (native/ppsurf_native.cpp, same generated tables) when built.
    """
    if volume.ndim != 3:
        raise ValueError("volume must be 3-D")
    if use_native:
        from ppsurf_tpu import native

        result = native.marching_cubes_native(volume, level)
        if result is not None:
            return result
    vol = np.asarray(volume, dtype=np.float64)
    finite = np.isfinite(vol)
    vol = np.where(finite, vol, np.inf)

    nx, ny, nz = vol.shape
    inside = vol < level  # (nx, ny, nz) bool

    # cube index per cell, bits from the 8 corners; cells touching an
    # unevaluated (NaN) corner emit no geometry — the true sign crossing
    # lies strictly inside the region-grown band, so this only suppresses
    # the spurious shell at the band boundary.
    idx = np.zeros((nx - 1, ny - 1, nz - 1), dtype=np.uint16)
    valid = np.ones((nx - 1, ny - 1, nz - 1), dtype=bool)
    for bit, (cx, cy, cz) in enumerate(_CORNERS):
        corner_in = inside[cx : cx + nx - 1, cy : cy + ny - 1, cz : cz + nz - 1]
        idx |= corner_in.astype(np.uint16) << bit
        valid &= finite[cx : cx + nx - 1, cy : cy + ny - 1, cz : cz + nz - 1]

    active = np.argwhere((idx != 0) & (idx != 255) & valid)  # (A, 3)
    if active.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    cell_cfg = idx[active[:, 0], active[:, 1], active[:, 2]]  # (A,)

    # global edge ids: edge = (corner point p, axis a) with a = 0|1|2
    # axis and base corner for each of the 12 cube edges
    edge_axis = np.zeros(12, dtype=np.int64)
    edge_base = np.zeros((12, 3), dtype=np.int64)
    for e, (a, b) in enumerate(_EDGES):
        ca, cb = _CORNERS[a], _CORNERS[b]
        d = cb - ca
        ax = int(np.nonzero(d)[0][0])
        edge_axis[e] = ax
        edge_base[e] = np.minimum(ca, cb)

    def global_edge_id(cells: np.ndarray, local_edge: np.ndarray) -> np.ndarray:
        base = cells + edge_base[local_edge]  # (M, 3)
        ax = edge_axis[local_edge]
        return ((base[:, 0] * ny + base[:, 1]) * nz + base[:, 2]) * 3 + ax

    # interpolated vertex positions for every *cut* edge of active cells
    cut = _EDGE_CUT[cell_cfg]  # (A, 12)
    cells_rep = np.repeat(active, 12, axis=0).reshape(-1, 12, 3)
    local_edges = np.broadcast_to(np.arange(12), cut.shape)
    cut_cells = cells_rep[cut]  # (C, 3)
    cut_local = local_edges[cut]  # (C,)
    geids = global_edge_id(cut_cells, cut_local)

    uniq_geids, inv = np.unique(geids, return_inverse=True)

    # compute interpolation on unique edges only
    u_base = cut_cells + edge_base[cut_local]
    u_ax = edge_axis[cut_local]
    first = np.zeros(uniq_geids.shape[0], dtype=np.int64)
    first[inv] = np.arange(geids.shape[0])
    ub = u_base[first]
    ua = u_ax[first]
    p0 = ub
    p1 = ub.copy()
    p1[np.arange(p1.shape[0]), ua] += 1
    v0 = vol[p0[:, 0], p0[:, 1], p0[:, 2]]
    v1 = vol[p1[:, 0], p1[:, 1], p1[:, 2]]
    denom = v1 - v0
    # guard: both finite on cut edges by construction; denom != 0
    t = np.where(np.abs(denom) > 1e-300, (level - v0) / denom, 0.5)
    t = np.clip(t, 0.0, 1.0)
    # replace +/-inf endpoints (NaN cells) with midpoint placement
    t = np.where(np.isfinite(denom), t, 0.5)
    verts = p0.astype(np.float64)
    verts[np.arange(verts.shape[0]), ua] += t

    # map the tri table through the per-cell edge -> vertex-id mapping
    edge_vert = -np.ones((active.shape[0], 12), dtype=np.int64)
    edge_vert[cut] = inv  # vertex index per (cell, local edge)

    ntris = _TRI_COUNTS[cell_cfg]  # (A,)
    tri_entries = _TRI_TABLE[cell_cfg]  # (A, 15)
    tri_mask = np.broadcast_to(np.arange(5), (active.shape[0], 5)) < ntris[:, None]
    tris_local = tri_entries.reshape(-1, 5, 3)[tri_mask]  # (T, 3) local edge ids
    cell_of_tri = np.broadcast_to(
        np.arange(active.shape[0])[:, None], (active.shape[0], 5)
    )[tri_mask]
    faces = edge_vert[cell_of_tri[:, None], tris_local]

    return verts.astype(np.float32), faces.astype(np.int64)
