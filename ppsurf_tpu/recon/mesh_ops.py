"""Mesh cleanup: duplicate/degenerate removal + small-component filtering.

Parity targets: reference `source/base/mesh.py` (`clean_simple_inplace`,
`remove_small_connected_components` with face-adjacency components and the
min-6-faces threshold used by reconstruction, `poco_utils.py:104-107`).
Implemented on numpy + scipy.sparse.csgraph instead of trimesh.
"""
from __future__ import annotations

import os
import time
import typing

import numpy as np

from ppsurf_tpu.io.ply import Mesh


class _steptimer:
    """Env-gated (PPSURF_EVAL_DEBUG=1) step timer for the cleanup phases —
    they run on a single shared host core and have shown large in-process
    slowdowns that standalone profiling does not reproduce. Reports minor
    page-fault deltas: on this class of sandboxed kernel first-touch
    faults cost ~100 us each, so fresh-page traffic dominates wall time."""

    __slots__ = ("t", "f", "c")

    def __init__(self):
        if _DBG():
            import resource

            ru = resource.getrusage(resource.RUSAGE_SELF)
            self.t = time.perf_counter()
            self.f = ru.ru_minflt
            self.c = ru.ru_utime + ru.ru_stime
        else:
            self.t = None

    def mark(self, label: str) -> None:
        if self.t is not None:
            import resource

            now = time.perf_counter()
            ru = resource.getrusage(resource.RUSAGE_SELF)
            cpu = ru.ru_utime + ru.ru_stime
            print(
                f"#     mesh[{label}]: {now - self.t:6.2f}s "
                f"cpu={cpu - self.c:5.2f}s "
                f"{(ru.ru_minflt - self.f) / 1000:.0f}k flt", flush=True,
            )
            self.t = now
            self.f = ru.ru_minflt
            self.c = cpu


def _DBG() -> bool:
    return os.environ.get("PPSURF_EVAL_DEBUG") == "1"


def _unique_rows(key: np.ndarray) -> typing.Tuple[np.ndarray, np.ndarray]:
    """(first_occurrence_index, inverse) for row-duplicates of `key`.

    Equivalent to np.unique(key, axis=0, return_index, return_inverse)
    except that unique groups come in lexicographic value order instead of
    void-byte order (both deterministic). The lexsort path is ~20x faster
    at production sizes (np.unique(axis=0) sorts rows as void scalars —
    14.9 s of the res-257 reconstruction's mesh-clean phase was these row
    uniques on ~1M-row arrays). The native C++ sort is preferred when the
    library is present: inside the reconstruction process, multi-MB numpy
    temporaries intermittently cost seconds on the single shared host
    core (see face_connected_components).
    """
    if key.ndim == 2 and key.shape[1] == 3:
        from ppsurf_tpu import native

        result = native.unique_rows_native(key.astype(np.float64, copy=False))
        if result is not None:
            return result
    order = np.lexsort(key.T[::-1])
    ks = key[order]
    new = np.empty(order.shape[0], bool)
    new[0] = True
    np.any(ks[1:] != ks[:-1], axis=1, out=new[1:])
    inverse = np.empty(order.shape[0], np.int64)
    inverse[order] = np.cumsum(new) - 1
    # lexsort is stable, so the group leader is the smallest original index
    first = order[np.flatnonzero(new)]
    return first, inverse


def merge_duplicate_vertices(mesh: Mesh, digits: int = 10) -> Mesh:
    """Merge vertices that coincide up to rounding."""
    if mesh.vertices.shape[0] == 0:
        return mesh
    key = np.round(mesh.vertices.astype(np.float64), digits)
    first, inverse = _unique_rows(key)
    verts = mesh.vertices[first]
    faces = inverse[mesh.faces]
    colors = mesh.vertex_colors[first] if mesh.vertex_colors is not None else None
    return Mesh(vertices=verts, faces=faces, vertex_colors=colors)


def remove_degenerate_faces(mesh: Mesh) -> Mesh:
    """Drop faces with repeated vertex indices and exact duplicate faces."""
    f = mesh.faces
    if f.shape[0] == 0:
        return mesh
    from ppsurf_tpu import native

    keep = native.dedup_faces_native(f)
    if keep is not None:
        return Mesh(
            vertices=mesh.vertices,
            faces=f[keep],
            vertex_colors=mesh.vertex_colors,
        )
    ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    f = f[ok]
    # duplicate faces (same vertex set): scalar int64 keys when the vertex
    # count permits (v^3 < 2^63), row-unique fallback otherwise
    key = np.sort(f, axis=1)
    nv = int(mesh.vertices.shape[0])
    if 0 < nv < 2_000_000:
        k1 = (
            key[:, 0].astype(np.int64) * nv + key[:, 1]
        ) * nv + key[:, 2]
        _, first = np.unique(k1, return_index=True)
    else:
        first, _ = _unique_rows(key)
    f = f[np.sort(first)]
    return Mesh(vertices=mesh.vertices, faces=f, vertex_colors=mesh.vertex_colors)


def remove_unreferenced_vertices(mesh: Mesh) -> Mesh:
    if mesh.faces.shape[0] == 0:
        return Mesh(
            vertices=np.zeros((0, 3), np.float32),
            faces=mesh.faces,
            vertex_colors=None,
        )
    used = np.unique(mesh.faces)
    remap = -np.ones(mesh.vertices.shape[0], dtype=np.int64)
    remap[used] = np.arange(used.shape[0])
    colors = mesh.vertex_colors[used] if mesh.vertex_colors is not None else None
    return Mesh(
        vertices=mesh.vertices[used],
        faces=remap[mesh.faces],
        vertex_colors=colors,
    )


def clean_simple(mesh: Mesh) -> Mesh:
    """Reference `clean_simple_inplace` (`mesh.py:7-13`): merge duplicate
    vertices, drop duplicate/degenerate faces."""
    t = _steptimer()
    mesh = merge_duplicate_vertices(mesh)
    t.mark(f"merge_dup v={mesh.vertices.shape[0]}")
    mesh = remove_degenerate_faces(mesh)
    t.mark(f"degen f={mesh.faces.shape[0]}")
    return mesh


def face_connected_components(
    faces: np.ndarray, use_native: bool = True
) -> typing.Tuple[int, np.ndarray]:
    """Connected components over face adjacency (shared edges).

    The native sort+union-find is the default: the scipy coo/csr/BFS
    pipeline, while fine standalone (~0.9 s at 966k faces), was measured
    at 2-16 s of real CPU inside the large-heap reconstruction process
    (cache/TLB pathology on sandboxed kernels — the work itself slowed
    down, not the scheduling; see native face_components). The scipy
    path remains as the no-native fallback.
    """
    n_faces = faces.shape[0]
    if n_faces == 0:
        return 0, np.zeros((0,), np.int64)
    if use_native:
        from ppsurf_tpu import native

        result = native.face_components_native(faces)
        if result is not None:
            return result
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    face_id = np.tile(np.arange(n_faces), 3)
    # group faces by shared edge: scalar int64 edge keys sort ~5x faster
    # than a 2-column lexsort at production sizes (2.9M edges)
    nv = int(edges.max()) + 1 if edges.size else 1
    ekey = edges[:, 0].astype(np.int64) * nv + edges[:, 1]
    order = np.argsort(ekey, kind="stable")
    es = ekey[order]
    fs = face_id[order]
    same = es[1:] == es[:-1]
    a = fs[:-1][same]
    b = fs[1:][same]
    graph = sp.coo_matrix(
        (np.ones(len(a)), (a, b)), shape=(n_faces, n_faces)
    )
    n_comp, labels = connected_components(graph, directed=False)
    return n_comp, labels


def remove_small_connected_components(mesh: Mesh, num_faces: int = 6) -> Mesh:
    """Keep components with > num_faces faces (reference `mesh.py:16-38`)."""
    t = _steptimer()
    n_comp, labels = face_connected_components(mesh.faces)
    t.mark(f"cc n={n_comp} f={mesh.faces.shape[0]}")
    if n_comp == 0:
        return mesh
    counts = np.bincount(labels, minlength=n_comp)
    keep = counts[labels] > num_faces
    mesh = Mesh(
        vertices=mesh.vertices,
        faces=mesh.faces[keep],
        vertex_colors=mesh.vertex_colors,
    )
    out = remove_unreferenced_vertices(mesh)
    t.mark("unref")
    return out
