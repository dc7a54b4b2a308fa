"""Generalized winding number on device — inside/outside tests for meshes.

Replaces pysdf's "inaccurate but sign-correct" signed distance
(reference `source/base/proximity.py:11-17`, used by the IoU and F1-approx
metrics, `metrics.py:157-219`) with the solid-angle winding number
(Van Oosterom–Strackee), computed as one jit-compiled tiled reduction over
(query, face) pairs. For watertight meshes the winding number is ~1 inside
and ~0 outside; we threshold at 0.5. Runs on TPU: the per-pair math is pure
VPU work and the face axis reduces on chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ppsurf_tpu.io.ply import Mesh


F_TILE = 8192  # faces per scan step: (q_tile, F_TILE, 3) temps stay ~100 MB


@functools.partial(jax.jit, static_argnames=("q_tile",))
def _winding_tiled(queries, tri_a, tri_b, tri_c, q_tile: int = 1024):
    """Winding numbers for (Q, 3) queries against (F, 3, 3) triangles.

    Both axes are tiled: queries by `q_tile` (lax.map) and faces by
    `F_TILE` (lax.scan accumulating the solid-angle sum) — the unscanned
    version materialized (q_tile, F, 3) temps, which at 964k faces
    (res-257 reconstructions) was a 33 GB HBM footprint. Face padding uses
    degenerate all-zero triangles: a=b=c ==> cross(b,c)=0 so num=0, and
    arctan2(0, den) = 0 for den >= 0 (den = 4|q|^3 there), so padded
    faces contribute exactly zero.
    """
    num_f = tri_a.shape[0]
    pad_f = (-num_f) % F_TILE
    tris = [jnp.pad(t, ((0, pad_f), (0, 0))).reshape(-1, F_TILE, 3)
            for t in (tri_a, tri_b, tri_c)]

    def one_tile(q):  # (t, 3)
        def face_chunk(acc, abc):
            ta, tb, tc = abc  # (F_TILE, 3) each
            a = ta[None] - q[:, None]  # (t, F_TILE, 3)
            b = tb[None] - q[:, None]
            c = tc[None] - q[:, None]
            la = jnp.linalg.norm(a, axis=-1)
            lb = jnp.linalg.norm(b, axis=-1)
            lc = jnp.linalg.norm(c, axis=-1)
            num = jnp.einsum("tfi,tfi->tf", a, jnp.cross(b, c))
            den = (
                la * lb * lc
                + jnp.einsum("tfi,tfi->tf", a, b) * lc
                + jnp.einsum("tfi,tfi->tf", b, c) * la
                + jnp.einsum("tfi,tfi->tf", c, a) * lb
            )
            omega = 2.0 * jnp.arctan2(num, den)  # solid angle per triangle
            return acc + jnp.sum(omega, axis=-1), None

        total, _ = jax.lax.scan(
            face_chunk, jnp.zeros((q.shape[0],), jnp.float32), tuple(tris)
        )
        return total / (4.0 * jnp.pi)

    num_q = queries.shape[0]
    pad = (-num_q) % q_tile
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    out = jax.lax.map(one_tile, qp.reshape(-1, q_tile, 3))
    return out.reshape(-1)[:num_q]


def winding_number(mesh: Mesh, queries: np.ndarray, q_tile: int = 1024) -> np.ndarray:
    v = jnp.asarray(mesh.vertices, jnp.float32)
    f = mesh.faces
    tri_a = v[jnp.asarray(f[:, 0])]
    tri_b = v[jnp.asarray(f[:, 1])]
    tri_c = v[jnp.asarray(f[:, 2])]
    return np.asarray(
        _winding_tiled(jnp.asarray(queries, jnp.float32), tri_a, tri_b, tri_c, q_tile)
    )


def points_inside(mesh: Mesh, queries: np.ndarray, q_tile: int = 1024) -> np.ndarray:
    """Bool mask: query points inside the (near-watertight) mesh.

    Sign convention matches the reference's pysdf usage: `sdf > 0` == inside
    (`metrics.py:175-176`).
    """
    if mesh.is_empty:
        return np.zeros(queries.shape[0], bool)
    return winding_number(mesh, queries, q_tile) > 0.5
