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


@functools.partial(jax.jit, static_argnames=("q_tile",))
def _winding_tiled(queries, tri_a, tri_b, tri_c, q_tile: int = 1024):
    """Winding numbers for (Q, 3) queries against (F, 3, 3) triangles."""

    def one_tile(q):  # (t, 3)
        a = tri_a[None] - q[:, None]  # (t, F, 3)
        b = tri_b[None] - q[:, None]
        c = tri_c[None] - q[:, None]
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
        return jnp.sum(omega, axis=-1) / (4.0 * jnp.pi)

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
