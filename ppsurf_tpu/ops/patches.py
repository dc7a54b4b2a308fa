"""On-device local-patch extraction for the PPSurf PointNet branch.

Replaces the reference's CPU kd-tree patch queries
(`source/ppsurf_data_loader.py:83-123` and `source/poco_utils.py:67-72`)
with masked on-device kNN + vectorized patch-space normalization, so patch
extraction is fused into the same jit program as the network forward.
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp

from ppsurf_tpu.ops.knn import masked_knn

Array = jax.Array


def patch_space(pts_local_ms: Array, pts_query_ms: Array) -> Array:
    """Center patches on queries and scale each to unit max-radius.

    pts_local_ms: (..., Q, P, 3), pts_query_ms: (..., Q, 3).
    Parity: reference `ppsurf_data_loader.py:91-123`
    (get_patch_radii + model_space_to_patch_space).
    """
    centered = pts_local_ms - pts_query_ms[..., None, :]
    radius = jnp.max(jnp.linalg.norm(centered, axis=-1), axis=-1)  # (..., Q)
    return centered / jnp.maximum(radius[..., None, None], 1e-30)


@functools.partial(jax.jit, static_argnames=("num_pts_local", "tile"))
def extract_local_patches(
    pts_raw: Array,
    valid_raw: Array,
    pts_query: Array,
    num_pts_local: int,
    tile: int = 512,
) -> Array:
    """kNN patches around each query, normalized to patch space.

    pts_raw: (B, Nraw, 3) padded raw cloud; valid_raw: (B, Nraw) bool;
    pts_query: (B, Q, 3). Returns (B, Q, num_pts_local, 3).

    The reference queries a CPU kd-tree over the *raw* (pre-subsampling)
    cloud (`ppsurf_data_loader.py:62,84-89`); we keep that semantic with a
    padded static-shape cloud and masked distances.
    """
    ids = masked_knn(pts_raw, pts_query, valid_raw, k=num_pts_local, tile=tile)
    patches = jnp.take_along_axis(
        pts_raw[:, None, :, :],  # (B, 1, Nraw, 3)
        ids[..., None],  # (B, Q, k, 1)
        axis=2,
    )  # (B, Q, k, 3)
    return patch_space(patches, pts_query)
