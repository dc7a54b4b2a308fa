"""On-device k-nearest-neighbor search with static shapes.

Replaces the reference's 13+ per-item CPU kd-tree queries
(`source/poco_utils.py:257-273` `knn`, `source/base/proximity.py:40-89`)
with tiled brute-force distance + top-k that runs inside jit on TPU.

Design notes (TPU-first):
- The (Q, N) distance tile is produced by one MXU matmul (-2 q·pᵀ) plus
  rank-1 norm corrections, then `lax.top_k` reduces over N. Queries are
  processed in fixed-size tiles via `lax.map` so HBM never holds the full
  (Q, N) matrix.
- All shapes are static: k and the tile size are Python ints; padded points
  are excluded with +inf distances via `valid_n` masks.
- Matches kd-tree semantics: neighbors sorted nearest-first; when
  k > #points the reference clamps k (`poco_utils.py:259-260`) — we instead
  require static k and let callers clamp.
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp

Array = jax.Array


def _dist2_tile(queries: Array, points: Array) -> Array:
    """Squared L2 distances (q, n) for one tile; MXU-friendly."""
    # f32 accumulation: coordinates are ~unit scale, products stay accurate.
    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)  # (q, 1)
    pn = jnp.sum(points * points, axis=-1, keepdims=True).T  # (1, n)
    # HIGHEST precision: on TPU the default bf16 matmul perturbs distances by
    # ~1e-2 at unit scale, enough to swap non-tied neighbors. The kNN FLOPs
    # are negligible next to the network, so full f32 is the right trade.
    cross = jax.lax.dot_general(
        queries,
        points,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (q, n)
    return qn + pn - 2.0 * cross


def _knn_single(
    points: Array,
    queries: Array,
    k: int,
    tile: int,
    valid_n: typing.Optional[Array],
    return_dists: bool,
):
    """kNN for one (N,3) cloud / (Q,3) query set."""
    num_q = queries.shape[0]
    pad_q = (-num_q) % tile
    queries_padded = jnp.pad(queries, ((0, pad_q), (0, 0)))
    q_tiles = queries_padded.reshape(-1, tile, 3)

    def one_tile(q: Array):
        d2 = _dist2_tile(q, points)  # (tile, N)
        if valid_n is not None:
            d2 = jnp.where(valid_n[None, :], d2, jnp.inf)
        neg_d, idx = jax.lax.top_k(-d2, k)  # nearest first
        return (-neg_d, idx) if return_dists else (idx,)

    out = jax.lax.map(one_tile, q_tiles)
    if return_dists:
        dists = out[0].reshape(-1, k)[:num_q]
        idx = out[1].reshape(-1, k)[:num_q]
        return dists, idx
    return out[0].reshape(-1, k)[:num_q]


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def knn(points: Array, queries: Array, k: int, tile: int = 512) -> Array:
    """Indices (..., Q, k) of the k nearest of `points` for each query.

    points: (B, N, 3) or (N, 3); queries: (B, Q, 3) or (Q, 3).
    Nearest-first ordering, parity with reference `poco_utils.py:257-273`.
    """
    if points.ndim == 2:
        return _knn_single(points, queries, k, tile, None, False)
    return jax.vmap(lambda p, q: _knn_single(p, q, k, tile, None, False))(points, queries)


@functools.partial(jax.jit, static_argnames=("k", "tile", "return_dists"))
def masked_knn(
    points: Array,
    queries: Array,
    valid_n: Array,
    k: int,
    tile: int = 512,
    return_dists: bool = False,
):
    """kNN over padded point sets: `valid_n` (bool, (..., N)) masks padding.

    Enables static-shape batching of variable-size raw clouds (the reference
    queries a kd-tree over the raw cloud for PPSurf patches,
    `ppsurf_data_loader.py:83-89`).
    """
    if points.ndim == 2:
        return _knn_single(points, queries, k, tile, valid_n, return_dists)
    return jax.vmap(
        lambda p, q, v: _knn_single(p, q, k, tile, v, return_dists)
    )(points, queries, valid_n)


def knn_interp_ids(points: Array, queries: Array) -> Array:
    """1-NN ids used by the decoder's upsampling path (k=1).

    Parity: `poco_data_loader.py:165-168` (ids43/32/21/10 with k=1).
    Returns (..., Q, 1).
    """
    return knn(points, queries, k=1)
