"""On-device construction of the FKAConv spatial graph.

Replaces the reference's CPU hot path — 4 progressive subsamplings plus 13
kd-tree kNN queries per item inside DataLoader workers
(`source/poco_data_loader.py:137-240` `get_fkaconv_ids`/`get_proj_ids`) —
with a single jit-compiled program: voxel-favored fixed-count subsampling and
tiled on-device top-k. This removes the reference's need for 8-48 CPU workers
per accelerator (`configs/device_server.yaml:7`): graph building rides the
TPU next to the network forward.

Level sizes follow the reference's ratio 0.25 pyramid
(`poco_data_loader.py:148-151`): N, N/4, N/16, N/64, N/256 (ceil, min 1).
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp

from ppsurf_tpu.ops.knn import knn
from ppsurf_tpu.ops.subsample import voxel_subsample

Array = jax.Array

KNN_K = 16  # FKAConv kernel neighborhood (`nn.py:465` kernel_size=16)


def level_sizes(n: int, num_levels: int = 4, ratio: float = 0.25) -> typing.List[int]:
    """Static support-point counts per level.

    The reference uses max(1, int(n * 0.25)) per level
    (`poco_data_loader.py:74-77`); we additionally align each level UP to a
    multiple of 8 (the TPU sublane width, capped at the parent size): odd
    support counts (e.g. 39 at level 4 for N=10000) produce batched dots on
    bf16[B, 39, 1024] operands that crash XLA's TransformWindow fusion on
    v5e, and aligned shapes tile better regardless.
    """
    sizes = []
    cur = n
    for _ in range(num_levels):
        nxt = max(1, int(cur * ratio))
        nxt = min(cur, ((nxt + 7) // 8) * 8) if cur >= 8 else max(1, nxt)
        sizes.append(nxt)
        cur = nxt
    return sizes


@functools.partial(jax.jit, static_argnames=("segmentation", "tile"))
def build_fkaconv_graph(
    pts: Array, key: Array, segmentation: bool = True, tile: int = 512
) -> typing.Dict[str, Array]:
    """Build supports + all kNN id sets for the FKAConv U-Net.

    pts: (B, N, 3). Returns dict with 'support1..4' (B, Nl, 3),
    down-path ids 'ids00, ids01, ids11, ids12, ids22, ids23, ids33, ids34,
    ids44' (k=16) and up-path ids 'ids43, ids32, ids21, ids10' (k=1),
    matching reference `get_fkaconv_ids` key-for-key.
    """
    b, n, _ = pts.shape
    sizes = level_sizes(n)

    keys = jax.random.split(key, 4)
    supports = [pts]
    for lvl in range(4):
        k_small = min(KNN_K, sizes[lvl])
        prev = supports[-1]
        idx = voxel_subsample(prev, keys[lvl], sizes[lvl])  # (B, Nl)
        sup = jnp.take_along_axis(prev, idx[..., None], axis=1)
        supports.append(sup)

    def k_at(level_pts: Array) -> int:
        return min(KNN_K, level_pts.shape[1])

    s0, s1, s2, s3, s4 = supports
    graph: typing.Dict[str, Array] = {
        "support1": s1,
        "support2": s2,
        "support3": s3,
        "support4": s4,
        "ids00": knn(s0, s0, k_at(s0), tile=tile),
        "ids01": knn(s0, s1, k_at(s0), tile=tile),
        "ids11": knn(s1, s1, k_at(s1), tile=tile),
        "ids12": knn(s1, s2, k_at(s1), tile=tile),
        "ids22": knn(s2, s2, k_at(s2), tile=tile),
        "ids23": knn(s2, s3, k_at(s2), tile=tile),
        "ids33": knn(s3, s3, k_at(s3), tile=tile),
        "ids34": knn(s3, s4, k_at(s3), tile=tile),
        "ids44": knn(s4, s4, k_at(s4), tile=tile),
    }
    if segmentation:
        graph["ids43"] = knn(s4, s3, 1, tile=tile)
        graph["ids32"] = knn(s3, s2, 1, tile=tile)
        graph["ids21"] = knn(s2, s1, 1, tile=tile)
        graph["ids10"] = knn(s1, s0, 1, tile=tile)
    return graph


@functools.partial(jax.jit, static_argnames=("k", "tile", "kb"))
def build_proj_ids(pts: Array, pts_query: Array, k: int = 64, tile: int = 512,
                   kb: int = 0) -> Array:
    """k-NN of query points into the cloud for the decoder.

    Parity: reference `get_proj_ids` (`poco_data_loader.py:212-240`), k=64.
    pts: (B, N, 3), pts_query: (B, Q, 3) -> (B, Q, k). kb > 0 enables the
    banded Pallas kNN (exact; fast when pts/queries are Morton-ordered).
    """
    return knn(pts, pts_query, min(k, pts.shape[1]), tile=tile, kb=kb)
