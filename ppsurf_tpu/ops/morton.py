"""Morton (Z-order) spatial sorting on the host.

The banded Pallas kNN (`ops/knn_pallas.py`) gathers only the few best
128-point blocks per query; that band is tight exactly when consecutive
points (and consecutive queries) are spatially close, so the reconstruction
path sorts the cloud once per shape and each query chunk per call by Morton
code. Pure numpy — runs on the host in O(n log n), negligible next to a
single network chunk.

The reference has no analogue (its pykdtree handles locality internally,
`source/base/proximity.py:40-64`); this is the TPU-native replacement for
that spatial index.
"""
from __future__ import annotations

import numpy as np

_BITS = 16  # bits per axis; 48-bit codes in an int64


def _spread3(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of x two zeros apart (classic 3-D Morton
    bit-split; the masks are the standard 64-bit libmorton constants)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x001F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x001F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton_codes(points: np.ndarray, bmin=None, bmax=None) -> np.ndarray:
    """Z-order codes (uint64) for (N, 3) points.

    bmin/bmax fix the quantization box; pass the CLOUD's box when coding
    queries so both orders agree spatially.
    """
    pts = np.asarray(points, np.float64)
    if bmin is None:
        bmin = pts.min(axis=0)
    if bmax is None:
        bmax = pts.max(axis=0)
    bmin = np.broadcast_to(np.asarray(bmin, np.float64), (3,))
    bmax = np.broadcast_to(np.asarray(bmax, np.float64), (3,))
    scale = np.where(bmax > bmin, (2**_BITS - 1) / (bmax - bmin), 0.0)
    q = np.clip((pts - bmin) * scale, 0, 2**_BITS - 1).astype(np.uint64)
    return (
        _spread3(q[:, 0])
        | (_spread3(q[:, 1]) << np.uint64(1))
        | (_spread3(q[:, 2]) << np.uint64(2))
    )


def morton_order(points: np.ndarray, bmin=None, bmax=None) -> np.ndarray:
    """Permutation that sorts (N, 3) points into Z-order."""
    return np.argsort(morton_codes(points, bmin, bmax), kind="stable")

