"""Fixed-count support-point subsampling, jit-safe with static shapes.

Replaces the reference's data-dependent progressive voxel-grid sampling
(`source/poco_data_loader.py:59-134` `sampling_quantized`: a while-loop that
voxel-dedups under random rotations until the quota is met) with a single
deterministic pass that keeps static output shapes:

1. rotate points by a PRNG-sampled random rotation (same role as the
   reference's RandomRotate x/y/z composition),
2. voxelize at the reference's voxel size `diag_norm / sqrt(n_support)`,
3. sort by (voxel id, random tiebreak) and flag the first point per voxel,
4. rank points by (is-first-in-voxel, random) and take the top `n_support`.

Step 4 selects one random representative per occupied voxel first (spatially
uniform coverage, like the reference's first voxel pass) and fills the
remaining quota with uniformly random leftovers (the reference fills its
quota from progressively halved voxels; a random fill is statistically close
and shape-static). Returns indices into the input cloud so callers can gather
positions or features.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _random_rotation(key: Array) -> Array:
    """Uniform SO(3) rotation matrix via Shoemake quaternion sampling."""
    r1, r2, r3 = jax.random.uniform(key, (3,))
    q = jnp.array(
        [
            jnp.sqrt(1.0 - r1) * jnp.sin(2.0 * jnp.pi * r2),
            jnp.sqrt(1.0 - r1) * jnp.cos(2.0 * jnp.pi * r2),
            jnp.sqrt(r1) * jnp.sin(2.0 * jnp.pi * r3),
            jnp.sqrt(r1) * jnp.cos(2.0 * jnp.pi * r3),
        ]
    )
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


_NUM_HALVINGS = 4  # voxel-size halving levels mirrored from the reference loop


def _first_in_voxel_flags(pts_rot: Array, vox: Array, tie: Array) -> Array:
    """Bool flag per point: is it the (random) representative of its voxel?"""
    n = pts_rot.shape[0]
    mini = jnp.min(pts_rot, axis=0)
    # int32 voxel ids: grid extent per axis is <= diag/vox + 2 ~ sqrt(N)+2,
    # so the linear id stays < (sqrt(N)+2)^3 — well inside int32 for N <= 1M.
    cell = jnp.floor((pts_rot - mini[None, :]) / vox).astype(jnp.int32)
    dim = jnp.max(cell) + 2
    vox_id = (cell[:, 0] * dim + cell[:, 1]) * dim + cell[:, 2]
    order = jnp.lexsort((tie, vox_id))
    vox_sorted = vox_id[order]
    first_sorted = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), vox_sorted[1:] != vox_sorted[:-1]]
    )
    flags = jnp.zeros((n,), jnp.bool_).at[order].set(first_sorted)
    return flags


def _voxel_subsample_single(pts: Array, key: Array, n_support: int) -> Array:
    """Hierarchical voxel-representative ranking with static shapes.

    The reference (`poco_data_loader.py:94-127`) keeps one point per voxel,
    halves the voxel size, and repeats on the leftovers until the quota is
    met. We reproduce that priority order in one static pass: points that
    represent a coarse voxel rank highest, then representatives of each
    successively halved voxel level, then uniform random fill — selected with
    a single top-k over a combined score.
    """
    n = pts.shape[0]
    k_tie, *k_levels = jax.random.split(key, 1 + _NUM_HALVINGS)

    mini = jnp.min(pts, axis=0)
    maxi = jnp.max(pts, axis=0)
    # reference voxel size: bbox-diagonal norm / sqrt(n_support)
    # (`poco_data_loader.py:86-88`)
    vox0 = jnp.linalg.norm(maxi - mini) / jnp.sqrt(jnp.float32(n_support))
    vox0 = jnp.maximum(vox0, 1e-12)

    tie = jax.random.uniform(k_tie, (n,))
    score = tie
    weight = 2.0
    for lvl in range(_NUM_HALVINGS):
        rot = _random_rotation(k_levels[lvl])
        flags = _first_in_voxel_flags(pts @ rot.T, vox0 / (2.0**lvl), tie)
        # coarse-level flags dominate all finer levels combined
        score = score + jnp.where(flags, weight * 2.0 ** (_NUM_HALVINGS - lvl), 0.0)
    _, top = jax.lax.top_k(score, n_support)
    return top


@functools.partial(jax.jit, static_argnames=("n_support",))
def voxel_subsample(pts: Array, key: Array, n_support: int) -> Array:
    """Indices (..., n_support) of a spatially-uniform fixed-count subsample.

    pts: (N, 3) or (B, N, 3). Replaces `sampling_quantized` with static
    shapes (see module docstring).
    """
    if pts.ndim == 2:
        return _voxel_subsample_single(pts, key, n_support)
    keys = jax.random.split(key, pts.shape[0])
    return jax.vmap(lambda p, k: _voxel_subsample_single(p, k, n_support))(pts, keys)


@functools.partial(jax.jit, static_argnames=("n_in", "n_out"))
def random_subsample(key: Array, n_in: int, n_out: int) -> Array:
    """Uniform random choice of n_out indices (without replacement if
    n_out <= n_in, else with wraparound). Mirrors the manifold-point
    subsampling in `poco_data_loader.py:354-363`."""
    if n_out <= n_in:
        return jax.random.permutation(key, n_in)[:n_out]
    reps = -(-n_out // n_in)
    perm = jnp.concatenate([jax.random.permutation(jax.random.fold_in(key, r), n_in) for r in range(reps)])
    return perm[:n_out]
