"""Pallas fused distance + exact k-NN kernel for TPU.

The hot op of the whole framework (SURVEY.md §7 hard part 1): every train
step and every reconstruction query chunk runs kNN against 10k-60k points.
XLA's `lax.top_k` lowers to a full bitonic sort over N (~0.9 s per 50k x
60k chunk on v5e) and its reshape+reduce layouts for two-stage selection
are unpredictable (measured up to 3.3 s). This kernel controls the loop
structure explicitly:

stage 1: stream point blocks of S=128 through VMEM, computing the distance
         tile on the MXU and only materializing per-block minima
         (TQ, NB) — the (TQ, N) distance matrix never exists.
stage 2: select the k blocks with smallest block-min per query by k-pass
         min extraction over the tiny (TQ, NB) array. Exact: if a true
         k-nearest element lay in an unselected block, the k selected
         blocks would each contain an element no larger than it.
stage 3: gather each query's selected blocks with a one-hot MXU matmul
         (regular compute instead of irregular memory gathers), recompute
         the distances, and extract the final k nearest by iterative
         min extraction over the (TQ, k*S) candidates.

All ops are dense VPU/MXU work; no sorts, no gathers, no dynamic shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 128  # points per block (lane width)
NEG = 1e30


def _knn_kernel(q_ref, pts_ref, pad_ref, out_ref, bm_ref, blkids_ref, cand_ref,
                candi_ref, *, k: int, nb: int, tq: int):
    """One query tile: q (TQ,3), pts (NB*S,3), pad (NB*S,) {0,+inf}."""
    q = q_ref[:]  # (TQ, 3)
    qn = jnp.sum(q * q, axis=1, keepdims=True)  # (TQ, 1)

    # ---- stage 1: block minima ----
    def block_min(j, _):
        p = pts_ref[pl.ds(j * S, S), :]  # (S, 3)
        pad = pad_ref[pl.ds(j * S, S)]  # (S,)
        pn = jnp.sum(p * p, axis=1)[None, :]  # (1, S)
        cross = jax.lax.dot_general(
            q, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TQ, S)
        d2 = qn + pn - 2.0 * cross + pad[None, :]
        bm_ref[:, j] = jnp.min(d2, axis=1)
        return 0

    jax.lax.fori_loop(0, nb, block_min, 0)

    # ---- stage 2: k best blocks per query (iterative extraction) ----
    kb = min(k, nb)
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, nb), 1)

    def pick_block(i, bm):
        m = jnp.min(bm, axis=1, keepdims=True)  # (TQ, 1)
        is_min = bm <= m
        # first index achieving the min (ref store: Mosaic has no scatter)
        idx = jnp.min(jnp.where(is_min, col, nb), axis=1)  # (TQ,)
        blkids_ref[:, i] = idx
        return jnp.where(col == idx[:, None], NEG, bm)  # mask out the winner

    jax.lax.fori_loop(0, kb, pick_block, bm_ref[:])

    # ---- stage 3: gather selected blocks via one-hot matmul, recompute ----
    pts_flat = pts_ref[:].reshape(nb, S * 3)
    pad_flat = pad_ref[:].reshape(nb, S)

    def fill_slot(s, _):
        bid = blkids_ref[:, s]  # (TQ,)
        onehot = (col == bid[:, None]).astype(jnp.float32)  # (TQ, NB)
        gathered = jax.lax.dot_general(
            onehot, pts_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(tq, S, 3)
        gpad = jax.lax.dot_general(
            onehot, pad_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, S)
        diff = gathered - q[:, None, :]
        d2 = jnp.sum(diff * diff, axis=2) + gpad  # (TQ, S)
        cand_ref[:, pl.ds(s * S, S)] = d2
        candi_ref[:, pl.ds(s * S, S)] = bid[:, None] * S + jax.lax.broadcasted_iota(
            jnp.int32, (tq, S), 1
        )
        return 0

    jax.lax.fori_loop(0, kb, fill_slot, 0)

    # ---- final: k-pass extraction over (TQ, kb*S) candidates ----
    ncand = kb * S
    ccol = jax.lax.broadcasted_iota(jnp.int32, (tq, ncand), 1)

    def pick(i, cand):
        m = jnp.min(cand, axis=1, keepdims=True)
        is_min = cand <= m
        pos = jnp.min(jnp.where(is_min, ccol, ncand), axis=1)  # (TQ,)
        sel = ccol == pos[:, None]
        gidx = jnp.sum(jnp.where(sel, candi_ref[:], 0), axis=1)
        out_ref[:, i] = gidx
        return jnp.where(sel, NEG, cand)

    jax.lax.fori_loop(0, k, pick, cand_ref[:], unroll=False)


@functools.partial(jax.jit, static_argnames=("k", "tq"))
def knn_pallas_single(points, queries, pad_dist, k: int, tq: int = 256):
    """Exact kNN ids (Q, k) for one cloud.

    points: (Npad, 3) f32 with Npad % 128 == 0; pad_dist: (Npad,) f32
    additive mask: 0 for valid points, a LARGE FINITE value (1e30) for
    padding — +inf would produce 0*inf = NaN inside the one-hot gather
    matmul; queries: (Q, 3) f32.
    """
    npad = points.shape[0]
    nb = npad // S
    num_q = queries.shape[0]
    pad_q = (-num_q) % tq
    qp = jnp.pad(queries, ((0, pad_q), (0, 0)))
    kb = min(k, nb)

    grid = qp.shape[0] // tq
    out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, nb=nb, tq=tq),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp.shape[0], k), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tq, nb), jnp.float32),
            pltpu.VMEM((tq, kb), jnp.int32),
            pltpu.VMEM((tq, kb * S), jnp.float32),
            pltpu.VMEM((tq, kb * S), jnp.int32),
        ],
    )(qp, points, pad_dist)
    return out[:num_q]
