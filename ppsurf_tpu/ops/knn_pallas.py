"""Pallas fused distance + exact k-NN kernel for TPU.

The hot op of the whole framework (SURVEY.md §7 hard part 1): every train
step and every reconstruction query chunk runs kNN against 10k-60k points.
XLA's `lax.top_k` lowers to a full bitonic sort over N (~0.9 s for 50k
queries x 60k points on v5e) and its reshape+reduce layouts for two-stage
selection are unpredictable (measured up to 3.3 s). This kernel controls
the loop structure explicitly:

stage 1: stream 128-point blocks through VMEM, computing the distance tile
         on the MXU and materializing only per-block minima — the (TQ, N)
         distance matrix never exists.
stage 2: select the k blocks with smallest block-min per query by k-pass
         min extraction over the tiny (nb, TQ) block-min array. Exact: if
         a true k-nearest element lay in an unselected block, the k
         selected blocks would each contain an element no larger than it.
stage 3: gather each query's selected blocks with a one-hot MXU matmul
         (regular compute instead of irregular memory gathers), recompute
         the distances, and extract the final k nearest by iterative min
         extraction over the (TQ, k*S) candidates.

Data layout (Mosaic-friendly):
- points arrive coordinate-major as (4, Npad): x, y, z rows plus a 4th
  "padding" row w = sqrt(penalty), so padded points acquire d2 += penalty
  with no separate mask array; lane-dim slices land on 128 boundaries.
- a block-major copy (nb, 4*S) = [x_0..x_S | y | z | w] feeds the one-hot
  gather; static column slices split the coordinates back out.
- all loop-carried writes are row stores at dynamic sublane positions
  (`ref[i, :]`) — dynamic *lane* indexing is never used.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 128  # points per block (lane width)
PAD_PENALTY = 1e12  # w = sqrt(penalty); finite so 0*w stays 0 in matmuls


def _knn_kernel(q_ref, pts_cm_ref, pts_blk_ref, out_ref,
                bm_ref, blkids_ref, cand_ref, *,
                k: int, nb: int, tq: int):
    """One query tile.

    q (TQ, 3); pts_cm (4, NB*S) coordinate-major; pts_blk (NB, 4*S)
    block-major. out (k, TQ) — transposed by the caller. Scratch: bm
    (NB, TQ), blkids (kb, TQ), cand (TQ, kb*S). Global point ids are
    reconstructed from blkids at extraction time (no candi buffer), which
    halves the candidate VMEM footprint.
    """
    q = q_ref[:]  # (TQ, 3)
    qn = jnp.sum(q * q, axis=1, keepdims=True)  # (TQ, 1)

    # ---- stage 1: block minima, 8 blocks per MXU matmul ----
    # one (TQ, 3) x (3, 8*S) matmul amortizes per-iteration latency over 8
    # blocks; the 8 per-block minima come from static lane slices and are
    # written with one aligned 8-row store.
    G = 8  # blocks per group; nb is padded to a multiple of 8 by the caller

    def block_min_group(jg, _):
        p4 = pts_cm_ref[:, pl.ds(pl.multiple_of(jg * (G * S), G * S), G * S)]
        pn = jnp.sum(p4 * p4, axis=0)[None, :]  # (1, G*S) includes w^2
        cross = jax.lax.dot_general(
            q, p4[0:3, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TQ, G*S)
        d2 = qn + pn - 2.0 * cross
        mins = [
            jnp.min(d2[:, g * S : (g + 1) * S], axis=1) for g in range(G)
        ]
        bm_ref[pl.ds(pl.multiple_of(jg * G, G), G), :] = jnp.stack(mins, axis=0)
        return 0

    jax.lax.fori_loop(0, nb // G, block_min_group, 0)

    # ---- stage 2: k best blocks per query ----
    kb = min(k, nb)
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, tq), 0)

    def pick_block(i, bm):  # bm: (nb, tq)
        m = jnp.min(bm, axis=0, keepdims=True)  # (1, TQ)
        idx = jnp.min(jnp.where(bm <= m, row, nb), axis=0)  # (TQ,)
        blkids_ref[i, :] = idx
        return jnp.where(row == idx[None, :], jnp.float32(PAD_PENALTY * 4), bm)

    jax.lax.fori_loop(0, kb, pick_block, bm_ref[:])

    # ---- stage 3: one-hot gather selected blocks, recompute distances ----
    brow = jax.lax.broadcasted_iota(jnp.int32, (tq, nb), 1)
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]

    def fill_slot(s, _):
        bid = blkids_ref[s, :]  # (TQ,)
        # one-hot gather in ONE bf16 matmul pass: the one-hot matrix is
        # exact in bf16 and the coordinates are split hi/lo (x = hi + lo
        # with hi = bf16(x)), so the recovered f32 coords are exact — 3x
        # cheaper than a HIGHEST-precision f32 gather.
        onehot = (brow == bid[:, None]).astype(jnp.bfloat16)  # (TQ, NB)
        g = jax.lax.dot_general(
            onehot, pts_blk_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, 8*S): [xhi|yhi|zhi|whi|xlo|ylo|zlo|wlo] block-major
        gx = g[:, 0 * S : 1 * S] + g[:, 4 * S : 5 * S]
        gy = g[:, 1 * S : 2 * S] + g[:, 5 * S : 6 * S]
        gz = g[:, 2 * S : 3 * S] + g[:, 6 * S : 7 * S]
        gw = g[:, 3 * S : 4 * S] + g[:, 7 * S : 8 * S]
        d2 = (gx - qx) ** 2 + (gy - qy) ** 2 + (gz - qz) ** 2 + gw * gw
        cand_ref[:, pl.ds(pl.multiple_of(s * S, S), S)] = d2
        return 0

    jax.lax.fori_loop(0, kb, fill_slot, 0)

    # ---- final: k-pass extraction over (TQ, kb*S) candidates ----
    ncand = kb * S
    ccol = jax.lax.broadcasted_iota(jnp.int32, (tq, ncand), 1)
    blkids = blkids_ref[:]  # (kb, TQ)
    srow = jax.lax.broadcasted_iota(jnp.int32, (kb, tq), 0)

    def pick(i, cand):
        m = jnp.min(cand, axis=1, keepdims=True)
        pos = jnp.min(jnp.where(cand <= m, ccol, ncand), axis=1)  # (TQ,)
        sel = ccol == pos[:, None]
        # global id = blkids[pos // S, q] * S + pos % S, via a dense
        # sublane reduction (no per-lane gather)
        slot = pos // S  # (TQ,)
        blk = jnp.sum(jnp.where(srow == slot[None, :], blkids, 0), axis=0)
        out_ref[i, :] = blk * S + pos % S
        return jnp.where(sel, jnp.float32(PAD_PENALTY * 4), cand)

    jax.lax.fori_loop(0, k, pick, cand_ref[:])


def default_tile(k: int) -> int:
    """Query-tile size that keeps the candidate scratch inside VMEM.

    Must be a multiple of 128 (the transposed output's lane width).
    """
    return 256 if k <= 50 else 128


@functools.partial(jax.jit, static_argnames=("k", "tq"))
def knn_pallas_single(points, queries, valid, k: int, tq: int = 128):
    """Exact kNN ids (Q, k) for one cloud.

    points: (N, 3) f32; valid: (N,) bool mask (True = real point) or None;
    queries: (Q, 3) f32. Padding to block multiples happens here.
    """
    n = points.shape[0]
    pad_n = (-n) % (8 * S)  # pad to 8-block groups for the stage-1 matmul
    npad = n + pad_n
    pts = jnp.pad(points, ((0, pad_n), (0, 0)))
    if valid is None:
        valid = jnp.ones((n,), bool)
    valid_p = jnp.pad(valid, (0, pad_n))
    w = jnp.where(valid_p, 0.0, jnp.sqrt(jnp.float32(PAD_PENALTY)))

    pts_cm = jnp.concatenate([pts.T, w[None, :]], axis=0)  # (4, Npad)
    nb = npad // S
    # block-major hi/lo-split layout (nb, 8*S) in bf16 for the one-hot
    # gather: [xhi|yhi|zhi|whi|xlo|ylo|zlo|wlo] per block; hi = bf16(x),
    # lo = bf16(x - hi) recovers f32 exactly after the matmul.
    hi = pts_cm.astype(jnp.bfloat16)
    lo = (pts_cm - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    cm8 = jnp.concatenate([hi, lo], axis=0)  # (8, Npad) bf16
    pts_blk = cm8.reshape(8, nb, S).transpose(1, 0, 2).reshape(nb, 8 * S)

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
            pl.BlockSpec((4, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 8 * S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, qp.shape[0]), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nb, tq), jnp.float32),
            pltpu.VMEM((kb, tq), jnp.int32),
            pltpu.VMEM((tq, kb * S), jnp.float32),
        ],
    )(qp, pts_cm, pts_blk)
    return out.T[:num_q]
