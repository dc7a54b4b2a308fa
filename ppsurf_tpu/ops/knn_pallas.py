"""Pallas fused distance + exact k-NN kernel for TPU.

The hot op of the whole framework (SURVEY.md §7 hard part 1): every train
step and every reconstruction query chunk runs kNN against 10k-60k points.
XLA's `lax.top_k` lowers to a full bitonic sort over N (~0.9 s for 50k
queries x 60k points on v5e) and its reshape+reduce layouts for two-stage
selection are unpredictable (measured up to 3.3 s). This kernel controls
the loop structure explicitly:

stage 1: stream 8-block groups through VMEM, computing exact f32 distances
         with direct elementwise differences and materializing only
         per-block minima — the (TQ, N) distance matrix never exists.
stage 2: select the k blocks with smallest block-min per query by k-pass
         min extraction over the tiny (nb, TQ) block-min array. Exact: if
         a true k-nearest element lay in an unselected block, the k
         selected blocks would each contain an element no larger than it.
stage 3: gather each query's selected blocks with a one-hot f32 MXU matmul
         (regular compute instead of irregular memory gathers), recompute
         the distances, and extract the final k nearest by iterative min
         extraction over the (k*S, TQ) candidates.

Data layout (Mosaic-constraint-driven; each rule below was learned from a
real miscompile or compile error on v5e):
- points arrive coordinate-major as (4, Npad): x, y, z rows plus a 4th
  "padding" row w = sqrt(penalty), so padded points acquire d2 += penalty
  with no separate mask array; lane-dim slices land on 128 boundaries
  (1-D arrays demand 1024-aligned dynamic offsets — avoided entirely).
- a transposed block-major f32 copy (4*S, nb) feeds the one-hot gather.
  The gather matmul must be f32/HIGHEST: every bf16 dot variant silently
  dropped low mantissa bits inside this kernel on v5e.
- every loop-carried write is a row store at a dynamic *sublane* position
  (`ref[i, :]`); dynamic lane-offset stores and in-loop dynamic sublane
  *reads* are never used (rows are selected with dense masked reductions).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 128  # points per block (lane width)
PAD_PENALTY = 1e12  # w = sqrt(penalty); finite so 0*w stays 0 in matmuls


def _knn_kernel(q_ref, pts_cm_ref, pts_blk_t_ref, out_ref,
                bm_ref, blkids_ref, cand_ref, *,
                k: int, nb: int, tq: int):
    """One query tile.

    q (TQ, 3); pts_cm (4, NB*S) coordinate-major; pts_blk_t (4*S, NB)
    transposed block-major f32. out (k, TQ) — transposed by the caller. Scratch: bm
    (NB, TQ), blkids (kb, TQ), cand (kb*S, TQ). Global point ids are
    reconstructed from blkids at extraction time (no candi buffer), which
    halves the candidate VMEM footprint.
    """
    q = q_ref[:]  # (TQ, 3)

    # ---- stage 1: block minima, 8 blocks per pass ----
    # distances via direct elementwise differences on the VPU: exact f32.
    # (A HIGHEST-precision MXU matmul here was observed to lose ~1e-3 on
    # this shape under Mosaic, silently reordering near-tied blocks.)
    G = 8  # blocks per group; nb is padded to a multiple of 8 by the caller
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]

    def block_min_group(jg, _):
        p4 = pts_cm_ref[:, pl.ds(pl.multiple_of(jg * (G * S), G * S), G * S)]
        dx = p4[0:1, :] - qx  # (TQ, G*S)
        dy = p4[1:2, :] - qy
        dz = p4[2:3, :] - qz
        d2 = dx * dx + dy * dy + dz * dz + p4[3:4, :] * p4[3:4, :]
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
    # transposed throughout: candidates live as (kb*S, TQ) so every
    # loop-carried store is an aligned dynamic-*sublane* row store —
    # dynamic lane-offset stores were observed to miscompile under Mosaic.
    nbrow = jax.lax.broadcasted_iota(jnp.int32, (nb, tq), 0)
    qxT = q[:, 0][None, :]  # (1, TQ)
    qyT = q[:, 1][None, :]
    qzT = q[:, 2][None, :]
    blkids_all = blkids_ref[:]  # (kb, TQ) read once after stage 2
    srow_kb = jax.lax.broadcasted_iota(jnp.int32, (min(k, nb), tq), 0)

    def fill_slot(s, _):
        # row s of blkids via dense masked reduction (dynamic sublane reads
        # inside the loop miscompiled on some Mosaic versions)
        bid = jnp.sum(jnp.where(srow_kb == s, blkids_all, 0), axis=0)  # (TQ,)
        # one-hot gather as an f32 HIGHEST matmul. NOTE: every bf16
        # variant of this dot (stacked hi/lo, two separate exact-product
        # dots) silently lost low mantissa bits *inside this kernel* on
        # v5e, despite being exact in an isolated pallas test — do not
        # change this without re-running the large-N exactness check.
        onehot_t = (nbrow == bid[None, :]).astype(jnp.float32)  # (NB, TQ)
        g = jax.lax.dot_general(
            pts_blk_t_ref[:], onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (4*S, TQ): [x|y|z|w] block-major rows
        gx = g[0 * S : 1 * S, :]
        gy = g[1 * S : 2 * S, :]
        gz = g[2 * S : 3 * S, :]
        gw = g[3 * S : 4 * S, :]
        d2 = (gx - qxT) ** 2 + (gy - qyT) ** 2 + (gz - qzT) ** 2 + gw * gw
        cand_ref[pl.ds(pl.multiple_of(s * S, S), S), :] = d2  # (S, TQ)
        return 0

    jax.lax.fori_loop(0, kb, fill_slot, 0)

    # ---- final: k-pass extraction over (kb*S, TQ) candidates ----
    ncand = kb * S
    crow = jax.lax.broadcasted_iota(jnp.int32, (ncand, tq), 0)
    blkids = blkids_ref[:]  # (kb, TQ)
    srow = jax.lax.broadcasted_iota(jnp.int32, (kb, tq), 0)

    def pick(i, cand):  # cand: (ncand, TQ)
        m = jnp.min(cand, axis=0, keepdims=True)
        pos = jnp.min(jnp.where(cand <= m, crow, ncand), axis=0)  # (TQ,)
        sel = crow == pos[None, :]
        # global id = blkids[pos // S, q] * S + pos % S, via a dense
        # sublane reduction (no per-lane gather)
        slot = pos // S  # (TQ,)
        blk = jnp.sum(jnp.where(srow == slot[None, :], blkids, 0), axis=0)
        out_ref[i, :] = blk * S + pos % S
        return jnp.where(sel, jnp.float32(PAD_PENALTY * 4), cand)

    jax.lax.fori_loop(0, k, pick, cand_ref[:])


def default_tile(k: int) -> int:
    """Query-tile size that keeps the candidate scratch inside VMEM.

    Must be a multiple of 128 (the transposed output's lane width);
    tq=256 with k>16 overflows VMEM (cand scratch is k*S*tq*4 bytes).
    """
    return 256 if k <= 16 else 128


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
    # transposed block-major hi/lo bf16 layouts (4*S, nb): row r =
    # coord-part r//S for in-block point r%S, column = block id
    pts_blk_t = pts_cm.reshape(4, nb, S).transpose(0, 2, 1).reshape(4 * S, nb)

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
            pl.BlockSpec((4 * S, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, qp.shape[0]), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nb, tq), jnp.float32),
            pltpu.VMEM((kb, tq), jnp.int32),
            pltpu.VMEM((kb * S, tq), jnp.float32),
        ],
    )(qp, pts_cm, pts_blk_t)
    return out.T[:num_q]
