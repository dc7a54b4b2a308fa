"""Fused Pallas kernels for the PPSurf local-patch PointNet branch.

The reference PointNet (`source/base/nn.py:255-373` PointNetfeat with
feature-STN and attention pooling, configured by `ppsurf_model.py:52-57`)
runs ~10 small-channel matmuls over (C*P, 64..256) rows; XLA schedules each
as a separate HBM-resident op, so at C=50k queries x P=50 patch points the
(C*P, ch) bf16 intermediates (~0.3-1.3 GB each) round-trip HBM ten times.

Two Pallas kernels keep the per-point stages VMEM-resident:

  kernel A: conv0a/conv0b + the STN trunk (conv1..conv3, max-pool)
            -> per-point features b (R, 64) + per-patch pooled (C, nsm)
  XLA:      STN head (fc1/fc2/fc3 + identity) -> (C, 64, 64) transform,
            batched-matmul apply to b  [the (tq, 4096)->(tq, 64, 64)
            lane-split reshape and batched dot are unsupported in Mosaic,
            and this stage is tiny per query]
  kernel B: conv1..conv3 + attention pool -> (C, out_ch)

HBM traffic drops from ~10 intermediates to 4 (patches, b, x2, out).

Patches arrive padded to PP rows (multiple of 8, Mosaic sublane tiling) by
duplicating a real patch point: duplicates are harmless for the STN
max-pool and are masked out of the attention softmax.

Eval-mode BatchNorm (models/norm.py) is the affine
y = (x_f32 * g + c).astype(dt) with g = scale/sqrt(var+eps),
c = bias - mean*g; g/c rows are precomputed and passed as one
(rows, width) f32 table so BN applies exactly like the flax path (dense
output rounded to dt BEFORE the f32 affine).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dense_bn_relu(x, w_ref, aff_ref, row, ch, dt, relu=True):
    """flax Dense(dtype=dt) -> eval BatchNorm -> (relu): row-exact."""
    y = jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    y = y + aff_ref[row : row + 1, :ch].astype(dt)  # dense bias (in dt)
    g = aff_ref[row + 1 : row + 2, :ch]
    c = aff_ref[row + 2 : row + 3, :ch]
    y = (y.astype(jnp.float32) * g + c).astype(dt)  # eval BN (norm.py:64-66)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def _trunk_kernel(x_ref, w0a_ref, w0b_ref, ws1_ref, ws2_ref, ws3_ref,
                  aff_ref, b_ref, pool_ref, *, tq: int, pp: int, nsm: int,
                  dt):
    """conv0a/conv0b + STN trunk for one tile of tq patches (R = tq*pp)."""
    x = x_ref[:]
    a = _dense_bn_relu(x, w0a_ref, aff_ref, 0, 64, dt)
    b = _dense_bn_relu(a, w0b_ref, aff_ref, 3, 64, dt)
    b_ref[:] = b

    s = _dense_bn_relu(b, ws1_ref, aff_ref, 6, 64, dt)
    s = _dense_bn_relu(s, ws2_ref, aff_ref, 9, 128, dt)
    s = _dense_bn_relu(s, ws3_ref, aff_ref, 12, nsm, dt)
    # max over patch points; duplicated pad rows never change a max
    pool_ref[:] = jnp.max(s.reshape(tq, pp, nsm), axis=1)


def _head_kernel(x2_ref, wc1_ref, wc2_ref, wc3_ref, wq_ref, wv_ref,
                 bqv_ref, aff_ref, out_ref, *, tq: int, pp: int,
                 p_real: int, out_ch: int, dt):
    """conv1..conv3 + attention pool (pad rows masked) for one tile."""
    c1 = _dense_bn_relu(x2_ref[:], wc1_ref, aff_ref, 0, 64, dt)
    c2 = _dense_bn_relu(c1, wc2_ref, aff_ref, 3, 128, dt)
    c3 = _dense_bn_relu(c2, wc3_ref, aff_ref, 6, out_ch, dt, relu=False)

    # attention pool (nn.py:72-96)
    ql = jax.lax.dot_general(
        c3, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + bqv_ref[0:1, 0:1].astype(dt)  # (R, 1)
    v = jax.lax.dot_general(
        c3, wv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + bqv_ref[1:2, :out_ch].astype(dt)  # (R, out_ch)

    q3 = ql.reshape(tq, pp, 1)
    prow = jax.lax.broadcasted_iota(jnp.int32, (tq, pp, 1), 1)
    q3 = jnp.where(prow < p_real, q3, jnp.asarray(-jnp.inf, dt))
    q3 = q3 - jnp.max(q3, axis=1, keepdims=True)
    e = jnp.exp(q3)
    att = e / jnp.sum(e, axis=1, keepdims=True)  # (tq, pp, 1)

    v3 = v.reshape(tq, pp, out_ch).astype(jnp.float32)
    out = jnp.sum(att.astype(jnp.float32) * v3, axis=1)
    out_ref[:] = out.astype(dt)


def fold_bn(params, stats, eps=1e-5):
    """Eval-BN affine (g, c) from flax params/batch_stats (norm.py:62-65)."""
    g = params["scale"] * jax.lax.rsqrt(stats["var"] + eps)
    return g, params["bias"] - stats["mean"] * g


def _aff_table(entries, width):
    """(3*len, width) f32 table of (dense bias, bn g, bn c) rows."""
    rows = []
    for dense_tree, bn_params, bn_stats in entries:
        g, c = fold_bn(bn_params, bn_stats)
        for vec in (dense_tree["bias"], g, c):
            v = jnp.asarray(vec, jnp.float32)
            rows.append(jnp.pad(v, (0, width - v.shape[0])))
    return jnp.stack(rows, axis=0)


def _dense_bn_relu_xla(x, tree, bn_params, bn_stats, dt, relu=True):
    """Same flax-exact Dense+evalBN(+relu) sequence, in XLA (STN head)."""
    y = jnp.dot(
        x, jnp.asarray(tree["kernel"]).astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(dt) + jnp.asarray(tree["bias"]).astype(dt)
    g, c = fold_bn(bn_params, bn_stats)
    y = (y.astype(jnp.float32) * g + c).astype(dt)
    return jnp.maximum(y, 0) if relu else y


@functools.partial(jax.jit, static_argnames=("p_real", "tq", "interpret"))
def pointnet_att_pallas(patches, pn_params, pn_stats, p_real: int,
                        tq: int = 128, interpret: bool = False):
    """Fused PointNetfeat (feature-STN, att pooling) over C patches.

    patches: (C, P, 3) patch-space points (compute dtype or f32);
    pn_params/pn_stats: the flax `point_net` param / batch_stats subtrees.
    Returns (C, out_ch) per-patch features.

    Matches PointNetfeat(use_point_stn=False, use_feat_stn=True,
    sym_op='att') — the PPSurf configuration (`ppsurf_model.py:52-57`).
    """
    c, p, _ = patches.shape
    assert p == p_real
    dt = patches.dtype
    stn = pn_params["stn2"]
    stn_stats = pn_stats["stn2"]
    nsm = stn["conv3"]["kernel"].shape[1]
    out_ch = pn_params["conv3"]["kernel"].shape[1]
    width = max(nsm, out_ch, 128)

    pp = ((p + 7) // 8) * 8
    pad_c = (-c) % tq
    if pad_c:
        patches = jnp.pad(patches, ((0, pad_c), (0, 0), (0, 0)))
    if pp != p:
        # duplicate a real point: transparent to max-pool, masked in att
        fill = jnp.broadcast_to(
            patches[:, :1, :], (patches.shape[0], pp - p, 3)
        )
        patches = jnp.concatenate([patches, fill], axis=1)
    cp = c + pad_c
    xf = patches.reshape(cp * pp, 3).astype(dt)
    row = tq * pp

    def w(tree):
        return jnp.asarray(tree["kernel"]).astype(dt)

    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # ---- kernel A: per-point trunk + STN pool ----
    aff_a = _aff_table([
        (pn_params["conv0a"], pn_params["bn0a"], pn_stats["bn0a"]),
        (pn_params["conv0b"], pn_params["bn0b"], pn_stats["bn0b"]),
        (stn["conv1"], stn["bn1"], stn_stats["bn1"]),
        (stn["conv2"], stn["bn2"], stn_stats["bn2"]),
        (stn["conv3"], stn["bn3"], stn_stats["bn3"]),
    ], width)
    weights_a = [w(pn_params["conv0a"]), w(pn_params["conv0b"]),
                 w(stn["conv1"]), w(stn["conv2"]), w(stn["conv3"])]
    b, pooled = pl.pallas_call(
        functools.partial(_trunk_kernel, tq=tq, pp=pp, nsm=nsm, dt=dt),
        grid=(cp // tq,),
        in_specs=[
            pl.BlockSpec((row, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(tuple(x.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for x in weights_a
        ] + [
            pl.BlockSpec(tuple(aff_a.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((row, 64), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, nsm), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp * pp, 64), dt),
            jax.ShapeDtypeStruct((cp, nsm), dt),
        ],
        compiler_params=vmem,
        interpret=interpret,
    )(xf, *weights_a, aff_a)

    # ---- XLA middle: STN head -> (C, 64, 64) transform, batched apply
    # (reference nn.py:176-189 + the einsum at nn.py:176) ----
    t = _dense_bn_relu_xla(pooled, stn["fc1"], stn["bn4"], stn_stats["bn4"], dt)
    t = _dense_bn_relu_xla(t, stn["fc2"], stn["bn5"], stn_stats["bn5"], dt)
    tmat = jnp.dot(
        t, w(stn["fc3"]), preferred_element_type=jnp.float32
    ).astype(dt) + jnp.asarray(stn["fc3"]["bias"]).astype(dt)
    tmat = tmat + jnp.eye(64, dtype=dt).reshape(1, -1)
    trans = tmat.reshape(cp, 64, 64)
    x2 = jnp.einsum(
        "bij,bnj->bni", trans, b.reshape(cp, pp, 64),
        preferred_element_type=jnp.float32,
    ).astype(dt)

    # ---- kernel B: post-transform convs + attention pool ----
    aff_b = _aff_table([
        (pn_params["conv1"], pn_params["bn1"], pn_stats["bn1"]),
        (pn_params["conv2"], pn_params["bn2"], pn_stats["bn2"]),
        (pn_params["conv3"], pn_params["bn3"], pn_stats["bn3"]),
    ], width)
    att = pn_params["att"]
    bqv = jnp.stack([
        jnp.pad(jnp.asarray(att["fc_query"]["bias"], jnp.float32),
                (0, width - 1)),
        jnp.pad(jnp.asarray(att["fc_value"]["bias"], jnp.float32),
                (0, width - out_ch)),
    ], axis=0)
    weights_b = [w(pn_params["conv1"]), w(pn_params["conv2"]),
                 w(pn_params["conv3"]), w(att["fc_query"]),
                 w(att["fc_value"])]
    out = pl.pallas_call(
        functools.partial(
            _head_kernel, tq=tq, pp=pp, p_real=p_real, out_ch=out_ch, dt=dt
        ),
        grid=(cp // tq,),
        in_specs=[
            pl.BlockSpec((row, 64), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(tuple(x.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for x in weights_b
        ] + [
            pl.BlockSpec(tuple(bqv.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(aff_b.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tq, out_ch), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((cp, out_ch), dt),
        compiler_params=vmem,
        interpret=interpret,
    )(x2.reshape(cp * pp, 64), *weights_b, bqv, aff_b)
    return out[:c]
