"""Fused Pallas kernel for the InterpAttention decoder tail.

The reference decoder (`source/poco_model.py:362-419` InterpAttentionKHeadsNet
+ `source/base/nn.py:655-674` batch_gather) is the largest per-chunk compute
item of reconstruction: after the k=64 neighbor-latent gather, XLA schedules
fc2 / fc3 / fc_query / fc_value as separate HBM-resident matmuls, so five
(C*k, L) bf16 intermediates (~1.6 GB each at C=50k, L=256) round-trip HBM
between layers.

This kernel runs the whole tail — relu(x + rel@W1) -> fc2 -> fc3 ->
fc_query/fc_value -> k-softmax 64-head attention -> pooled (C, L) feature —
on one VMEM-resident query tile at a time: HBM traffic drops to one read of
the gathered latents plus one (C, L) write, and the MXU sees back-to-back
(tile*k, L, L) matmuls.

Operates on the `latents_projected` representation (fc1's latent half folded
into the per-shape latents by FieldEvaluator; see
models/decoder.py InterpAttentionKHeadsNet): `x` already holds
fc1_kernel[:L] @ latent + fc1_bias per (query, neighbor). The final fc8
(C-level, tiny) stays in XLA.

Numerics match the flax path at compute-dtype resolution: every dot
accumulates f32 (`preferred_element_type`) and rounds to the compute dtype
exactly where flax's Dense does (dot output), biases/relu/softmax run in the
compute dtype, and the attention-value contraction accumulates f32 like the
flax einsum.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dense(a, w_ref, b_ref, dt):
    """flax nn.Dense(dtype=dt): f32-accumulated dot rounded to dt, + bias."""
    y = jax.lax.dot_general(
        a, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    if b_ref is not None:
        y = y + b_ref[0:1, :]
    return y


def _decoder_tail_kernel(x_ref, rel_ref, w1_ref, w2_ref, b2_ref, w3_ref,
                         b3_ref, wq_ref, bq_ref, wv_ref, bv_ref, out_ref, *,
                         tq: int, k: int, heads: int, dt):
    """One tile of tq queries; R = tq*k gathered-neighbor rows.

    x (R, L) dt: projected latents (fc1 latent half + bias pre-applied);
    rel (R, 3) dt: query - neighbor positions; out (tq, L) dt.
    """
    lat = w2_ref.shape[0]

    # h1 = relu(x + rel @ W1_rel)   [fc1's remaining rel-position term]
    relw = jax.lax.dot_general(
        rel_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    h = jnp.maximum(x_ref[:] + relw, 0)

    h = jnp.maximum(_dense(h, w2_ref, b2_ref, dt), 0)  # fc2
    h = jnp.maximum(_dense(h, w3_ref, b3_ref, dt), 0)  # fc3

    qv = _dense(h, wq_ref, bq_ref, dt)  # (R, H)
    vv = _dense(h, wv_ref, bv_ref, dt)  # (R, L)

    # softmax over the k neighbors per head, mean over heads
    # (`poco_model.py:412`), computed in the compute dtype like flax
    q3 = qv.reshape(tq, k, heads)
    q3 = q3 - jnp.max(q3, axis=1, keepdims=True)
    e = jnp.exp(q3)
    att = jnp.mean(e / jnp.sum(e, axis=1, keepdims=True), axis=2)  # (tq, k)

    v3 = vv.reshape(tq, k, lat).astype(jnp.float32)
    out = jnp.sum(att[:, :, None].astype(jnp.float32) * v3, axis=1)
    out_ref[:] = out.astype(dt)


@functools.partial(
    jax.jit, static_argnames=("k", "heads", "tq", "interpret")
)
def decoder_tail_pallas(x, rel, w1, w2, b2, w3, b3, wq, bq, wv, bv,
                        k: int, heads: int, tq: int = 128,
                        interpret: bool = False):
    """Fused decoder tail for C queries.

    x (C, k, L): gathered projected neighbor latents (compute dtype);
    rel (C, k, 3): query - neighbor; weights as flax stores them
    (w1 (3, L) rel rows of fc1, no bias; w* (in, out); b* (out,)).
    Returns (C, L): per-query attention-pooled feature (pre-fc8).
    """
    c, kk, lat = x.shape
    assert kk == k
    dt = x.dtype
    pad_c = (-c) % tq
    if pad_c:
        x = jnp.pad(x, ((0, pad_c), (0, 0), (0, 0)))
        rel = jnp.pad(rel, ((0, pad_c), (0, 0), (0, 0)))
    cp = c + pad_c

    xf = x.reshape(cp * k, lat)
    relf = rel.astype(dt).reshape(cp * k, 3)
    row = tq * k

    def b2d(b):  # biases as (1, n) 2-D rows (Mosaic: no 1-D arrays)
        return b.astype(dt).reshape(1, -1)

    out = pl.pallas_call(
        functools.partial(
            _decoder_tail_kernel, tq=tq, k=k, heads=heads, dt=dt
        ),
        grid=(cp // tq,),
        in_specs=[
            pl.BlockSpec((row, lat), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for s in (
                (3, lat), (lat, lat), (1, lat), (lat, lat), (1, lat),
                (lat, heads), (1, heads), (lat, lat), (1, lat),
            )
        ],
        out_specs=pl.BlockSpec(
            (tq, lat), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((cp, lat), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        xf, relf, w1.astype(dt), w2.astype(dt), b2d(b2), w3.astype(dt),
        b2d(b3), wq.astype(dt), b2d(bq), wv.astype(dt), b2d(bv),
    )
    return out[:c]
