"""Exactness of the fused Pallas decoder tail vs the flax XLA path.

The kernel (ops/decoder_pallas.py) must reproduce the
InterpAttentionKHeadsNet projected-latents computation
(models/decoder.py; reference `poco_model.py:362-419`) at compute-dtype
resolution — it is an inference-time scheduling change, not a new model.
Runs in Pallas interpret mode on CPU (the real-TPU A/B lives in
tools/profile_field.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppsurf_tpu.models.decoder import InterpAttentionKHeadsNet
from ppsurf_tpu.models.fkaconv import gather_neighbors
from ppsurf_tpu.ops.decoder_pallas import decoder_tail_pallas


def _setup(latent=256, k=64, n=300, q=257, seed=0):
    rng = np.random.RandomState(seed)
    lat = rng.randn(1, n, latent).astype(np.float32)
    pts = rng.rand(1, n, 3).astype(np.float32) - 0.5
    queries = (rng.rand(1, q, 3).astype(np.float32) - 0.5) * 1.2
    ids = rng.randint(0, n, size=(1, q, k)).astype(np.int32)

    net = InterpAttentionKHeadsNet(latent, latent, k=k, dtype=jnp.float32)
    variables = net.init(
        jax.random.key(1), jnp.asarray(lat), jnp.asarray(pts),
        jnp.asarray(queries), jnp.asarray(ids),
    )
    return net, variables, lat, pts, queries, ids


def _project(variables, lat):
    """Fold fc1's latent rows + bias into the latents (FieldEvaluator)."""
    p = variables["params"]
    k1 = np.asarray(p["fc1"]["kernel"], np.float32)
    b1 = np.asarray(p["fc1"]["bias"], np.float32)
    latent_dim = lat.shape[-1]
    lat_p = lat @ k1[:latent_dim] + b1
    p2 = dict(p)
    p2["fc1"] = {"kernel": jnp.asarray(k1[latent_dim:])}
    return {"params": p2}, lat_p


@pytest.mark.parametrize("q,tq", [(257, 128), (64, 64)])
def test_decoder_tail_matches_flax(q, tq):
    net, variables, lat, pts, queries, ids = _setup(q=q)
    var_p, lat_p = _project(variables, lat)

    ref = net.apply(
        var_p, jnp.asarray(lat_p), jnp.asarray(pts), jnp.asarray(queries),
        jnp.asarray(ids), last_layer=False, latents_projected=True,
    )  # (1, Q, L), pre-fc8

    pp = var_p["params"]
    x = gather_neighbors(jnp.asarray(lat_p), jnp.asarray(ids))[0]
    neigh = gather_neighbors(jnp.asarray(pts), jnp.asarray(ids))[0]
    rel = jnp.asarray(queries)[0][:, None, :] - neigh
    out = decoder_tail_pallas(
        x, rel, pp["fc1"]["kernel"],
        pp["fc2"]["kernel"], pp["fc2"]["bias"],
        pp["fc3"]["kernel"], pp["fc3"]["bias"],
        pp["fc_query"]["kernel"], pp["fc_query"]["bias"],
        pp["fc_value"]["kernel"], pp["fc_value"]["bias"],
        k=64, heads=64, tq=tq, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref)[0], rtol=2e-5, atol=2e-5
    )


def test_decoder_tail_bf16_close():
    """bf16 compute path stays within bf16 resolution of the f32 result."""
    net, variables, lat, pts, queries, ids = _setup(q=128)
    var_p, lat_p = _project(variables, lat)

    ref = net.apply(
        var_p, jnp.asarray(lat_p), jnp.asarray(pts), jnp.asarray(queries),
        jnp.asarray(ids), last_layer=False, latents_projected=True,
    )

    pp = var_p["params"]
    x = gather_neighbors(
        jnp.asarray(lat_p).astype(jnp.bfloat16), jnp.asarray(ids)
    )[0]
    neigh = gather_neighbors(jnp.asarray(pts), jnp.asarray(ids))[0]
    rel = (jnp.asarray(queries)[0][:, None, :] - neigh).astype(jnp.bfloat16)
    out = decoder_tail_pallas(
        x, rel, pp["fc1"]["kernel"],
        pp["fc2"]["kernel"], pp["fc2"]["bias"],
        pp["fc3"]["kernel"], pp["fc3"]["bias"],
        pp["fc_query"]["kernel"], pp["fc_query"]["bias"],
        pp["fc_value"]["kernel"], pp["fc_value"]["bias"],
        k=64, heads=64, tq=128, interpret=True,
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)[0])
    scale = np.maximum(np.abs(np.asarray(ref)[0]), 1e-2)
    assert np.quantile(err / scale, 0.99) < 0.1  # bf16 accumulation noise
