"""Point-encoding utilities (parity: reference `source/base/nn.py:9-69`).

These are optional network-input transforms exposed by the reference's NN
library (`cartesian_to_polar`, `pos_encoding`); kept jit-friendly and
channels-last.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cartesian_to_polar(pts_cart: Array) -> Array:
    """(B, N, 2|3) cartesian -> polar/spherical (reference `nn.py:9-37`).

    3-D returns (azimuth, elevation, radius); 2-D returns (radius, phi).
    """
    num_dim = pts_cart.shape[-1]
    if num_dim == 2:
        x, y = pts_cart[..., 0], pts_cart[..., 1]
        r = jnp.sqrt(x**2 + y**2)
        phi = jnp.arctan2(y, x)
        return jnp.stack([r, phi], axis=-1)
    x, y, z = pts_cart[..., 0], pts_cart[..., 1], pts_cart[..., 2]
    hxy = jnp.hypot(x, y)
    r = jnp.hypot(hxy, z)
    el = jnp.arctan2(z, hxy)
    az = jnp.arctan2(y, x)
    return jnp.stack([az, el, r], axis=-1)


def pos_encoding(pts: Array, pos_encoding_levels: int, skip_last_dim: bool = False) -> Array:
    """Sin/cos positional encoding of point coordinates
    (reference `nn.py:40-69`): per dim and level l, emits
    cos(x * l * pi * 2^l) and sin(x * l * pi * 2^l); with skip_last_dim the
    last input dim (e.g. polar radius) is passed through unencoded.
    """
    if pos_encoding_levels <= 0:
        return pts
    num_dim = pts.shape[-1]
    out_parts = []
    for dim in range(num_dim):
        x = pts[..., dim]
        if skip_last_dim and dim == num_dim - 1:
            for _ in range(pos_encoding_levels):
                out_parts.append((x, x))
        else:
            for lvl in range(pos_encoding_levels):
                scale = lvl * jnp.pi * (2.0**lvl)
                out_parts.append((jnp.cos(x * scale), jnp.sin(x * scale)))
    cos_parts = [p[0] for p in out_parts]
    sin_parts = [p[1] for p in out_parts]
    return jnp.stack(cos_parts + sin_parts, axis=-1)
