"""Sample-warping functions (square -> disk / hemisphere / triangle).

Parity reference: psdr-cuda include/psdr/core/warp.h:13-95.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .constants import Pi, InvPi
from .math import safe_sqrt, sqr, squared_norm


def square_to_uniform_disk_concentric(sample: jax.Array) -> jax.Array:
    """Shirley's low-distortion concentric map; sample shape (..., 2)."""
    x = 2.0 * sample[..., 0] - 1.0
    y = 2.0 * sample[..., 1] - 1.0

    is_zero = jnp.logical_and(x == 0.0, y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)

    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)

    phi = 0.25 * Pi * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * Pi - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)

    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_cosine_hemisphere(sample: jax.Array) -> jax.Array:
    p = square_to_uniform_disk_concentric(sample)
    z = safe_sqrt(1.0 - squared_norm(p))
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(v: jax.Array) -> jax.Array:
    return InvPi * v[..., 2]


def square_to_uniform_triangle(sample: jax.Array) -> jax.Array:
    """Square sample -> barycentric (u, v) uniform over the unit triangle."""
    t = safe_sqrt(1.0 - sample[..., 0])
    return jnp.stack([1.0 - t, t * sample[..., 1]], axis=-1)


def square_to_uniform_triangle_pdf(p: jax.Array) -> jax.Array:
    return jnp.full(p.shape[:-1], 2.0, p.dtype)


def square_to_uniform_sphere(sample: jax.Array) -> jax.Array:
    """Uniform direction on S^2 from (..., 2) in [0,1)^2."""
    z = 1.0 - 2.0 * sample[..., 1]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * sample[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf() -> float:
    return 1.0 / (4.0 * jnp.pi)
