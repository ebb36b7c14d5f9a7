"""Orthonormal shading frames.

Parity reference: psdr-cuda include/psdr/core/frame.h (Duff et al. basis,
to_local/to_world, the cos/sin/tan theta & phi family).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .constants import Epsilon
from .math import dot, sqr, safe_sqrt


class Frame(NamedTuple):
    """s/t/n shape (..., 3); n is the frame's +z axis."""
    s: jax.Array
    t: jax.Array
    n: jax.Array


def coordinate_system(n: jax.Array):
    """Build (s, t) orthogonal to n via Duff et al. 2017 (frame.h:9-28)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack([
        sign * sqr(n[..., 0]) * a + 1.0,
        sign * b,
        -sign * n[..., 0],
    ], axis=-1)
    t = jnp.stack([b, sign + sqr(n[..., 1]) * a, -n[..., 1]], axis=-1)
    return s, t


def make_frame(n: jax.Array) -> Frame:
    s, t = coordinate_system(n)
    return Frame(s=s, t=t, n=n)


def to_local(f: Frame, v: jax.Array) -> jax.Array:
    return jnp.stack([dot(v, f.s), dot(v, f.t), dot(v, f.n)], axis=-1)


def to_world(f: Frame, v: jax.Array) -> jax.Array:
    return f.s * v[..., 0:1] + f.t * v[..., 1:2] + f.n * v[..., 2:3]


def cos_theta(v: jax.Array) -> jax.Array:
    return v[..., 2]


def cos_theta_2(v: jax.Array) -> jax.Array:
    return sqr(v[..., 2])


def sin_theta_2(v: jax.Array) -> jax.Array:
    return sqr(v[..., 0]) + sqr(v[..., 1])


def sin_theta(v: jax.Array) -> jax.Array:
    return safe_sqrt(sin_theta_2(v))


def tan_theta(v: jax.Array) -> jax.Array:
    return safe_sqrt(1.0 - sqr(v[..., 2])) / v[..., 2]


def tan_theta_2(v: jax.Array) -> jax.Array:
    return jnp.maximum(1.0 - sqr(v[..., 2]), 0.0) / sqr(v[..., 2])


def sin_phi(v: jax.Array) -> jax.Array:
    s2 = sin_theta_2(v)
    inv = jax.lax.rsqrt(jnp.maximum(s2, 1e-20))
    return jnp.where(jnp.abs(s2) <= 4.0 * Epsilon, 0.0,
                     jnp.clip(v[..., 1] * inv, -1.0, 1.0))


def cos_phi(v: jax.Array) -> jax.Array:
    s2 = sin_theta_2(v)
    inv = jax.lax.rsqrt(jnp.maximum(s2, 1e-20))
    return jnp.where(jnp.abs(s2) <= 4.0 * Epsilon, 1.0,
                     jnp.clip(v[..., 0] * inv, -1.0, 1.0))
