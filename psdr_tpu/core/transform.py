"""Homogeneous 4x4 transforms (column-vector convention, like Enoki).

Parity reference: psdr-cuda include/psdr/core/transform.h. Matrices act on
column vectors: ``p' = M @ [p, 1]``; batched helpers accept point arrays of
shape (..., 3).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .math import normalize, cross


def translate(v) -> jax.Array:
    v = jnp.asarray(v, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(v)


def scale(v) -> jax.Array:
    v = jnp.asarray(v, jnp.float32)
    return jnp.diag(jnp.concatenate([v, jnp.ones(1, jnp.float32)]))


def rotate(axis, angle_deg) -> jax.Array:
    """Rotation about an arbitrary axis; angle in degrees (transform.h:26-28)."""
    axis = normalize(jnp.asarray(axis, jnp.float32))
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    s, c = jnp.sin(theta), jnp.cos(theta)
    x, y, z = axis[0], axis[1], axis[2]
    C = 1.0 - c
    r = jnp.array([
        [x * x * C + c,     x * y * C - z * s, x * z * C + y * s, 0.0],
        [y * x * C + z * s, y * y * C + c,     y * z * C - x * s, 0.0],
        [z * x * C - y * s, z * y * C + x * s, z * z * C + c,     0.0],
        [0.0, 0.0, 0.0, 1.0],
    ], dtype=jnp.float32)
    return r


def perspective(fov_deg: float, near: float, far: float) -> jax.Array:
    """Maps [near, far] on +z to [0, 1]; fov mapped to [-1, 1]
    (transform.h:30-58)."""
    recip = 1.0 / (far - near)
    cot = 1.0 / math.tan(math.radians(fov_deg * 0.5))
    m = jnp.diag(jnp.array([cot, cot, far * recip, 0.0], jnp.float32))
    m = m.at[2, 3].set(-near * far * recip)
    m = m.at[3, 2].set(1.0)
    return m


def look_at(origin, target, up) -> jax.Array:
    """Camera-to-world: columns = [left, new_up, dir, origin]
    (transform.h:60-78)."""
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    dir_ = normalize(target - origin)
    left = normalize(cross(up, dir_))
    new_up = cross(dir_, left)
    m = jnp.stack([left, new_up, dir_, origin], axis=-1)  # (3, 4)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([m, bottom], axis=0)


def transform_pos(mat: jax.Array, p: jax.Array) -> jax.Array:
    """Apply M to points p (..., 3) with perspective divide."""
    tmp = p @ mat[:3, :3].T + mat[:3, 3]
    w = p @ mat[3, :3] + mat[3, 3]
    return tmp / w[..., None]


def transform_dir(mat: jax.Array, d: jax.Array) -> jax.Array:
    """Apply M's linear part to directions d (..., 3) (no divide)."""
    return d @ mat[:3, :3].T


def inverse(mat: jax.Array) -> jax.Array:
    return jnp.linalg.inv(mat)
