"""Anisotropic GGX microfacet distribution with visible-normal sampling.

Parity reference: psdr-cuda src/bsdf/ggx.cpp (eval ggx.cpp:15-33, Smith G1
ggx.cpp:79-92, VNDF sampling ggx.cpp:96-105 / sample ggx.cpp:37-76).
All functions take per-lane alpha_u/alpha_v arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import Pi
from ..core import warp
from ..core.frame import cos_theta
from ..core.math import safe_sqrt, sqr, squared_norm, normalize, dot


def ggx_eval(alpha_u: jax.Array, alpha_v: jax.Array, m: jax.Array) -> jax.Array:
    ct = cos_theta(m)
    alpha_uv = alpha_u * alpha_v
    denom = Pi * alpha_uv * sqr(sqr(m[..., 0] / alpha_u)
                                + sqr(m[..., 1] / alpha_v)
                                + sqr(m[..., 2]))
    result = 1.0 / denom
    return jnp.where(result * ct > 1e-5, result, 0.0)


def ggx_smith_g1(alpha_u: jax.Array, alpha_v: jax.Array,
                 v: jax.Array, m: jax.Array) -> jax.Array:
    xy_alpha_2 = sqr(alpha_u * v[..., 0]) + sqr(alpha_v * v[..., 1])
    tan_theta_alpha_2 = xy_alpha_2 / sqr(v[..., 2])
    result = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))
    result = jnp.where(xy_alpha_2 == 0.0, 1.0, result)
    result = jnp.where(dot(v, m) * cos_theta(v) <= 0.0, 0.0, result)
    return result


def ggx_G(alpha_u, alpha_v, wi, wo, m) -> jax.Array:
    return ggx_smith_g1(alpha_u, alpha_v, wi, m) * ggx_smith_g1(alpha_u, alpha_v, wo, m)


def _sample_visible_11(cos_theta_i: jax.Array, sample2: jax.Array) -> jax.Array:
    """GGX VNDF slope sampling for alpha=1 (ggx.cpp:96-105)."""
    p = warp.square_to_uniform_disk_concentric(sample2)
    s = 0.5 * (1.0 + cos_theta_i)
    py = safe_sqrt(1.0 - sqr(p[..., 0])) * (1.0 - s) + p[..., 1] * s
    p = jnp.stack([p[..., 0], py], axis=-1)
    x = p[..., 0]
    y = p[..., 1]
    z = safe_sqrt(1.0 - squared_norm(p))
    sin_theta_i = safe_sqrt(1.0 - sqr(cos_theta_i))
    norm_f = 1.0 / jnp.maximum(sin_theta_i * y + cos_theta_i * z, 1e-20)
    return jnp.stack([(cos_theta_i * y - sin_theta_i * z) * norm_f,
                      x * norm_f], axis=-1)


def ggx_sample(alpha_u: jax.Array, alpha_v: jax.Array,
               wi: jax.Array, sample2: jax.Array) -> jax.Array:
    """Sample a visible micro-normal m for incident direction wi."""
    wi_p = normalize(jnp.stack([alpha_u * wi[..., 0],
                                alpha_v * wi[..., 1],
                                wi[..., 2]], axis=-1))
    st2 = jnp.maximum(sqr(wi_p[..., 0]) + sqr(wi_p[..., 1]), 1e-20)
    inv_st = jax.lax.rsqrt(st2)
    # sin/cos phi of wi_p with the reference's degenerate-direction handling
    sp = jnp.where(st2 <= 4e-5, 0.0, jnp.clip(wi_p[..., 1] * inv_st, -1.0, 1.0))
    cp = jnp.where(st2 <= 4e-5, 1.0, jnp.clip(wi_p[..., 0] * inv_st, -1.0, 1.0))
    ct = cos_theta(wi_p)
    slope = _sample_visible_11(ct, sample2)
    slope = jnp.stack([
        (cp * slope[..., 0] - sp * slope[..., 1]) * alpha_u,
        (sp * slope[..., 0] + cp * slope[..., 1]) * alpha_v,
    ], axis=-1)
    return normalize(jnp.stack([-slope[..., 0], -slope[..., 1],
                                jnp.ones_like(slope[..., 0])], axis=-1))
