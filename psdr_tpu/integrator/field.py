"""AOV (field-extraction) integrator.

Parity reference: psdr-cuda src/integrator/field.cpp:10-54 — fields:
silhouette / position / depth / geoNormal / shNormal / uv.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene.scene import ray_intersect_with_prior
from .base import Integrator

_FIELDS = ("silhouette", "position", "depth", "geoNormal", "shNormal", "uv")


class FieldExtractionIntegrator(Integrator):
    def __init__(self, field: str):
        assert field in _FIELDS, f"Unsupported field: {field}"
        self.field = field

    def Li(self, scene, flat, rng, ray, active, prior=None):
        its = ray_intersect_with_prior(flat, ray, active, prior)
        f = self.field
        if f == "silhouette":
            result = jnp.ones(its.p.shape, its.p.dtype)
        elif f == "position":
            result = its.p
        elif f == "depth":
            result = jnp.broadcast_to(its.t[..., None], its.p.shape)
        elif f == "geoNormal":
            result = its.n
        elif f == "shNormal":
            result = its.sh_frame.n
        else:  # uv
            result = jnp.concatenate(
                [its.uv, jnp.zeros_like(its.uv[..., :1])], axis=-1)
        mask = active & its.valid
        return jnp.where(mask[..., None], result, 0.0)
