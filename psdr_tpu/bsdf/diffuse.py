"""Textured Lambertian BSDF.

Parity reference: psdr-cuda src/bsdf/diffuse.cpp — eval includes the
outgoing cosine (diffuse.cpp:25-33); pdf uses *detached* directions
(diffuse.cpp:69-85), matching the reference's derivative structure.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import InvPi
from ..core import warp
from ..core.bitmap import Bitmap, eval_bitmap, constant
from ..core.frame import cos_theta
from ..core.records import BSDFSample, Intersection


class Diffuse:
    kind = "diffuse"
    anisotropic = False

    def __init__(self, reflectance, bsdf_id: str = ""):
        if not isinstance(reflectance, Bitmap):
            reflectance = constant(reflectance, 3)
        self.reflectance = reflectance
        self.id = bsdf_id

    def params(self) -> dict:
        return {"reflectance": self.reflectance.data}

    def set_params(self, p: dict) -> None:
        self.reflectance = Bitmap(p["reflectance"])

    def __repr__(self):
        return f"Diffuse[id={self.id}]"


def eval_diffuse(params: dict, its: Intersection, wo: jax.Array,
                 active: jax.Array) -> jax.Array:
    cti = cos_theta(its.wi)
    cto = cos_theta(wo)
    active = active & (cti > 0.0) & (cto > 0.0)
    value = eval_bitmap(Bitmap(params["reflectance"]), its.uv) * (InvPi * cto)[..., None]
    return jnp.where(active[..., None], value, 0.0)


def sample_diffuse(params: dict, its: Intersection, sample3: jax.Array,
                   active: jax.Array) -> BSDFSample:
    cti = cos_theta(its.wi)
    # consume dims 0:2 (the reference uses tail<2>, diffuse.cpp) so ALL
    # bsdfs warp the same sample dims — the first-bounce stratification
    # (integrator/direct._stratify2) stratifies exactly sample3[..., 0:2]
    wo = warp.square_to_cosine_hemisphere(sample3[..., 0:2])
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    return BSDFSample(valid=active & (cti > 0.0), pdf=pdf, wo=wo)


def pdf_diffuse(params: dict, its: Intersection, wo: jax.Array,
                active: jax.Array) -> jax.Array:
    cti = jax.lax.stop_gradient(cos_theta(its.wi))
    cto = jax.lax.stop_gradient(cos_theta(wo))
    active = active & (cti > 0.0) & (cto > 0.0)
    return jnp.where(active, InvPi * cto, 0.0)
