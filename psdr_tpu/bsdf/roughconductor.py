"""Textured rough-conductor (microfacet) BSDF with complex-IOR Fresnel.

Parity reference: psdr-cuda src/bsdf/roughconductor.cpp — eval = D*G*F /
(4 cos_theta_i) * specular_reflectance (roughconductor.cpp:40-56), VNDF
sample + mirror reflection (roughconductor.cpp:79-92), pdf = D * G1 /
(4 cos_theta_i) (roughconductor.cpp:60-76; note: *not* detached in the
reference's AD path, unlike Diffuse).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bitmap import Bitmap, eval_bitmap, constant
from ..core.frame import cos_theta
from ..core.math import dot, normalize, fresnel_conductor
from ..core.records import BSDFSample, Intersection
from .ggx import ggx_eval, ggx_G, ggx_sample, ggx_smith_g1


class RoughConductor:
    kind = "roughconductor"
    anisotropic = True

    def __init__(self, alpha_u=0.1, alpha_v=0.1,
                 eta=(0.2004, 0.9240, 1.1022),       # Au-ish defaults
                 k=(3.9129, 2.4528, 2.1421),
                 specular_reflectance=(1.0, 1.0, 1.0),
                 bsdf_id: str = ""):
        self.alpha_u = alpha_u if isinstance(alpha_u, Bitmap) else constant(alpha_u, 1)
        self.alpha_v = alpha_v if isinstance(alpha_v, Bitmap) else constant(alpha_v, 1)
        self.eta = eta if isinstance(eta, Bitmap) else constant(eta, 3)
        self.k = k if isinstance(k, Bitmap) else constant(k, 3)
        self.specular_reflectance = (specular_reflectance
                                     if isinstance(specular_reflectance, Bitmap)
                                     else constant(specular_reflectance, 3))
        self.id = bsdf_id

    def params(self) -> dict:
        return {"alpha_u": self.alpha_u.data, "alpha_v": self.alpha_v.data,
                "eta": self.eta.data, "k": self.k.data,
                "specular_reflectance": self.specular_reflectance.data}

    def set_params(self, p: dict) -> None:
        self.alpha_u = Bitmap(p["alpha_u"])
        self.alpha_v = Bitmap(p["alpha_v"])
        self.eta = Bitmap(p["eta"])
        self.k = Bitmap(p["k"])
        self.specular_reflectance = Bitmap(p["specular_reflectance"])

    def __repr__(self):
        return f"RoughConductor[id={self.id}]"


def _alphas(params: dict, uv: jax.Array):
    au = eval_bitmap(Bitmap(params["alpha_u"]), uv)[..., 0]
    av = eval_bitmap(Bitmap(params["alpha_v"]), uv)[..., 0]
    return au, av


def eval_roughconductor(params: dict, its: Intersection, wo: jax.Array,
                        active: jax.Array) -> jax.Array:
    cti = cos_theta(its.wi)
    cto = cos_theta(wo)
    active = active & (cti > 0.0) & (cto > 0.0)
    au, av = _alphas(params, its.uv)
    H = normalize(wo + its.wi)
    D = ggx_eval(au, av, H)
    active = active & (D != 0.0)
    G = ggx_G(au, av, its.wi, wo, H)
    result = (D * G / (4.0 * cti))[..., None]
    F = fresnel_conductor(eval_bitmap(Bitmap(params["eta"]), its.uv),
                          eval_bitmap(Bitmap(params["k"]), its.uv),
                          dot(its.wi, H))
    spec = eval_bitmap(Bitmap(params["specular_reflectance"]), its.uv)
    return jnp.where(active[..., None], F * result * spec, 0.0)


def pdf_roughconductor(params: dict, its: Intersection, wo: jax.Array,
                       active: jax.Array) -> jax.Array:
    cti = cos_theta(its.wi)
    cto = cos_theta(wo)
    m = normalize(wo + its.wi)
    active = (active & (cti > 0.0) & (cto > 0.0)
              & (dot(its.wi, m) > 0.0) & (dot(wo, m) > 0.0))
    au, av = _alphas(params, its.uv)
    result = ggx_eval(au, av, m) * ggx_smith_g1(au, av, its.wi, m) / (4.0 * cti)
    return jnp.where(active, result, 0.0)


def sample_roughconductor(params: dict, its: Intersection, sample3: jax.Array,
                          active: jax.Array) -> BSDFSample:
    cti = cos_theta(its.wi)
    au, av = _alphas(params, its.uv)
    m = ggx_sample(au, av, its.wi, sample3[..., :2])
    wo = m * (2.0 * dot(its.wi, m))[..., None] - its.wi
    pdf = pdf_roughconductor(params, its, wo, active)
    valid = active & (cti > 0.0) & (pdf != 0.0) & (cos_theta(wo) > 0.0)
    return BSDFSample(valid=valid, pdf=pdf, wo=wo)
