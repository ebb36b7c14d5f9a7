"""BSDF models and the integer-tagged dispatch that replaces the reference's
Enoki vcalls over per-lane BSDF pointer arrays (bsdf/bsdf.h:43-48).

Dispatch strategy: the scene carries a static list of BSDF objects; per-lane
``bsdf_id`` selects among them. Evaluation loops over the (small, static)
BSDF list, computing each model on all lanes and blending by the id mask —
branch-free and XLA-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.records import BSDFSample, Intersection
from .diffuse import Diffuse, eval_diffuse, sample_diffuse, pdf_diffuse
from .roughconductor import (RoughConductor, eval_roughconductor,
                             pdf_roughconductor, sample_roughconductor)

_EVAL = {"diffuse": eval_diffuse, "roughconductor": eval_roughconductor}
_SAMPLE = {"diffuse": sample_diffuse, "roughconductor": sample_roughconductor}
_PDF = {"diffuse": pdf_diffuse, "roughconductor": pdf_roughconductor}

# Capability flags, keyed like the dispatch tables above. A kind is
# "reflective one-sided" when eval/pdf are exactly zero whenever wi or wo
# is at or below the shading horizon (wi.z <= 0 or wo.z <= 0). The NEE
# side-gate (integrator/{direct,path}.py) may skip the shadow trace on
# below-horizon lanes ONLY when every scene BSDF has this property;
# kinds missing from this dict conservatively report False, so adding a
# transmissive/two-sided BSDF silently disables the gate (exact, just
# slower) instead of biasing renders.
_REFLECTIVE_ONE_SIDED = {"diffuse": True, "roughconductor": True}


def all_reflective_one_sided(kinds) -> bool:
    """True iff the NEE below-horizon side-gate is exact for this BSDF set."""
    return all(_REFLECTIVE_ONE_SIDED.get(k, False) for k in kinds)


def eval_bsdf(kinds, params_list, its: Intersection, wo: jax.Array,
              active: jax.Array) -> jax.Array:
    result = jnp.zeros(wo.shape[:-1] + (3,), wo.dtype)
    for i, (kind, params) in enumerate(zip(kinds, params_list)):
        mask = active & (its.bsdf_id == i)
        result = result + jnp.where(mask[..., None],
                                    _EVAL[kind](params, its, wo, mask), 0.0)
    return result


def pdf_bsdf(kinds, params_list, its: Intersection, wo: jax.Array,
             active: jax.Array) -> jax.Array:
    result = jnp.zeros(wo.shape[:-1], wo.dtype)
    for i, (kind, params) in enumerate(zip(kinds, params_list)):
        mask = active & (its.bsdf_id == i)
        result = result + jnp.where(mask, _PDF[kind](params, its, wo, mask), 0.0)
    return result


def sample_bsdf(kinds, params_list, its: Intersection, sample3: jax.Array,
                active: jax.Array) -> BSDFSample:
    n = sample3.shape[:-1]
    out = BSDFSample(valid=jnp.zeros(n, bool),
                     pdf=jnp.zeros(n, jnp.float32),
                     wo=jnp.zeros(n + (3,), jnp.float32))
    for i, (kind, params) in enumerate(zip(kinds, params_list)):
        mask = active & (its.bsdf_id == i)
        bs = _SAMPLE[kind](params, its, sample3, mask)
        out = BSDFSample(
            valid=jnp.where(mask, bs.valid, out.valid),
            pdf=jnp.where(mask, bs.pdf, out.pdf),
            wo=jnp.where(mask[..., None], bs.wo, out.wo),
        )
    return out
