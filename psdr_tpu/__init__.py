"""psdr_tpu: a TPU-native path-space differentiable renderer (JAX/Pallas).

Re-designed from scratch with the capabilities of uci-rendering/psdr-cuda:
interior path integrals differentiated by jax.grad, plus explicit primary-
and secondary-edge boundary estimators for visibility-discontinuity
gradients, scaled over TPU meshes with shard_map.
"""
__version__ = "0.1.0"

from .core.records import RenderOptions
from .scene import Scene
from .scene.loader import load_file, load_string, load_integrator
from .shape import Mesh, load_obj
from .shape import primitives
from .bsdf import Diffuse, RoughConductor
from .emitter import AreaLight, EnvironmentMap
from .sensor import PerspectiveCamera
from . import opt
from .integrator import (DirectIntegrator, FieldExtractionIntegrator,
                         PathTracer)
