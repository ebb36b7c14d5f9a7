"""psdr_tpu: a TPU-native path-space differentiable renderer (JAX/Pallas).

Re-designed from scratch with the capabilities of uci-rendering/psdr-cuda:
interior path integrals differentiated by jax.grad, plus explicit primary-
and secondary-edge boundary estimators for visibility-discontinuity
gradients, scaled over TPU meshes with shard_map.
"""
__version__ = "0.1.0"

import os as _os

# Persistent XLA executable cache. Guiding builds and full renders are
# compile-dominated through the tunnel (215 s guiding at reference scale,
# BASELINE.md round 4); a warm on-disk cache removes recompiles across
# processes. Opt out with PSDR_TPU_COMPILE_CACHE=0 or point
# PSDR_TPU_COMPILE_CACHE_DIR elsewhere. Safe under concurrent writers
# (atomic renames); keyed on HLO + compile flags + backend, so CPU tests
# and TPU runs never collide.
if _os.environ.get("PSDR_TPU_COMPILE_CACHE", "1") == "1":
    import jax as _jax
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("PSDR_TPU_COMPILE_CACHE_DIR",
                        _os.path.expanduser("~/.cache/psdr_tpu_xla")))
    # default min compile time is 1 s — keep it, but allow every entry
    # size (tiny executables recompile often in tests)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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
