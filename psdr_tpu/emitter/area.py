"""One-sided constant-radiance area light attached to a mesh.

Parity reference: psdr-cuda src/emitter/area.cpp — eval is one-sided
(area.cpp:20-29), position sampling delegates to the mesh
(area.cpp:42-47), sampling weight = area x luminance (area.cpp:10-17).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class AreaLight:
    kind = "area"

    def __init__(self, radiance, mesh_index: int, emitter_id: str = ""):
        import numpy as _np
        self.radiance = _np.asarray(radiance, _np.float32)
        self.mesh_index = int(mesh_index)
        self.id = emitter_id

    def params(self) -> dict:
        return {"radiance": self.radiance}

    def set_params(self, p: dict) -> None:
        self.radiance = p["radiance"]

    def __repr__(self):
        return f"AreaLight[radiance={self.radiance}, mesh={self.mesh_index}]"
