"""AD-vs-FD derivative-image validation — the reference's core test
workflow (examples/psdr_test.py + run_test.py): render d(image)/dP with
forward-mode AD (interior + boundary estimators) and with central finite
differences, write both as EXRs for comparison.

Usage: python examples/validate_gradients.py [mode] [out_dir]
  mode in: mesh_transform | mesh_rotate | vertex_transform |
           material_roughness (default mesh_transform)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import os

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from psdr_tpu import DirectIntegrator, RoughConductor
from psdr_tpu.core.exr import write_exr
from psdr_tpu.testing import run_ad, run_fd
from scenes import sphere_light_scene


def _metal_scene():
    """material_roughness needs a roughconductor in the scene."""
    sc = sphere_light_scene(width=64, height=64, spp=32)
    sc.bsdfs[0] = RoughConductor(alpha_u=0.2, alpha_v=0.2, bsdf_id="white")
    sc.param_map["BSDF[id=white]"] = sc.bsdfs[0]
    return sc


def main():
    modes = ("mesh_transform", "mesh_rotate", "vertex_transform",
             "material_roughness")
    mode = sys.argv[1] if len(sys.argv) > 1 else "mesh_transform"
    if mode not in modes:
        sys.exit(f"usage: validate_gradients.py [{'|'.join(modes)}] [out_dir]")
    out = sys.argv[2] if len(sys.argv) > 2 else "out"
    os.makedirs(out, exist_ok=True)

    if mode == "material_roughness":
        scene = _metal_scene()  # interior-only perturbation
    else:
        # boundary terms on: silhouette gradients need sppe/sppse
        scene = sphere_light_scene(width=64, height=64, spp=32, sppe=4,
                                   sppse=16)
    integ = DirectIntegrator(1, 1)

    eps = {"mesh_transform": 0.01, "mesh_rotate": 0.5,
           "vertex_transform": 0.02, "material_roughness": 0.01}[mode]

    ad = run_ad(scene, integ, mode, npass=4,
                guiding=((8, 8, 8, 2), 2) if scene.opts.sppse else None)
    fd = run_fd(scene, integ, mode, eps=eps, npass=16)

    write_exr(os.path.join(out, f"{mode}_ad.exr"), ad)
    write_exr(os.path.join(out, f"{mode}_fd.exr"), fd)
    denom = max(np.abs(fd).max(), 1e-6)
    err = np.abs(ad - fd) / denom
    print(f"{mode}: |ad|max={np.abs(ad).max():.4f} |fd|max={np.abs(fd).max():.4f}"
          f"  rel-err p50={np.percentile(err, 50):.3f} p95={np.percentile(err, 95):.3f}")
    print(f"wrote {out}/{mode}_ad.exr and {out}/{mode}_fd.exr")


if __name__ == "__main__":
    main()
