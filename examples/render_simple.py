"""Forward-render the Cornell-box test scene and write EXRs.

Equivalent of the reference's run_orig workflow (examples/run_test.py:12-41):
npass-averaged renderC plus a couple of AOV passes.

Usage: python examples/render_simple.py [out_dir]
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

from psdr_tpu import DirectIntegrator, FieldExtractionIntegrator
from psdr_tpu.core.exr import write_exr
from psdr_tpu.testing import run_orig
from scenes import cbox_scene


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "out"
    os.makedirs(out, exist_ok=True)

    scene = cbox_scene(width=128, height=128, spp=8, occluder_subdiv=3)
    img = run_orig(scene, DirectIntegrator(1, 1), npass=2)
    write_exr(os.path.join(out, "cbox.exr"), img)
    print(f"wrote {out}/cbox.exr  mean={img.mean():.4f}")

    for field in ("depth", "shNormal"):
        aov = run_orig(scene, FieldExtractionIntegrator(field), npass=1)
        write_exr(os.path.join(out, f"cbox_{field}.exr"), np.abs(aov))
        print(f"wrote {out}/cbox_{field}.exr")


if __name__ == "__main__":
    main()
