"""Inverse rendering: recover a sphere's albedo from a target image.

Equivalent of the reference's docs/inverse_diff_render.rst workflow
(Adam over reflectance.data through param_map).

Usage: python examples/inverse_albedo.py [iters]
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

import jax
import jax.numpy as jnp
import numpy as np

from psdr_tpu import DirectIntegrator
from psdr_tpu.core.bitmap import Bitmap
from psdr_tpu.opt import Optimizer
from scenes import sphere_light_scene


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    scene = sphere_light_scene(width=64, height=64, spp=8)
    integ = DirectIntegrator(1, 1)
    render = jax.jit(integ.render_fn(scene, with_boundary=False))

    target = render(scene.params(), jax.random.PRNGKey(1234))
    print("target albedo: [0.8 0.8 0.8]")

    scene.bsdfs[0].reflectance = Bitmap(
        data=jnp.full((1, 1, 3), 0.25, jnp.float32))
    opt = Optimizer(scene, ["BSDF[id=white].reflectance"], lr=5e-2)

    def loss_fn(params, key):
        img = render(params, key)
        return jnp.mean((img - target) ** 2)

    for it in range(iters):
        loss = opt.step(loss_fn, jax.random.PRNGKey(it))
        if it % 10 == 0 or it == iters - 1:
            alb = np.asarray(opt.params["bsdfs"][0]["reflectance"]).ravel()
            print(f"iter {it:4d}  loss {loss:.3e}  albedo {alb.round(3)}")

    opt.write_back()  # push recovered parameters into the scene


if __name__ == "__main__":
    main()
