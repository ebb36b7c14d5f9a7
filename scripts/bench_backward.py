"""Backward-pass benchmark: grad-samples/s/chip (BASELINE.json north-star
companion to bench.py's forward rays/s).

Measures a full differentiable iteration: value_and_grad of an L2 loss
through scene build + interior render (geometry + material gradients).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp


def main():
    from psdr_tpu import DirectIntegrator
    from psdr_tpu.core.gather import set_gather_vjp_mode
    from scenes import cbox_scene

    mode = sys.argv[1] if len(sys.argv) > 1 else "native"
    set_gather_vjp_mode(mode)

    width = height = 512
    spp = 16
    scene = cbox_scene(width=width, height=height, spp=spp,
                       occluder_subdiv=5)
    integ = DirectIntegrator(1, 1)
    render = integ.render_fn(scene, with_boundary=False)
    params = scene.params()
    target = jnp.zeros((width * height, 3), jnp.float32)

    @jax.jit
    def step(params, key):
        def loss(p):
            img = render(p, key)
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss)(params)

    out = step(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    n_iter = 3
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(params, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    samples = width * height * spp
    print(json.dumps({
        "metric": "backward_grad_samples_per_s_per_chip",
        "value": samples / dt,
        "unit": "grad-samples/s",
        "seconds_per_iteration": dt,
        "gather_vjp": mode,
    }))


if __name__ == "__main__":
    main()
