"""Full differentiable-render (renderD) benchmark: interior + primary-edge
+ secondary-edge boundary passes under one value_and_grad.

The reference's representative AD config is spp=16, sppe=8, sppse=64
(/root/reference/examples/config.py:21-40); bench.py's backward metric
covers the interior term only, so this measures the boundary machinery
(edge sampling, sorted edge wavefronts, the x - stop_gradient(x)
estimators) at reference-like settings scaled to the flagship scene.

Prints one JSON line: grad-samples/s counting interior + sppe + sppse
lanes (the work actually traced), plus the per-term lane split.
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
    import dataclasses
    from psdr_tpu import DirectIntegrator, PathTracer
    from scenes import cbox_scene

    width = height = 256
    spp, sppe, sppse = 16, 8, 64
    # pass-split probes: PSDR_RD_SPPE=0 / PSDR_RD_SPPSE=0 zero a term
    sppe = int(os.environ.get("PSDR_RD_SPPE", sppe))
    sppse = int(os.environ.get("PSDR_RD_SPPSE", sppse))
    scene = cbox_scene(width=width, height=height, spp=spp,
                       occluder_subdiv=5)
    scene.opts = dataclasses.replace(scene.opts, sppe=sppe, sppse=sppse)
    # PSDR_RD_INTEGRATOR=path: depth-2 PathTracer with the camera-side
    # (camera_depth=2) + indirect boundary estimators — the full
    # beyond-reference renderD
    if os.environ.get("PSDR_RD_INTEGRATOR", "direct") == "path":
        integ = PathTracer(max_depth=2, camera_depth=2)
    else:
        integ = DirectIntegrator(1, 1)
    render = integ.render_fn(scene, with_boundary=True)
    params = scene.params()
    target = jnp.zeros((width * height, 3), jnp.float32)

    @jax.jit
    def step(p, key):
        def loss(q):
            img = render(q, key)
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss)(p)

    out = step(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    n_iter = 3
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(params, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    # sanity: a sub-10ms "iteration" of a full renderD program means the
    # measurement (or the program) is broken — print the loss + a grad
    # norm so the run self-validates
    loss_v = float(out[0])
    import numpy as _np
    gn = float(sum(_np.abs(_np.asarray(g)).sum()
                   for g in jax.tree.leaves(out[1])))
    print(json.dumps({"loss": loss_v, "grad_l1": gn}), flush=True)

    pix = width * height
    samples = pix * (spp + sppe) + pix * sppse
    print(json.dumps({
        "metric": "renderD_grad_samples_per_s_per_chip",
        "value": samples / dt,
        "unit": "grad-samples/s",
        "seconds_per_iteration": dt,
        "config": {"width": width, "spp": spp, "sppe": sppe,
                   "sppse": sppse},
    }))


if __name__ == "__main__":
    main()
