"""Benchmark: forward rays/s and backward grad-samples/s on the flagship
Direct-integrator scene (both BASELINE.json north-star metrics).

Prints one JSON line per metric: {"metric", "value", "unit",
"vs_baseline"}; the first line is the headline forward-throughput number.
The reference (psdr-cuda) publishes no numbers (BASELINE.md), so
``vs_baseline`` is measured against the recorded best from previous rounds
(bench_baseline.json if present, else 1.0).

Configuration mirrors the reference's representative forward config scaled
to the BASELINE.json target: Cornell-box-style scene with a 20k-triangle
occluder, 512x512, spp=64, MIS 1 bsdf + 1 light sample (=> 3 traced rays
per camera sample). The backward step is value_and_grad of an L2 loss
through scene build + interior render at spp=16 (geometry + material
gradients), as in the reference's inverse-rendering loop (SURVEY.md §3.5).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def _baselines():
    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if os.path.exists(base_file):
        with open(base_file) as f:
            return json.load(f)
    return {}


def _bench(step, args, n_iter):
    out = step(*args(0))  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(*args(i + 1))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    from psdr_tpu import DirectIntegrator
    from tests.scenes import cbox_scene

    width = height = 512
    spp = 64
    bsdf_samples = light_samples = 1
    integrator = DirectIntegrator(bsdf_samples, light_samples)
    baselines = _baselines()
    lanes = width * height * spp

    # backward first: the grad program hits a TPU runtime InvalidArgument
    # when compiled after the big forward program in the same process (the
    # identical program succeeds standalone — tunnel-server state), while
    # forward-after-backward is fine. Metrics still print forward-first.
    bwd_spp = 16
    scene_b = cbox_scene(width=width, height=height, spp=bwd_spp,
                         occluder_subdiv=5)
    render_b = integrator.render_fn(scene_b, with_boundary=False)
    params_b = scene_b.params()
    target = jnp.zeros((width * height, 3), jnp.float32)

    @jax.jit
    def grad_step(p, key):
        def loss(q):
            img = render_b(q, key)
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss)(p)  # full grads: nothing DCE'd

    dt_b = _bench(grad_step, lambda i: (params_b, jax.random.PRNGKey(i)),
                  n_iter=3)
    grad_samples_per_s = width * height * bwd_spp / dt_b

    scene = cbox_scene(width=width, height=height, spp=spp,
                       occluder_subdiv=5)
    render = jax.jit(integrator.render_fn(scene, with_boundary=False))
    params = scene.params()

    dt = _bench(render, lambda i: (params, jax.random.PRNGKey(i)), n_iter=5)
    rays = lanes * (1 + bsdf_samples + light_samples)
    rays_per_s = rays / dt
    fwd_base = float(baselines.get("rays_per_s", 1.0))
    print(json.dumps({
        "metric": "forward_rays_per_s_per_chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / fwd_base,
    }), flush=True)

    bwd_base = float(baselines.get("grad_samples_per_s", 1.0))
    print(json.dumps({
        "metric": "backward_grad_samples_per_s_per_chip",
        "value": grad_samples_per_s,
        "unit": "grad-samples/s",
        "vs_baseline": grad_samples_per_s / bwd_base,
    }), flush=True)


if __name__ == "__main__":
    main()
