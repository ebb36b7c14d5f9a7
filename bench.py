"""Benchmark: forward rays/s on the flagship Direct-integrator scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference (psdr-cuda) publishes no numbers (BASELINE.md), so
``vs_baseline`` is measured against the recorded best from previous rounds
(bench_baseline.json if present, else 1.0).

Configuration mirrors the reference's representative forward config scaled
to the BASELINE.json target: Cornell-box-style scene with a 20k-triangle
occluder, 512x512, spp=64, MIS 1 bsdf + 1 light sample (=> 3 traced rays
per camera sample).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from psdr_tpu import DirectIntegrator
    from tests.scenes import cbox_scene

    width = height = 512
    spp = 64
    bsdf_samples = light_samples = 1
    scene = cbox_scene(width=width, height=height, spp=spp,
                       occluder_subdiv=5)
    integrator = DirectIntegrator(bsdf_samples, light_samples)
    render = jax.jit(integrator.render_fn(scene, with_boundary=False))
    params = scene.params()

    # compile + warmup
    img = render(params, jax.random.PRNGKey(0))
    jax.block_until_ready(img)

    n_iter = 5
    t0 = time.perf_counter()
    for i in range(n_iter):
        img = render(params, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n_iter

    lanes = width * height * spp
    rays = lanes * (1 + bsdf_samples + light_samples)
    rays_per_s = rays / dt

    baseline = 1.0
    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if os.path.exists(base_file):
        with open(base_file) as f:
            baseline = float(json.load(f).get("rays_per_s", 1.0))

    print(json.dumps({
        "metric": "forward_rays_per_s_per_chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / baseline,
    }))


if __name__ == "__main__":
    main()
