"""(RETIRED protocol — kept for the record: full-render programs,
even a single 0.5M-lane chunk, cannot co-reside in one tunnel process;
the interleave dies with the rule-7 INVALID_ARGUMENT. Use sub-Li-scale
programs as in bench_env_ab.py instead.)

Same-process interleaved stage split of the flagship (cbox) forward —
the tunnel-noise-robust replacement for bench_e2e_stages' child-per-stage
protocol (children drift 2-4x with tunnel load; only its `full` number is
used). All stages render ONE 2M-lane chunk of the real wavefront through
renderC semantics (detached flat), compiled once, timed in alternating
rounds.

  cam     raygen + closest hit + detached recompute + Le
  bsdf    DirectIntegrator(1, 0) chunk: + bsdf sample + emitter-first + MIS
  nee     DirectIntegrator(0, 1) chunk: + NEE sample + ray_test + shading
  full    DirectIntegrator(1, 1) chunk (the headline config)

Also: nee-ftb — full chunk with the NEE ray_test forced to the sorted
front-to-back sweep, answering whether cbox's coherent shadow rays want
the envmap treatment (round-2 measured a loss at the old kernel config).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

WIDTH = 512
HEIGHT = 32
SPP = 64
CHUNK = WIDTH * HEIGHT * SPP


def interleaved(fns: dict, key, iters=6):
    for name, f in fns.items():
        jax.block_until_ready(f(key))
    tot = {n: 0.0 for n in fns}
    for i in range(iters):
        for name, f in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f(jax.random.fold_in(key, i)))
            tot[name] += time.perf_counter() - t0
    for name in fns:
        ms = tot[name] / iters * 1e3
        print(f"{name:10s} {ms:8.1f} ms  ({CHUNK/ (ms/1e3) /1e6:6.1f} "
              f"Msamples/s)", flush=True)


def main():
    from psdr_tpu import DirectIntegrator
    from psdr_tpu.scene.scene import ray_intersect, scene_le
    from tests.scenes import cbox_scene

    # One EXACT 2M-lane chunk through the REAL interior machinery: a
    # 512x64 film at spp=64 (tiled raygen, arithmetic inverse, detached
    # flat, film reduction) — the standalone chunk-Li jit dies on the
    # sparse-occlusion lax.cond (rule-7 cond-of-kernels quirk), while the
    # same cond inside the full render program is fine.
    class CamOnly(DirectIntegrator):
        def Li(self, scene, flat, rng, ray, active, prior=None):
            its = ray_intersect(flat, ray, active)
            return scene_le(flat, its, active & its.valid)

    def make(integ):
        scene = cbox_scene(width=WIDTH, height=HEIGHT, spp=SPP,
                           occluder_subdiv=5)
        scene.prepare_accel()
        params = scene.params()
        render = jax.jit(integ.render_fn(scene, with_boundary=False,
                                         detached=True))
        return lambda key: render(params, key)

    fns = {
        "cam": make(CamOnly(1, 1)),
        "bsdf": make(DirectIntegrator(1, 0)),
        "nee": make(DirectIntegrator(0, 1)),
        "full": make(DirectIntegrator(1, 1)),
    }
    if len(sys.argv) > 1 and sys.argv[1] == "--nee-ftb":
        import psdr_tpu.integrator.direct as D
        real = D.ray_test

        def sorted_ray_test(flat, ray, dist, active, sort_rays=False,
                            sparse=False):
            return real(flat, ray, dist, active, sort_rays=True,
                        sparse=False)

        D.ray_test = sorted_ray_test
        f_ftb = make(DirectIntegrator(0, 1))
        jax.block_until_ready(f_ftb(jax.random.PRNGKey(5)))  # trace now
        D.ray_test = real
        f_plain = make(DirectIntegrator(0, 1))
        interleaved({"nee-ftb": f_ftb, "nee-plain": f_plain},
                    jax.random.PRNGKey(5))
        return

    interleaved(fns, jax.random.PRNGKey(5))


if __name__ == "__main__":
    main()
