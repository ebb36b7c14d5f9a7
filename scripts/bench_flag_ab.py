"""Same-process interleaved stage split of the flagship (cbox) forward —
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

WIDTH = HEIGHT = 512
SPP = 64
CHUNK = 1 << 21


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
    from psdr_tpu.core.sampler import RngStream, ld_2d
    from psdr_tpu.integrator.base import tile_pos_to_pixel
    from psdr_tpu.scene.scene import detach_flat, ray_intersect, scene_le
    from psdr_tpu.sensor.perspective import sample_primary_ray
    from tests.scenes import cbox_scene

    scene = cbox_scene(width=WIDTH, height=HEIGHT, spp=SPP,
                       occluder_subdiv=5)
    scene.prepare_accel()
    params = scene.params()

    def gen_rays(flat, key):
        lane = jnp.arange(CHUNK, dtype=jnp.int32)
        idx = tile_pos_to_pixel(lane // SPP, WIDTH, HEIGHT)
        base = jnp.stack([(idx % WIDTH).astype(jnp.float32),
                          (idx // WIDTH).astype(jnp.float32)], axis=-1)
        rng = RngStream(key, salt=0)
        w = jax.random.randint(rng._subkey(), (6,), 0,
                               jnp.iinfo(jnp.int32).max,
                               jnp.int32).astype(jnp.uint32)

        def pix_scramble(word):
            h = idx.astype(jnp.uint32) ^ word
            h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
            h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
            return h ^ (h >> 16)

        s_idx = (lane % SPP).astype(jnp.uint32)
        jitter = ld_2d(s_idx, pix_scramble(w[0]), pix_scramble(w[1]))
        rng.ld = (s_idx, pix_scramble(w[2]), pix_scramble(w[3]),
                  pix_scramble(w[4]), pix_scramble(w[5]))
        samples = (base + jitter) / jnp.array([WIDTH, HEIGHT], jnp.float32)
        return rng, sample_primary_ray(flat.sensors[0], samples)

    def cam_only(key):
        flat = detach_flat(scene.build(params))
        rng, ray = gen_rays(flat, key)
        its = ray_intersect(flat, ray, jnp.ones(CHUNK, bool))
        le = scene_le(flat, its, its.valid)
        return le.sum() + its.p.sum()

    def li_chunk(integ):
        def f(key):
            flat = detach_flat(scene.build(params))
            rng, ray = gen_rays(flat, key)
            val = integ.Li(scene, flat, rng, ray, jnp.ones(CHUNK, bool))
            return val.sum()
        return f

    fns = {
        "cam": jax.jit(cam_only),
        "bsdf": jax.jit(li_chunk(DirectIntegrator(1, 0))),
        "nee": jax.jit(li_chunk(DirectIntegrator(0, 1))),
        "full": jax.jit(li_chunk(DirectIntegrator(1, 1))),
    }
    if len(sys.argv) > 1 and sys.argv[1] == "--nee-ftb":
        import psdr_tpu.integrator.direct as D
        real = D.ray_test

        def sorted_ray_test(flat, ray, dist, active, sort_rays=False,
                            sparse=False):
            return real(flat, ray, dist, active, sort_rays=True,
                        sparse=False)

        # trace-time patch: force the sorted ftb sweep into one variant
        D.ray_test = sorted_ray_test
        f_ftb = jax.jit(li_chunk(DirectIntegrator(0, 1)))
        jax.block_until_ready(f_ftb(jax.random.PRNGKey(5)))  # trace now
        D.ray_test = real
        f_plain = jax.jit(li_chunk(DirectIntegrator(0, 1)))
        interleaved({"nee-ftb": f_ftb, "nee-plain": f_plain},
                    jax.random.PRNGKey(5))
        return

    interleaved(fns, jax.random.PRNGKey(5))


if __name__ == "__main__":
    main()
