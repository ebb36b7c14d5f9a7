"""Decompose the camera stage of the flagship forward bench.

The round-3 anatomy (bench_e2e_stages) puts "cam" (raygen + closest hit +
recompute + Le + film) at ~982 ms of the 1629 ms frame — yet the culled2
kernel standalone does 39.5 Mray/s at this triangle count, which would be
only ~425 ms of kernel time for 16.7M rays. These probes localize the gap
at one 2M-lane pass chunk of the REAL bench wavefront (spp=64 lane->pixel
mapping: a 1024-ray block covers 16 pixels, not the sweep scripts' 128).

  raygen       sobol jitter + sample_primary_ray + sum        (no kernel)
  cam-kernel   + detached closest hit, production params
  cam-full     + differentiable recompute + scene_le           (CamOnly)
  cam-R512 / cam-R2048 / cam-ss1 / cam-ss4 / cam-nb16 / cam-nb4
               kernel-param variants of cam-kernel
  counters     debug_counters on the production config: mean MT tiles /
               candidate blocks per ray block

One probe per child process (CLAUDE.md rule 7).
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

sg = jax.lax.stop_gradient

WIDTH = HEIGHT = 512
SPP = 64
CHUNK = 1 << 21          # one pass chunk of the 16.7M-lane bench wavefront

PROBES = ("raygen", "cam-kernel", "cam-full", "cam-R512", "cam-R2048",
          "cam-ss1", "cam-ss4", "cam-nb16", "cam-nb4", "counters",
          # round 2: the counters probe showed only ~2 MT tiles per ray
          # block — the per-ray-block FIXED cost (interval cull over all
          # B leaf blocks + prefix matmul + SMEM copies) dominates, so
          # larger ray blocks amortize it
          "cam-R4096", "cam-R2048ss4", "cam-R4096ss4", "cam-T256",
          "raygen2")


def bench(fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def orchestrate(names=None):
    for name in names or PROBES:
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=3600)
        out = [l for l in r.stdout.splitlines() if l.startswith(name)]
        print(out[0] if out else f"{name:10s} FAILED\n{r.stdout[-300:]}"
              f"{r.stderr[-300:]}", flush=True)


def main():
    name = sys.argv[1]
    from psdr_tpu.core.sampler import RngStream, ld_2d
    from psdr_tpu.integrator.base import tiled_pixel_order
    from psdr_tpu.scene.scene import (_closest_hit, ray_intersect, scene_le)
    from psdr_tpu.core.records import Ray
    from psdr_tpu.sensor.perspective import sample_primary_ray
    from psdr_tpu.accel.pallas_kernel import ray_intersect_pallas_culled2
    from tests.scenes import cbox_scene

    scene = cbox_scene(width=WIDTH, height=HEIGHT, spp=SPP,
                       occluder_subdiv=5)
    scene.prepare_accel()
    params = scene.params()
    pix_order = jnp.asarray(tiled_pixel_order(WIDTH, HEIGHT))

    def gen_rays(flat, key):
        """First pass chunk of the bench wavefront, sobol subpixel jitter."""
        lane = jnp.arange(CHUNK, dtype=jnp.int32)
        idx = pix_order[lane // SPP]
        base = jnp.stack([(idx % WIDTH).astype(jnp.float32),
                          (idx // WIDTH).astype(jnp.float32)], axis=-1)
        rng = RngStream(key, salt=0)
        w = jax.random.randint(rng._subkey(), (2,), 0,
                               jnp.iinfo(jnp.int32).max,
                               jnp.int32).astype(jnp.uint32)

        def pix_scramble(word):
            h = idx.astype(jnp.uint32) ^ word
            h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
            h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
            return h ^ (h >> 16)

        s_idx = (lane % SPP).astype(jnp.uint32)
        jitter = ld_2d(s_idx, pix_scramble(w[0]), pix_scramble(w[1]))
        samples = (base + jitter) / jnp.array([WIDTH, HEIGHT], jnp.float32)
        return sample_primary_ray(flat.sensors[0], samples)

    kern_variants = {
        "cam-R512": dict(ray_block=512, sub_split=2, front_to_back=True),
        "cam-R2048": dict(ray_block=2048, sub_split=2, front_to_back=True),
        "cam-ss1": dict(ray_block=1024, sub_split=1, front_to_back=True),
        "cam-ss4": dict(ray_block=1024, sub_split=4, front_to_back=True),
        "cam-nb16": dict(ray_block=1024, sub_split=2, front_to_back=True,
                         n_buckets=16),
        "cam-nb4": dict(ray_block=1024, sub_split=2, front_to_back=True,
                        n_buckets=4),
        "cam-R4096": dict(ray_block=4096, sub_split=2, front_to_back=True),
        "cam-R2048ss4": dict(ray_block=2048, sub_split=4,
                             front_to_back=True),
        "cam-R4096ss4": dict(ray_block=4096, sub_split=4,
                             front_to_back=True),
        "cam-T256": dict(ray_block=2048, tri_block=256, sub_split=2,
                         front_to_back=True),
    }

    if name == "raygen":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            ray = gen_rays(flat, key)
            return ray.o.sum() + ray.d.sum()
    elif name == "raygen2":
        # production raygen: arithmetic tile-order inverse (no pix_order
        # gather) — what render_interior actually runs since commit 4e7f766
        from psdr_tpu.integrator.base import tile_pos_to_pixel

        @jax.jit
        def f(key):
            flat = scene.build(params)
            lane = jnp.arange(CHUNK, dtype=jnp.int32)
            idx = tile_pos_to_pixel(lane // SPP, WIDTH, HEIGHT)
            base = jnp.stack([(idx % WIDTH).astype(jnp.float32),
                              (idx // WIDTH).astype(jnp.float32)], axis=-1)
            rng = RngStream(key, salt=0)
            w = jax.random.randint(rng._subkey(), (2,), 0,
                                   jnp.iinfo(jnp.int32).max,
                                   jnp.int32).astype(jnp.uint32)

            def pix_scramble(word):
                h = idx.astype(jnp.uint32) ^ word
                h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
                h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
                return h ^ (h >> 16)

            s_idx = (lane % SPP).astype(jnp.uint32)
            jitter = ld_2d(s_idx, pix_scramble(w[0]), pix_scramble(w[1]))
            samples = (base + jitter) / jnp.array([WIDTH, HEIGHT],
                                                  jnp.float32)
            ray = sample_primary_ray(flat.sensors[0], samples)
            return ray.o.sum() + ray.d.sum()
    elif name == "cam-kernel":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            ray = gen_rays(flat, key)
            hit = _closest_hit(flat, ray, jnp.ones(CHUNK, bool))
            return hit.t.sum() + hit.tri_id.sum()
    elif name in kern_variants:
        kw = kern_variants[name]

        @jax.jit
        def f(key):
            flat = scene.build(params)
            ray = gen_rays(flat, key)
            hit = ray_intersect_pallas_culled2(
                flat.accel, sg(ray.o), sg(ray.d), jnp.ones(CHUNK, bool),
                **kw)
            return hit.t.sum() + hit.tri_id.sum()
    elif name == "cam-full":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            ray = gen_rays(flat, key)
            its = ray_intersect(flat, ray, jnp.ones(CHUNK, bool))
            le = scene_le(flat, its, its.valid)
            return le.sum() + its.p.sum()
    elif name == "counters":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            ray = gen_rays(flat, key)
            hit, (tiles, cands) = ray_intersect_pallas_culled2(
                flat.accel, sg(ray.o), sg(ray.d), jnp.ones(CHUNK, bool),
                ray_block=1024, sub_split=2, front_to_back=True,
                debug_counters=True)
            return tiles.mean(), cands.mean(), hit.t.sum()

        dt, out = bench(f, jax.random.PRNGKey(0))
        print(f"{name:10s} {dt*1e3:8.1f} ms  tiles/rb={float(out[0]):.2f} "
              f"cands/rb={float(out[1]):.2f}", flush=True)
        return
    else:
        raise SystemExit(f"unknown probe {name}")

    dt, _ = bench(f, jax.random.PRNGKey(0))
    print(f"{name:10s} {dt*1e3:8.1f} ms  "
          f"({CHUNK/dt/1e6:6.1f} Mray/s)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 1:
        orchestrate()
    elif sys.argv[1] == "--only":
        orchestrate(sys.argv[2:])
    else:
        main()
