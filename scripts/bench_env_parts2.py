"""Round-2 bunny_env decomposition: split nee-sample (57 ms/2M) into its
search / trig / AABB parts, and A/B the shadow-ray any-hit kernel params
(nee-occl minus nee-sample ~= 75 ms/2M — the single biggest envmap-scene
cost; the sweep is 100% active so the sparse path never applies).

Reuses the camera-hit npz produced by bench_env_parts.py --setup.
One probe per child process (CLAUDE.md rule 7).
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

sg = jax.lax.stop_gradient

_NPZ = "/tmp/env_parts_inputs.npz"
CHUNK = 1 << 21
PROBES = ("ns-search", "ns-dir", "ns-pos",
          "occl-ftb", "occl-R2048", "occl-ftbR2048", "occl-counters")


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
        print(out[0] if out else f"{name:14s} FAILED\n{r.stdout[-300:]}"
              f"{r.stderr[-300:]}", flush=True)


def main():
    from psdr_tpu.core.records import Ray
    from psdr_tpu.core.sampler import RngStream
    from psdr_tpu.core.distribution import hypercube_sample_reuse
    from psdr_tpu.core.math import squared_norm
    from psdr_tpu.emitter.envmap import (envmap_sample_direction,
                                         envmap_sample_position)
    from psdr_tpu.scene.scene import _octant_sort
    from psdr_tpu.accel.pallas_kernel import ray_intersect_pallas_culled2
    from scripts.bench_env_parts import load_scene

    scene = load_scene()
    params = scene.params()
    data = np.load(_NPZ)
    p = jnp.asarray(data["p"])
    act = jnp.asarray(data["act"])
    name = sys.argv[1]

    if name == "ns-search":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            rng = RngStream(key, salt=4)
            uv, pdf = hypercube_sample_reuse(flat.envmap.cell_distrb,
                                             rng.next_2d(CHUNK))
            return uv.sum() + pdf.sum()
    elif name == "ns-dir":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            rng = RngStream(key, salt=4)
            d, pdf = envmap_sample_direction(flat.envmap, rng.next_2d(CHUNK))
            return d.sum() + pdf.sum()
    elif name == "ns-pos":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            rng = RngStream(key, salt=4)
            ps = envmap_sample_position(flat.envmap, p, rng.next_2d(CHUNK),
                                        act)
            return ps.p.sum() + ps.pdf.sum()
    elif name.startswith("occl"):
        kw = {
            "occl-ftb": dict(ray_block=1024, sub_split=4,
                             front_to_back=True),
            "occl-R2048": dict(ray_block=2048, sub_split=4,
                               front_to_back=False),
            "occl-ftbR2048": dict(ray_block=2048, sub_split=4,
                                  front_to_back=True),
            "occl-counters": dict(ray_block=1024, sub_split=4,
                                  front_to_back=False, debug_counters=True),
        }[name]

        @jax.jit
        def f(key):
            flat = scene.build(params)
            rng = RngStream(key, salt=4)
            ps = envmap_sample_position(flat.envmap, p, rng.next_2d(CHUNK),
                                        act)
            a1 = act & ps.valid
            wo = ps.p - p
            dist = jnp.sqrt(jnp.maximum(squared_norm(wo), 1e-20))
            wo = wo / dist[..., None]
            ray = Ray(p, wo)
            from psdr_tpu.core.constants import ShadowEpsilon
            tmax = sg(dist) - ShadowEpsilon
            perm, _ = _octant_sort(ray, a1, want_inv=False)
            packed = jnp.concatenate(
                [sg(ray.o), sg(ray.d), a1.astype(jnp.float32)[:, None],
                 sg(tmax)[:, None]], axis=1)[perm]
            out = ray_intersect_pallas_culled2(
                flat.accel, packed[:, 0:3], packed[:, 3:6],
                packed[:, 6] > 0.5, tmax=packed[:, 7], any_hit=True, **kw)
            if kw.get("debug_counters"):
                hit, (tiles, cands) = out
                return tiles.mean(), cands.mean(), hit.valid.sum()
            return out.valid.sum()

        if kw.get("debug_counters"):
            dt, out = bench(f, jax.random.PRNGKey(1))
            print(f"{name:14s} {dt*1e3:8.1f} ms  "
                  f"tiles/rb={float(out[0]):.2f} cands/rb={float(out[1]):.2f}",
                  flush=True)
            return
    else:
        raise SystemExit(f"unknown probe {name}")

    dt, _ = bench(f, jax.random.PRNGKey(1))
    print(f"{name:14s} {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 1:
        orchestrate()
    elif sys.argv[1] == "--only":
        orchestrate(sys.argv[2:])
    else:
        main()
