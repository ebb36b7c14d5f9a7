"""Micro-benchmark: intersection backends on the current default device.

Usage: python scripts/bench_intersect.py [n_rays] [tri_counts...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from psdr_tpu.accel.bruteforce import ray_intersect_brute
from psdr_tpu.accel.bvh import build_bvh_topology, ray_intersect_bvh, refit_bvh
from psdr_tpu.shape.primitives import make_icosphere


def make_tris(n_target):
    subdiv = 0
    while 20 * 4 ** subdiv < n_target:
        subdiv += 1
    m = make_icosphere(subdiv=subdiv, radius=1.0)
    import psdr_tpu.shape.mesh as meshmod
    info, _ = meshmod.compute_triangle_info(
        jnp.asarray(m.vertices), jnp.asarray(m.faces), m.num_vertices)
    return np.asarray(info.p0), np.asarray(info.e1), np.asarray(info.e2)


def bench(fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    tri_counts = ([int(x) for x in sys.argv[2:]] if len(sys.argv) > 2
                  else [1280, 5120, 20480, 81920, 327680])

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    for f in tri_counts:
        p0, e1, e2 = make_tris(f)
        f_real = p0.shape[0]
        jp0, je1, je2 = jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2)

        brute = jax.jit(lambda o, d: ray_intersect_brute(jp0, je1, je2, o, d))
        dt_b, hb = bench(brute, o, d)

        topo = build_bvh_topology(p0, e1, e2, leaf_size=4)
        bvh = refit_bvh(topo, jp0, je1, je2)
        bvh_fn = jax.jit(lambda o, d: ray_intersect_bvh(bvh, o, d))
        dt_v, hv = bench(bvh_fn, o, d)

        agree = np.mean(np.asarray(hb.tri_id) == np.asarray(hv.tri_id))
        print(f"F={f_real:7d}  brute {n_rays/dt_b/1e6:9.1f} Mray/s   "
              f"bvh {n_rays/dt_v/1e6:9.1f} Mray/s   agree={agree:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
