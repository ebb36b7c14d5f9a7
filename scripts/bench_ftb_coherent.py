"""A/B front_to_back on tile-coherent camera-style rays (the remaining
dominant closest-hit after the emitter-first bounce landed).

Usage: python scripts/bench_ftb_coherent.py [n_rays] [n_tris]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from psdr_tpu.accel.bvh import build_bvh_topology, refit_bvh
from psdr_tpu.accel.pallas_kernel import ray_intersect_pallas_culled2
from bench_intersect import make_tris, bench


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    f_target = int(sys.argv[2]) if len(sys.argv) > 2 else 20480

    side = int(np.sqrt(n_rays))
    n_rays = side * side
    px, py = np.meshgrid(np.linspace(-0.55, 0.55, side, dtype=np.float32),
                         np.linspace(-0.55, 0.55, side, dtype=np.float32))
    d_np = np.stack([px.ravel(), py.ravel(),
                     np.full(n_rays, -1.0, np.float32)], axis=-1)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o_np = np.broadcast_to(np.array([0.0, 0.0, 3.0], np.float32),
                           (n_rays, 3)).copy()
    ts = 32
    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    order = np.lexsort((xx.ravel() % ts, yy.ravel() % ts,
                        xx.ravel() // ts, yy.ravel() // ts))
    d_np = d_np[order]
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)

    p0n, e1n, e2n = make_tris(f_target)
    topo = build_bvh_topology(p0n, e1n, e2n, leaf_size=4)
    args = (jnp.asarray(p0n), jnp.asarray(e1n), jnp.asarray(e2n), o, d)

    for ftb in (False, True):
        def fused(p0, e1, e2, o, d, ftb=ftb):
            bvh = refit_bvh(topo, p0, e1, e2)
            return ray_intersect_pallas_culled2(
                bvh, o, d, tri_block=128, ray_block=1024, sub_split=2,
                front_to_back=ftb)
        t, h = bench(jax.jit(fused), args)
        print(f"F={p0n.shape[0]}  ftb={int(ftb)}  "
              f"{n_rays/t/1e6:8.2f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
