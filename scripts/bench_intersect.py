"""Micro-benchmark: intersection backends (single fused jit per variant).

Every variant (brute force / BVH with different leaf sizes) is ONE jitted
function containing refit + traversal, because the axon tunnel makes eager
dispatches cost ~0.3s each. Geometry is a real surface (icosphere), rays a
camera-like bundle from outside.

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
from psdr_tpu.accel.bvh import (build_bvh_topology, ray_intersect_bvh,
                                ray_intersect_culled, refit_bvh)


def make_tris(n_target):
    from psdr_tpu.shape import primitives
    import psdr_tpu.shape.mesh as meshmod
    subdiv = 0
    while 20 * 4 ** subdiv < n_target:
        subdiv += 1
    m = primitives.make_icosphere(subdiv=subdiv, radius=1.0)
    info, _ = meshmod.compute_triangle_info(
        jnp.asarray(m.vertices), jnp.asarray(m.faces), m.num_vertices)
    return (np.asarray(info.p0), np.asarray(info.e1), np.asarray(info.e2))


def bench(fn, args, iters=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    tri_counts = ([int(x) for x in sys.argv[2:]] if len(sys.argv) > 2
                  else [1280, 20480, 81920])

    # pinhole camera ray grid: coherent in lane (scanline) order, the layout
    # the renderer actually produces
    side = int(np.sqrt(n_rays))
    n_rays = side * side
    px, py = np.meshgrid(np.linspace(-0.55, 0.55, side, dtype=np.float32),
                         np.linspace(-0.55, 0.55, side, dtype=np.float32))
    d_np = np.stack([px.ravel(), py.ravel(),
                     np.full(n_rays, -1.0, np.float32)], axis=-1)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o_np = np.broadcast_to(np.array([0.0, 0.0, 3.0], np.float32),
                           (n_rays, 3)).copy()
    # tile the lanes: 32x32 pixel tiles so each ray block is a tight frustum
    ts = 32
    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    order = np.lexsort((xx.ravel() % ts, yy.ravel() % ts,
                        xx.ravel() // ts, yy.ravel() // ts))
    d_np = d_np[order]
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)

    for f_target in tri_counts:
        p0n, e1n, e2n = make_tris(f_target)
        f_real = p0n.shape[0]
        args = (jnp.asarray(p0n), jnp.asarray(e1n), jnp.asarray(e2n), o, d)

        t_brute, hb = bench(jax.jit(
            lambda p0, e1, e2, o, d: ray_intersect_brute(p0, e1, e2, o, d)),
            args)
        line = f"F={f_real:7d}  brute {n_rays/t_brute/1e6:8.2f} Mray/s"
        print(line, flush=True)

        topo = build_bvh_topology(p0n, e1n, e2n, leaf_size=4)
        for T, R in ((256, 1024), (512, 2048)):
            def fused(p0, e1, e2, o, d, topo=topo, T=T, R=R):
                bvh = refit_bvh(topo, p0, e1, e2)
                return ray_intersect_culled(bvh, o, d, tri_block=T,
                                            ray_block=R)

            t_c, hv = bench(jax.jit(fused), args)
            agree = float(np.mean(np.asarray(hb.tri_id) == np.asarray(hv.tri_id)))
            line += (f"   cull(T={T},R={R}) {n_rays/t_c/1e6:8.2f}"
                     f" agree={agree:.4f}")
            print(line, flush=True)

        from psdr_tpu.accel.pallas_kernel import (
            ray_intersect_pallas_culled, ray_intersect_pallas_culled2)

        def fused_pl(p0, e1, e2, o, d, topo=topo):
            bvh = refit_bvh(topo, p0, e1, e2)
            return ray_intersect_pallas_culled(bvh, o, d, tri_block=256,
                                               ray_block=1024)

        t_p, hp = bench(jax.jit(fused_pl), args)
        agree = float(np.mean(np.asarray(hb.tri_id) == np.asarray(hp.tri_id)))
        line += f"   pallas {n_rays/t_p/1e6:8.2f} agree={agree:.4f}"
        print(line, flush=True)

        for T, R in ((128, 512), (256, 1024)):
            def fused_p2(p0, e1, e2, o, d, topo=topo, T=T, R=R):
                bvh = refit_bvh(topo, p0, e1, e2)
                return ray_intersect_pallas_culled2(bvh, o, d, tri_block=T,
                                                    ray_block=R)

            t_p2, hp2 = bench(jax.jit(fused_p2), args)
            agree = float(np.mean(np.asarray(hb.tri_id)
                                  == np.asarray(hp2.tri_id)))
            line += (f"   pallas2(T={T},R={R}) {n_rays/t_p2/1e6:8.2f}"
                     f" agree={agree:.4f}")
            print(line, flush=True)

        def fused_any(p0, e1, e2, o, d, topo=topo):
            bvh = refit_bvh(topo, p0, e1, e2)
            return ray_intersect_pallas_culled2(bvh, o, d, tri_block=128,
                                                ray_block=512, any_hit=True)

        t_a, ha = bench(jax.jit(fused_any), args)
        agree = float(np.mean(np.asarray(hb.valid) == np.asarray(ha.valid)))
        line += f"   pallas2-any {n_rays/t_a/1e6:8.2f} agree={agree:.4f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
