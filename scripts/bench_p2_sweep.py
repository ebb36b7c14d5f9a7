"""Sweep pallas_culled2 (T, R) tilings + any-hit on one geometry.

Usage: python scripts/bench_p2_sweep.py [n_rays] [n_tris]
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
    f_target = int(sys.argv[2]) if len(sys.argv) > 2 else 81920

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
    print(f"F={p0n.shape[0]} rays={n_rays}", flush=True)
    args = (jnp.asarray(p0n), jnp.asarray(e1n), jnp.asarray(e2n), o, d)
    topo = build_bvh_topology(p0n, e1n, e2n, leaf_size=4)

    ref_ids = None
    for T, R, G in ((128, 1024, 1), (128, 1024, 2), (128, 1024, 4),
                    (128, 512, 4)):
        def fused(p0, e1, e2, o, d, topo=topo, T=T, R=R, G=G):
            bvh = refit_bvh(topo, p0, e1, e2)
            return ray_intersect_pallas_culled2(bvh, o, d, tri_block=T,
                                                ray_block=R, sub_split=G)

        t_p, hp = bench(jax.jit(fused), args)
        ids = np.asarray(hp.tri_id)
        if ref_ids is None:
            ref_ids = ids
        agree = float(np.mean(ids == ref_ids))
        print(f"pallas2(T={T},R={R},G={G}) {n_rays/t_p/1e6:8.2f} Mray/s"
              f" agree={agree:.4f}", flush=True)

    for T, R, G in ((128, 1024, 1), (128, 1024, 4)):
        def fused_any(p0, e1, e2, o, d, topo=topo, T=T, R=R, G=G):
            bvh = refit_bvh(topo, p0, e1, e2)
            return ray_intersect_pallas_culled2(bvh, o, d, tri_block=T,
                                                ray_block=R, any_hit=True,
                                                sub_split=G)

        t_a, ha = bench(jax.jit(fused_any), args)
        agree = float(np.mean(np.asarray(ha.valid) == (ref_ids >= 0)))
        print(f"pallas2-any(T={T},R={R},G={G}) {n_rays/t_a/1e6:8.2f} Mray/s"
              f" agree={agree:.4f}", flush=True)

    return
    # occupancy counters at the production tiling -> roofline estimate
    T, R = 128, 2048
    def fused_dbg(p0, e1, e2, o, d, topo=topo):
        bvh = refit_bvh(topo, p0, e1, e2)
        return ray_intersect_pallas_culled2(bvh, o, d, tri_block=T,
                                            ray_block=R,
                                            debug_counters=True)

    (_, (tiles, cands)), = (jax.jit(fused_dbg)(*args),)
    tiles, cands = np.asarray(tiles), np.asarray(cands)
    total_tiles = float(tiles.sum())
    n_rblocks = tiles.shape[0]
    flop_per_tile = 60 * T * R   # ~60 f32 VPU ops per MT lane pair
    t_best, _ = bench(jax.jit(lambda *a: ray_intersect_pallas_culled2(
        refit_bvh(topo, a[0], a[1], a[2]), a[3], a[4],
        tri_block=T, ray_block=R)), args)
    print(f"counters: rblocks={n_rblocks} mean tiles/rb={tiles.mean():.1f} "
          f"mean cands/rb={cands.mean():.1f} refine-skip="
          f"{1 - tiles.sum()/max(cands.sum(), 1):.2%}", flush=True)
    print(f"roofline: {total_tiles:.0f} tiles, "
          f"{total_tiles * flop_per_tile / 1e9:.1f} GFLOP MT work in "
          f"{t_best*1e3:.1f} ms -> "
          f"{total_tiles * flop_per_tile / t_best / 1e12:.2f} TFLOP/s "
          f"realized (v5e VPU f32 peak ~3.7)", flush=True)


if __name__ == "__main__":
    main()
