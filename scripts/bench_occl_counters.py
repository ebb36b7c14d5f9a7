"""Occupancy counters for the cbox NEE occlusion sweep (shaft-cull sizing).

Runs the production any-hit occlusion query (emitter sampling + side
gates + unsorted kernel, as DirectIntegrator.Li does on area-light
scenes) with the kernel's debug counters and reports, per ray block:
candidate blocks after the interval cull (cands/rb), MT tile-equivalents
actually executed (tiles/rb), and the total leaf-block count B. The gap
between cands/rb and tiles/rb is what the per-lane slab refine already
recovers; cands/rb >> needed means a tighter (shaft) cull could cut the
fixed per-candidate cost. Reuses bench_cbox_nee_ab's cached camera-hit
inputs (run that with --setup first).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

sg = jax.lax.stop_gradient

_NPZ = "/tmp/cbox_nee_inputs.npz"
CHUNK = 1 << 21


def main():
    from bench_cbox_nee_ab import build_scene
    from psdr_tpu.core.sampler import RngStream
    from psdr_tpu.core.constants import ShadowEpsilon
    from psdr_tpu.core.math import dot, squared_norm
    from psdr_tpu.core.frame import to_local
    from psdr_tpu.integrator.direct import _emitter_meta
    from psdr_tpu.scene.scene import sample_emitter_position
    from psdr_tpu.accel.pallas_kernel import ray_intersect_pallas_culled2

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    scene = build_scene()
    params = scene.params()
    emeta = _emitter_meta(scene)
    data = np.load(_NPZ)
    p = jnp.asarray(data["p"])
    act = jnp.asarray(data["act"])

    @jax.jit
    def f(key):
        flat = scene.build(params)
        rng = RngStream(key, salt=4)
        ps = sample_emitter_position(flat, scene.face_offset, emeta, p,
                                     rng.next_2d(CHUNK), act)
        a1 = act & ps.valid
        wo = ps.p - p
        dist = jnp.sqrt(jnp.maximum(squared_norm(wo), 1e-20))
        wo = wo / dist[..., None]
        # production side gate (zero-contribution lanes skip)
        a1 = a1 & (dot(ps.n, -wo) > 0.0)
        tmax = sg(dist) - ShadowEpsilon
        hit, (tiles, cands) = ray_intersect_pallas_culled2(
            flat.accel, sg(p), wo, a1, tmax=tmax, any_hit=True,
            ray_block=1024, sub_split=4, debug_counters=True)
        return (tiles.mean(), cands.mean(), tiles.max(), cands.max(),
                a1.mean(), hit.valid.sum())

    out = jax.block_until_ready(f(jax.random.PRNGKey(3)))
    n_blocks = max(1, scene.flat.accel.num_leaves * scene.flat.accel.leaf_size
                   // 128)
    print(f"tiles/rb mean={float(out[0]):.2f} max={float(out[2]):.0f}  "
          f"cands/rb mean={float(out[1]):.2f} max={float(out[3]):.0f}  "
          f"B={n_blocks}  active={float(out[4]):.3f}  "
          f"hits={int(out[5])}", flush=True)

    # timing of the same production query (counters off)
    @jax.jit
    def g(key):
        flat = scene.build(params)
        rng = RngStream(key, salt=4)
        ps = sample_emitter_position(flat, scene.face_offset, emeta, p,
                                     rng.next_2d(CHUNK), act)
        a1 = act & ps.valid
        wo = ps.p - p
        dist = jnp.sqrt(jnp.maximum(squared_norm(wo), 1e-20))
        wo = wo / dist[..., None]
        a1 = a1 & (dot(ps.n, -wo) > 0.0)
        tmax = sg(dist) - ShadowEpsilon
        hit = ray_intersect_pallas_culled2(
            flat.accel, sg(p), wo, a1, tmax=tmax, any_hit=True,
            ray_block=1024, sub_split=4)
        return hit.valid.sum()

    jax.block_until_ready(g(jax.random.PRNGKey(3)))
    t0 = time.perf_counter()
    for i in range(6):
        jax.block_until_ready(g(jax.random.fold_in(jax.random.PRNGKey(3), i)))
    dt = (time.perf_counter() - t0) / 6
    print(f"occl sweep {dt*1e3:.1f} ms/2M", flush=True)


if __name__ == "__main__":
    main()
