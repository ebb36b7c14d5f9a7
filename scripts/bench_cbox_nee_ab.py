"""Same-process interleaved A/B of the cbox NEE shadow-ray occlusion
sweep (sub-Li-scale programs: emitter sampling + one any-hit kernel —
the only program class that co-resides through the tunnel; full-render
stages cannot, see bench_flag_ab.py).

Variants: plain unsorted (production default for area-light scenes),
sorted front-to-back (the envmap treatment), any-hit R=2048, sub_split 2.
Run --setup first (CPU) to build the camera-hit inputs.
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
WIDTH = HEIGHT = 512
SPP = 64
CHUNK = 1 << 21


def interleaved(fns: dict, key, iters=6, sacrifice=True):
    """Compile all variants, then time them in rotating rounds.

    The FIRST-compiled program in a tunnel process is penalized (~3-14x:
    its executable appears to be invalidated by subsequent compiles and
    pays a per-call re-upload — measured both orders, bench_cbox_nee_ab
    round 4), so a sacrificial duplicate of the first variant is compiled
    and run first and excluded from results; the timing rounds also
    rotate the variant order so residual position effects cancel."""
    names = list(fns)
    if sacrifice:
        jax.block_until_ready(fns[names[0]](jax.random.fold_in(key, 999)))
    for name in names:
        jax.block_until_ready(fns[name](key))
    tot = {n: 0.0 for n in names}
    for i in range(iters):
        order = names[i % len(names):] + names[:i % len(names)]
        for name in order:
            f = fns[name]
            t0 = time.perf_counter()
            jax.block_until_ready(f(jax.random.fold_in(key, i)))
            tot[name] += time.perf_counter() - t0
    for name in names:
        print(f"{name:18s} {tot[name]/iters*1e3:8.1f} ms", flush=True)


def build_scene():
    from tests.scenes import cbox_scene
    scene = cbox_scene(width=WIDTH, height=HEIGHT, spp=SPP,
                       occluder_subdiv=5)
    scene.prepare_accel()
    return scene


def setup():
    jax.config.update("jax_platforms", "cpu")
    from psdr_tpu.core.sampler import RngStream
    from psdr_tpu.integrator.base import tile_pos_to_pixel
    from psdr_tpu.scene.scene import ray_intersect
    from psdr_tpu.sensor.perspective import sample_primary_ray

    scene = build_scene()
    params = scene.params()
    # PSDR_NEE_CHUNK_OFF picks which pass chunk of the 16.7M-lane frame
    # the probe reproduces: 0 = top-left image region (ceiling-heavy,
    # side gates kill ~90% of NEE lanes), 3 = center (the occluder's
    # shadow region - representative of the shadowed floor)
    off = int(os.environ.get("PSDR_NEE_CHUNK_OFF", "0")) * CHUNK

    @jax.jit
    def f(key):
        flat = scene.build(params)
        lane = off + jnp.arange(CHUNK, dtype=jnp.int32)
        idx = tile_pos_to_pixel(lane // SPP, WIDTH, HEIGHT)
        base = jnp.stack([(idx % WIDTH).astype(jnp.float32),
                          (idx // WIDTH).astype(jnp.float32)], axis=-1)
        rng = RngStream(key, salt=0)
        samples = (base + rng.next_2d(CHUNK)) / jnp.array(
            [WIDTH, HEIGHT], jnp.float32)
        ray = sample_primary_ray(flat.sensors[0], samples)
        its = ray_intersect(flat, ray, jnp.ones(CHUNK, bool))
        return its.p, its.valid & (its.bsdf_id >= 0)

    p, act = f(jax.random.PRNGKey(0))
    np.savez(_NPZ, p=np.asarray(p), act=np.asarray(act))
    print(f"setup: lanes={CHUNK} active={float(np.asarray(act).mean()):.3f}",
          flush=True)


def main():
    from psdr_tpu.core.records import Ray
    from psdr_tpu.core.sampler import RngStream
    from psdr_tpu.core.constants import ShadowEpsilon
    from psdr_tpu.core.math import squared_norm
    from psdr_tpu.integrator.direct import _emitter_meta
    from psdr_tpu.scene.scene import (_octant_sort, sample_emitter_position)
    from psdr_tpu.accel.pallas_kernel import ray_intersect_pallas_culled2

    scene = build_scene()
    params = scene.params()
    emeta = _emitter_meta(scene)
    data = np.load(_NPZ)
    p = jnp.asarray(data["p"])
    act = jnp.asarray(data["act"])

    def make(sort, **kw):
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
            tmax = sg(dist) - ShadowEpsilon
            q_o, q_d, q_a, q_t = sg(p), wo, a1, tmax
            if sort:
                perm, _ = _octant_sort(Ray(p, wo), a1, want_inv=False)
                packed = jnp.concatenate(
                    [sg(p), wo, a1.astype(jnp.float32)[:, None],
                     tmax[:, None]], axis=1)[perm]
                q_o, q_d = packed[:, 0:3], packed[:, 3:6]
                q_a, q_t = packed[:, 6] > 0.5, packed[:, 7]
            hit = ray_intersect_pallas_culled2(
                flat.accel, q_o, q_d, q_a, tmax=q_t, any_hit=True, **kw)
            return hit.valid.sum()
        return f

    fns = {
        "plain-1024-ss4": make(False, ray_block=1024, sub_split=4),
        "plain-1024-ss2": make(False, ray_block=1024, sub_split=2),
        "plain-2048-ss4": make(False, ray_block=2048, sub_split=4),
        "sortftb-1024": make(True, ray_block=1024, sub_split=4,
                             front_to_back=True),
    }
    if "--reverse" in sys.argv:
        fns = dict(reversed(fns.items()))
    interleaved(fns, jax.random.PRNGKey(3))


if __name__ == "__main__":
    if "--setup" in sys.argv:
        setup()
    else:
        main()
