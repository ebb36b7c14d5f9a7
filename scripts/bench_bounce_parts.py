"""Decompose the bounce-pass cost (bench_e2e_stages 'bounce' - 'cam').

The e2e forward spends ~3.7s/frame on the bounce machinery at 16.7M lanes
(r2 stage bench). Each probe here is a small (2M-lane = one pass_lanes
chunk) standalone jit, so programs chain safely through the axon tunnel.

Probes:
  bsdf-sample    cosine-hemisphere BSDF sampling alone
  sort-perm      octant-sort permutation build (segmented argsort)
  sort-gathers   o/d/act forward gathers + 5-field hit inverse gathers
  kern-sorted    culled2 kernel on octant-sorted bounce rays
  kern-unsorted  culled2 kernel on raw bounce rays
  kern-ftb       culled2 kernel, front_to_back=True, sorted rays
  kern-bins64    kernel on rays sorted by 64 direction bins / 32k segments
  isect-full     production ray_intersect(path_space, sort_rays) end-to-end
The differentiable recompute cost ~= isect-full - sort-perm - sort-gathers
- kern-sorted.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from psdr_tpu import DirectIntegrator
from psdr_tpu.accel.pallas_kernel import ray_intersect_pallas_culled2
from psdr_tpu.core.records import Ray
from psdr_tpu.core.sampler import RngStream
from psdr_tpu.core.frame import to_world
from psdr_tpu.integrator.base import tiled_pixel_order
from psdr_tpu.integrator.direct import sample_bsdf
from psdr_tpu.scene.scene import _octant_sort, ray_intersect
from psdr_tpu.sensor.perspective import sample_primary_ray
from tests.scenes import cbox_scene

sg = jax.lax.stop_gradient


def bench(fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    width = height = 512
    spp = 8                       # 512*512*8 = 2M lanes = one pass chunk
    scene = cbox_scene(width=width, height=height, spp=spp,
                       occluder_subdiv=5)
    scene.prepare_accel()
    params = scene.params()
    n = width * height * spp
    pix_order = jnp.asarray(tiled_pixel_order(width, height))

    def gen_rays(flat, key):
        lane = jnp.arange(n, dtype=jnp.int32)
        idx = pix_order[lane // spp]
        base = jnp.stack([(idx % width).astype(jnp.float32),
                          (idx // width).astype(jnp.float32)], axis=-1)
        rng = RngStream(key, salt=0)
        samples = (base + rng.next_2d(n)) / jnp.array(
            [width, height], jnp.float32)
        ray = sample_primary_ray(flat.sensors[0], samples)
        its = ray_intersect(flat, ray, jnp.ones(n, bool))
        bs = sample_bsdf(scene.bsdf_kinds, flat.bsdfs, its,
                         rng.next_3d(n), its.valid)
        act = its.valid & bs.valid
        return (sg(its.p), sg(to_world(its.sh_frame, bs.wo)), act)

    @jax.jit
    def setup(key):
        return gen_rays(scene.build(params), key)

    o, d, act = setup(jax.random.PRNGKey(0))
    jax.block_until_ready(o)
    print(f"lanes={n} active={float(act.mean()):.3f}", flush=True)

    @jax.jit
    def p_bsdf(key):
        o2, d2, _ = gen_rays(scene.build(params), key)
        return o2.sum() + d2.sum()

    @jax.jit
    def p_sortperm(o, d, act):
        perm, inv = _octant_sort(Ray(o, d), act)
        return perm.sum() + inv.sum()

    perm, inv = jax.jit(lambda o, d, act:
                        _octant_sort(Ray(o, d), act))(o, d, act)
    jax.block_until_ready(perm)

    @jax.jit
    def kern(o, d, act):
        bvh = scene.build(params).accel
        return ray_intersect_pallas_culled2(bvh, o, d, act, ray_block=1024,
                                            sub_split=2)

    hit = kern(o[perm], d[perm], act[perm])
    jax.block_until_ready(hit.t)

    @jax.jit
    def p_gathers(o, d, act, perm, inv, hit):
        qo, qd, qa = o[perm], d[perm], act[perm]
        back = jax.tree.map(lambda a: a[inv], hit)
        return (qo.sum() + qd.sum() + qa.sum()
                + back.t.sum() + back.tri_id.sum() + back.valid.sum()
                + back.uv.sum())

    @jax.jit
    def p_kern_sorted(o, d, act, perm):
        h = kern(o[perm], d[perm], act[perm])
        return h.t.sum() + h.tri_id.sum()

    @jax.jit
    def p_kern_unsorted(o, d, act):
        h = kern(o, d, act)
        return h.t.sum() + h.tri_id.sum()

    @jax.jit
    def p_kern_ftb(o, d, act, perm):
        bvh = scene.build(params).accel
        h = ray_intersect_pallas_culled2(bvh, o[perm], d[perm], act[perm],
                                         ray_block=1024, sub_split=2,
                                         front_to_back=True)
        return h.t.sum() + h.tri_id.sum()

    def bin_sort(d, seg, key_fn):
        nn = d.shape[0]
        keys = key_fn(d).reshape(nn // seg, seg)
        local = jnp.argsort(keys, axis=1, stable=True).astype(jnp.int32)
        base = (jnp.arange(nn // seg, dtype=jnp.int32) * seg)[:, None]
        return (local + base).reshape(nn)

    def key64(d):
        q = jnp.clip(((d + 1.0) * 2.0).astype(jnp.int32), 0, 3)
        return q[:, 0] * 16 + q[:, 1] * 4 + q[:, 2]

    @jax.jit
    def p_kern_bins64(o, d, act):
        perm = bin_sort(sg(d), 1 << 15, key64)
        h = kern(o[perm], d[perm], act[perm])
        return h.t.sum() + h.tri_id.sum()

    @jax.jit
    def p_isect_full(o, d, act):
        flat = scene.build(params)
        its = ray_intersect(flat, Ray(o, d), act, path_space=True,
                            sort_rays=True)
        return its.p.sum() + its.t.sum() + its.J.sum()

    for name, fn, args in [
        ("bsdf-sample", p_bsdf, (jax.random.PRNGKey(1),)),
        ("sort-perm", p_sortperm, (o, d, act)),
        ("sort-gathers", p_gathers, (o, d, act, perm, inv, hit)),
        ("kern-sorted", p_kern_sorted, (o, d, act, perm)),
        ("kern-unsorted", p_kern_unsorted, (o, d, act)),
        ("kern-ftb", p_kern_ftb, (o, d, act, perm)),
        ("kern-bins64", p_kern_bins64, (o, d, act)),
        ("isect-full", p_isect_full, (o, d, act)),
    ]:
        try:
            dt = bench(fn, *args)
            print(f"{name:13s} {dt*1e3:8.1f} ms  "
                  f"({n/dt/1e6:6.2f} Mlanes/s)", flush=True)
        except Exception as e:  # keep probing past one failure
            print(f"{name:13s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
