"""Decompose ray_intersect_emitter_first (the new bounce section costs
~2.2s/frame at 16.7M lanes; probes at 2M = one pass chunk).

  em-brute       closest hit vs the emitter face set alone
  occl-sorted    sparse any-hit occlusion, 64-bin sorted (production)
  occl-unsorted  same without the sort machinery
  recompute      differentiable path-space recompute given a hit
  emfirst-full   the full production query
  sample-bsdf    sample_bsdf alone on the camera hits

ONE large TPU program per process (CLAUDE.md rule 7; clear_caches alone
was not enough — the setup program + a kernel probe in one process still
died with INVALID_ARGUMENT): the parent computes the probe inputs on CPU
and saves them; each probe child loads them and runs exactly one program.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--setup" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from psdr_tpu.accel.bruteforce import ray_intersect_brute
from psdr_tpu.core.records import Ray
from psdr_tpu.core.sampler import RngStream
from psdr_tpu.core.frame import to_world
from psdr_tpu.integrator.base import tiled_pixel_order
from psdr_tpu.integrator.direct import sample_bsdf
from psdr_tpu.scene.scene import (ray_intersect, ray_intersect_emitter_first,
                                  ray_test)
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


_NPZ = "/tmp/emfirst_inputs.npz"
PROBES = ("em-brute", "occl-sorted", "occl-unsorted", "recompute",
          "emfirst-full", "cam+sample", "occl-machinery", "occl-kernel")


def orchestrate():
    r = subprocess.run(
        [sys.executable, "-u", os.path.abspath(__file__), "--setup"],
        capture_output=True, text=True, timeout=3600)
    print(r.stdout.strip() or r.stderr[-300:], flush=True)
    for name in PROBES:
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=3600)
        out = [l for l in r.stdout.splitlines() if l.startswith(name)]
        print(out[0] if out else f"{name:14s} FAILED\n{r.stdout[-300:]}"
              f"{r.stderr[-300:]}", flush=True)


def main():
    width = height = 512
    spp = 8
    scene = cbox_scene(width=width, height=height, spp=spp,
                       occluder_subdiv=5)
    scene.prepare_accel()
    params = scene.params()
    n = width * height * spp
    pix_order = jnp.asarray(tiled_pixel_order(width, height))

    def gen(flat, key):
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
        return its, bs

    if "--setup" in sys.argv:  # CPU child: compute probe inputs once
        @jax.jit
        def setup(key):
            flat = scene.build(params)
            its, bs = gen(flat, key)
            act = its.valid & bs.valid
            o = sg(its.p)
            d = sg(to_world(its.sh_frame, bs.wo))
            idxs = flat.em_tri_idx
            hit_e = ray_intersect_brute(flat.tri.p0[idxs], flat.tri.e1[idxs],
                                        flat.tri.e2[idxs], o, d, act)
            return (o, d, act, hit_e.valid & act,
                    jnp.where(hit_e.valid, hit_e.t, 0.0))

        o, d, act, valid_e, t_e = setup(jax.random.PRNGKey(0))
        np.savez(_NPZ, o=o, d=d, act=act, valid_e=valid_e, t_e=t_e)
        print(f"lanes={n} active={float(act.mean()):.3f} "
              f"emitter-pointing={float(valid_e.mean()):.3f}", flush=True)
        return

    data = np.load(_NPZ) if os.path.exists(_NPZ) else None
    if data is not None:
        o, d, act, valid_e, t_e = (jnp.asarray(data[k]) for k in
                                   ("o", "d", "act", "valid_e", "t_e"))

    @jax.jit
    def p_brute(o, d, act):
        flat = scene.build(params)
        idxs = flat.em_tri_idx
        h = ray_intersect_brute(flat.tri.p0[idxs], flat.tri.e1[idxs],
                                flat.tri.e2[idxs], o, d, act)
        return h.t.sum() + h.tri_id.sum()

    @jax.jit
    def p_occl_sorted(o, d, valid_e, t_e):
        flat = scene.build(params)
        return ray_test(flat, Ray(o, d), t_e, valid_e, sort_rays=True).sum()

    @jax.jit
    def p_occl_sparse(o, d, valid_e, t_e):
        flat = scene.build(params)
        return ray_test(flat, Ray(o, d), t_e, valid_e, sort_rays=True,
                        sparse=True).sum()

    @jax.jit
    def p_occl_unsorted(o, d, valid_e, t_e):
        flat = scene.build(params)
        return ray_test(flat, Ray(o, d), t_e, valid_e, sort_rays=False).sum()

    @jax.jit
    def p_recompute(o, d, act, valid_e, t_e):
        flat = scene.build(params)
        idxs = flat.em_tri_idx
        h = ray_intersect_brute(flat.tri.p0[idxs], flat.tri.e1[idxs],
                                flat.tri.e2[idxs], o, d, act)
        hit = h._replace(valid=valid_e,
                         tri_id=jnp.where(valid_e,
                                          idxs[jnp.maximum(h.tri_id, 0)], -1),
                         t=jnp.where(valid_e, h.t, jnp.inf))
        its = ray_intersect(flat, Ray(o, d), act, path_space=True, hit=hit)
        return its.p.sum() + its.t.sum() + its.J.sum()

    @jax.jit
    def p_emfirst(o, d, act):
        flat = scene.build(params)
        its = ray_intersect_emitter_first(flat, Ray(o, d), act)
        return its.p.sum() + its.t.sum() + its.J.sum()

    @jax.jit
    def p_sample(key):
        flat = scene.build(params)
        its, bs = gen(flat, key)
        return bs.wo.sum() + bs.pdf.sum()

    @jax.jit
    def p_occl_machinery(o, d, valid_e, t_e):
        """The occl-sorted path minus the kernel: octant sort keys + packed
        permute row gather + the result scatter — bounds the non-kernel
        share of the 51ms occlusion sweep."""
        from psdr_tpu.scene.scene import _octant_sort
        flat = scene.build(params)
        tmax = sg(t_e)
        ray2 = Ray(o, d)
        perm, _ = _octant_sort(ray2, valid_e, want_inv=False)
        packed = jnp.concatenate(
            [sg(o), sg(d), valid_e.astype(jnp.float32)[:, None],
             tmax[:, None]], axis=1)[perm]
        fake_valid = packed[:, 6] > 0.5
        return jnp.zeros(perm.shape, bool).at[perm].set(fake_valid).sum()

    @jax.jit
    def p_occl_kernel(o, d, valid_e, t_e):
        """The culled2 any-hit kernel alone on unsorted lanes (sparse
        actives in place): kernel share without permute machinery."""
        from psdr_tpu.accel.pallas_kernel import ray_intersect_pallas_culled2
        flat = scene.build(params)
        hit = ray_intersect_pallas_culled2(
            flat.accel, sg(o), sg(d), valid_e, tmax=sg(t_e), any_hit=True,
            ray_block=1024, sub_split=4, front_to_back=False)
        return hit.valid.sum()

    probes = {
        "em-brute": (p_brute, (o, d, act)),
        "occl-sorted": (p_occl_sorted, (o, d, valid_e, t_e)),
        "occl-unsorted": (p_occl_unsorted, (o, d, valid_e, t_e)),
        "recompute": (p_recompute, (o, d, act, valid_e, t_e)),
        "emfirst-full": (p_emfirst, (o, d, act)),
        "cam+sample": (p_sample, (jax.random.PRNGKey(1),)),
        "occl-machinery": (p_occl_machinery, (o, d, valid_e, t_e)),
        "occl-kernel": (p_occl_kernel, (o, d, valid_e, t_e)),
        "occl-sparse": (p_occl_sparse, (o, d, valid_e, t_e)),
    }
    which = [a for a in sys.argv[1:] if a in probes]
    fn, args = probes[which[0]]
    dt = bench(fn, *args)
    print(f"{which[0]:14s} {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 1:
        orchestrate()
    else:
        main()
