"""Decompose the bunny_env forward frame (the weakest reference scene:
14.0 Mrays/s vs tree's 36.5 — BASELINE.md round-3 table).

Round-3 side split per 16.7M-lane frame: base 0.44 s / bsdf side 1.45 s /
NEE side 1.70 s. These probes split each side's components at one 2M-lane
chunk of the REAL wavefront (bunny_env_2.xml camera hits, spp=64 lane
mapping):

  bsdf-sample    sample_bsdf on the camera hits
  bsdf-emfirst   the emitter-first bounce query (bounding-mesh sweep +
                 occlusion any-hit + recompute) — the envmap scene's
                 occlusion is ~100% active, not sparse
  bsdf-shade     envmap eval_direction + position_pdf MIS on the bounce
  nee-sample     envmap_sample_position (blocked-broadcast cmf search)
  nee-occl       the sorted shadow-ray any-hit sweep
  nee-shade      envmap eval + bsdf eval/pdf + MIS weights

One probe per child process (CLAUDE.md rule 7). The camera-hit inputs are
computed once on CPU (--setup) and shared via npz.
"""
import dataclasses
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

sg = jax.lax.stop_gradient

BASE = "/root/reference/examples/data/scenes"
WIDTH = HEIGHT = 512
SPP = 64
CHUNK = 1 << 21

_NPZ = "/tmp/env_parts_inputs.npz"
PROBES = ("bsdf-sample", "bsdf-emfirst", "bsdf-shade",
          "nee-sample", "nee-occl", "nee-shade")


def bench(fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def load_scene():
    from psdr_tpu.scene.loader import load_string
    with open(os.path.join(BASE, "bunny_env_2.xml")) as f:
        xml = f.read()
    xml = xml.replace("./data", BASE + "/..")
    xml = xml.replace("bunny/bunny.obj", "bunny/bunny_low.obj")
    sc = load_string(xml, base_dir=BASE)
    sc.opts = dataclasses.replace(sc.opts, width=WIDTH, height=HEIGHT,
                                  spp=SPP)
    sc.prepare_accel()
    return sc


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
        print(out[0] if out else f"{name:12s} FAILED\n{r.stdout[-300:]}"
              f"{r.stderr[-300:]}", flush=True)


def main():
    from psdr_tpu.core.records import Ray
    from psdr_tpu.core.sampler import RngStream
    from psdr_tpu.core.frame import to_world, to_local
    from psdr_tpu.integrator.base import tiled_pixel_order
    from psdr_tpu.integrator.direct import _mdiv, _emitter_meta
    from psdr_tpu.bsdf import eval_bsdf, pdf_bsdf, sample_bsdf
    from psdr_tpu.core.math import dot, sqr, squared_norm
    from psdr_tpu.emitter.envmap import (envmap_eval_direction,
                                         envmap_sample_position)
    from psdr_tpu.scene.scene import (ray_intersect,
                                      ray_intersect_emitter_first,
                                      emitter_position_pdf, ray_test)
    from psdr_tpu.sensor.perspective import sample_primary_ray

    scene = load_scene()
    params = scene.params()
    pix_order = jnp.asarray(tiled_pixel_order(WIDTH, HEIGHT))
    kinds = scene.bsdf_kinds
    emeta = _emitter_meta(scene)

    def gen(flat, key):
        lane = jnp.arange(CHUNK, dtype=jnp.int32)
        idx = pix_order[lane // SPP]
        base = jnp.stack([(idx % WIDTH).astype(jnp.float32),
                          (idx // WIDTH).astype(jnp.float32)], axis=-1)
        rng = RngStream(key, salt=0)
        samples = (base + rng.next_2d(CHUNK)) / jnp.array(
            [WIDTH, HEIGHT], jnp.float32)
        ray = sample_primary_ray(flat.sensors[0], samples)
        its = ray_intersect(flat, ray, jnp.ones(CHUNK, bool))
        return rng, its

    if "--setup" in sys.argv:
        @jax.jit
        def setup(key):
            flat = scene.build(params)
            rng, its = gen(flat, key)
            act = its.valid & (its.bsdf_id >= 0)
            bs = sample_bsdf(kinds, flat.bsdfs, its, rng.next_3d(CHUNK), act)
            d1 = to_world(its.sh_frame, bs.wo)
            return (its.p, its.t, its.uv, its.wi, its.tri_id, act,
                    bs.wo, bs.pdf, act & bs.valid, d1)

        out = setup(jax.random.PRNGKey(0))
        names = ("p", "t", "uv", "wi", "tri_id", "act",
                 "bwo", "bpdf", "act1", "d1")
        np.savez(_NPZ, **dict(zip(names, map(np.asarray, out))))
        print(f"lanes={CHUNK} active={float(np.asarray(out[5]).mean()):.3f} "
              f"bounce={float(np.asarray(out[8]).mean()):.3f}", flush=True)
        return

    data = np.load(_NPZ)
    p, t, uv, wi, tri_id, act, bwo, bpdf, act1, d1 = (
        jnp.asarray(data[k]) for k in
        ("p", "t", "uv", "wi", "tri_id", "act", "bwo", "bpdf", "act1", "d1"))
    name = sys.argv[1]

    # rebuild a minimal Intersection for shading probes
    def make_its(flat):
        from psdr_tpu.scene.scene import ray_intersect as _ri
        from psdr_tpu.accel.bruteforce import HitRecord
        hit = HitRecord(valid=act, tri_id=tri_id, uv=uv,
                        t=jnp.where(act, t, jnp.inf))
        # origin reconstructed as p - t*d is unnecessary: pass p as origin
        # with t=0-ish ray; recompute in path_space gives identical frames
        ray = Ray(p - d1 * 0.0, d1)  # placeholder; only frames/uv matter
        return _ri(flat, ray, act, path_space=True, hit=hit)

    if name == "bsdf-sample":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            its = make_its(flat)
            rng = RngStream(key, salt=3)
            bs = sample_bsdf(kinds, flat.bsdfs, its, rng.next_3d(CHUNK), act)
            return bs.wo.sum() + bs.pdf.sum()
    elif name == "bsdf-emfirst":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            its1 = ray_intersect_emitter_first(flat, Ray(p, d1), act1)
            return its1.p.sum() + its1.t.sum()
    elif name == "bsdf-shade":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            its = make_its(flat)
            its1 = ray_intersect_emitter_first(flat, Ray(p, d1), act1)
            a1 = act1 & its1.valid & its1.is_emitter()
            wo = _mdiv(its1.p - p, its1.t, a1)
            le = envmap_eval_direction(flat.envmap, wo, a1)
            pdf_nee = emitter_position_pdf(flat, emeta, p, its1, a1)
            bsdf_val = eval_bsdf(kinds, flat.bsdfs, its,
                                 to_local(its.sh_frame, wo), a1)
            return le.sum() + pdf_nee.sum() + bsdf_val.sum()
    elif name == "nee-sample":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            rng = RngStream(key, salt=4)
            from psdr_tpu.scene.scene import sample_emitter_position
            ps = sample_emitter_position(flat, scene.face_offset, emeta, p,
                                         rng.next_2d(CHUNK), act)
            return ps.p.sum() + ps.pdf.sum()
    elif name == "nee-occl":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            rng = RngStream(key, salt=4)
            from psdr_tpu.scene.scene import sample_emitter_position
            ps = sample_emitter_position(flat, scene.face_offset, emeta, p,
                                         rng.next_2d(CHUNK), act)
            a1 = act & ps.valid
            wo = ps.p - p
            dist = jnp.sqrt(jnp.maximum(squared_norm(wo), 1e-20))
            wo = wo / dist[..., None]
            occ = ray_test(flat, Ray(p, wo), dist, a1, sort_rays=True)
            return occ.sum()
    elif name == "nee-shade":
        @jax.jit
        def f(key):
            flat = scene.build(params)
            its = make_its(flat)
            rng = RngStream(key, salt=4)
            from psdr_tpu.scene.scene import sample_emitter_position
            ps = sample_emitter_position(flat, scene.face_offset, emeta, p,
                                         rng.next_2d(CHUNK), act)
            a1 = act & ps.valid
            wo = ps.p - p
            dist_sqr = squared_norm(wo)
            dist = jnp.sqrt(jnp.maximum(dist_sqr, 1e-20))
            wo = wo / dist[..., None]
            cos_val = dot(ps.n, -wo)
            le = envmap_eval_direction(flat.envmap, wo, a1)
            G_val = _mdiv(jnp.abs(cos_val), dist_sqr, a1)
            wo_local = to_local(its.sh_frame, wo)
            bsdf_val = eval_bsdf(kinds, flat.bsdfs, its, wo_local, a1)
            pdf1 = pdf_bsdf(kinds, flat.bsdfs, its, wo_local, a1) * sg(G_val)
            w = _mdiv(sqr(ps.pdf), sqr(ps.pdf) + sqr(pdf1), a1)
            return (le * bsdf_val).sum() + w.sum()
    else:
        raise SystemExit(f"unknown probe {name}")

    dt = bench(f, jax.random.PRNGKey(1))
    print(f"{name:12s} {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 1:
        orchestrate()
    else:
        main()
