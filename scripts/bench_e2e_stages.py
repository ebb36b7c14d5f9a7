"""Decompose the e2e forward bench (bench.py config) into stage costs.

Five variants of the flagship Direct render, cumulative in work:
  cam      camera rays + closest-hit intersect + emitter lookup only
  bounce   + bsdf sampling + octant-sorted bounce intersect (no shading)
  bsdf     DirectIntegrator(1,0): full bsdf-side estimator, no NEE
  nee      DirectIntegrator(0,1): NEE only (intersect + ray_test + shading)
  full     DirectIntegrator(1,1): the bench.py headline config

The deltas localize where forward time goes (kernel vs shading vs sort vs
film scatter). Each large variant runs in its own child process: through
the axon tunnel the second large program in one process dies with a
server-side INVALID_ARGUMENT (CLAUDE.md rule 7); small micro-probes can
chain freely and stay in the parent.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from psdr_tpu import DirectIntegrator
from psdr_tpu.integrator.direct import sample_bsdf
from psdr_tpu.scene.scene import ray_intersect, scene_le
from psdr_tpu.core.records import Ray
from psdr_tpu.core.frame import to_world
from tests.scenes import cbox_scene


class CamOnly(DirectIntegrator):
    def Li(self, scene, flat, rng, ray, active):
        its = ray_intersect(flat, ray, active)
        active = active & its.valid
        return scene_le(flat, its, active)


class BouncePlumb(DirectIntegrator):
    def Li(self, scene, flat, rng, ray, active):
        its = ray_intersect(flat, ray, active)
        active = active & its.valid
        n = ray.o.shape[0]
        bs = sample_bsdf(scene.bsdf_kinds, flat.bsdfs, its,
                         rng.next_3d(n), active)
        active1 = active & bs.valid
        ray1 = Ray(its.p, to_world(its.sh_frame, bs.wo))
        its1 = ray_intersect(flat, ray1, active1, path_space=True,
                             sort_rays=True)
        # depend on the bounce hit so nothing is DCE'd
        return (scene_le(flat, its, active)
                + jnp.where((active1 & its1.valid)[..., None],
                            its1.t[..., None] * 1e-6, 0.0))


def bench(step, args_fn, n_iter=3):
    out = step(*args_fn(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(*args_fn(i + 1))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


VARIANTS = ["cam", "bounce", "bsdf", "nee", "full", "full-rbg"]


def _run_variant(name: str) -> None:
    """Child: compile+time one large render program, print one line."""
    width = height = 512
    spp = 64
    scene = cbox_scene(width=width, height=height, spp=spp,
                       occluder_subdiv=5)
    params = scene.params()
    lanes = width * height * spp
    integ = {
        "cam": CamOnly(1, 1),
        "bounce": BouncePlumb(1, 1),
        "bsdf": DirectIntegrator(1, 0),
        "nee": DirectIntegrator(0, 1),
        "full": DirectIntegrator(1, 1),
        "full-rbg": DirectIntegrator(1, 1),
    }[name]
    render = jax.jit(integ.render_fn(scene, with_boundary=False))
    if name == "full-rbg":
        args_fn = lambda i: (params, jax.random.key(i, impl="rbg"))
    else:
        args_fn = lambda i: (params, jax.random.PRNGKey(i))
    dt = bench(render, args_fn)
    print(f"{name:8s} {dt*1e3:9.1f} ms  "
          f"({lanes/dt/1e6:6.2f} Msamples/s)", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] in VARIANTS:
        _run_variant(sys.argv[1])
        return

    width = height = 512
    spp = 64
    scene = cbox_scene(width=width, height=height, spp=spp,
                       occluder_subdiv=5)
    params = scene.params()
    lanes = width * height * spp

    # micro-probes: the non-render costs (RNG generation, film scatter)
    from psdr_tpu.integrator.base import (accumulate_image, scan_lane_chunks,
                                          tiled_pixel_order)
    from psdr_tpu.core.sampler import RngStream
    num_pixels = width * height
    pass_lanes = scene.opts.pass_lanes
    pix_order = jnp.asarray(tiled_pixel_order(width, height))

    def make_rng_probe(impl):
        def rng_probe(key):
            def run(lane, key_c):
                rng = RngStream(key_c, salt=0)
                m = lane.shape[0]
                s = (rng.next_2d(m).sum(-1) + rng.next_3d(m).sum(-1)
                     + rng.next_2d(m).sum(-1))
                return jnp.zeros((num_pixels, 3)).at[0, 0].add(s.sum())
            return scan_lane_chunks(run, lanes, num_pixels, key, pass_lanes)
        return rng_probe, (lambda i: (jax.random.key(i, impl=impl),))

    def film_probe(key):
        def run(lane, key_c):
            idx = pix_order[lane // spp]
            val = jax.random.uniform(key_c, (lane.shape[0], 3))
            return accumulate_image(val, idx, num_pixels)
        return scan_lane_chunks(run, lanes, num_pixels, key, pass_lanes)

    if "--probes" in sys.argv:  # measured r2: threefry 0.3ms, rbg 1.3ms,
        for name, fn, args_fn in [  # film-scatter 408ms (dense path: 0)
            ("rng-threefry", *make_rng_probe("threefry2x32")),
            ("rng-rbg", *make_rng_probe("rbg")),
            ("film-scatter", film_probe,
             lambda i: (jax.random.PRNGKey(i),)),
        ]:
            dt = bench(jax.jit(fn), args_fn)
            print(f"{name:12s} {dt*1e3:9.1f} ms", flush=True)

    # one child per large program, sequential (one TPU process at a time)
    for name in VARIANTS:
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=3600)
        out = [l for l in r.stdout.splitlines() if l.startswith(name)]
        print(out[0] if out else f"{name:8s} FAILED\n{r.stdout[-500:]}"
              f"{r.stderr[-500:]}", flush=True)


if __name__ == "__main__":
    main()
