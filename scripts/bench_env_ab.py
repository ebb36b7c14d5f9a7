"""Same-process interleaved A/Bs for the envmap NEE costs — the ONLY
noise-robust protocol through the tunnel (cross-process child probes vary
+-20% with tunnel load; bench_env_parts2's occl variants all landed inside
that band). Each A/B compiles its variants once, then alternates timed
iterations variant-by-variant so tunnel drift hits both equally.

  occl-ab     shadow-ray any-hit: plain vs front-to-back vs R2048
  search-ab   cmf search: packed [cmf|pmf] row vs separate pmf gather,
              at full reso and PSDR_TPU_ENV_RESO_DIV=4 (set via env).

Programs here are mid-size (sampling + sort + one kernel); rule-7 applies
to the 16.7M-lane full-frame class, and bench_p2_sweep precedent shows
many kernel variants chain fine in one process at this size.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

sg = jax.lax.stop_gradient

_NPZ = "/tmp/env_parts_inputs.npz"
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


def main():
    from psdr_tpu.core.records import Ray
    from psdr_tpu.core.sampler import RngStream
    from psdr_tpu.core.distribution import hypercube_sample_reuse
    from psdr_tpu.core.math import squared_norm
    from psdr_tpu.core.constants import ShadowEpsilon
    from psdr_tpu.emitter.envmap import envmap_sample_position
    from psdr_tpu.scene.scene import _octant_sort
    from psdr_tpu.accel.pallas_kernel import ray_intersect_pallas_culled2
    from scripts.bench_env_parts import load_scene

    which = sys.argv[1]
    scene = load_scene()
    params = scene.params()
    data = np.load(_NPZ)
    p = jnp.asarray(data["p"])
    act = jnp.asarray(data["act"])

    if which == "search-ab":
        def make(packed):
            def f(key):
                os.environ["PSDR_TPU_CMF_PACKED"] = packed
                flat = scene.build(params)
                rng = RngStream(key, salt=4)
                uv, pdf = hypercube_sample_reuse(flat.envmap.cell_distrb,
                                                 rng.next_2d(CHUNK))
                return uv.sum() + pdf.sum()
            # env var is read at trace time; bake it per-variant via jit
            return jax.jit(f)

        interleaved({"search-sep": make("0"), "search-packed": make("1")},
                    jax.random.PRNGKey(2))
    elif which == "hier-ab":
        # frozen-cmf blocked search vs hierarchical 2D warp, matched
        # reference-parity div=1 grid (the hier/alias default). Decision
        # metric for PSDR_TPU_ENV_HIER: hier costs 1.21x NEE variance
        # under QMC (CPU seeds A/B, round 5), so it must win the search
        # by more than that to be an equal-quality default.
        def make(hier):
            def f(key):
                os.environ["PSDR_TPU_ENV_HIER"] = hier
                os.environ["PSDR_TPU_ENV_RESO_DIV"] = "1"
                flat = scene.build(params)
                rng = RngStream(key, salt=4)
                uv, pdf = hypercube_sample_reuse(flat.envmap.cell_distrb,
                                                 rng.next_2d(CHUNK))
                return uv.sum() + pdf.sum()
            return jax.jit(f)

        interleaved({"search-cmf": make("0"), "search-hier": make("1")},
                    jax.random.PRNGKey(2))
    elif which == "occl-ab":
        def make(**kw):
            @jax.jit
            def f(key):
                flat = scene.build(params)
                rng = RngStream(key, salt=4)
                ps = envmap_sample_position(flat.envmap, p,
                                            rng.next_2d(CHUNK), act)
                a1 = act & ps.valid
                wo = ps.p - p
                dist = jnp.sqrt(jnp.maximum(squared_norm(wo), 1e-20))
                wo = wo / dist[..., None]
                ray = Ray(p, wo)
                tmax = sg(dist) - ShadowEpsilon
                perm, _ = _octant_sort(ray, a1, want_inv=False)
                packed = jnp.concatenate(
                    [sg(ray.o), sg(ray.d),
                     a1.astype(jnp.float32)[:, None],
                     sg(tmax)[:, None]], axis=1)[perm]
                hit = ray_intersect_pallas_culled2(
                    flat.accel, packed[:, 0:3], packed[:, 3:6],
                    packed[:, 6] > 0.5, tmax=packed[:, 7], any_hit=True,
                    sub_split=4, **kw)
                return hit.valid.sum()
            return f

        interleaved({
            "occl-plain": make(ray_block=1024, front_to_back=False),
            "occl-ftb": make(ray_block=1024, front_to_back=True),
            "occl-R2048": make(ray_block=2048, front_to_back=False),
        }, jax.random.PRNGKey(2))
    else:
        raise SystemExit(which)


if __name__ == "__main__":
    main()
