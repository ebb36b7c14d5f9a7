"""Bisect the backward-pass TPU InvalidArgument seen in bench.py after
switching the pallas dispatch to ray_block=1024 + sub_split.

Runs value_and_grad of a small render for each (sub_split closest, any-hit)
combination by monkeypatching the dispatch constants. Small res keeps
compiles short; the kernel's block shapes only depend on the geometry
(same 20k-tri occluder as bench.py), so a kernel-level fault reproduces.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import psdr_tpu.scene.scene as scene_mod
from psdr_tpu import DirectIntegrator
from psdr_tpu.accel.pallas_kernel import ray_intersect_pallas_culled2
from tests.scenes import cbox_scene


def run(tag, closest_g, anyhit_g, rb):
    real_kernel = ray_intersect_pallas_culled2

    def patched_kernel(bvh, o, d, active=None, tmax=None, any_hit=False,
                       **kw):
        kw.pop("ray_block", None)
        kw.pop("sub_split", None)
        return real_kernel(bvh, o, d, active, tmax=tmax, any_hit=any_hit,
                           ray_block=rb,
                           sub_split=anyhit_g if any_hit else closest_g)

    import psdr_tpu.accel.pallas_kernel as pk
    # patch at the import site used inside _closest_hit
    pk_backup = pk.ray_intersect_pallas_culled2
    pk.ray_intersect_pallas_culled2 = patched_kernel
    try:
        scene = cbox_scene(width=64, height=64, spp=4, occluder_subdiv=5)
        integ = DirectIntegrator(1, 1)
        render = integ.render_fn(scene, with_boundary=False)
        params = scene.params()
        target = jnp.zeros((64 * 64, 3), jnp.float32)

        @jax.jit
        def grad_step(p, key):
            def loss(q):
                img = render(q, key)
                return jnp.mean((img - target) ** 2)
            return jax.value_and_grad(loss)(p)

        val, g = grad_step(params, jax.random.PRNGKey(0))
        jax.block_until_ready(val)
        leaves = jax.tree.leaves(g)
        finite = all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
        print(f"{tag}: OK val={float(val):.5f} finite={finite}", flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
    finally:
        pk.ray_intersect_pallas_culled2 = pk_backup


def main():
    # committed round-1 behavior first (sanity), then the new dispatch
    run("G=1/1 R=512 ", 1, 1, 512)
    run("G=1/1 R=1024", 1, 1, 1024)
    run("G=2/1 R=1024", 2, 1, 1024)
    run("G=1/4 R=1024", 1, 4, 1024)
    run("G=2/4 R=1024", 2, 4, 1024)


if __name__ == "__main__":
    main()
