"""Decompose the backward bench (bench.py: value_and_grad of L2 through
scene build + interior render, 512x512 spp=16 = 4.2M lanes, auto-remat
=> residual spill mode).

  fwd-only     the same render WITHOUT grad (lower bound)
  fwd-resid    render under value_and_grad but grads w.r.t. nothing
               (jax.value_and_grad over a dummy scalar epsilon) — isolates
               residual-saving forward cost. Approximated as grad w.r.t.
               a single emitter radiance (tiny cotangent tree).
  grad-geom    grads w.r.t. vertex positions + transforms only
  grad-mat     grads w.r.t. bsdf bitmaps only
  grad-full    all params (the bench.py headline)

One probe per child process (CLAUDE.md rule 7).
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH = HEIGHT = 512
SPP = 16
PROBES = ("fwd-only", "fwd-resid", "grad-geom", "grad-mat", "grad-full")


def orchestrate():
    for name in PROBES:
        try:
            r = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=5400)
        except subprocess.TimeoutExpired as e:
            print(f"{name:10s} TIMEOUT", flush=True)
            continue
        out = [l for l in r.stdout.splitlines() if l.startswith(name)]
        print(out[0] if out else f"{name:10s} FAILED\n{r.stdout[-300:]}"
              f"{r.stderr[-300:]}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from psdr_tpu import DirectIntegrator
    from tests.scenes import cbox_scene

    name = sys.argv[1]
    scene = cbox_scene(width=WIDTH, height=HEIGHT, spp=SPP,
                       occluder_subdiv=5)
    integ = DirectIntegrator(1, 1)
    render = integ.render_fn(scene, with_boundary=False)
    params = scene.params()
    target = jnp.zeros((WIDTH * HEIGHT, 3), jnp.float32)

    def loss(p, key):
        img = render(p, key)
        return jnp.mean((img - target) ** 2)

    if name == "fwd-only":
        @jax.jit
        def step(p, key):
            return loss(p, key)
    elif name == "fwd-resid":
        @jax.jit
        def step(p, key):
            # tiny grad subset: one emitter radiance vector — forces the
            # full residual structure with a near-empty cotangent fan-in
            sub = p["emitters"][0]["radiance"]

            def f(r):
                q = jax.tree.map(lambda x: x, p)
                q["emitters"][0]["radiance"] = r
                return loss(q, key)
            return jax.value_and_grad(f)(sub)
    elif name in ("grad-geom", "grad-mat", "grad-full"):
        def split(p):
            if name == "grad-full":
                return p, {}
            geom = name == "grad-geom"
            diff, rest = {}, {}
            for group, entries in p.items():
                is_diff = (group == "meshes") == geom
                (diff if is_diff else rest)[group] = entries
            return diff, rest

        diff0, rest0 = split(params)

        @jax.jit
        def step(diff, key, rest=rest0):
            def f(d):
                return loss({**d, **rest}, key)
            return jax.value_and_grad(f)(diff)

        out = step(diff0, jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(3):
            out = step(diff0, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"{name:10s} {dt*1e3:8.1f} ms  "
              f"({WIDTH*HEIGHT*SPP/dt/1e6:5.2f} Mgrad-samples/s)", flush=True)
        return
    else:
        raise SystemExit(name)

    out = step(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = step(params, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name:10s} {dt*1e3:8.1f} ms  "
          f"({WIDTH*HEIGHT*SPP/dt/1e6:5.2f} Mgrad-samples/s)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 1:
        orchestrate()
    else:
        main()
