"""A/B RenderOptions.remat_passes on the bench.py backward config.

Each arm runs in its own child process (one large TPU program per
process, CLAUDE.md rules 1/7). Prints seconds per value_and_grad step.
"""
import dataclasses
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH = HEIGHT = int(os.environ.get("PSDR_BENCH_RES", 512))
SPP = int(os.environ.get("PSDR_BENCH_SPP", 16))


def child(remat: bool) -> None:
    import jax
    import jax.numpy as jnp
    from psdr_tpu import DirectIntegrator
    from tests.scenes import cbox_scene

    scene = cbox_scene(width=WIDTH, height=HEIGHT, spp=SPP,
                      occluder_subdiv=5)
    scene.opts = dataclasses.replace(scene.opts, remat_passes=remat)
    integ = DirectIntegrator(1, 1)
    render = integ.render_fn(scene, with_boundary=False)
    params = scene.params()
    target = jnp.zeros((WIDTH * HEIGHT, 3), jnp.float32)

    @jax.jit
    def grad_step(p, key):
        def loss(q):
            return jnp.mean((render(q, key) - target) ** 2)
        return jax.value_and_grad(loss)(p)

    out = grad_step(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = grad_step(params, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"remat={remat}  {dt*1e3:9.1f} ms/step "
          f"({WIDTH*HEIGHT*SPP/dt/1e6:.2f} Mgrad-samples/s)", flush=True)


def main():
    if len(sys.argv) > 1:
        child(sys.argv[1] == "on")
        return
    for arm in ("on", "off"):
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), arm],
            capture_output=True, text=True, timeout=5400)
        out = [l for l in r.stdout.splitlines() if l.startswith("remat=")]
        print(out[0] if out else f"{arm} FAILED\n{r.stdout[-300:]}"
              f"{r.stderr[-400:]}", flush=True)


if __name__ == "__main__":
    main()
