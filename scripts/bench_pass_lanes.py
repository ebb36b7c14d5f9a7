"""e2e forward A/B over RenderOptions.pass_lanes (one child per value —
e2e child protocol; frame times on the same scene repeat to ~0.1%, so
>=5% effects are resolvable). The 2^21 default dates from round 1 (a
16.7M-lane single pass OOMs on padded temporaries, and the backward
spills residuals per chunk); the detached renderC forward holds fewer
live values, so bigger passes may amortize per-chunk overhead.
"""
import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH = HEIGHT = 512
SPP = 64
VALUES = (1 << 21, 1 << 22, 1 << 23)


def child(pass_lanes: int) -> None:
    import jax
    from psdr_tpu import DirectIntegrator
    from tests.scenes import cbox_scene

    scene = cbox_scene(width=WIDTH, height=HEIGHT, spp=SPP,
                       occluder_subdiv=5)
    scene.opts = dataclasses.replace(scene.opts, pass_lanes=pass_lanes)
    integ = DirectIntegrator(1, 1)
    render = jax.jit(integ.render_fn(scene, with_boundary=False,
                                     detached=True))
    params = scene.params()
    out = render(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = render(params, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    rays = WIDTH * HEIGHT * SPP * 3
    print(json.dumps({"pass_lanes": pass_lanes, "seconds_per_frame": dt,
                      "rays_per_s": rays / dt}), flush=True)


def main():
    for v in VALUES:
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), str(v)],
            capture_output=True, text=True, timeout=3600)
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(out[0] if out else f"{v} FAILED\n{r.stdout[-200:]}"
              f"{r.stderr[-300:]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(int(sys.argv[1]))
    else:
        main()
