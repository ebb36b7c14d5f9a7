"""e2e forward frame-time A/B for NEE visibility reuse (one variant per
child process; e2e childs repeat to 0.07% per BASELINE round-4 notes).

Usage: python scripts/bench_vr_e2e.py          (orchestrates children)
       python scripts/bench_vr_e2e.py <q>      (one child at reuse q)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def child(q: str) -> None:
    # "<mode>[:<q>[:<k_pen>]]"; bare floats keep the old bern meaning
    if ":" in q:
        parts = q.split(":")
        os.environ["PSDR_TPU_VIS_REUSE"] = parts[0]
        if len(parts) > 1 and parts[1] and parts[1] != "0":
            os.environ["PSDR_TPU_VIS_REUSE_Q"] = parts[1]
        if len(parts) > 2 and parts[2]:
            os.environ["PSDR_TPU_VIS_REUSE_KPEN"] = parts[2]
    elif q in ("off", "edge", "bern"):
        os.environ["PSDR_TPU_VIS_REUSE"] = q
    else:
        os.environ["PSDR_TPU_VIS_REUSE_Q"] = q
    import jax
    from psdr_tpu import DirectIntegrator
    from scenes import cbox_scene
    scene = cbox_scene(width=512, height=512, spp=64, occluder_subdiv=5)
    integ = DirectIntegrator(1, 1)
    render = jax.jit(integ.render_fn(scene, with_boundary=False,
                                     detached=True))
    params = scene.params()
    out = render(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    n_iter = 5
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = render(params, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    rays = 512 * 512 * 64 * 3
    print(json.dumps({"q": q, "seconds_per_frame": dt,
                      "rays_per_s": rays / dt,
                      "image_mean": float(out.mean())}), flush=True)


def main():
    variants = sys.argv[1:] if len(sys.argv) > 1 else (
        "off", "edge", "bern:0.0625")
    for q in variants:
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--child", q],
            capture_output=True, text=True, timeout=3600)
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(out[0] if out else f"q={q} FAILED\n{r.stdout[-300:]}"
              f"{r.stderr[-400:]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
    else:
        main()
