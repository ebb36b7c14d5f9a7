"""Forward throughput on the reference's own example scenes (BASELINE.md
protocol: "Benchmark scenes: ports of the reference's example scenes").

Loads the reference XMLs verbatim (asset paths rewritten to the read-only
checkout; bunny.obj is not committed upstream, so the bunny scenes use the
committed bunny_low.obj as the loader tests do), renders each at 512x512
with the scene's own integrator config, and prints one JSON line per scene
with rays/s/chip. Each scene runs in its own child process (CLAUDE.md
rule 7: one large TPU program per process).
"""
import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/reference/examples/data/scenes"
SCENES = ("cbox_bunny.xml", "cbox_bunny_mutiemitter.xml", "tree.xml",
          "bunny_env.xml", "bunny_env_2.xml")
SPP = 64


def child(name: str) -> None:
    import jax
    from psdr_tpu.scene.loader import load_string
    from psdr_tpu import DirectIntegrator

    with open(os.path.join(BASE, name)) as f:
        xml = f.read()
    xml = xml.replace("./data", BASE + "/..")
    xml = xml.replace("bunny/bunny.obj", "bunny/bunny_low.obj")
    sc = load_string(xml, base_dir=BASE)
    if name == "bunny_env.xml":
        # same missing-asset substitution: normalize bunny_low to a
        # unit-height bunny (the committed asset spans ~2300 world units;
        # the intended bunny.obj is unit-scale) so the XML's scale-40 /
        # translate(20,-50) lands a visible bunny in the fov-25 frustum
        import numpy as np
        for m in sc.meshes:
            if m.num_faces > 100:
                v = np.asarray(m.vertex_positions, np.float32)
                lo, hi = v.min(0), v.max(0)
                v = v / max(hi[1] - lo[1], 1e-6)
                lo, hi = v.min(0), v.max(0)
                v -= (lo + hi) / 2
                m.vertex_positions = v
    if name.startswith("cbox_bunny"):
        # bunny.obj is not committed upstream; raw bunny_low spans ~2300
        # world units under the XML's scale-35 transform and engulfs the
        # 200-unit box (renders black). Normalize the substitute asset:
        # unit-ish height, feet at y=0, centered in x/z — the scene then
        # renders a representative image instead of the inside of a mesh.
        import numpy as np
        for m in sc.meshes:
            if m.num_faces > 100:  # the bunny; walls/light are quads
                v = np.asarray(m.vertex_positions, np.float32)
                v = v * 0.03
                lo, hi = v.min(0), v.max(0)
                v[:, 0] -= (lo[0] + hi[0]) / 2
                v[:, 2] -= (lo[2] + hi[2]) / 2
                v[:, 1] -= lo[1]
                m.vertex_positions = v
    sc.opts = dataclasses.replace(sc.opts, width=512, height=512, spp=SPP)
    integ = DirectIntegrator(1, 1)
    # forward metric = a forward render: detached fast path, as bench.py
    render = jax.jit(integ.render_fn(sc, with_boundary=False,
                                     detached=True))
    params = sc.params()

    out = render(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    n_iter = 3
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = render(params, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    lanes = sc.opts.num_pixels * SPP
    rays = lanes * 3  # camera + 1 bsdf + 1 light trace per sample
    mean = float(out.mean())
    print(json.dumps({
        "scene": name, "rays_per_s": rays / dt,
        "seconds_per_frame": dt, "image_mean": mean,
        "n_faces": int(sum(m.num_faces for m in sc.meshes)),
    }), flush=True)


def main():
    for name in SCENES:
        try:
            r = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=3600)
        except subprocess.TimeoutExpired as e:  # keep going, keep output
            print(f"{name} TIMEOUT\n{(e.stdout or '')[-300:]}"
                  f"{(e.stderr or '')[-300:]}", flush=True)
            continue
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(out[0] if out else f"{name} FAILED\n{r.stdout[-300:]}"
              f"{r.stderr[-400:]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(sys.argv[1])
    else:
        main()
