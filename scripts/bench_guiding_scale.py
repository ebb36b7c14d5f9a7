"""Reference-scale secondary-edge guiding: build + variance check.

The reference's representative AD config builds its guiding hypercube at
resolution 40000x5x5 with 2 spp/cell x 16-32 rounds
(/root/reference/examples/config.py:21-40). The CPU test
(tests/test_reference_parity.py::test_guiding_reduces_secondary_edge_variance)
validates the mechanism at a scaled-down grid; this script runs the real
scale on the chip: builds the table, times the build, and measures the
boundary-gradient variance reduction it buys at sppse=reference levels.

Usage: python -u scripts/bench_guiding_scale.py > /tmp/guiding.log 2>&1
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dataclasses
    from psdr_tpu import DirectIntegrator
    from psdr_tpu.testing.differential import apply_perturbation
    from scenes import cbox_scene

    reso = (40000, 5, 5, 2)
    nrounds = 16
    sc = cbox_scene(width=64, height=64, spp=0, occluder_subdiv=3)
    sc.opts = dataclasses.replace(sc.opts, sppe=0, sppse=64)

    def boundary_grads(integ, n_seeds=4):
        render = integ.render_fn(sc, 0, with_boundary=True)
        base = sc.params()
        outs = []
        for s in range(n_seeds):
            key = jax.random.PRNGKey(100 + s)

            def f(P):
                p = jax.tree.map(lambda x: x, base)
                return render(apply_perturbation(
                    "vertex_transform", p, P, mesh_index=0, vertex_index=0,
                    direction=(-1.0, 0.0, 0.0)), key)

            outs.append(np.asarray(jax.jvp(f, (0.0,), (1.0,))[1]))
        return np.stack(outs)

    guided = DirectIntegrator(1, 1)
    t0 = time.perf_counter()
    guided.preprocess_secondary_edges(sc, 0, reso, nrounds)
    jax.block_until_ready(guided.warpper[0].distrb.cmf)
    t_build = time.perf_counter() - t0
    print(json.dumps({"stage": "build", "reso": reso, "nrounds": nrounds,
                      "seconds": t_build}), flush=True)

    g_guided = boundary_grads(guided)
    g_plain = boundary_grads(DirectIntegrator(1, 1))
    v_g = float(g_guided.var(axis=0).mean())
    v_p = float(g_plain.var(axis=0).mean())
    print(json.dumps({
        "metric": "guiding_variance_ratio",
        "value": v_g / max(v_p, 1e-30),
        "unit": "guided/plain boundary-grad variance (lower is better)",
        "v_guided": v_g, "v_plain": v_p,
        "build_seconds": t_build,
    }), flush=True)


if __name__ == "__main__":
    main()
