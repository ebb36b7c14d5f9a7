"""Flagship inverse-rendering recovery at benchmark scale.

Multiview VERTEX recovery on the flagship cbox scene (20k-triangle
occluder, the bench.py geometry): the occluder is deformed by a smooth
bump plus a rigid shift, and masked Adam on the raw ``vertex_positions``
recovers the original shape from 3 rendered views through the FULL
differentiable pipeline — interior + primary-edge + secondary-edge
boundary estimators (the silhouette/shadow motion is most of the
signal). Reference analog: docs/inverse_diff_render.rst:37-79's loop at
its intended scale, not test scale.

Checkpoints every 10 iterations (psdr_tpu.opt save/load), appends one
JSON line per iteration to ``out/flagship_recovery_log.jsonl`` (loss,
vertex RMSE vs ground truth, wall-clock) and writes the recovered mesh
to ``out/recovered_occluder.obj``. docs/inverse_rendering.md quotes a
measured run.

Usage:
    python examples/flagship_recovery.py [iters] [--small]
``--small`` shrinks everything for a CPU smoke run (tests use it).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from psdr_tpu import DirectIntegrator, PerspectiveCamera
from psdr_tpu.core import transform as xf
from scenes import cbox_scene


def save_ckpt(path, params, opt_state):
    """Checkpoint params + optimizer state (psdr_tpu.opt.save pattern)."""
    leaves, _ = jax.tree.flatten((params, opt_state))
    np.savez(path, n=len(leaves),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_ckpt(path, params, opt_state):
    data = np.load(path)
    leaves, treedef = jax.tree.flatten((params, opt_state))
    assert int(data["n"]) == len(leaves), "checkpoint structure mismatch"
    return jax.tree.unflatten(
        treedef, [data[f"leaf_{i}"] for i in range(len(leaves))])

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "out")
OCCLUDER = 5  # mesh index in cbox_scene


def build_scene(small: bool):
    if small:
        sc = cbox_scene(width=48, height=48, spp=8, occluder_subdiv=2)
        sc.opts = dataclasses.replace(sc.opts, sppe=2, sppse=16)
    else:
        sc = cbox_scene(width=256, height=256, spp=16, occluder_subdiv=5)
        sc.opts = dataclasses.replace(sc.opts, sppe=4, sppse=32)
    # two extra views: the box is open toward +z, so keep cameras on that
    # side but displaced — silhouettes move differently per view, which
    # is what makes vertex recovery well-posed
    for eye in ([1.2, 0.7, 3.3], [-1.1, -0.6, 3.3]):
        cam = PerspectiveCamera(fov_x=39.0, near=0.01, far=100.0)
        cam.set_transform(np.asarray(
            xf.look_at(eye, [0, 0, 0], [0, 1, 0])))
        sc.add_sensor(cam)
    return sc


def deform(v):
    """Smooth bump + rigid shift applied to ground-truth vertices."""
    v = jnp.asarray(v)
    c = jnp.array([0.25, 0.0, 0.1], jnp.float32)
    r2 = jnp.sum((v - c) ** 2, axis=1, keepdims=True)
    bump = 0.12 * jnp.exp(-r2 / 0.05) * (v - c) / jnp.sqrt(
        jnp.maximum(r2, 1e-8))
    return v + bump + jnp.array([0.06, -0.04, 0.03], jnp.float32)


def main():
    iters = 60
    small = "--small" in sys.argv
    for a in sys.argv[1:]:
        if a.isdigit():
            iters = int(a)

    os.makedirs(OUT, exist_ok=True)
    log_path = os.path.join(OUT, "flagship_recovery_log.jsonl")
    ckpt_path = os.path.join(OUT, "flagship_recovery_ckpt.npz")

    sc = build_scene(small)
    integ = DirectIntegrator(1, 1)
    sc.prepare_accel()
    truth = sc.params()
    v_true = jnp.asarray(truth["meshes"][OCCLUDER]["vertex_positions"])

    # target images at ground truth, one per view (independent noise);
    # rendered in a CHILD process: the target programs + the train-step
    # program cannot co-reside through the TPU tunnel (CLAUDE.md rule 7 —
    # the flagship run hit INVALID_ARGUMENT at iteration 2 with them
    # in-process; each child runs ONE large program class and exits)
    t_build0 = time.perf_counter()
    if "--targets-child" in sys.argv:
        s = int(sys.argv[sys.argv.index("--targets-child") + 1])
        img = np.asarray(jax.jit(integ.render_fn(
            sc, s, with_boundary=False, detached=True))(
                truth, jax.random.PRNGKey(1000 + s)))
        np.savez(os.path.join(OUT, f"flagship_recovery_target{s}.npz"),
                 img=img)
        print("target written", flush=True)
        return
    import subprocess
    targets = []
    for s in range(sc.num_sensors):
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--targets-child", str(s)]
            + [a for a in sys.argv[1:]],
            capture_output=True, text=True, timeout=7200)
        assert "target written" in r.stdout, \
            r.stdout[-500:] + r.stderr[-800:]
        targets.append(np.load(os.path.join(
            OUT, f"flagship_recovery_target{s}.npz"))["img"])
    t_targets = time.perf_counter() - t_build0

    # start from the deformed shape
    start = jax.tree.map(lambda x: x, truth)
    start["meshes"] = list(start["meshes"])
    start["meshes"][OCCLUDER] = dict(start["meshes"][OCCLUDER])
    start["meshes"][OCCLUDER]["vertex_positions"] = deform(v_true)

    renders = [integ.render_fn(sc, s, with_boundary=True)
               for s in range(sc.num_sensors)]
    tgt = [jnp.asarray(t) for t in targets]

    def loss_fn(params, key):
        l = 0.0
        for s, render in enumerate(renders):
            img = render(params, jax.random.fold_in(key, s))
            l = l + jnp.mean((img - tgt[s]) ** 2)
        return l / len(renders)

    # Laplacian gradient smoothing (uniform weights over mesh edges):
    # raw per-vertex MC gradients are sparse (silhouette rims) and noisy;
    # diffusing them over the 1-ring a few rounds preconditions the
    # descent toward smooth deformations (Nicolet et al. 2021's insight,
    # in its simplest form), which is exactly the deformation class here.
    faces = np.asarray(sc.meshes[OCCLUDER].faces, np.int64)
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]], axis=0)
    e = np.unique(np.sort(e, axis=1), axis=0)
    src = jnp.asarray(np.concatenate([e[:, 0], e[:, 1]]), jnp.int32)
    dst = jnp.asarray(np.concatenate([e[:, 1], e[:, 0]]), jnp.int32)
    nv = int(v_true.shape[0])
    deg = jnp.maximum(jax.ops.segment_sum(
        jnp.ones_like(src, jnp.float32), dst, num_segments=nv), 1.0)

    def smooth_grad(g, rounds=10, lam=0.9):
        for _ in range(rounds):
            nb = jax.ops.segment_sum(g[src], dst,
                                     num_segments=nv) / deg[:, None]
            g = (1.0 - lam) * g + lam * nb
        return g

    # masked Adam: only the occluder's vertices move
    mask = jax.tree.map(lambda a: jnp.zeros_like(jnp.asarray(a)), start)
    mask["meshes"][OCCLUDER]["vertex_positions"] = jnp.ones_like(v_true)

    def entrywise_mask(m_tree):
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            return jax.tree.map(lambda u, m: u * m, updates, m_tree), state
        return optax.GradientTransformation(init, update)

    # overshoot guard: the vertex gap closes in ~10 Adam steps of ~lr
    # each; afterwards the gradient is MC-noise-dominated, so decay the
    # step size instead of random-walking around the optimum
    sched = optax.exponential_decay(1e-2, transition_steps=max(iters, 1),
                                    decay_rate=0.05)
    optimizer = optax.chain(optax.adam(learning_rate=sched),
                            entrywise_mask(mask))
    opt_state = optimizer.init(start)
    params = start

    @jax.jit
    def train_step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        g = grads["meshes"][OCCLUDER]["vertex_positions"]
        grads["meshes"][OCCLUDER]["vertex_positions"] = smooth_grad(g)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def vert_rmse(p):
        d = p["meshes"][OCCLUDER]["vertex_positions"] - v_true
        return float(jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=1))))

    rmse0 = vert_rmse(params)
    with open(log_path, "w") as f:
        f.write(json.dumps({"event": "start", "iters": iters,
                            "views": sc.num_sensors,
                            "vertices": int(v_true.shape[0]),
                            "faces": int(sc.meshes[OCCLUDER].num_faces),
                            "opts": [sc.opts.width, sc.opts.spp,
                                     sc.opts.sppe, sc.opts.sppse],
                            "target_seconds": t_targets,
                            "rmse0": rmse0}) + "\n")

    t_start = time.perf_counter()
    for i in range(iters):
        t0 = time.perf_counter()
        params, opt_state, loss = train_step(params, opt_state,
                                             jax.random.PRNGKey(i))
        loss = float(loss)
        dt = time.perf_counter() - t0
        rec = {"iter": i, "loss": loss, "vertex_rmse": vert_rmse(params),
               "seconds": dt}
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        if (i + 1) % 10 == 0:
            save_ckpt(ckpt_path, params, opt_state)

    total = time.perf_counter() - t_start
    rmse1 = vert_rmse(params)
    # recovered geometry to OBJ (Mesh.dump writes the current vertices)
    sc.meshes[OCCLUDER].vertex_positions = np.asarray(
        params["meshes"][OCCLUDER]["vertex_positions"])
    sc.meshes[OCCLUDER].dump(os.path.join(OUT, "recovered_occluder.obj"))
    summary = {"event": "done", "iters": iters, "wall_seconds": total,
               "seconds_per_iter": total / max(iters, 1),
               "rmse0": rmse0, "rmse_final": rmse1,
               "rmse_reduction": rmse0 / max(rmse1, 1e-9)}
    with open(log_path, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
