"""Multi-host launch script for a real TPU slice (e.g. v5e-16).

Run the SAME command on every host of the slice (the TPU runtime supplies
coordinator/topology through its environment, so ``jax.distributed
.initialize()`` needs no arguments there):

    python scripts/launch_v5e16.py [--steps N] [--spp S] [--no-boundary]

For a manual coordinator (CPU rehearsal / non-TPU cluster):

    python scripts/launch_v5e16.py --coordinator HOST:PORT \
        --num-processes P --process-id I

What it does (BASELINE.json north-star protocol, SURVEY §5.8):
1. global 1D device mesh over every chip of the slice;
2. flagship scene (cbox + 20k-tri occluder, 512x512) with boundary terms;
3. ``make_train_step(overlap=True)``: data-parallel render, per-leaf psum'd
   gradients issued biggest-first inside shard_map (ICI within hosts, DCN
   across), in-body Adam update;
4. times steps and prints rays/s + scaling vs the recorded single-chip
   bench number (bench_baseline.json) — the >= 0.85 scaling gate.

Recommended XLA flag so MB-scale gradient leaves stay separate all-reduces
that the latency-hiding scheduler can overlap with remaining backward work:

    XLA_FLAGS=--xla_all_reduce_combine_threshold_bytes=1048576

Process 0 prints one JSON line per measurement.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--sppe", type=int, default=0)
    ap.add_argument("--sppse", type=int, default=0)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--no-boundary", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    # distributed init MUST run before anything touches the XLA backend —
    # importing psdr_tpu creates jnp constants, so initialize through bare
    # jax first (psdr_tpu.parallel.initialize_distributed does the same;
    # importing it would pull the package in too early)
    import jax
    try:
        if args.coordinator is not None:
            jax.distributed.initialize(coordinator_address=args.coordinator,
                                       num_processes=args.num_processes,
                                       process_id=args.process_id)
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:
        # single-process rehearsal (no TPU env, no coordinator): run on
        # whatever local devices exist
        print(f"single-process mode ({e})", file=sys.stderr, flush=True)

    import dataclasses

    import jax.numpy as jnp
    import optax

    from psdr_tpu import DirectIntegrator
    from psdr_tpu.parallel import device_mesh, make_train_step
    from psdr_tpu.parallel.sharding import replicate_scene_params
    from scenes import cbox_scene

    p0 = jax.process_index() == 0
    n_dev = jax.device_count()
    if p0:
        print(json.dumps({"hosts": jax.process_count(),
                          "devices": n_dev,
                          "local_devices": jax.local_device_count()}),
              flush=True)

    w = args.width
    scene = cbox_scene(width=w, height=w, spp=args.spp, occluder_subdiv=5)
    scene.opts = dataclasses.replace(scene.opts, sppe=args.sppe,
                                     sppse=args.sppse)
    integrator = DirectIntegrator(1, 1)
    mesh = device_mesh()
    target = jnp.zeros((scene.opts.num_pixels, 3), jnp.float32)
    step, opt_state = make_train_step(
        integrator, scene, mesh, target, optimizer=optax.adam(1e-2),
        with_boundary=not args.no_boundary, overlap=True)
    params = replicate_scene_params(scene.params(), mesh)
    opt_state = jax.device_put(
        opt_state,
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))

    key = jax.random.PRNGKey(0)
    out = step(params, opt_state, key)       # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.fold_in(key, i + 1))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / args.steps

    lanes = w * w * args.spp
    rays = lanes * 3  # camera + bsdf + light trace per interior sample
    rays_per_s = rays / dt
    base = {}
    bf = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_baseline.json")
    if os.path.exists(bf):
        with open(bf) as f:
            base = json.load(f)
    # scaling vs the single-chip BACKWARD number: a train step is
    # value_and_grad, so grad-samples/s is the comparable metric
    chip_gs = float(base.get("grad_samples_per_s", 0.0))
    gs = lanes / dt
    if p0:
        print(json.dumps({
            "metric": "multihost_train_rays_per_s", "value": rays_per_s,
            "seconds_per_step": dt, "grad_samples_per_s": gs,
            "scaling_vs_single_chip": (gs / (chip_gs * n_dev)
                                       if chip_gs else None),
            "loss": float(loss if jnp.ndim(loss) == 0 else loss[0]),
        }), flush=True)


if __name__ == "__main__":
    main()
