"""Worker process for the 2-process multi-host equality test.

Run as:  python multihost_worker.py <process_id> <num_processes> <port> <out>

Each process owns 2 emulated CPU devices, so 2 processes form a 4-device
global mesh spanning a process (DCN-analog) boundary. The worker drives the
identical code paths a real multi-host slice would use:

1. ``shard_render_fn`` with boundary terms ON (interior + primary-edge +
   secondary-edge lanes all shard over the global mesh) and the to_world
   gradient of a loss through it;
2. one ``make_train_step(overlap=True)`` step (explicit per-leaf psums +
   in-body optimizer update inside shard_map — the overlapped-reduction
   schedule) at SGD(1.0), whose updated parameters the parent compares
   against a single-process run of the same 4-device math.

Everything is written to disk for the parent (tests/test_parallel.py
test_multihost_two_process_smoke) to cross-check: both processes must
agree bit-exactly with each other, and match the single-process emulation
to float tolerance.
"""
import os
import sys

if __name__ == "__main__":
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    import numpy as np
    import jax

    # before any jnp value creation (psdr_tpu constants) inits the backend
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                               process_id=pid)

    import jax.numpy as jnp
    import optax

    from psdr_tpu import DirectIntegrator
    from psdr_tpu.parallel import device_mesh, shard_render_fn
    from psdr_tpu.parallel.sharding import (make_train_step,
                                            replicate_scene_params)
    from scenes import cbox_scene
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()
    assert jax.local_device_count() == 2

    # boundary terms ON: primary- and secondary-edge lanes shard over the
    # global (cross-process) mesh exactly like interior lanes
    scene = cbox_scene(width=16, height=16, spp=4, sppe=4, sppse=8)
    integrator = DirectIntegrator(bsdf_samples=1, light_samples=1)
    mesh = device_mesh()  # all 2*nproc global devices
    render = shard_render_fn(integrator, scene, mesh, with_boundary=True)
    params = replicate_scene_params(scene.params(), mesh)
    key = jax.random.PRNGKey(7)

    def loss(p, k):
        img = render(p, k)
        return jnp.mean(img * img) + jnp.mean(img)

    img = jax.jit(render)(params, key)
    grad = jax.jit(jax.grad(loss))(params, key)

    # one overlapped-reduction train step across the process boundary
    target = jnp.zeros((scene.opts.num_pixels, 3), jnp.float32)
    step, opt_state = make_train_step(integrator, scene, mesh, target,
                                      optimizer=optax.sgd(1.0),
                                      overlap=True)
    opt_state = jax.device_put(
        opt_state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    new_params, _, step_loss = step(params, opt_state, key)

    # replicated outputs: every local shard is the full value
    def shard0(x):
        return np.asarray(x.addressable_shards[0].data)

    np.savez(out, img=shard0(img),
             grad_to_world=shard0(grad["meshes"][0]["to_world"]),
             step_to_world=shard0(new_params["meshes"][0]["to_world"]),
             step_loss=shard0(step_loss))
    print(f"worker {pid}: ok", flush=True)
