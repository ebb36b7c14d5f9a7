"""Worker process for the 2-process multi-host smoke test.

Run as:  python multihost_worker.py <process_id> <num_processes> <port> <out>

Each process owns 2 emulated CPU devices, so 2 processes form a 4-device
global mesh spanning a process (DCN-analog) boundary. The worker renders a
tiny cbox data-parallel over the *global* mesh via the identical
shard_render_fn code path used on a real multi-host slice, then writes the
replicated image (and the to_world gradient of an L2-style loss) to disk
for the parent test to cross-check against a serial emulation.
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

    from psdr_tpu import DirectIntegrator
    from psdr_tpu.parallel import device_mesh, shard_render_fn
    from psdr_tpu.parallel.sharding import replicate_scene_params
    from scenes import cbox_scene
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()
    assert jax.local_device_count() == 2

    scene = cbox_scene(width=16, height=16, spp=4, sppe=0, sppse=0)
    integrator = DirectIntegrator(bsdf_samples=1, light_samples=1)
    mesh = device_mesh()  # all 2*nproc global devices
    render = shard_render_fn(integrator, scene, mesh, with_boundary=False)
    params = replicate_scene_params(scene.params(), mesh)
    key = jax.random.PRNGKey(7)

    def loss(p, k):
        img = render(p, k)
        return jnp.mean(img * img) + jnp.mean(img)

    img = jax.jit(render)(params, key)
    grad = jax.jit(jax.grad(loss))(params, key)

    # replicated outputs: every local shard is the full value
    img_np = np.asarray(img.addressable_shards[0].data)
    g_np = np.asarray(
        grad["meshes"][0]["to_world"].addressable_shards[0].data)
    np.savez(out, img=img_np, grad_to_world=g_np)
    print(f"worker {pid}: ok", flush=True)
