"""Flagship PSDR workload: recover object POSITION from images.

Interior gradients alone cannot move a silhouette (the visibility
discontinuity carries the signal); this exercises the full renderD pipeline
— interior + primary-edge + secondary-edge estimators — inside an Adam
loop, the reference's docs/inverse_diff_render.rst geometry workload."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psdr_tpu import DirectIntegrator
from psdr_tpu.core import transform as xf

from scenes import sphere_light_scene


def test_recover_translation_via_boundary_gradients():
    sc = sphere_light_scene(width=32, height=32, spp=8, sppe=2, sppse=8)
    integ = DirectIntegrator(1, 1)
    render = jax.jit(integ.render_fn(sc, with_boundary=True))

    target = render(sc.params(), jax.random.PRNGKey(42))

    # parametrize the sphere position by a 2-vector offset
    base = sc.params()

    def params_at(offset):
        p = jax.tree.map(lambda x: x, base)
        m = dict(p["meshes"][0])
        shift = jnp.concatenate([offset, jnp.zeros((1,), jnp.float32)])
        m["to_world"] = xf.translate(shift) @ m["to_world"]
        p["meshes"] = list(p["meshes"])
        p["meshes"][0] = m
        return p

    def loss_fn(offset, key):
        img = render(params_at(offset), key)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    import optax
    tx = optax.adam(0.05)
    offset = jnp.array([0.45, -0.3], jnp.float32)   # wrong initial position
    state = tx.init(offset)
    start = np.asarray(offset).copy()
    losses = []
    for it in range(60):
        loss, g = grad_fn(offset, jax.random.PRNGKey(100 + it))
        updates, state = tx.update(g, state)
        offset = optax.apply_updates(offset, updates)
        losses.append(float(loss))

    final = np.asarray(offset)
    # must recover the true position (0, 0) far better than the start
    assert np.linalg.norm(final) < 0.12, f"final offset {final}"
    assert np.linalg.norm(final) < 0.3 * np.linalg.norm(start)
    assert losses[-1] < losses[0] * 0.5
