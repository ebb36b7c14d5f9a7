"""Boundary-estimator tests: visibility-discontinuity gradients from the
primary-edge (silhouette) and secondary-edge (shadow) integrals must close
the gap between interior-only AD and finite differences.

This is the heart of PSDR (SURVEY.md §7 hard part #1).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psdr_tpu import DirectIntegrator

from scenes import sphere_light_scene
from test_gradients import ad_vs_fd


def _perturb_mesh_translation(mesh_index, shift):
    shift = jnp.asarray(shift, jnp.float32)

    def perturb(params, P):
        mp = params["meshes"][mesh_index]
        params["meshes"][mesh_index] = {
            "vertex_positions": mp["vertex_positions"] + P * shift,
            "to_world": mp["to_world"],
        }
        return params
    return perturb


def test_primary_edges_zero_primal():
    """Boundary terms must vanish in the primal image (pure-gradient trick,
    integrator.cpp:116 value -= detach(value))."""
    sc = sphere_light_scene(width=16, height=16, spp=2, sppe=2, sppse=0)
    integ = DirectIntegrator(1, 1)
    flat = sc.configure()
    key = jax.random.PRNGKey(0)
    img_edges = integ.render_primary_edges(sc, flat, 0, key)
    assert np.allclose(np.asarray(img_edges), 0.0)


@pytest.mark.slow
def test_primary_edge_gradient_against_fd():
    """Sphere translated along x in front of the camera: the image gradient
    at the silhouette is pure boundary term. With sppe>0 the AD image must
    approach FD; interior-only AD misses the silhouette entirely."""
    w = h = 24
    sc = sphere_light_scene(width=w, height=h, spp=8, sppe=64, sppse=0)
    integ = DirectIntegrator(1, 1)
    perturb = _perturb_mesh_translation(0, [1.0, 0.0, 0.0])

    # FD reference: average several seeds at decent eps
    fds = []
    ads = []
    ads_nob = []
    for seed in range(4):
        ad, fd = ad_vs_fd(sc, perturb, integ, eps=0.02, seed=seed,
                          with_boundary=True)
        ad_nob, _ = ad_vs_fd(sc, perturb, integ, eps=0.02, seed=seed,
                             with_boundary=False)
        fds.append(fd)
        ads.append(ad)
        ads_nob.append(ad_nob)
    fd = np.mean(fds, axis=0).reshape(h, w, 3)
    ad = np.mean(ads, axis=0).reshape(h, w, 3)
    ad_nob = np.mean(ads_nob, axis=0).reshape(h, w, 3)

    # the boundary term must contribute substantially (silhouette pixels)
    boundary_part = np.abs(ad - ad_nob).sum()
    assert boundary_part > 0.1 * np.abs(fd).sum(), \
        "primary-edge estimator contributed nothing"

    # and with it, AD must be much closer to FD than without it
    err_with = np.abs(ad - fd).sum()
    err_without = np.abs(ad_nob - fd).sum()
    assert err_with < 0.7 * err_without, (
        f"with boundary {err_with}, without {err_without}")


@pytest.mark.slow
def test_secondary_edge_gradient_shadow():
    """Occluder translation changes the cast shadow: the shadow-boundary
    gradient is produced only by the secondary-edge estimator."""
    w = h = 24
    sc = sphere_light_scene(width=w, height=h, spp=8, sppe=0, sppse=64)
    integ = DirectIntegrator(0, 1)
    perturb = _perturb_mesh_translation(0, [1.0, 0.0, 0.0])

    ads, ads_nob, fds = [], [], []
    for seed in range(4):
        ad, fd = ad_vs_fd(sc, perturb, integ, eps=0.02, seed=seed,
                          with_boundary=True)
        ad_nob, _ = ad_vs_fd(sc, perturb, integ, eps=0.02, seed=seed,
                             with_boundary=False)
        ads.append(ad); ads_nob.append(ad_nob); fds.append(fd)
    fd = np.mean(fds, axis=0)
    ad = np.mean(ads, axis=0)
    ad_nob = np.mean(ads_nob, axis=0)

    boundary_part = np.abs(ad - ad_nob).sum()
    assert boundary_part > 0.0, "secondary-edge estimator contributed nothing"

    err_with = np.abs(ad - fd).sum()
    err_without = np.abs(ad_nob - fd).sum()
    assert err_with < err_without, (
        f"with boundary {err_with}, without {err_without}")


@pytest.mark.slow
def test_primary_edge_vis_check_rejects_occluded():
    """Runtime analog of the reference's PSDR_PRIMARY_EDGE_VIS_CHECK
    (perspective.cpp:171-192): silhouette-edge samples whose edge point is
    hidden behind other geometry are rejected; unoccluded samples are not."""
    import jax.numpy as jnp
    from scenes import sphere_light_scene
    from psdr_tpu.scene.scene import ray_test
    from psdr_tpu.sensor.perspective import sample_primary_edge
    from psdr_tpu.shape import primitives

    # sphere in front of the camera; a large quad between camera and sphere
    # occludes the lower half of the view
    sc = sphere_light_scene(width=24, height=24, spp=1, sppe=4)
    grey = len(sc.bsdfs) - 1
    blocker = primitives.make_quad(size=0.9, bsdf_id=grey, enable_edges=False)
    import numpy as np
    from psdr_tpu.core import transform as xf
    m = np.asarray(xf.translate([0.8, 0.0, 2.5]))
    blocker.set_transform(m)  # covers the sphere's right silhouette arc
    sc.add_mesh(blocker)

    flat = sc.flat
    sensor = flat.sensors[0]
    key = jax.random.PRNGKey(0)
    s1 = jax.random.uniform(key, (4096,))
    pes = sample_primary_edge(sensor, s1)
    valid = pes.idx >= 0
    occluded = np.asarray(ray_test(flat, pes.ray_c, pes.vis_dist, valid))
    valid_np = np.asarray(valid)
    assert valid_np.sum() > 100
    # the blocker hides part of the sphere silhouette...
    assert occluded[valid_np].sum() > 0
    # ...but unoccluded samples are never spuriously rejected: all rejected
    # samples must actually sit in the blocker's screen region (y below
    # center projects to the lower half of the sample plane)
    frac = occluded[valid_np].mean()
    assert frac < 0.9

    # and the option changes the rendered boundary image only where masked
    import dataclasses
    sc.opts = dataclasses.replace(sc.opts, primary_edge_vis_check=True)
    integ = DirectIntegrator(1, 1)
    render = integ.render_fn(sc, 0, with_boundary=True)

    def f(params, P, key):
        p = jax.tree.map(lambda x: x, params)
        m = p["meshes"][0]
        new = dict(m)
        new["to_world"] = jnp.asarray(xf.translate(
            jnp.array([1.0, 0, 0]) * P)) @ jnp.asarray(m["to_world"])
        p["meshes"][0] = new
        return render(p, key)

    img = jax.jvp(lambda P: f(sc.params(), P, jax.random.PRNGKey(1)),
                  (0.0,), (1.0,))[1]
    assert np.isfinite(np.asarray(img)).all()


def test_secondary_compact_path_matches_full():
    """The quarter-width compacted secondary-boundary evaluation (taken
    when the valid-lane count fits; ~3% typical unguided) must reproduce
    the full-width pass: same samples, same estimator, only the lane
    order/width changes. Gradients and the (pure-gradient) image must
    agree to accumulation-reorder tolerance."""
    import os
    import jax
    import jax.numpy as jnp
    from scenes import cbox_scene
    from psdr_tpu import DirectIntegrator

    def secondary_grad(compact: bool):
        os.environ["PSDR_TPU_SSE_COMPACT"] = "1" if compact else "0"
        try:
            sc = cbox_scene(width=64, height=64, spp=0, sppse=4,
                            occluder_subdiv=3)
            integ = DirectIntegrator(1, 1)
            render = integ.render_fn(sc, with_boundary=True)
            params = sc.params()

            def loss(p):
                return jnp.mean(render(p, jax.random.PRNGKey(7)))

            return jax.jit(jax.grad(loss))(params)
        finally:
            os.environ["PSDR_TPU_SSE_COMPACT"] = "1"

    import jax as _jax
    g_c = secondary_grad(True)
    g_f = secondary_grad(False)
    leaves_c = _jax.tree.leaves(g_c)
    leaves_f = _jax.tree.leaves(g_f)
    total = 0.0
    for a, b in zip(leaves_c, leaves_f):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b, rtol=1e-4,
                                   atol=1e-6 * max(np.abs(b).max(), 1e-12))
        total += np.abs(b).sum()
    assert total > 0  # the boundary term produced real gradients
