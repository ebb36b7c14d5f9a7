"""Path-tracer validation: depth-1 equivalence with DirectIntegrator,
energy growth with depth, and interior gradient sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psdr_tpu import DirectIntegrator, PathTracer

from scenes import cbox_scene, sphere_light_scene


@pytest.fixture(scope="module")
def scene():
    return cbox_scene(width=32, height=32, spp=16)


def _avg_render(integ, sc, seeds=4):
    imgs = [np.asarray(integ.renderC(sc, seed=s)) for s in range(seeds)]
    return np.mean(imgs, axis=0)


def test_depth1_matches_direct(scene):
    """With max_depth=1 the estimator is Direct's: identical integrand,
    so the MC means must agree within noise."""
    d = _avg_render(DirectIntegrator(1, 1), scene)
    p = _avg_render(PathTracer(max_depth=1), scene)
    assert np.all(np.isfinite(p))
    assert abs(p.mean() - d.mean()) < 0.05 * d.mean()


@pytest.mark.slow
def test_depth_adds_energy(scene):
    """Multi-bounce transport adds energy in an enclosed box (global
    illumination > direct-only) and converges as depth grows."""
    m1 = _avg_render(PathTracer(max_depth=1), scene).mean()
    m3 = _avg_render(PathTracer(max_depth=3), scene).mean()
    m5 = _avg_render(PathTracer(max_depth=5), scene).mean()
    assert m3 > m1 * 1.05          # noticeable indirect light
    assert m5 >= m3 * 0.98         # monotone-ish
    assert (m5 - m3) < (m3 - m1)   # geometric falloff of added bounces


def test_path_gradients_finite_and_nonzero():
    sc = sphere_light_scene(width=24, height=24, spp=4)
    integ = PathTracer(max_depth=3)
    f = integ.render_fn(sc, with_boundary=False)

    def loss(params):
        return jnp.mean(f(params, jax.random.PRNGKey(0)))

    g = jax.grad(loss)(sc.params())
    leaf = np.asarray(g["bsdfs"][0]["reflectance"])
    assert np.all(np.isfinite(leaf))
    assert np.abs(leaf).max() > 0.0
    gv = np.asarray(g["meshes"][0]["vertex_positions"])
    assert np.all(np.isfinite(gv))


def test_path_albedo_gradient_vs_fd():
    """Interior-term gradient check: d(mean image)/d(albedo scale) by AD
    must match central finite differences (depth=2 so the gradient includes
    multi-bounce terms)."""
    sc = sphere_light_scene(width=16, height=16, spp=8)
    integ = PathTracer(max_depth=2)
    f = integ.render_fn(sc, with_boundary=False)
    base = sc.params()
    key = jax.random.PRNGKey(7)

    def loss_at(theta):
        p = jax.tree.map(lambda x: x, base)
        p["bsdfs"][0]["reflectance"] = base["bsdfs"][0]["reflectance"] * theta
        return jnp.mean(f(p, key))

    g_ad = float(jax.grad(loss_at)(jnp.float32(1.0)))
    eps = 1e-2
    g_fd = float((loss_at(jnp.float32(1.0 + eps))
                  - loss_at(jnp.float32(1.0 - eps))) / (2 * eps))
    assert g_fd != 0.0
    np.testing.assert_allclose(g_ad, g_fd, rtol=2e-2)


def test_path_stratification_reduces_variance():
    """First-bounce NEE/BSDF stratification must lower PathTracer
    variance (57% measured on cbox at spp=16) and keep the mean."""
    import dataclasses
    import jax
    import numpy as np
    from scenes import cbox_scene
    from psdr_tpu import PathTracer

    integ = PathTracer(max_depth=2)
    imgs = {}
    for strat in (True, False):
        sc = cbox_scene(width=24, height=24, spp=16, occluder_subdiv=1)
        sc.opts = dataclasses.replace(
            sc.opts, sampler="stratified", stratify_primary=strat)
        render = jax.jit(integ.render_fn(sc, with_boundary=False))
        params = sc.params()
        imgs[strat] = np.stack([
            np.asarray(render(params, jax.random.PRNGKey(50 + s)))
            for s in range(8)])
    v_s = imgs[True].var(0).mean()
    v_i = imgs[False].var(0).mean()
    tol = 2.0 * np.sqrt((v_s + v_i) / imgs[True].shape[0])
    assert np.abs(imgs[True].mean(0) - imgs[False].mean(0)).mean() < tol
    assert v_s < v_i, f"stratification did not help: {v_s:.3e} vs {v_i:.3e}"


def test_path_scan_depths_matches_unrolled():
    """The lax.scan middle-depth loop must produce the same image and
    gradients as the Python-unrolled loop (identical per-depth subkeys)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenes import cbox_scene
    from psdr_tpu import PathTracer

    sc = cbox_scene(width=16, height=16, spp=4, occluder_subdiv=1)
    params = sc.params()
    key = jax.random.PRNGKey(5)
    for D in (1, 3, 6):
        img, grd = {}, {}
        for scan in (False, True):
            integ = PathTracer(max_depth=D, scan_depths=scan)
            render = integ.render_fn(sc, with_boundary=False)
            img[scan] = np.asarray(jax.jit(render)(params, key))
            if D == 3:  # gradient check once; deeper only adds runtime
                g = jax.grad(lambda p: jnp.sum(render(p, key)))(params)
                grd[scan] = np.concatenate(
                    [np.ravel(x) for x in jax.tree.leaves(g)])
        np.testing.assert_array_equal(img[True], img[False], err_msg=f"D={D}")
        if grd:
            # the scan backward accumulates cotangents per-iteration, so
            # its float rounding differs slightly from the unrolled chain
            np.testing.assert_allclose(grd[True], grd[False], rtol=1e-2,
                                       atol=1e-3, err_msg=f"D={D}")


def test_pathtracer_first_bounce_visibility_reuse_unbiased(monkeypatch):
    """PathTracer's first-bounce NEE routes through the shared visibility
    reuse (edge mode); seed-averaged images must agree with the plain
    sweep (unbiasedness of the wiring, not just the impl)."""
    import numpy as np
    from scenes import cbox_scene
    from psdr_tpu import PathTracer

    def avg(mode, seeds=8):
        monkeypatch.setenv("PSDR_TPU_VIS_REUSE", mode)
        sc = cbox_scene(width=24, height=24, spp=16, occluder_subdiv=2)
        integ = PathTracer(max_depth=2)
        return np.mean([np.asarray(integ.renderC(sc, seed=s))
                        for s in range(seeds)], axis=0)

    plain = avg("off")
    edge = avg("edge")
    assert np.isfinite(edge).all()
    assert abs(edge.mean() - plain.mean()) < 0.025 * plain.mean()
