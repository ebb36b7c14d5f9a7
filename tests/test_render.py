"""End-to-end forward-render tests: field extraction + direct lighting,
estimator cross-validation (SURVEY.md §4.3: bsdf-only vs light-only vs MIS
must agree), and basic energy sanity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psdr_tpu import DirectIntegrator, FieldExtractionIntegrator

from scenes import sphere_light_scene, cbox_scene


@pytest.fixture(scope="module")
def sphere_scene():
    return sphere_light_scene(width=32, height=32, spp=4)


def test_field_silhouette(sphere_scene):
    integ = FieldExtractionIntegrator("silhouette")
    img = np.asarray(integ.renderC(sphere_scene, 0, seed=0))
    assert img.shape == (32, 32, 3)
    # sphere fills the center of the frame; corners above horizon are empty
    assert img[16, 16, 0] > 0.9
    assert img.mean() > 0.05
    assert np.isfinite(img).all()


def test_field_depth_and_normal(sphere_scene):
    depth = np.asarray(FieldExtractionIntegrator("depth").renderC(sphere_scene, 0))
    assert depth[16, 16, 0] == pytest.approx(5.0, abs=1.0)  # cam ~6 from origin
    n = np.asarray(FieldExtractionIntegrator("geoNormal").renderC(sphere_scene, 0))
    # center of sphere faces the camera (positive z toward camera)
    assert n[16, 16, 2] > 0.5


def test_direct_render_basic(sphere_scene, monkeypatch):
    integ = DirectIntegrator(bsdf_samples=1, light_samples=1)
    img = np.asarray(integ.renderC(sphere_scene, 0, seed=0))
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # something is lit
    # the default NEE visibility-reuse correction is a control variate:
    # unbiased, but individual penumbra samples may go slightly negative
    assert img.min() >= -0.1 * img.max()
    # with reuse off the estimator is non-negative by construction
    monkeypatch.setenv("PSDR_TPU_VIS_REUSE", "off")
    img2 = np.asarray(DirectIntegrator(1, 1).renderC(sphere_scene, 0, seed=0))
    assert img2.min() >= 0.0


def test_estimator_cross_validation():
    """BSDF-only, light-only and MIS must converge to the same image
    (the reference's own consistency check, examples/config.py:46-78)."""
    sc = cbox_scene(width=24, height=24, spp=48)
    img_mis = np.asarray(DirectIntegrator(2, 2).renderC(sc, 0, seed=1))
    img_bs = np.asarray(DirectIntegrator(5, 0).renderC(sc, 0, seed=2))
    img_ls = np.asarray(DirectIntegrator(0, 5).renderC(sc, 0, seed=3))

    def rel(a, b):
        return np.abs(a - b).mean() / max(b.mean(), 1e-6)

    assert rel(img_ls, img_mis) < 0.15
    assert rel(img_bs, img_mis) < 0.35  # bsdf-only is noisier


def test_render_reproducible(sphere_scene):
    integ = DirectIntegrator(1, 1)
    a = np.asarray(integ.renderC(sphere_scene, 0, seed=7))
    b = np.asarray(integ.renderC(sphere_scene, 0, seed=7))
    assert np.array_equal(a, b)


def test_pass_chunking_matches_unchunked():
    """Bounded-memory lax.scan passes must not change the estimator
    structure: with the same key the chunked render is a valid MC estimate
    whose mean matches the unchunked one."""
    import dataclasses
    from psdr_tpu import DirectIntegrator

    sc1 = cbox_scene(width=16, height=16, spp=8)
    sc2 = cbox_scene(width=16, height=16, spp=8)
    sc2.opts = dataclasses.replace(sc2.opts, pass_lanes=256)  # force 8 chunks

    integ = DirectIntegrator(1, 1)
    img1 = np.mean([np.asarray(integ.renderC(sc1, seed=s)) for s in range(6)],
                   axis=0)
    img2 = np.mean([np.asarray(integ.renderC(sc2, seed=s)) for s in range(6)],
                   axis=0)
    assert np.all(np.isfinite(img2))
    assert abs(img1.mean() - img2.mean()) < 0.05 * img1.mean()


def test_camera_hit_prior_matches_unbounded():
    """The camera-hit prior (RenderOptions.camera_hit_prior) must be a pure
    performance hint: a candidate hit upper-bounds the closest t, so the
    tmax-bounded query returns the same hits and the render (and its
    gradients) are unchanged. Exercised across several pass chunks AND a
    masked ragged tail chunk (20x20 pixels, 512-lane chunks) where the
    candidate-row slice clamps — a misaligned row is still a real scene
    triangle, so its bound stays valid."""
    import dataclasses
    import jax
    from psdr_tpu import DirectIntegrator

    sc1 = cbox_scene(width=20, height=20, spp=8)
    sc2 = cbox_scene(width=20, height=20, spp=8)
    sc1.opts = dataclasses.replace(sc1.opts, camera_hit_prior=True,
                                   pass_lanes=512)
    sc2.opts = dataclasses.replace(sc2.opts, camera_hit_prior=False,
                                   pass_lanes=512)
    integ = DirectIntegrator(1, 1)
    a = np.asarray(integ.renderC(sc1, seed=3))
    b = np.asarray(integ.renderC(sc2, seed=3))
    assert np.allclose(a, b, atol=1e-6)

    key = jax.random.PRNGKey(0)
    f1 = integ.render_fn(sc1, 0, with_boundary=False)
    f2 = integ.render_fn(sc2, 0, with_boundary=False)
    g1 = jax.grad(lambda p: (f1(p, key) ** 2).sum())(sc1.params())
    g2 = jax.grad(lambda p: (f2(p, key) ** 2).sum())(sc2.params())
    for l1, l2 in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert np.allclose(np.asarray(l1), np.asarray(l2),
                           rtol=1e-5, atol=1e-6)


def test_emitter_first_matches_full_closest_hit():
    """ray_intersect_emitter_first must equal the full-scene closest hit
    wherever the consumer looks (emitter lanes), on both its internal
    paths: tiny emitter set (unrolled brute + select-chain recompute) and
    a tessellated >16-face emitter (tiled brute + face-table gather)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from psdr_tpu.core.records import Ray
    from psdr_tpu.scene.scene import ray_intersect, ray_intersect_emitter_first
    from psdr_tpu.shape import primitives
    from psdr_tpu.emitter.area import AreaLight
    from scenes import cbox_scene

    for tessellate in (False, True):
        sc = cbox_scene(width=16, height=16, spp=1, occluder_subdiv=1)
        if tessellate:
            # second emitter with an icosphere mesh (80 faces > both the
            # select-chain and small-F brute thresholds)
            ball = primitives.make_icosphere(subdiv=1, radius=0.3, bsdf_id=0)
            ball.set_transform(np.asarray(
                [[1, 0, 0, 0.5], [0, 1, 0, 0.5], [0, 0, 1, 0.0],
                 [0, 0, 0, 1]], np.float32))
            bidx = sc.add_mesh(ball)
            sc.add_emitter(AreaLight([5.0, 5.0, 5.0], mesh_index=bidx))
        sc.prepare_accel()
        flat = sc.build(sc.params())
        assert flat.em_tri_idx is not None

        key = jax.random.PRNGKey(0)
        n = 4096
        o = jnp.array([0.0, 0.0, 0.9]) + 0.05 * jax.random.normal(
            key, (n, 3))
        d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        act = jnp.ones((n,), bool)

        its_ef = ray_intersect_emitter_first(flat, Ray(o, d), act)
        its_full = ray_intersect(flat, Ray(o, d), act, path_space=True)
        em_full = its_full.valid & its_full.is_emitter()
        # identical emitter-lane sets and identical hits there
        assert np.array_equal(np.asarray(its_ef.valid), np.asarray(em_full))
        m = np.asarray(em_full)
        assert m.any(), "test scene must produce emitter hits"
        assert np.array_equal(np.asarray(its_ef.tri_id)[m],
                              np.asarray(its_full.tri_id)[m])
        np.testing.assert_allclose(np.asarray(its_ef.t)[m],
                                   np.asarray(its_full.t)[m], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(its_ef.p)[m],
                                   np.asarray(its_full.p)[m], atol=1e-5)


def test_stratified_primary_reduces_variance(monkeypatch):
    """Stratified subpixel jitter must lower pixel variance across seeds
    vs independent jitter, and leave the mean unbiased."""
    import dataclasses
    import jax
    import numpy as np
    from scenes import sphere_light_scene
    from psdr_tpu import DirectIntegrator
    # isolate the sampler property under test from visibility-reuse noise
    monkeypatch.setenv("PSDR_TPU_VIS_REUSE", "off")

    integ = DirectIntegrator(1, 1)
    imgs = {}
    for strat in (True, False):
        sc = sphere_light_scene(width=24, height=24, spp=16)
        sc.opts = dataclasses.replace(
            sc.opts, sampler="stratified", stratify_primary=strat)
        render = jax.jit(integ.render_fn(sc, with_boundary=False))
        params = sc.params()
        imgs[strat] = np.stack([
            np.asarray(render(params, jax.random.PRNGKey(s)))
            for s in range(8)])
    m_s, m_i = imgs[True].mean(0), imgs[False].mean(0)
    # same estimator mean (statistically)
    assert np.abs(m_s - m_i).mean() < 0.01
    v_s = imgs[True].var(0).mean()
    v_i = imgs[False].var(0).mean()
    assert v_s < v_i, f"stratification did not help: {v_s:.3e} vs {v_i:.3e}"


def test_stratified_nee_reduces_soft_shadow_variance():
    """The per-pixel-rotated NEE stratification must lower variance on a
    soft-shadow scene (area light + occluder) and keep the mean."""
    import dataclasses
    import jax
    import numpy as np
    from scenes import cbox_scene
    from psdr_tpu import DirectIntegrator

    integ = DirectIntegrator(0, 1)   # light sampling only: isolates NEE
    imgs = {}
    for strat in (True, False):
        sc = cbox_scene(width=24, height=24, spp=16, occluder_subdiv=1)
        sc.opts = dataclasses.replace(
            sc.opts, sampler="stratified", stratify_primary=strat)
        render = jax.jit(integ.render_fn(sc, with_boundary=False))
        params = sc.params()
        imgs[strat] = np.stack([
            np.asarray(render(params, jax.random.PRNGKey(100 + s)))
            for s in range(8)])
    m_s, m_i = imgs[True].mean(0), imgs[False].mean(0)
    assert np.abs(m_s - m_i).mean() < 0.015
    v_s = imgs[True].var(0).mean()
    v_i = imgs[False].var(0).mean()
    assert v_s < v_i, f"NEE stratification did not help: {v_s:.3e} vs {v_i:.3e}"

def test_stratified_bsdf_reduces_variance():
    """The per-pixel-rotated BSDF-sample stratification must lower
    variance on a bsdf-sampling-only estimator and keep the mean."""
    import dataclasses
    import jax
    import numpy as np
    from scenes import cbox_scene
    from psdr_tpu import DirectIntegrator

    integ = DirectIntegrator(1, 0)   # bsdf sampling only
    imgs = {}
    for strat in (True, False):
        sc = cbox_scene(width=24, height=24, spp=16, occluder_subdiv=1)
        sc.opts = dataclasses.replace(
            sc.opts, sampler="stratified", stratify_primary=strat)
        render = jax.jit(integ.render_fn(sc, with_boundary=False))
        params = sc.params()
        imgs[strat] = np.stack([
            np.asarray(render(params, jax.random.PRNGKey(200 + s)))
            for s in range(8)])
    m_s, m_i = imgs[True].mean(0), imgs[False].mean(0)
    v_s = imgs[True].var(0).mean()
    v_i = imgs[False].var(0).mean()
    # bsdf-only cbox is high-variance (the light is small): bound the
    # mean gap by ~2x the expected |N(0, v_s/n + v_i/n)| magnitude
    tol = 2.0 * np.sqrt((v_s + v_i) / imgs[True].shape[0])
    assert np.abs(m_s - m_i).mean() < tol
    assert v_s < v_i, f"BSDF stratification did not help: {v_s:.3e} vs {v_i:.3e}"


def test_octant_sort_counting_matches_argsort():
    """The counting-sort implementation of the segmented direction sort
    must produce exactly the stable-argsort (perm, inv)."""
    import jax
    import numpy as np
    from psdr_tpu.core.records import Ray
    from psdr_tpu.scene.scene import _octant_sort

    n = 1 << 14
    key = jax.random.PRNGKey(11)
    d = jax.random.normal(key, (n, 3))
    o = jnp.zeros((n, 3))
    active = jax.random.uniform(jax.random.PRNGKey(12), (n,)) < 0.7
    ray = Ray(o, d)
    for seg in (1 << 12, 1 << 14):
        p_a, i_a = _octant_sort(ray, active, seg=seg, impl="argsort")
        p_c, i_c = _octant_sort(ray, active, seg=seg, impl="counting")
        np.testing.assert_array_equal(np.asarray(p_a), np.asarray(p_c))
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_c))


def test_sobol_sampler_beats_stratified():
    """sampler="sobol" (scrambled (0,2)-sequence over subpixel + first
    NEE/BSDF dims) must cut variance below the stratified sampler (5.5x
    measured) with a consistent mean."""
    import dataclasses
    import jax
    import numpy as np
    from scenes import cbox_scene
    from psdr_tpu import DirectIntegrator

    integ = DirectIntegrator(1, 1)
    imgs = {}
    for sampler in ("sobol", "stratified"):
        sc = cbox_scene(width=24, height=24, spp=16, occluder_subdiv=1)
        sc.opts = dataclasses.replace(sc.opts, sampler=sampler)
        render = jax.jit(integ.render_fn(sc, with_boundary=False))
        params = sc.params()
        imgs[sampler] = np.stack([
            np.asarray(render(params, jax.random.PRNGKey(300 + s)))
            for s in range(8)])
    v_q = imgs["sobol"].var(0).mean()
    v_s = imgs["stratified"].var(0).mean()
    tol = 2.0 * np.sqrt((v_q + v_s) / 8)
    assert np.abs(imgs["sobol"].mean(0)
                  - imgs["stratified"].mean(0)).mean() < tol
    assert v_q < 0.7 * v_s, f"sobol did not beat stratified: {v_q:.3e} vs {v_s:.3e}"


def test_detached_fast_path_matches_differentiable_forward():
    """renderC goes through the detached fast path (kernel t/uv reused,
    narrowed face-table gather); it must reproduce the differentiable
    pipeline's primal bit-for-bit up to fp reassociation. Pins both the
    DirectIntegrator and PathTracer chunks, and the detached render_fn."""
    from psdr_tpu.integrator.path import PathTracer
    from psdr_tpu.scene.scene import detach_flat
    from scenes import cbox_scene

    sc = cbox_scene(width=32, height=32, spp=4)
    key = jax.random.PRNGKey(2)
    for integ in (DirectIntegrator(1, 1), PathTracer(max_depth=2)):
        fast = integ.radiance_image(sc, detach_flat(sc.flat), 0, key,
                                    with_boundary=False)
        slow = integ.radiance_image(
            sc, detach_flat(sc.flat)._replace(detached=False), 0, key,
            with_boundary=False)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=2e-5)
    p = sc.params()
    integ = DirectIntegrator(1, 1)
    a = integ.render_fn(sc, with_boundary=False)(p, key)
    b = integ.render_fn(sc, with_boundary=False, detached=True)(p, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_reflective_one_sided_capability_flag():
    """The NEE side-gate must derive from per-kind capability flags; an
    unknown/future BSDF kind must conservatively disable the gate."""
    from psdr_tpu.bsdf import all_reflective_one_sided
    assert all_reflective_one_sided(("diffuse", "roughconductor"))
    assert not all_reflective_one_sided(("diffuse", "thindielectric"))
    assert all_reflective_one_sided(())


def test_visibility_reuse_unbiased(monkeypatch):
    """PSDR_TPU_VIS_REUSE_Q>0 replaces the boolean NEE occlusion with the
    control-variate reuse estimator (trace stratum 0 + a q-subset). It
    must stay unbiased: seed-averaged images agree with the plain path.
    Measured round 5: mean rel diff 2e-4 (=0.5 SEM) but 1.5x variance at
    q=1/16 on cbox (penumbra correction amplifies by 1/q) — an equal-
    quality LOSS, hence OFF by default; pinned here like camera_hit_prior."""
    import jax as _jax
    from scenes import cbox_scene
    from psdr_tpu import DirectIntegrator

    def avg(q, seeds=10):
        monkeypatch.setenv("PSDR_TPU_VIS_REUSE_Q", q)
        sc = cbox_scene(width=24, height=24, spp=16, occluder_subdiv=2)
        integ = DirectIntegrator(1, 1)
        return np.mean([np.asarray(integ.renderC(sc, seed=s))
                        for s in range(seeds)], axis=0)

    plain = avg("0")
    reuse = avg("0.0625")
    assert np.isfinite(reuse).all()
    assert abs(reuse.mean() - plain.mean()) < 0.02 * plain.mean()


def test_visibility_reuse_edge_mode_unbiased(monkeypatch):
    """Edge mode (the production default): probe-classified systematic
    subsampling must agree in expectation with the plain sweep. Measured
    round 5: mean rel diff <= 5e-4, variance ratio 1.10 (k_pen=4)."""
    from scenes import cbox_scene
    from psdr_tpu import DirectIntegrator

    def avg(mode, seeds=10):
        monkeypatch.setenv("PSDR_TPU_VIS_REUSE", mode)
        sc = cbox_scene(width=24, height=24, spp=16, occluder_subdiv=2)
        return np.mean([np.asarray(DirectIntegrator(1, 1).renderC(sc, seed=s))
                        for s in range(seeds)], axis=0)

    plain = avg("off")
    edge = avg("edge")
    assert np.isfinite(edge).all()
    assert abs(edge.mean() - plain.mean()) < 0.02 * plain.mean()
