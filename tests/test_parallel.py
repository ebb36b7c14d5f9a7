"""Multi-chip (8 emulated CPU devices) sharding tests.

The load-bearing property: ``shard_render_fn``'s image and its parameter
*gradients* must equal, to float tolerance, a serial emulation that runs the
identical per-device math in a Python loop (``per_device_render_fn``). That
pins down the shard_map machinery itself — a psum/transpose bug that scaled
gradients by n_devices would fail these, while finiteness checks would not.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psdr_tpu import DirectIntegrator
from psdr_tpu.parallel import device_mesh, make_train_step, shard_render_fn
from psdr_tpu.parallel.sharding import per_device_render_fn

from scenes import cbox_scene


@pytest.fixture(scope="module")
def scene():
    return cbox_scene(width=24, height=24, spp=8, sppe=0, sppse=0)


def _loss(render):
    def f(p, k):
        img = render(p, k)
        return jnp.mean(img * img) + jnp.mean(img)
    return f


def _serial_reference(integrator, scene, n_dev, mode, with_boundary=False):
    """mean over d of the identical per-device partial, in a Python loop."""
    g = per_device_render_fn(integrator, scene, n_dev,
                             with_boundary=with_boundary, mode=mode)

    def render(params, key):
        parts = [g(params, key, jnp.int32(d)) for d in range(n_dev)]
        return sum(parts) / n_dev
    return render


@pytest.mark.parametrize("spp,mode", [(8, "budget"), (6, "lanes")])
def test_sharded_render_matches_serial_emulation(spp, mode):
    """spp=8 divides the 8-device mesh (budget DP); spp=6 does not and takes
    the exact lane-sharded path."""
    sc = cbox_scene(width=24, height=24, spp=spp, sppe=0, sppse=0)
    integrator = DirectIntegrator(bsdf_samples=1, light_samples=1)
    mesh = device_mesh(8)
    render_sh = shard_render_fn(integrator, sc, mesh, with_boundary=False)
    render_ser = _serial_reference(integrator, sc, 8, mode)
    params = sc.params()
    key = jax.random.PRNGKey(3)

    img_sh = np.asarray(jax.jit(render_sh)(params, key))
    img_ser = np.asarray(jax.jit(render_ser)(params, key))
    assert np.isfinite(img_sh).all() and img_sh.max() > 0.0
    np.testing.assert_allclose(img_sh, img_ser, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("spp,mode", [(8, "budget"), (6, "lanes")])
@pytest.mark.slow
def test_sharded_grads_match_serial_emulation(spp, mode):
    """Gradients through the sharded render (shard_map transpose psum) must
    equal the serial-emulation gradients leaf-by-leaf."""
    sc = cbox_scene(width=24, height=24, spp=spp, sppe=0, sppse=0)
    integrator = DirectIntegrator(bsdf_samples=1, light_samples=1)
    # 4 devices: same equality evidence, but the serial emulation traces
    # n_dev full renders, so the mesh size is pure test runtime
    mesh = device_mesh(4)
    render_sh = shard_render_fn(integrator, sc, mesh, with_boundary=False)
    render_ser = _serial_reference(integrator, sc, 4, mode)
    params = sc.params()
    key = jax.random.PRNGKey(0)

    g_sh = jax.jit(jax.grad(_loss(render_sh)))(params, key)
    g_ser = jax.jit(jax.grad(_loss(render_ser)))(params, key)

    leaves_sh, tree_sh = jax.tree.flatten(g_sh)
    leaves_ser, tree_ser = jax.tree.flatten(g_ser)
    assert tree_sh == tree_ser
    checked = 0
    for a, b in zip(leaves_sh, leaves_ser):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.isfinite(a).all()
        scale = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5 * scale)
        checked += a.size
    assert checked > 10  # the pytree actually carries gradients
    # and the gradient is not trivially zero
    total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves_sh)
    assert total > 0.0


def test_lane_sharding_covers_full_budget():
    """Lane-DP must assign every lane to exactly one device (ceil split +
    tail masking). The cbox encloses the camera, so the silhouette AOV is
    exactly 1 for every sample regardless of RNG: summed lane partials give
    a pixel value != 1 iff a lane was lost or double-counted."""
    from psdr_tpu import FieldExtractionIntegrator
    sc = cbox_scene(width=16, height=16, spp=5, sppe=0, sppse=0)
    integrator = FieldExtractionIntegrator("silhouette")
    for n_dev in (8, 3):  # 1280 lanes: exact split and ceil-with-tail
        render_ser = _serial_reference(integrator, sc, n_dev, "lanes")
        img = np.asarray(render_ser(sc.params(), jax.random.PRNGKey(1))
                         ).reshape(16, 16, 3)
        np.testing.assert_allclose(img, 1.0, rtol=1e-5)


@pytest.mark.slow
def test_sharded_boundary_terms_run():
    """Boundary estimators under lane-DP: gradients flow and match the
    serial emulation."""
    sc = cbox_scene(width=16, height=16, spp=4, sppe=6, sppse=6)
    integrator = DirectIntegrator(bsdf_samples=1, light_samples=1)
    mesh = device_mesh(4)  # see note in test_sharded_grads_match_...
    render_sh = shard_render_fn(integrator, sc, mesh, with_boundary=True)
    render_ser = _serial_reference(integrator, sc, 4, "lanes",
                                   with_boundary=True)
    params = sc.params()
    key = jax.random.PRNGKey(2)

    def loss(p, k, r):
        def inner(q):
            return jnp.mean(r(q, k))
        return jax.grad(inner)(p)

    g_sh = jax.jit(lambda p, k: loss(p, k, render_sh))(params, key)
    g_ser = jax.jit(lambda p, k: loss(p, k, render_ser))(params, key)
    a = np.asarray(g_sh["meshes"][0]["to_world"], np.float64)
    b = np.asarray(g_ser["meshes"][0]["to_world"], np.float64)
    assert np.isfinite(a).all() and np.abs(a).max() > 0
    np.testing.assert_allclose(a, b, rtol=5e-4,
                               atol=5e-5 * max(np.abs(b).max(), 1e-12))


def test_train_step_runs(scene):
    integrator = DirectIntegrator(bsdf_samples=1, light_samples=1)
    mesh = device_mesh(8)
    target = jnp.zeros((scene.opts.num_pixels, 3), jnp.float32)
    step, opt_state = make_train_step(integrator, scene, mesh, target)
    params = scene.params()
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and float(loss) > 0.0


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_multihost_two_process_smoke(tmp_path):
    """2 OS processes x 2 emulated CPU devices = a 4-device global mesh with
    a real process (DCN-analog) boundary, driven through jax.distributed by
    the exact shard_render_fn code path a multi-host slice would use. Both
    processes must produce the identical replicated image and to_world
    gradient, and both must match a single-process serial emulation of the
    same per-device math."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable the TPU plugin hook
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    outs = [str(tmp_path / f"mh{i}.npz") for i in range(2)]
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(i), "2", str(port), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    a, b = (np.load(o) for o in outs)
    np.testing.assert_array_equal(a["img"], b["img"])
    np.testing.assert_array_equal(a["grad_to_world"], b["grad_to_world"])
    np.testing.assert_array_equal(a["step_to_world"], b["step_to_world"])
    np.testing.assert_array_equal(a["step_loss"], b["step_loss"])

    # serial emulation of the same 4-device math in this process
    # (boundary terms ON — edge lanes crossed the process boundary too)
    sc = cbox_scene(width=16, height=16, spp=4, sppe=4, sppse=8)
    integrator = DirectIntegrator(bsdf_samples=1, light_samples=1)
    render = _serial_reference(integrator, sc, 4, "budget",
                               with_boundary=True)
    params = sc.params()
    key = jax.random.PRNGKey(7)
    img_ref = np.asarray(jax.jit(render)(params, key))
    np.testing.assert_allclose(a["img"], img_ref, rtol=2e-5, atol=2e-6)

    g_ref = jax.jit(jax.grad(_loss(render)))(params, key)
    g_ref = np.asarray(g_ref["meshes"][0]["to_world"], np.float64)
    scale = max(np.abs(g_ref).max(), 1e-12)
    np.testing.assert_allclose(a["grad_to_world"], g_ref,
                               rtol=5e-4, atol=5e-5 * scale)

    # the cross-process overlapped train step must match the identical
    # 4-device math run in ONE process (multi-host == single-host)
    import optax
    mesh = device_mesh(4)
    target = jnp.zeros((sc.opts.num_pixels, 3), jnp.float32)
    step, st = make_train_step(integrator, sc, mesh, target,
                               optimizer=optax.sgd(1.0), overlap=True)
    p1, _, l1 = step(params, st, key)
    ref_tw = np.asarray(p1["meshes"][0]["to_world"], np.float64)
    scale = max(np.abs(ref_tw).max(), 1e-12)
    np.testing.assert_allclose(a["step_to_world"], ref_tw,
                               rtol=5e-4, atol=5e-5 * scale)
    np.testing.assert_allclose(float(a["step_loss"]), float(l1), rtol=1e-4)


def test_overlap_train_step_matches_baseline(scene):
    """The overlapped-reduction step (per-group psums issued inside
    shard_map, big leaves first) must be numerically identical to the
    default single-fused-all-reduce step."""
    import optax
    integrator = DirectIntegrator(bsdf_samples=1, light_samples=1)
    mesh = device_mesh(8)
    target = jnp.zeros((scene.opts.num_pixels, 3), jnp.float32)
    # SGD makes param deltas linear in the gradients (Adam normalizes
    # near-zero grads to +-lr, amplifying float-summation-order noise)
    step_a, st_a = make_train_step(integrator, scene, mesh, target,
                                   optimizer=optax.sgd(1.0))
    step_b, st_b = make_train_step(integrator, scene, mesh, target,
                                   optimizer=optax.sgd(1.0), overlap=True)
    params = scene.params()
    key = jax.random.PRNGKey(4)
    pa, sa, la = step_a(params, st_a, key)
    pb, sb, lb = step_b(params, st_b, key)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for p0, a, b in zip(jax.tree.leaves(params), jax.tree.leaves(pa),
                        jax.tree.leaves(pb)):
        ga = np.asarray(a, np.float64) - np.asarray(p0, np.float64)
        gb = np.asarray(b, np.float64) - np.asarray(p0, np.float64)
        scale = max(np.abs(gb).max(), 1e-10)
        np.testing.assert_allclose(ga, gb, rtol=5e-4, atol=5e-4 * scale)


def test_overlap_step_owns_the_reduction(scene):
    """Structural check. Baseline: the gradient all-reduce is inserted by
    the autodiff transpose at the shard_map boundary (metadata
    'transpose(jvp)'), trailing the whole backward — nothing can overlap
    it. Overlap mode: the reduction is the step body's *explicit* psum
    feeding the in-body optimizer update, which the TPU latency-hiding
    scheduler can run async against remaining work (how much splitting
    survives is governed by xla_all_reduce_combine_threshold_bytes)."""
    integrator = DirectIntegrator(bsdf_samples=1, light_samples=1)
    mesh = device_mesh(8)
    target = jnp.zeros((scene.opts.num_pixels, 3), jnp.float32)

    def grad_allreduce_meta(step, opt_state):
        txt = jax.jit(step).lower(scene.params(), opt_state,
                                  jax.random.PRNGKey(0)).compile().as_text()
        return [ln for ln in txt.splitlines()
                if "all-reduce(" in ln and "f32[4,4]" in ln]  # grads tuple

    step_a, st_a = make_train_step(integrator, scene, mesh, target)
    meta_a = grad_allreduce_meta(step_a, st_a)
    assert meta_a and any("transpose" in ln for ln in meta_a), meta_a

    step_b, st_b = make_train_step(integrator, scene, mesh, target,
                                   overlap=True)
    meta_b = grad_allreduce_meta(step_b, st_b)
    assert meta_b and not any("transpose" in ln for ln in meta_b), meta_b
    assert any("psum" in ln for ln in meta_b), meta_b


def test_collective_guiding_build_matches_serial():
    """The mesh-sharded secondary-edge guiding build draws the same uniform
    for every lane as the serial build, so the psum'd masses must equal the
    serial masses to float tolerance; the indirect table build must produce
    a finite, normalized, usable table."""
    sc = cbox_scene(width=16, height=16, spp=2, sppe=0, sppse=2)
    sc.prepare_accel()

    serial = DirectIntegrator(1, 1)
    serial.preprocess_secondary_edges(sc, 0, (4, 4, 4, 2), nrounds=2, seed=3)
    mesh = device_mesh(8)
    sharded = DirectIntegrator(1, 1)
    sharded.preprocess_secondary_edges(sc, 0, (4, 4, 4, 2), nrounds=2,
                                       seed=3, mesh=mesh)
    ms = np.asarray(serial.warpper[0].distrb.pmf)
    mm = np.asarray(sharded.warpper[0].distrb.pmf)
    np.testing.assert_allclose(mm, ms, rtol=1e-5, atol=1e-7)

    from psdr_tpu import PathTracer
    pt = PathTracer(max_depth=2)
    pt.preprocess_indirect_edges(sc, 0, (4, 4, 4, 1), nrounds=1, seed=5,
                                 mesh=mesh)
    d = pt.ind_warpper[0].distrb
    pmf = np.asarray(d.pmf)
    assert np.isfinite(pmf).all() and (pmf >= 0).all()
    np.testing.assert_allclose(float(d.total), pmf.sum(), rtol=1e-5)
    assert pmf.sum() > 0.0


@pytest.mark.slow
def test_multiview_train_step_matches_serial():
    """BASELINE config 5 (scaled down): one view per device. The sharded
    multi-view step's loss and updated params must equal a serial
    emulation of mean-over-views L2 with matched per-device RNG folds,
    and a few steps must reduce the loss (deforming-mesh recovery)."""
    import dataclasses
    import optax
    from scenes import sphere_light_scene
    from psdr_tpu import PerspectiveCamera
    from psdr_tpu.core import transform as xfm
    from psdr_tpu.parallel.sharding import (make_multiview_train_step,
                                            _stack_sensors, _select_sensor)

    sc = sphere_light_scene(width=16, height=16, spp=2)
    sc.opts = dataclasses.replace(sc.opts, sppe=2, sppse=4)
    for i, eye in enumerate(([6.0, 1.5, 0.0], [0.0, 1.5, 6.0],
                             [-6.0, 1.5, 0.0])):
        cam = PerspectiveCamera(fov_x=40.0)
        cam.set_transform(np.asarray(xfm.look_at(eye, [0, 0, 0], [0, 1, 0])))
        sc.add_sensor(cam)
    n_views = sc.num_sensors  # 4
    integ = DirectIntegrator(1, 1)

    # targets: renders at the true params
    sc.prepare_accel()
    targets = [np.asarray(integ.radiance_image(
        sc, sc.build(sc.params()), s, jax.random.PRNGKey(900 + s), False))
        for s in range(n_views)]

    mesh = device_mesh(4)  # 4 devices = 4 views; the serial emulation
    n_dev = 4              # traces n_dev full renders, so keep it lean
    # optimize only the deformed mesh's translation column (the recovery
    # check below perturbs the transform; Adam's per-element
    # normalization on the full 4x4 / vertices / albedo thrashes at this
    # tiny scale — see examples/multiview_inverse.py)
    p0_l = sc.params()
    t_mask = np.zeros((4, 4), np.float32)
    t_mask[0:3, 3] = 1.0
    mask_tree = jax.tree.map(lambda a: jnp.zeros_like(a), p0_l)
    mask_tree["meshes"][0]["to_world"] = jnp.asarray(t_mask)

    def entrywise_mask(m_tree):
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            return jax.tree.map(lambda u, m: u * m, updates, m_tree), state

        return optax.GradientTransformation(init, update)

    optimizer = optax.chain(optax.adam(5e-2), entrywise_mask(mask_tree))
    step, opt_state = make_multiview_train_step(
        integ, sc, mesh, targets, optimizer=optimizer, with_boundary=True)

    params0 = sc.params()
    key = jax.random.PRNGKey(3)
    p1, s1, loss1 = step(params0, opt_state, key)

    # serial emulation with identical per-device keys and view mapping
    def total_loss(q):
        tot = 0.0
        flat = sc.build(q)
        stacked, reso = _stack_sensors(flat.sensors)
        for d in range(n_dev):
            view = d % n_views
            fl = flat._replace(sensors=(_select_sensor(stacked, reso,
                                                       jnp.int32(view)),))
            img = integ.radiance_image(sc, fl, 0,
                                       jax.random.fold_in(key, d), True)
            diff = img - jnp.asarray(targets[view])
            tot = tot + jnp.mean(diff * diff)
        return tot / n_dev

    loss_ref, g_ref = jax.jit(jax.value_and_grad(total_loss))(params0)
    np.testing.assert_allclose(float(loss1), float(loss_ref), rtol=1e-5)
    updates, _ = optimizer.update(g_ref, optimizer.init(params0), params0)
    p_ref = optax.apply_updates(params0, updates)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4,
            atol=5e-5 * (np.abs(np.asarray(b)).max() + 1e-9)),
        p1, p_ref)

    # deform the mesh and recover: loss must drop over a few steps
    # (eps=1.0 puts the loss ~3.5x above the MC noise floor at this
    # resolution; smaller offsets drown in sampling noise)
    import psdr_tpu.testing.differential as dif
    p_bad = dif.apply_perturbation("mesh_transform", sc.params(), 1.0,
                                   mesh_index=0, direction=(1.0, 0.0, 0.0))
    p, st = p_bad, opt_state
    losses = []
    for i in range(5):
        p, st, l = step(p, st, jax.random.PRNGKey(10 + i))
        losses.append(float(l))
    assert min(losses[-2:]) < losses[0], losses


@pytest.mark.slow
def test_sharded_pathtracer_boundary_matches_serial():
    """Round-3 estimator paths (emitter-first boundary visibility,
    known-triangle camera traces, sparse occlusion cond, indirect +
    camera-side walks) under lane-DP sharding: PathTracer gradients with
    every boundary term enabled must match the serial emulation."""
    from psdr_tpu import PathTracer
    sc = cbox_scene(width=12, height=12, spp=2, sppe=4, sppse=4)
    integrator = PathTracer(max_depth=2, camera_depth=2)
    mesh = device_mesh(4)
    render_sh = shard_render_fn(integrator, sc, mesh, with_boundary=True)
    render_ser = _serial_reference(integrator, sc, 4, "lanes",
                                   with_boundary=True)
    params = sc.params()
    key = jax.random.PRNGKey(5)

    def loss(p, k, r):
        def inner(q):
            return jnp.mean(r(q, k))
        return jax.grad(inner)(p)

    g_sh = jax.jit(lambda p, k: loss(p, k, render_sh))(params, key)
    g_ser = jax.jit(lambda p, k: loss(p, k, render_ser))(params, key)
    a = np.asarray(g_sh["meshes"][0]["to_world"], np.float64)
    b = np.asarray(g_ser["meshes"][0]["to_world"], np.float64)
    assert np.isfinite(a).all() and np.abs(a).max() > 0
    np.testing.assert_allclose(a, b, rtol=5e-4,
                               atol=5e-5 * max(np.abs(b).max(), 1e-12))
