"""Multi-chip scaling: data-parallel Monte-Carlo rendering over a TPU mesh.

The reference (psdr-cuda) is strictly single-GPU — its only parallelism is
the wavefront array (SURVEY.md §2.3). This module is new capability: shard
the Monte-Carlo sample budget over a `jax.sharding.Mesh` with `shard_map`,
replicate the (small) flattened scene, and `pmean` the per-device partial
images. Gradients of replicated parameters are reduced automatically by the
`shard_map` transpose (broadcast-in → psum-of-cotangents-out), so a jitted
`value_and_grad` training step needs no manual collectives; the all-reduce
rides ICI.

Design notes (tpu-first):
* Monte-Carlo estimators are linear in sample count, so DP over samples is
  exact: each device renders the full image with 1/D of the per-pixel sample
  budget under an independent fold of the RNG key, and the mean over the
  mesh axis is the same estimator as the single-chip render with the full
  budget.
* Per-device sample counts (spp/sppe/sppse divided by D) are static, keeping
  every shape inside the jitted region static as XLA requires.
* The flat scene pytree enters replicated (`P()`), so no gather/scatter of
  geometry crosses chips; the only collectives are the image `pmean` and the
  parameter-gradient `psum` inserted by AD.
"""
from __future__ import annotations

import copy
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def device_mesh(n_devices: Optional[int] = None,
                axis_name: str = "dp",
                devices: Optional[Sequence] = None) -> Mesh:
    """A 1D device mesh over the sample (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def _scaled_opts_scene(scene, n_dev: int):
    """A shallow scene copy whose per-device sample budgets are 1/n_dev."""
    import dataclasses
    opts = scene.opts
    local = copy.copy(scene)
    local.opts = dataclasses.replace(opts, spp=opts.spp // n_dev,
                                     sppe=opts.sppe // n_dev,
                                     sppse=opts.sppse // n_dev)
    return local


def _budgets_divisible(opts, n_dev: int) -> bool:
    return all(v % n_dev == 0 for v in (opts.spp, opts.sppe, opts.sppse))


def per_device_render_fn(integrator, scene, n_dev: int, sensor_id: int = 0,
                         with_boundary: bool = True, mode: str = "auto"):
    """The per-device partial render ``g(params, key, d) -> partial image``,
    with the property that  mean_d g  ==  the full-budget estimator.

    Two DP schemes (``mode``: "auto" | "budget" | "lanes"):
    * budget: spp/sppe/sppse split across devices (requires divisibility);
      each device renders the whole wavefront at 1/n_dev budget.
    * lanes: every device renders a contiguous 1/n_dev slice of the
      *full-budget* lane domain of every term — exact for any sample count
      (base.py shard_lane_range), at the price of building the full-size
      wavefront chunk grid on each device.

    Factored out of ``shard_render_fn`` so tests can run the identical math
    serially (a loop over d) and assert the sharded render/gradients match
    the emulation to float tolerance.
    """
    if mode == "auto":
        mode = "budget" if _budgets_divisible(scene.opts, n_dev) else "lanes"
    scene.prepare_accel()
    if mode == "budget":
        local_scene = _scaled_opts_scene(scene, n_dev)

        def g(params, key, d):
            key = jax.random.fold_in(key, d)
            flat = local_scene.build(params)
            return integrator.radiance_image(local_scene, flat, sensor_id,
                                             key, with_boundary)
    elif mode == "lanes":
        def g(params, key, d):
            key = jax.random.fold_in(key, d)
            flat = scene.build(params)
            # partial sums of the full-budget estimator: scale by n_dev so
            # the mean over devices is the estimator itself
            return n_dev * integrator.radiance_image(
                scene, flat, sensor_id, key, with_boundary,
                shard=(d, n_dev))
    else:
        raise ValueError(f"unknown DP mode {mode!r}")
    return g


def shard_render_fn(integrator, scene, mesh: Mesh, sensor_id: int = 0,
                    with_boundary: bool = True, mode: str = "auto"):
    """A jittable, differentiable ``f(params, key) -> (num_pixels, 3)`` that
    renders data-parallel over ``mesh``'s first axis.

    AD flows through scene build (geometry) exactly like the single-chip
    ``Integrator.render_fn``; each device computes its partial (budget split
    when divisible, exact lane slices otherwise — see per_device_render_fn)
    and the partials are averaged with ``pmean``.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    g = per_device_render_fn(integrator, scene, n_dev, sensor_id,
                             with_boundary, mode)

    def per_device(params, key):
        return jax.lax.pmean(g(params, key, jax.lax.axis_index(axis)), axis)

    params_spec = jax.tree.map(lambda _: P(), scene.params())
    f = shard_map(per_device, mesh=mesh,
                  in_specs=(params_spec, P()), out_specs=P(),
                  check_vma=False)

    def render(params, key):
        return f(params, key)

    return render


def replicate_scene_params(params, mesh: Mesh):
    """Place a parameter pytree replicated over every device of the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def make_train_step(integrator, scene, mesh: Mesh, target_image,
                    optimizer=None, sensor_id: int = 0,
                    with_boundary: bool = True, overlap: bool = False):
    """Jitted multi-chip inverse-rendering step.

    Returns ``(step, opt_state)`` where
    ``step(params, opt_state, key) -> (params, opt_state, loss)`` renders
    data-parallel, computes an L2 loss against ``target_image``
    ((num_pixels, 3), replicated), backpropagates through the sharded render
    (geometry + BSDF + emitter + sensor parameter gradients, psum'd over the
    mesh), and applies one optimizer update.

    ``overlap=False``: gradients cross the shard_map boundary, so the
    transpose emits ONE fused all-reduce of every leaf at the very end of
    the backward pass — nothing can hide its latency.

    ``overlap=True``: the whole step (value_and_grad + per-leaf psums +
    optimizer update) runs inside shard_map. Gradient leaves are reduced
    in explicit descending-size groups with an optimization barrier between
    group k's reduction and group k+1's use, so the large reductions
    (vertex positions, texture bitmaps) are issued first and — on hardware
    with async collectives (TPU ICI/DCN) — overlap the remaining reduction
    + optimizer math instead of serializing after it (BASELINE v5e-16
    scaling target; SURVEY §5.8). Numerically identical to the default
    path (tests/test_parallel.py pins it).
    """
    import optax
    if optimizer is None:
        optimizer = optax.adam(1e-2)
    target = jnp.asarray(target_image)
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    opt_state = optimizer.init(scene.params())

    if not overlap:
        render = shard_render_fn(integrator, scene, mesh, sensor_id,
                                 with_boundary)

        def loss_fn(params, key):
            img = render(params, key)
            diff = img - target
            return jnp.mean(diff * diff)

        @jax.jit
        def step(params, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step, opt_state

    g = per_device_render_fn(integrator, scene, n_dev, sensor_id,
                             with_boundary)

    def per_device(params, opt_state, key):
        d = jax.lax.axis_index(axis)

        # explicit VJP: the L2-loss cotangent is an analytic constant, so
        # no AD rule has to transpose a collective (under check_vma=False
        # the transpose of psum is psum, which double-counts replicated
        # cotangents by n_dev — measured, not hypothetical)
        img_local, vjp = jax.vjp(lambda q: g(q, key, d), params)
        img = jax.lax.pmean(img_local, axis)
        diff = img - target
        loss = jnp.mean(diff * diff)
        cot = jax.lax.stop_gradient(2.0 * diff / (diff.size * n_dev))
        grads = vjp(cot)[0]

        # explicit per-leaf reductions, biggest leaves first. Issue order
        # is a scheduling hint; how many distinct collectives survive is
        # the all-reduce combiner's call (tune
        # --xla_all_reduce_combine_threshold_bytes so MB-scale leaves —
        # vertex positions, texture bitmaps — stay separate and overlap)
        leaves, treedef = jax.tree.flatten(grads)
        order = sorted(range(len(leaves)), key=lambda i: -leaves[i].size)
        reduced = list(leaves)
        for i in order:
            reduced[i] = jax.lax.psum(reduced[i], axis)
        grads = jax.tree.unflatten(treedef, reduced)

        updates, new_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, loss

    params_spec = jax.tree.map(lambda _: P(), scene.params())
    state_spec = jax.tree.map(lambda _: P(), opt_state)
    f = shard_map(per_device, mesh=mesh,
                  in_specs=(params_spec, state_spec, P()),
                  out_specs=(params_spec, state_spec, P()),
                  check_vma=False)

    return jax.jit(f), opt_state


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host entry point: initialize jax.distributed so
    ``device_mesh()`` spans every chip of a multi-host slice. Sample DP and
    the psum'd gradients then ride ICI within hosts and DCN across them
    (the shard_map code path is topology-agnostic)."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


# -- multi-view (sensor-parallel) inverse rendering (BASELINE config 5) ------

def _stack_sensors(sensors):
    """Stack per-sensor SensorState pytrees along a leading axis so a
    traced device index can select its view. ``resolution`` is a static
    tuple (must match across sensors) and rides around the stack."""
    s0 = sensors[0]
    assert all(s.resolution == s0.resolution for s in sensors), \
        "multi-view sharding needs equal per-sensor resolutions"
    stripped = [s._replace(resolution=None) for s in sensors]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *stripped)
    return stacked, s0.resolution


def _select_sensor(stacked, resolution, d):
    sel = jax.tree.map(lambda a: a[d], stacked)
    return sel._replace(resolution=resolution)


def make_multiview_train_step(integrator, scene, mesh: Mesh, targets,
                              optimizer=None, with_boundary: bool = True):
    """Jitted multi-view inverse-rendering step: one VIEW per device.

    BASELINE config 5's sharding axis: device d renders sensor
    ``d % n_sensors`` at the full per-view sample budget against
    ``targets[d % n_sensors]``; the loss is the mean over views of the
    per-view L2, gradients (geometry + materials + emitters + sensors)
    are ``psum``'d over the mesh, and the optimizer update runs inside
    ``shard_map`` like the overlapped path of ``make_train_step``.

    Requires ``len(mesh) % n_sensors == 0`` (views get equal device
    counts; replicas of a view draw independent RNG folds, which only
    lowers that view's estimator variance).
    """
    import optax
    if optimizer is None:
        optimizer = optax.adam(1e-2)
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n_views = scene.num_sensors
    assert n_dev % n_views == 0, \
        f"{n_dev} devices cannot evenly cover {n_views} views"
    targets = jnp.stack([jnp.asarray(t) for t in targets])
    assert targets.shape[0] == n_views
    scene.prepare_accel()
    opt_state = optimizer.init(scene.params())

    def per_device(params, opt_state, key):
        d = jax.lax.axis_index(axis)
        view = d % n_views

        def render_view(q):
            flat = scene.build(q)
            stacked, reso = _stack_sensors(flat.sensors)
            flat = flat._replace(
                sensors=(_select_sensor(stacked, reso, view),))
            return integrator.radiance_image(
                scene, flat, 0, jax.random.fold_in(key, d), with_boundary)

        # explicit VJP with an analytic loss cotangent (see
        # make_train_step: transposing a collective under check_vma=False
        # double-counts replicated cotangents)
        img, vjp = jax.vjp(render_view, params)
        diff = img - targets[view]
        loss = jax.lax.pmean(jnp.mean(diff * diff), axis)
        cot = jax.lax.stop_gradient(2.0 * diff / (diff.size * n_dev))
        grads = vjp(cot)[0]

        leaves, treedef = jax.tree.flatten(grads)
        order = sorted(range(len(leaves)), key=lambda i: -leaves[i].size)
        reduced = list(leaves)
        for i in order:
            reduced[i] = jax.lax.psum(reduced[i], axis)
        grads = jax.tree.unflatten(treedef, reduced)

        updates, new_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, loss

    params_spec = jax.tree.map(lambda _: P(), scene.params())
    state_spec = jax.tree.map(lambda _: P(), opt_state)
    f = shard_map(per_device, mesh=mesh,
                  in_specs=(params_spec, state_spec, P()),
                  out_specs=(params_spec, state_spec, P()),
                  check_vma=False)
    return jax.jit(f), opt_state
