"""Optimizer + AD/FD harness tests: param addressing, masked updates, an
actual inverse-rendering recovery, and harness AD-vs-FD agreement."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psdr_tpu import DirectIntegrator
from psdr_tpu.opt import Optimizer, param_mask, resolve_param_path
from psdr_tpu.testing import run_ad, run_fd, run_orig

from scenes import sphere_light_scene


def test_param_addressing():
    sc = sphere_light_scene()
    assert resolve_param_path(sc, "BSDF[id=white].reflectance") == \
        ("bsdfs", 0, "reflectance")
    assert resolve_param_path(sc, "Mesh[0].vertex_positions") == \
        ("meshes", 0, "vertex_positions")
    assert resolve_param_path(sc, "Mesh[1]") == ("meshes", 1, None)
    with pytest.raises(KeyError):
        resolve_param_path(sc, "BSDF[id=nope].reflectance")
    with pytest.raises(KeyError):
        resolve_param_path(sc, "Mesh[0].nope")

    mask = param_mask(sc, ["BSDF[id=white].reflectance"])
    assert mask["bsdfs"][0]["reflectance"] is True
    assert mask["bsdfs"][1]["reflectance"] is False
    assert mask["meshes"][0]["vertex_positions"] is False


def test_masked_updates_only_touch_selected():
    sc = sphere_light_scene(width=16, height=16, spp=2)
    integ = DirectIntegrator(1, 1)
    render = jax.jit(integ.render_fn(sc, with_boundary=False))
    opt = Optimizer(sc, ["BSDF[id=white].reflectance"], lr=0.05)
    before = jax.tree.map(lambda x: np.asarray(x), opt.params)

    def loss_fn(params):
        return jnp.mean(render(params, jax.random.PRNGKey(0)))

    opt.step(loss_fn)
    after = opt.params
    assert not np.allclose(np.asarray(after["bsdfs"][0]["reflectance"]),
                           before["bsdfs"][0]["reflectance"])
    np.testing.assert_array_equal(
        np.asarray(after["meshes"][0]["vertex_positions"]),
        before["meshes"][0]["vertex_positions"])
    np.testing.assert_array_equal(
        np.asarray(after["bsdfs"][1]["reflectance"]),
        before["bsdfs"][1]["reflectance"])


def test_inverse_albedo_recovery():
    """End-to-end inverse rendering: recover the sphere albedo from a target
    image (the reference's docs/inverse_diff_render.rst workload)."""
    sc = sphere_light_scene(width=24, height=24, spp=4)
    integ = DirectIntegrator(1, 1)
    render = jax.jit(integ.render_fn(sc, with_boundary=False))

    target_params = sc.params()
    target = render(target_params, jax.random.PRNGKey(99))

    # start from a wrong albedo
    sc.bsdfs[0].reflectance = type(sc.bsdfs[0].reflectance)(
        data=jnp.full((1, 1, 3), 0.2, jnp.float32))
    opt = Optimizer(sc, ["BSDF[id=white].reflectance"], lr=0.1)

    def loss_fn(params, key):
        img = render(params, key)
        return jnp.mean((img - target) ** 2)

    losses = []
    for it in range(80):
        losses.append(opt.step(loss_fn, jax.random.PRNGKey(it)))
    recovered = np.asarray(opt.params["bsdfs"][0]["reflectance"]).ravel()
    np.testing.assert_allclose(recovered, [0.8, 0.8, 0.8], atol=0.08)
    # loss falls to the MC-noise floor (target uses a different key)
    assert losses[-1] < losses[0] * 0.5


def test_harness_ad_matches_fd_interior():
    """run_ad vs run_fd on a material (interior-only) perturbation."""
    from psdr_tpu import RoughConductor, Scene, AreaLight, PerspectiveCamera
    from psdr_tpu import RenderOptions
    from psdr_tpu.core import transform as xf
    from psdr_tpu.shape import primitives

    sc = Scene()
    metal = sc.add_bsdf(RoughConductor(alpha_u=0.2, alpha_v=0.2), "metal")
    sphere = primitives.make_icosphere(subdiv=2, radius=1.0, bsdf_id=metal)
    sc.add_mesh(sphere)
    light = primitives.make_quad(size=1.0, bsdf_id=-1, enable_edges=False,
                                 use_face_normals=True)
    light.set_transform(np.asarray(
        xf.translate([0, 3.0, 3.0]) @ xf.rotate([1, 0, 0], 135.0)))
    li = sc.add_mesh(light)
    sc.add_emitter(AreaLight([8.0, 8.0, 8.0], mesh_index=li))
    cam = PerspectiveCamera(fov_x=40.0)
    cam.set_transform(np.asarray(xf.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])))
    sc.add_sensor(cam)
    sc.opts = RenderOptions(width=24, height=24, spp=32)

    integ = DirectIntegrator(1, 1)
    ad = run_ad(sc, integ, "material_roughness", npass=4)
    fd = run_fd(sc, integ, "material_roughness", eps=0.01, npass=4)
    assert np.abs(ad).max() > 0.0
    # normalized agreement over well-covered pixels
    denom = np.abs(fd).max()
    err = np.abs(ad - fd) / denom
    assert np.percentile(err, 95) < 0.15


def test_checkpoint_resume(tmp_path):
    """Optimizer save/load restores params + Adam moments exactly."""
    sc = sphere_light_scene(width=12, height=12, spp=2)
    integ = DirectIntegrator(1, 1)
    render = jax.jit(integ.render_fn(sc, with_boundary=False))

    def loss_fn(params, key):
        return jnp.mean(render(params, key))

    opt = Optimizer(sc, ["BSDF[id=white].reflectance"], lr=0.05)
    for i in range(3):
        opt.step(loss_fn, jax.random.PRNGKey(i))
    opt.save(str(tmp_path / "ckpt.npz"))
    ref_next = jax.tree.map(np.asarray, opt.params)
    opt.step(loss_fn, jax.random.PRNGKey(3))
    after4 = np.asarray(opt.params["bsdfs"][0]["reflectance"])

    opt2 = Optimizer(sc, ["BSDF[id=white].reflectance"], lr=0.05)
    opt2.load(str(tmp_path / "ckpt.npz"))
    np.testing.assert_array_equal(
        np.asarray(opt2.params["bsdfs"][0]["reflectance"]),
        ref_next["bsdfs"][0]["reflectance"])
    opt2.step(loss_fn, jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        np.asarray(opt2.params["bsdfs"][0]["reflectance"]), after4,
        rtol=1e-6)


def test_mesh_dump_roundtrip(tmp_path):
    """Mesh.dump -> load_obj reproduces geometry (mesh.cpp:354-418)."""
    from psdr_tpu.shape import load_obj, primitives
    m = primitives.make_icosphere(subdiv=1, radius=1.0)
    m.dump(str(tmp_path / "m.obj"))
    m2 = load_obj(str(tmp_path / "m.obj"))
    np.testing.assert_allclose(m2.vertices, m.vertices, rtol=1e-5)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_multi_sensor_render():
    """Two sensors: render_fn(sensor_id) selects the right view."""
    from psdr_tpu import PerspectiveCamera
    from psdr_tpu.core import transform as xfm
    sc = sphere_light_scene(width=16, height=16, spp=2)
    cam2 = PerspectiveCamera(fov_x=40.0)
    cam2.set_transform(np.asarray(
        xfm.look_at([6.0, 1.5, 0.0], [0, 0, 0], [0, 1, 0])))
    sc.add_sensor(cam2)
    integ = DirectIntegrator(1, 1)
    img0 = np.asarray(integ.renderC(sc, sensor_id=0, seed=0))
    img1 = np.asarray(integ.renderC(sc, sensor_id=1, seed=0))
    assert np.all(np.isfinite(img0)) and np.all(np.isfinite(img1))
    assert not np.allclose(img0, img1)
