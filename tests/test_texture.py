"""Texture-space gradients: per-texel derivatives through the bilinear
bitmap eval, and an inverse texture-recovery optimization (the reference's
Adam-over-reflectance.data workload at texture resolution)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psdr_tpu import (AreaLight, Diffuse, DirectIntegrator,
                      PerspectiveCamera, RenderOptions, Scene)
from psdr_tpu.core import transform as xf
from psdr_tpu.core.bitmap import Bitmap, from_array
from psdr_tpu.opt import Optimizer
from psdr_tpu.shape import primitives


def _textured_quad_scene(tex, width=32, height=32, spp=8):
    sc = Scene()
    mat = sc.add_bsdf(Diffuse(from_array(tex)), "tex")
    quad = primitives.make_quad(size=1.0, bsdf_id=mat, enable_edges=False,
                                use_face_normals=True)
    sc.add_mesh(quad)
    light = primitives.make_quad(size=0.5, bsdf_id=-1, enable_edges=False,
                                 use_face_normals=True)
    light.set_transform(np.asarray(
        xf.translate([0, 0, 3.0]) @ xf.rotate([1, 0, 0], 180.0)))
    li = sc.add_mesh(light)
    sc.add_emitter(AreaLight([12.0, 12.0, 12.0], mesh_index=li))
    cam = PerspectiveCamera(fov_x=45.0)
    cam.set_transform(np.asarray(xf.look_at([0, 0, 2.5], [0, 0, 0],
                                            [0, 1, 0])))
    sc.add_sensor(cam)
    sc.opts = RenderOptions(width=width, height=height, spp=spp)
    return sc


def test_texel_gradients_are_localized():
    """d(loss over left image half)/d(texels) must concentrate on the
    texels the left half sees."""
    tex = np.full((8, 8, 3), 0.5, np.float32)
    sc = _textured_quad_scene(tex)
    integ = DirectIntegrator(1, 1)
    render = jax.jit(integ.render_fn(sc, with_boundary=False))

    def loss(params):
        img = render(params, jax.random.PRNGKey(0))
        img = img.reshape(32, 32, 3)
        return jnp.mean(img[:, :16])  # left half of the image

    g = np.asarray(jax.grad(loss)(sc.params())["bsdfs"][0]["reflectance"])
    assert np.all(np.isfinite(g))
    left = np.abs(g[:, :4]).sum()
    right = np.abs(g[:, 5:]).sum()
    assert left > 3.0 * right


def test_inverse_texture_recovery():
    """Recover a 4x4 texture from a rendered target."""
    target_tex = np.zeros((4, 4, 3), np.float32)
    target_tex[:2, :2] = [0.8, 0.2, 0.2]
    target_tex[:2, 2:] = [0.2, 0.8, 0.2]
    target_tex[2:, :2] = [0.2, 0.2, 0.8]
    target_tex[2:, 2:] = [0.7, 0.7, 0.1]

    sc = _textured_quad_scene(target_tex, width=24, height=24, spp=8)
    integ = DirectIntegrator(1, 1)
    render = jax.jit(integ.render_fn(sc, with_boundary=False))
    target = render(sc.params(), jax.random.PRNGKey(77))

    sc.bsdfs[0].reflectance = Bitmap(
        data=jnp.full((4, 4, 3), 0.5, jnp.float32))
    opt = Optimizer(sc, ["BSDF[id=tex].reflectance"], lr=0.08)

    def loss_fn(params, key):
        return jnp.mean((render(params, key) - target) ** 2)

    for it in range(120):
        opt.step(loss_fn, jax.random.PRNGKey(it))

    rec = np.asarray(opt.params["bsdfs"][0]["reflectance"])
    # interior texels dominate coverage; allow slack on the uv border
    err = np.abs(rec - target_tex).mean()
    assert err < 0.12, f"mean texel error {err}"
