"""Indirect-boundary estimator validation (beyond the reference: the
direction-sampled boundary integral for indirectly-lit discontinuities).

Scene: an upward-facing area light illuminates a white ceiling panel; the
camera sees a floor lit ONLY by the ceiling's reflection. A blocker quad
between ceiling and floor casts a gradient-bearing shadow whose motion the
interior + direct-boundary estimators cannot capture — the far side of the
blocker's silhouette segments is the (non-emissive) bright ceiling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psdr_tpu import (AreaLight, Diffuse, PathTracer, PerspectiveCamera,
                      RenderOptions, Scene)
from psdr_tpu.core import transform as xf
from psdr_tpu.shape import primitives
from psdr_tpu.testing import apply_perturbation


def _gi_shadow_scene(width=24, height=24, spp=32, sppe=2, sppse=32):
    sc = Scene()
    white = sc.add_bsdf(Diffuse([0.9, 0.9, 0.9]), "white")
    grey = sc.add_bsdf(Diffuse([0.6, 0.6, 0.6]), "grey")
    black = sc.add_bsdf(Diffuse([0.0, 0.0, 0.0]), "black")

    floor = primitives.make_quad(size=3.0, bsdf_id=grey, enable_edges=False,
                                 use_face_normals=True)
    floor.set_transform(np.asarray(xf.rotate([1, 0, 0], -90.0)))  # +y normal
    sc.add_mesh(floor)

    ceiling = primitives.make_quad(size=3.0, bsdf_id=white,
                                   enable_edges=False, use_face_normals=True)
    ceiling.set_transform(np.asarray(
        xf.translate([0, 2.0, 0]) @ xf.rotate([1, 0, 0], 90.0)))  # -y normal
    sc.add_mesh(ceiling)

    # small light above the floor facing UP: lights the ceiling only
    light = primitives.make_quad(size=0.3, bsdf_id=black, enable_edges=False,
                                 use_face_normals=True)
    light.set_transform(np.asarray(
        xf.translate([1.2, 0.4, 1.2]) @ xf.rotate([1, 0, 0], -90.0)))
    li = sc.add_mesh(light)
    sc.add_emitter(AreaLight([60.0, 60.0, 60.0], mesh_index=li))

    # blocker between ceiling and floor, horizontal, edges enabled
    blocker = primitives.make_quad(size=0.5, bsdf_id=grey, enable_edges=True,
                                   use_face_normals=True)
    blocker.set_transform(np.asarray(
        xf.translate([0, 0.35, 0]) @ xf.rotate([1, 0, 0], -90.0)))
    sc.add_mesh(blocker)

    cam = PerspectiveCamera(fov_x=45.0)
    cam.set_transform(np.asarray(
        xf.look_at([0, 1.4, 2.8], [0, 0.0, 0], [0, 1, 0])))
    sc.add_sensor(cam)
    sc.opts = RenderOptions(width=width, height=height, spp=spp, sppe=sppe,
                            sppse=sppse)
    return sc


MODE = dict(mesh_index=3, direction=(1.0, 0.0, 0.0))  # slide the blocker


def _scalar_fd(scene, integ, eps=0.02, npass=24):
    render = jax.jit(integ.render_fn(scene, with_boundary=False))
    base = scene.params()
    acc = 0.0
    for i in range(npass):
        key = jax.random.PRNGKey(i)
        hi = render(apply_perturbation("mesh_transform", base, +eps, **MODE),
                    key)
        lo = render(apply_perturbation("mesh_transform", base, -eps, **MODE),
                    key)
        acc += float((hi.mean() - lo.mean()) / (2 * eps))
    return acc / npass


def _scalar_ad(scene, integ, npass=16, seed0=500):
    render = integ.render_fn(scene, with_boundary=True)
    base = scene.params()

    @jax.jit
    def deriv(key):
        def f(P):
            return render(apply_perturbation("mesh_transform", base, P,
                                             **MODE), key).mean()
        return jax.jvp(f, (jnp.float32(0.0),), (jnp.float32(1.0),))[1]

    return float(np.mean([deriv(jax.random.PRNGKey(seed0 + i))
                          for i in range(npass)]))


def test_interior_gradient_is_zero():
    """Sanity: rigid translation of the flat blocker has NO interior
    derivative — the whole gradient is a visibility-boundary effect."""
    scene = _gi_shadow_scene(spp=8)
    integ = PathTracer(max_depth=2)
    render = integ.render_fn(scene, with_boundary=False)
    base = scene.params()

    def f(P):
        return render(apply_perturbation("mesh_transform", base, P, **MODE),
                      jax.random.PRNGKey(0)).mean()

    d = float(jax.jvp(f, (jnp.float32(0.0),), (jnp.float32(1.0),))[1])
    assert d == 0.0


@pytest.mark.slow
def test_indirect_boundary_matches_fd():
    scene = _gi_shadow_scene(width=20, height=20)
    fd = _scalar_fd(scene, PathTracer(max_depth=2), eps=0.05, npass=48)
    assert fd != 0.0

    ad_full = np.mean([_scalar_ad(scene, PathTracer(max_depth=2),
                                  npass=24, seed0=s)
                       for s in (500, 900)])

    # without the indirect term: monkeypatch it off
    integ_no_ind = PathTracer(max_depth=2)
    integ_no_ind.render_indirect_edges = \
        lambda sc, fl, sid, key, shard=None: jnp.zeros((sc.opts.num_pixels, 3),
                                           jnp.float32)
    ad_direct_only = _scalar_ad(scene, integ_no_ind, npass=24, seed0=500)

    # the direct-only estimator misses the GI-shadow motion entirely (it
    # even gets the sign wrong on this scene); the indirect term must both
    # fix the sign and land within MC noise of the FD reference
    assert np.sign(ad_full) == np.sign(fd)
    assert abs(ad_full - fd) < abs(ad_direct_only - fd)
    assert abs(ad_full - fd) < 0.5 * abs(fd) + 1e-4


@pytest.mark.slow
def test_indirect_guiding_builds_and_renders():
    scene = _gi_shadow_scene(width=12, height=12, spp=4, sppse=8)
    integ = PathTracer(max_depth=2)
    integ.preprocess_indirect_edges(scene, 0, (4, 4, 4, 2), nrounds=1)
    hc = integ.ind_warpper[0]
    assert float(jnp.sum(hc.distrb.pmf)) > 0.0  # some cells carry mass
    img = integ.renderD(scene, seed=0)
    assert np.all(np.isfinite(np.asarray(img)))
