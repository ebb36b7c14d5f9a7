"""Unit tests for the core math / sampling layer (SURVEY.md §4a:
pure-function tests against closed forms)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psdr_tpu.core import frame, warp, math as m, transform as xf
from psdr_tpu.core.distribution import (discrete_init, discrete_sample_reuse,
                                        hypercube_init, hypercube_pdf,
                                        hypercube_sample_reuse)


def test_frame_orthonormal():
    key = jax.random.PRNGKey(0)
    n = m.normalize(jax.random.normal(key, (1000, 3)))
    f = frame.make_frame(n)
    assert np.allclose(m.dot(f.s, f.t), 0, atol=1e-5)
    assert np.allclose(m.dot(f.s, f.n), 0, atol=1e-5)
    assert np.allclose(m.norm(f.s), 1, atol=1e-5)
    assert np.allclose(m.norm(f.t), 1, atol=1e-5)
    # round trip
    v = m.normalize(jax.random.normal(jax.random.PRNGKey(1), (1000, 3)))
    v2 = frame.to_world(f, frame.to_local(f, v))
    assert np.allclose(v, v2, atol=1e-5)


def test_cosine_hemisphere_pdf_integrates_to_one():
    # Monte-Carlo check: E[pdf-weighted] consistency + chi-square-ish moment
    u = jax.random.uniform(jax.random.PRNGKey(2), (200000, 2))
    v = warp.square_to_cosine_hemisphere(u)
    assert np.all(np.asarray(v[:, 2]) >= 0)
    assert np.allclose(m.norm(v), 1, atol=1e-4)
    # cos-weighted sampling => E[z] = integral z * (z/pi) dOmega = 2/3
    assert abs(float(jnp.mean(v[:, 2])) - 2.0 / 3.0) < 5e-3


def test_uniform_triangle():
    u = jax.random.uniform(jax.random.PRNGKey(3), (100000, 2))
    b = warp.square_to_uniform_triangle(u)
    b = np.asarray(b)
    assert np.all(b >= 0) and np.all(b.sum(-1) <= 1 + 1e-6)
    # centroid of uniform samples on unit right triangle is (1/3, 1/3)
    assert np.allclose(b.mean(0), [1 / 3, 1 / 3], atol=5e-3)


def test_discrete_sample_reuse():
    pmf = jnp.array([1.0, 2.0, 3.0, 4.0])
    d = discrete_init(pmf)
    u = jax.random.uniform(jax.random.PRNGKey(4), (200000,))
    idx, pdf, rem = discrete_sample_reuse(d, u)
    idx = np.asarray(idx)
    counts = np.bincount(idx, minlength=4) / idx.shape[0]
    assert np.allclose(counts, [0.1, 0.2, 0.3, 0.4], atol=5e-3)
    assert np.allclose(np.asarray(pdf), np.asarray(pmf)[idx] / 10.0)
    rem = np.asarray(rem)
    assert np.all((rem >= 0) & (rem <= 1))
    # remapped residuals must be ~uniform (mean 1/2, var 1/12)
    assert abs(rem.mean() - 0.5) < 5e-3
    assert abs(rem.var() - 1 / 12) < 5e-3


def test_hypercube_distribution_3d():
    hc = hypercube_init((4, 3, 2))
    mass = jnp.arange(24, dtype=jnp.float32) + 1.0
    from psdr_tpu.core.distribution import hypercube_set_mass
    hc = hypercube_set_mass(hc, mass)
    u = jax.random.uniform(jax.random.PRNGKey(5), (100000, 3))
    w, pdf = hypercube_sample_reuse(hc, u)
    w_np = np.asarray(w)
    assert np.all((w_np >= 0) & (w_np <= 1))
    # pdf at the sampled point must equal the returned pdf
    pdf2 = hypercube_pdf(hc, w)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-5)
    # MC integral of 1/pdf over samples = volume = 1
    assert abs(float(jnp.mean(1.0 / pdf)) - 1.0) < 2e-2


def test_moeller_trumbore_and_grad():
    p0 = jnp.array([[0.0, 0.0, 1.0]])
    e1 = jnp.array([[1.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.2, 0.3, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    uv, t = m.ray_intersect_triangle(p0, e1, e2, o, d)
    assert np.allclose(np.asarray(t), 1.0, atol=1e-6)
    assert np.allclose(np.asarray(uv), [[0.2, 0.3]], atol=1e-6)

    # derivative of hit distance w.r.t. triangle z-offset is 1
    def f(z):
        uv2, t2 = m.ray_intersect_triangle(p0 + jnp.array([0, 0, 1.0]) * z,
                                           e1, e2, o, d)
        return t2[0]
    g = jax.grad(f)(0.0)
    assert np.allclose(np.asarray(g), 1.0, atol=1e-5)


def test_transforms():
    p = jnp.array([[1.0, 2.0, 3.0]])
    t = xf.translate([1.0, 0.0, 0.0])
    assert np.allclose(np.asarray(xf.transform_pos(t, p)), [[2, 2, 3]])
    r = xf.rotate([0, 0, 1], 90.0)
    out = xf.transform_pos(r, jnp.array([[1.0, 0.0, 0.0]]))
    assert np.allclose(np.asarray(out), [[0, 1, 0]], atol=1e-6)
    lk = xf.look_at([0, 0, 0], [0, 0, 5], [0, 1, 0])
    d = xf.transform_dir(lk, jnp.array([[0.0, 0.0, 1.0]]))
    assert np.allclose(np.asarray(d), [[0, 0, 1]], atol=1e-6)


def test_aabb_exit():
    lower = jnp.array([-1.0, -1.0, -1.0])
    upper = jnp.array([1.0, 1.0, 1.0])
    o = jnp.zeros((1, 3))
    d = jnp.array([[1.0, 0.0, 0.0]])
    t, n, G = m.ray_intersect_scene_aabb(o, d, lower, upper)
    assert np.allclose(np.asarray(t), 1.0)
    assert np.allclose(np.asarray(n), [[-1, 0, 0]])
    assert np.allclose(np.asarray(G), 1.0)


def test_fresnel_normal_incidence():
    # At normal incidence: R = ((n-1)^2 + k^2) / ((n+1)^2 + k^2)
    eta = jnp.array([[2.0, 2.0, 2.0]])
    k = jnp.array([[0.0, 0.0, 0.0]])
    F = m.fresnel_conductor(eta, k, jnp.array([1.0]))
    assert np.allclose(np.asarray(F), ((2 - 1) / (2 + 1)) ** 2, atol=1e-5)
