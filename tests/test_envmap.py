"""Environment-map emitter tests: estimator cross-validation (the
reference's MIS parity trick, SURVEY.md section 4.3) and AD-vs-FD for
envmap rotation + roughconductor under an envmap."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psdr_tpu import (AreaLight, DirectIntegrator, Diffuse, EnvironmentMap,
                      PerspectiveCamera, RenderOptions, RoughConductor, Scene)
from psdr_tpu.core import transform as xf
from psdr_tpu.shape import primitives
from psdr_tpu.testing import run_ad, run_fd


def _gradient_sky(h=16, w=32):
    """Bright band near the horizon on +x, dark elsewhere: azimuthally
    non-uniform so rotation has a visible derivative."""
    theta = np.linspace(0, np.pi, h, dtype=np.float32)[:, None]
    phi = np.linspace(0, 2 * np.pi, w, endpoint=False, dtype=np.float32)[None, :]
    val = (np.exp(-((theta - 1.3) ** 2) * 8.0)
           * (1.0 + 0.9 * np.cos(phi))) + 0.05
    return np.repeat(val.astype(np.float32)[..., None], 3, axis=-1)


def _env_scene(bsdf, width=24, height=24, spp=8):
    sc = Scene()
    b = sc.add_bsdf(bsdf, "mat")
    sphere = primitives.make_icosphere(subdiv=2, radius=1.0, bsdf_id=b)
    sc.add_mesh(sphere)
    sc.add_emitter(EnvironmentMap(_gradient_sky(), scale=1.0))
    cam = PerspectiveCamera(fov_x=40.0)
    cam.set_transform(np.asarray(xf.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])))
    sc.add_sensor(cam)
    sc.opts = RenderOptions(width=width, height=height, spp=spp)
    return sc


def _avg(integ, sc, seeds=6):
    return np.mean([np.asarray(integ.renderC(sc, seed=s))
                    for s in range(seeds)], axis=0)


def test_env_render_finite_nonzero():
    sc = _env_scene(Diffuse([0.7, 0.7, 0.7]))
    img = _avg(DirectIntegrator(1, 1), sc, seeds=2)
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01
    # background pixels see the envmap directly
    corner = img[0, 0]
    assert corner.sum() > 0.0


@pytest.mark.slow
def test_env_estimator_cross_validation():
    """BSDF-sampling-only, light-sampling-only and MIS must converge to the
    same image (validates envmap direction/position sampling + pdfs)."""
    sc = _env_scene(Diffuse([0.7, 0.7, 0.7]), spp=32)
    bsdf_only = _avg(DirectIntegrator(2, 0), sc)
    light_only = _avg(DirectIntegrator(0, 2), sc)
    mis = _avg(DirectIntegrator(1, 1), sc)

    # compare means over the sphere region (MC noise bounded by averaging)
    m = [img.mean() for img in (bsdf_only, light_only, mis)]
    assert abs(m[0] - m[1]) < 0.08 * m[2]
    assert abs(m[0] - m[2]) < 0.08 * m[2]


def test_envmap_rotation_ad_vs_fd():
    sc = _env_scene(Diffuse([0.7, 0.7, 0.7]), width=16, height=16, spp=16)
    integ = DirectIntegrator(1, 1)
    ad = run_ad(sc, integ, "envmap_rotate", npass=4)
    fd = run_fd(sc, integ, "envmap_rotate", eps=1.0, npass=4)
    assert np.abs(ad).max() > 0.0
    denom = np.abs(fd).max()
    err = np.abs(ad - fd) / max(denom, 1e-6)
    assert np.percentile(err, 95) < 0.2


def test_divided_grid_keeps_mass_of_small_features(monkeypatch):
    """PSDR_TPU_ENV_RESO_DIV>1 coarsens the importance grid; the coarse
    mass is MAX-pooled over each cell's fine-grid footprint so a small
    bright feature (HDRI sun disk) between coarse cell centers can never
    get zero mass / zero NEE pdf (which would bias light-only estimators).
    Invariant pinned here: fine mass > 0 => coarse pmf of covering cell > 0."""
    from psdr_tpu.emitter.envmap import configure_envmap
    from psdr_tpu.core.bitmap import Bitmap, eval_bitmap
    from psdr_tpu.core.distribution import hypercube_init
    from psdr_tpu.core.math import rgb2luminance
    from psdr_tpu.core.constants import Pi

    h, w = 256, 512  # fine grid 1022x510 > 2^18 cells -> divides at div=4
    img = np.zeros((h, w, 3), np.float32)
    img[100, 300] = 50.0     # lone sun-disk texel
    img[13, 477] = 25.0      # a second one elsewhere
    monkeypatch.setenv("PSDR_TPU_ENV_RESO_DIV", "4")
    st = configure_envmap(
        {"radiance": jnp.asarray(img), "scale": np.float32(1.0),
         "to_world": jnp.eye(4)},
        lower=-jnp.ones(3), upper=jnp.ones(3))
    gw, gh = (int(st.cell_distrb.resolution[0]), int(st.cell_distrb.resolution[1]))
    gw_f, gh_f = (w - 1) * 2, (h - 1) * 2
    assert (gw, gh) != (gw_f, gh_f), "expected the divided grid"

    # reference-parity fine mass (the div=1 computation)
    fine = hypercube_init((gw_f, gh_f))
    uv = (fine.cells.astype(jnp.float32) + 0.5) * fine.unit
    val = eval_bitmap(Bitmap(jnp.asarray(img)), uv)
    theta = ((jnp.arange(gw_f * gh_f, dtype=jnp.float32) % gh_f) + 0.5) * (Pi / gh_f)
    m_fine = np.asarray(rgb2luminance(val) * jnp.sin(theta)).reshape(gw_f, gh_f)

    pmf = np.asarray(st.cell_distrb.distrb.pmf).reshape(gw, gh)
    cx = (np.arange(gw_f) * gw) // gw_f
    cy = (np.arange(gh_f) * gh) // gh_f
    covered = pmf[cx[:, None], cy[None, :]]       # (gw_f, gh_f)
    assert np.all(covered[m_fine > 0] > 0), \
        "a nonzero-radiance direction lost all mass in the divided grid"
    assert np.isfinite(np.asarray(st.cell_distrb.distrb.total))


def test_roughconductor_under_envmap():
    sc = _env_scene(RoughConductor(alpha_u=0.3, alpha_v=0.3), spp=32)
    img = _avg(DirectIntegrator(1, 1), sc, seeds=3)
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.005


def test_alias_and_cmf_envmap_estimators_agree(monkeypatch):
    """Large envmap grids freeze an O(1) alias importance table at trace
    time; light-only estimates through the alias path must agree with the
    cmf-search path (both unbiased for the same radiance)."""
    sky = _gradient_sky(h=160, w=320)       # fine grid 202k cells > 2^15
    sky[40, 200] *= 400.0                   # concentrated feature
    def build():
        sc = Scene()
        b = sc.add_bsdf(Diffuse([0.7, 0.7, 0.7]), "mat")
        sc.add_mesh(primitives.make_icosphere(subdiv=2, radius=1.0, bsdf_id=b))
        sc.add_emitter(EnvironmentMap(sky, scale=1.0))
        cam = PerspectiveCamera(fov_x=40.0)
        cam.set_transform(np.asarray(xf.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])))
        sc.add_sensor(cam)
        sc.opts = RenderOptions(width=16, height=16, spp=64)
        return sc

    monkeypatch.setenv("PSDR_TPU_ENV_ALIAS", "1")
    sc = build()
    flat = sc.build(sc.params())
    assert flat.envmap.cell_distrb.alias is not None, \
        "expected the frozen alias path for a 202k-cell grid"
    img_alias = _avg(DirectIntegrator(0, 1), sc, seeds=6)

    monkeypatch.setenv("PSDR_TPU_ENV_ALIAS", "0")
    sc2 = build()
    flat2 = sc2.build(sc2.params())
    assert flat2.envmap.cell_distrb.alias is None
    img_cmf = _avg(DirectIntegrator(0, 1), sc2, seeds=6)

    assert np.all(np.isfinite(img_alias)) and np.all(np.isfinite(img_cmf))
    m_a, m_c = img_alias.mean(), img_cmf.mean()
    assert abs(m_a - m_c) < 0.05 * max(m_a, m_c), (m_a, m_c)


def test_frozen_and_injit_cmf_estimators_agree(monkeypatch):
    """Large grids freeze their cmf table host-side (f64) at trace time by
    default; estimates must agree with the in-jit per-frame build
    (PSDR_TPU_ENV_FROZEN=0) — same importance family, different
    precision/build path."""
    sky = _gradient_sky(h=160, w=320)       # 202k fine cells > 2^15
    def build():
        sc = Scene()
        b = sc.add_bsdf(Diffuse([0.7, 0.7, 0.7]), "mat")
        sc.add_mesh(primitives.make_icosphere(subdiv=2, radius=1.0, bsdf_id=b))
        sc.add_emitter(EnvironmentMap(sky, scale=1.0))
        cam = PerspectiveCamera(fov_x=40.0)
        cam.set_transform(np.asarray(xf.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])))
        sc.add_sensor(cam)
        sc.opts = RenderOptions(width=16, height=16, spp=48)
        return sc

    monkeypatch.setenv("PSDR_TPU_ENV_FROZEN", "1")
    sc = build()
    assert sc.build(sc.params()).envmap.cell_distrb.cells.shape[0] == 0, \
        "expected the frozen (placeholder-cells) path"
    img_frozen = _avg(DirectIntegrator(0, 1), sc, seeds=4)

    monkeypatch.setenv("PSDR_TPU_ENV_FROZEN", "0")
    sc2 = build()
    assert sc2.build(sc2.params()).envmap.cell_distrb.cells.shape[0] > 0
    img_injit = _avg(DirectIntegrator(0, 1), sc2, seeds=4)

    assert np.isfinite(img_frozen).all() and np.isfinite(img_injit).all()
    m_f, m_j = img_frozen.mean(), img_injit.mean()
    assert abs(m_f - m_j) < 0.05 * max(m_f, m_j), (m_f, m_j)


def test_hier_and_cmf_envmap_estimators_agree(monkeypatch):
    """PSDR_TPU_ENV_HIER=1 routes large-grid envmap NEE through the
    hierarchical 2D warp (distribution.py Hier2D) at the reference-parity
    div=1 grid; light-only estimates must agree with the default frozen-cmf
    path (both unbiased for the same radiance), and the sampling pdf must
    stay consistent with hypercube_pdf (the MIS surface)."""
    sky = _gradient_sky(h=160, w=320)       # fine grid 202k cells > 2^15
    sky[40, 200] *= 400.0                   # concentrated feature
    def build():
        sc = Scene()
        b = sc.add_bsdf(Diffuse([0.7, 0.7, 0.7]), "mat")
        sc.add_mesh(primitives.make_icosphere(subdiv=2, radius=1.0, bsdf_id=b))
        sc.add_emitter(EnvironmentMap(sky, scale=1.0))
        cam = PerspectiveCamera(fov_x=40.0)
        cam.set_transform(np.asarray(xf.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])))
        sc.add_sensor(cam)
        sc.opts = RenderOptions(width=16, height=16, spp=64)
        return sc

    monkeypatch.setenv("PSDR_TPU_ENV_HIER", "1")
    sc = build()
    flat = sc.build(sc.params())
    hc = flat.envmap.cell_distrb
    assert hc.hier is not None, "expected the hier path for a 202k-cell grid"
    # sampler pdf == hypercube_pdf at the warped point (MIS consistency)
    from psdr_tpu.core.distribution import (hier2d_sample_reuse,
                                            hypercube_pdf)
    u = jnp.asarray(np.random.default_rng(5).random((20000, 2)), jnp.float32)
    w, pdf = hier2d_sample_reuse(hc.hier, u, hc.resolution)
    pdf_eval = hypercube_pdf(hc, w) / hc.num_cells
    ok = np.isclose(np.asarray(pdf), np.asarray(pdf_eval), rtol=1e-5)
    assert ok.mean() > 0.999                 # f32 cell-boundary rounding only
    img_hier = _avg(DirectIntegrator(0, 1), sc, seeds=6)

    monkeypatch.setenv("PSDR_TPU_ENV_HIER", "0")
    sc2 = build()
    assert sc2.build(sc2.params()).envmap.cell_distrb.hier is None
    img_cmf = _avg(DirectIntegrator(0, 1), sc2, seeds=6)

    assert np.all(np.isfinite(img_hier)) and np.all(np.isfinite(img_cmf))
    m_h, m_c = img_hier.mean(), img_cmf.mean()
    assert abs(m_h - m_c) < 0.05 * max(m_h, m_c), (m_h, m_c)
