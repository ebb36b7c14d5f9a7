"""Lat-long environment-map emitter with grid importance sampling.

Parity reference: psdr-cuda src/emitter/envmap.cpp —
* configure builds a 2D hypercube distribution over a (2(W-1), 2(H-1)) grid
  with sin-theta weighting (envmap.cpp:10-26);
* eval_direction maps a world direction to lat-long uv (envmap.cpp:41-58);
* position sampling converts a sampled direction into a pseudo area sample
  on the scene AABB with a G-converted pdf (envmap.cpp:71-95);
The scene adds an 8-vertex/12-face bounding mesh carrying this emitter
(scene.cpp:134-180) so env hits look like surface hits.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.constants import Epsilon, InvPi, InvTwoPi, Pi, TwoPi
from ..core.bitmap import Bitmap, eval_bitmap, from_array
from ..core.distribution import (HyperCube, hypercube_init, hypercube_pdf,
                                 hypercube_sample_reuse)
from ..core.math import (dot, normalize, rgb2luminance, safe_acos, safe_rsqrt,
                         safe_sqrt, sphdir, sqr, squared_norm,
                         ray_intersect_scene_aabb)
from ..core import transform as xform
from ..core.records import PositionSample


class EnvironmentMap:
    kind = "env"

    def __init__(self, radiance, scale=1.0, to_world=None, emitter_id: str = ""):
        if not isinstance(radiance, Bitmap):
            radiance = from_array(radiance)
        self.radiance = radiance
        import numpy as _np
        self.scale = _np.float32(scale)
        self.to_world = (_np.eye(4, dtype=_np.float32) if to_world is None
                         else _np.asarray(to_world, _np.float32))

    def params(self) -> dict:
        return {"radiance": self.radiance.data, "scale": self.scale,
                "to_world": self.to_world}

    def set_params(self, p: dict) -> None:
        self.radiance = Bitmap(p["radiance"])
        self.scale = p["scale"]
        self.to_world = p["to_world"]

    def __repr__(self):
        return "EnvironmentMap"


class EnvmapState(NamedTuple):
    """Differentiable runtime state built by the scene (envmap.cpp:10-26)."""
    data: jax.Array        # (H, W, 3)
    scale: jax.Array
    to_world: jax.Array    # (4, 4)
    from_world: jax.Array  # (4, 4)
    cell_distrb: HyperCube
    lower: jax.Array       # scene AABB (3,)
    upper: jax.Array


def configure_envmap(params: dict, lower: jax.Array, upper: jax.Array) -> EnvmapState:
    data = params["radiance"]
    h, w = data.shape[0], data.shape[1]
    gw_f, gh_f = (w - 1) * 2, (h - 1) * 2
    # The reference super-samples the importance grid to 2x the bitmap
    # (envmap.cpp:14) — 2M cells for a 1k envmap, which makes the cmf
    # search + pdf gathers the dominant envmap-NEE cost on TPU. The grid
    # is an importance choice, not a correctness surface: the pdf reads
    # the SAME distribution, so any resolution is unbiased (image means
    # agree to 3e-4 on bunny_env) PROVIDED every nonzero-radiance direction
    # keeps nonzero mass. Default div=4 for large grids: +3.8% NEE variance
    # (CPU-measured, seeds A/B) for +32% e2e forward on bunny_env
    # (15.1 -> 19.9 Mrays/s, BASELINE.md round 4).
    # PSDR_TPU_ENV_RESO_DIV=1 restores exact reference-parity resolution;
    # small grids (<= 2^18 cells, incl. every test envmap) never divide.
    import os as _os
    div = max(1, int(_os.environ.get("PSDR_TPU_ENV_RESO_DIV", "4")))
    gw, gh = gw_f, gh_f
    if div > 1 and gw_f * gh_f > (1 << 18):
        gw, gh = max(128, gw_f // div), max(64, gh_f // div)
    if (gw, gh) == (gw_f, gh_f):
        # reference-parity grid: one bilinear tap per (half-texel) cell
        # center, exactly envmap.cpp:14-26
        hc = hypercube_init((gw, gh))
        uv = (hc.cells.astype(jnp.float32) + 0.5) * hc.unit
        val = eval_bitmap(Bitmap(jax.lax.stop_gradient(data)), uv)
        theta = ((jnp.arange(gw * gh, dtype=jnp.float32) % gh) + 0.5) * (Pi / gh)
        mass = rgb2luminance(val) * jnp.sin(theta)
    else:
        # Divided grid: a single center tap at ~div-texel spacing can miss
        # small bright features (HDRI sun disks) entirely — zero mass means
        # zero NEE pdf, which is BIASED for light-sampling-only estimators.
        # Pool the fine reference grid with MAX over each coarse cell's
        # footprint instead: every direction with nonzero fine-grid mass
        # keeps nonzero coarse mass (conservative over-weighting only
        # affects variance, never bias — the pdf reads the same table).
        fine = hypercube_init((gw_f, gh_f))
        uv = (fine.cells.astype(jnp.float32) + 0.5) * fine.unit
        val = eval_bitmap(Bitmap(jax.lax.stop_gradient(data)), uv)
        theta = ((jnp.arange(gw_f * gh_f, dtype=jnp.float32) % gh_f) + 0.5) * (Pi / gh_f)
        m_fine = (rgb2luminance(val) * jnp.sin(theta)).reshape(gw_f, gh_f)
        cx = (jnp.arange(gw_f, dtype=jnp.int32) * gw) // gw_f
        cy = (jnp.arange(gh_f, dtype=jnp.int32) * gh) // gh_f
        pooled = jax.ops.segment_max(m_fine, cx, num_segments=gw)        # (gw, gh_f)
        pooled = jax.ops.segment_max(pooled.T, cy, num_segments=gh).T    # (gw, gh)
        mass = pooled.reshape(gw * gh)
    hc = hypercube_init((gw, gh), mass)
    to_world = params["to_world"]
    return EnvmapState(data=data, scale=params["scale"], to_world=to_world,
                       from_world=jnp.linalg.inv(to_world),
                       cell_distrb=hc, lower=lower, upper=upper)


def envmap_eval_direction(st: EnvmapState, wi: jax.Array,
                          active: jax.Array) -> jax.Array:
    """Radiance arriving *from* direction wi (envmap.cpp:41-58)."""
    v = xform.transform_dir(st.from_world, wi)
    uv = jnp.stack([jnp.arctan2(v[..., 0], -v[..., 2]) * InvTwoPi,
                    safe_acos(v[..., 1]) * InvPi], axis=-1)
    uv = uv - jnp.floor(uv)
    val = eval_bitmap(Bitmap(st.data), uv) * st.scale
    return jnp.where(active[..., None], val, 0.0)


def envmap_sample_direction(st: EnvmapState, sample2: jax.Array):
    """(direction, pdf in solid angle) (envmap.cpp:98-111)."""
    uv, pdf = hypercube_sample_reuse(st.cell_distrb, sample2)
    theta = uv[..., 1] * Pi
    phi = uv[..., 0] * TwoPi
    d = sphdir(theta, phi)
    d = jnp.stack([d[..., 1], d[..., 2], -d[..., 0]], axis=-1)
    inv_sin_theta = safe_rsqrt(jnp.maximum(sqr(d[..., 0]) + sqr(d[..., 2]),
                                           sqr(Epsilon)))
    pdf = jnp.where(pdf > Epsilon, pdf * inv_sin_theta * (0.5 / sqr(Pi)), pdf)
    d = xform.transform_dir(jax.lax.stop_gradient(st.to_world), d)
    return d, pdf


def envmap_sample_position(st: EnvmapState, ref_p: jax.Array,
                           sample2: jax.Array, active: jax.Array) -> PositionSample:
    """Direction sample -> pseudo area sample on the scene AABB
    (envmap.cpp:71-95)."""
    o = jax.lax.stop_gradient(ref_p)
    d, pdf = envmap_sample_direction(st, jax.lax.stop_gradient(sample2))
    t, n, G = ray_intersect_scene_aabb(o, d, st.lower, st.upper)
    return PositionSample(valid=active, pdf=pdf * G, p=o + d * t[..., None],
                          n=n, J=jnp.ones_like(pdf))


def envmap_position_pdf(st: EnvmapState, ref_p: jax.Array, its_p: jax.Array,
                        its_n: jax.Array, active: jax.Array) -> jax.Array:
    """Area-measure pdf of a bounding-mesh hit (envmap.cpp:120-139)."""
    d = jax.lax.stop_gradient(its_p) - jax.lax.stop_gradient(ref_p)
    dist2 = squared_norm(d)
    d = d / safe_sqrt(dist2)[..., None]
    G = jnp.abs(dot(d, jax.lax.stop_gradient(its_n))) / dist2
    d = xform.transform_dir(jax.lax.stop_gradient(st.from_world), d)
    factor = G * safe_rsqrt(jnp.maximum(sqr(d[..., 0]) + sqr(d[..., 2]),
                                        sqr(Epsilon))) * (0.5 / sqr(Pi))
    uv = jnp.stack([jnp.arctan2(d[..., 0], -d[..., 2]) * InvTwoPi,
                    safe_acos(d[..., 1]) * InvPi], axis=-1)
    uv = uv - jnp.floor(uv)
    return jnp.where(active, hypercube_pdf(st.cell_distrb, uv) * factor, 0.0)
