"""Discrete and hypercube sampling distributions.

Parity reference: psdr-cuda src/core/pmf.cpp (DiscreteDistribution with
``sample_reuse``) and src/core/cube_distrb.cpp (HyperCubeDistribution<2,3>).

Everything is a static-shape pytree so distributions can live inside jitted
scene state; gradients never flow through sampling (sampling uses detached
masses, exactly like the reference which builds them from detached arrays).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Discrete(NamedTuple):
    """Unnormalized pmf + inclusive cmf (pmf.cpp:7-14)."""
    pmf: jax.Array   # (n,)
    cmf: jax.Array   # (n,) inclusive prefix sum
    total: jax.Array  # scalar = cmf[-1]

    @property
    def size(self) -> int:
        return self.pmf.shape[0]


def discrete_init(pmf: jax.Array) -> Discrete:
    pmf = jax.lax.stop_gradient(pmf)
    cmf = jnp.cumsum(pmf)
    return Discrete(pmf=pmf, cmf=cmf, total=cmf[-1])


def discrete_sample_reuse(d: Discrete, samples: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample indices ∝ pmf and remap the used samples back to [0, 1).

    Returns (idx, pdf_normalized, samples_remapped). Parity: pmf.cpp:29-50.

    Small tables (emitter selection, small area-light face tables) use a
    broadcast compare + masked reductions instead of searchsorted + gathers:
    wavefront-sized gathers cost ~4ms per 2M lanes each on TPU while the
    L-wide compare row is VPU-trivial. Both branches compute identical
    values (the reductions select actual table entries, no re-derivation).
    """
    s = samples * d.total
    if d.size <= 32:
        lt = d.cmf[None, :] < s[..., None]                   # (N, L)
        idx = jnp.sum(lt, axis=-1, dtype=jnp.int32)
        idx = jnp.clip(idx, 0, d.size - 1)
        # select cmf[idx-1] / pmf[idx] by INDEX (static select chains), not
        # by masked max over values: XLA's parallel-scan cumsum is not
        # guaranteed monotone at f32 rounding level, so a value-based max
        # can pick a different entry than searchsorted's cmf[idx-1]
        prev = jnp.zeros_like(s)
        pmf_i = jnp.broadcast_to(d.pmf[0], idx.shape)
        for i in range(1, d.size):
            prev = jnp.where(idx == i, d.cmf[i - 1], prev)
            pmf_i = jnp.where(idx == i, d.pmf[i], pmf_i)
    elif d.size <= (1 << 18):
        # two-level broadcast search: count superblock-end cmf entries
        # below s (VPU broadcast, no gathers), then ONE packed row gather
        # of the 128-entry sub-cmf block and an in-row count. searchsorted
        # lowers to log2(n) dependent wavefront gathers (~4ms each on v5e);
        # this is one row gather + one pmf gather + broadcast compares.
        # All selected values are actual table entries — identical results.
        C = 128
        n_blocks = -(-d.size // C)
        pad = n_blocks * C - d.size
        cmf_rows = jnp.pad(d.cmf, (0, pad),
                           constant_values=jnp.inf).reshape(n_blocks, C)
        scmf = cmf_rows[:, -1]
        # end value of the last real block is cmf[-1] (pad is +inf): fix it
        scmf = scmf.at[-1].set(d.cmf[-1])
        blk_lt = scmf[None, :] < s[..., None]                # (N, B)
        blk = jnp.sum(blk_lt, axis=-1, dtype=jnp.int32)
        blk = jnp.clip(blk, 0, n_blocks - 1)
        # index-based selects (see small-branch comment: cumsum is not
        # guaranteed monotone, value-based max can disagree with
        # searchsorted's cmf[idx-1])
        biota = jnp.arange(n_blocks, dtype=jnp.int32)
        prev_blk = jnp.sum(jnp.where(biota[None, :] == (blk - 1)[..., None],
                                     scmf[None, :], 0.0), axis=-1)
        row = cmf_rows[blk]                                  # (N, C)
        in_lt = row < s[..., None]
        r = jnp.sum(in_lt, axis=-1, dtype=jnp.int32)
        r = jnp.clip(r, 0, C - 1)
        idx = jnp.clip(blk * C + r, 0, d.size - 1)
        ciota = jnp.arange(C, dtype=jnp.int32)
        prev_in = jnp.sum(jnp.where(ciota[None, :] == (r - 1)[..., None],
                                    row, 0.0), axis=-1)
        prev = jnp.where(r > 0, prev_in, prev_blk)
        pmf_i = d.pmf[idx]
    else:
        # first index i with cmf[i] >= s
        idx = jnp.clip(jnp.searchsorted(d.cmf, s, side="left"), 0, d.size - 1)
        idx = idx.astype(jnp.int32)
        prev = jnp.where(idx > 0, d.cmf[jnp.maximum(idx - 1, 0)], 0.0)
        pmf_i = d.pmf[idx]
    residual = s - prev
    remapped = jnp.clip(jnp.where(pmf_i > 0.0, residual / pmf_i, residual), 0.0, 1.0)
    return idx, pmf_i / d.total, remapped


def discrete_pdf(d: Discrete, idx: jax.Array) -> jax.Array:
    return d.pmf[idx] / d.total


class HyperCube(NamedTuple):
    """Piecewise-constant distribution over a regular n-D grid
    (cube_distrb.cpp:8-75). ``cells`` holds each flat cell's integer grid
    coordinates; ``unit`` = 1/resolution.
    """
    distrb: Discrete
    cells: jax.Array       # (num_cells, ndim) int32
    resolution: jax.Array  # (ndim,) int32
    unit: jax.Array        # (ndim,) float32

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def ndim(self) -> int:
        return self.cells.shape[1]


def hypercube_cells(resolution) -> jax.Array:
    """Flat-index -> grid-coordinate decomposition (cube_distrb.cpp:8-29).

    Row-major: last dim fastest.
    """
    reso = tuple(int(r) for r in resolution)
    grids = jnp.meshgrid(*[jnp.arange(r, dtype=jnp.int32) for r in reso], indexing="ij")
    return jnp.stack([g.reshape(-1) for g in grids], axis=-1)


def hypercube_init(resolution, mass: jax.Array | None = None) -> HyperCube:
    reso = jnp.asarray(resolution, jnp.int32)
    cells = hypercube_cells(resolution)
    n = cells.shape[0]
    if mass is None:
        mass = jnp.ones((n,), jnp.float32)
    assert mass.shape[0] == n
    return HyperCube(
        distrb=discrete_init(mass),
        cells=cells,
        resolution=reso,
        unit=1.0 / reso.astype(jnp.float32),
    )


def hypercube_set_mass(hc: HyperCube, mass: jax.Array) -> HyperCube:
    # an all-zero mass table (e.g. guiding preprocess found no valid
    # boundary segments) must degrade to uniform sampling, not to a
    # zero-pdf distribution that silently kills every guided sample
    total = jnp.sum(mass)
    mass = jnp.where(total > 0.0, mass, jnp.ones_like(mass))
    return hc._replace(distrb=discrete_init(mass))


def hypercube_sample_reuse(hc: HyperCube, samples: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """samples (..., ndim) in [0,1)^ndim -> (warped samples, pdf).

    Picks a cell using the *last* component, then maps the remainder
    uniformly inside the cell (cube_distrb.cpp:41-50).
    """
    idx, pdf, last = discrete_sample_reuse(hc.distrb, samples[..., -1])
    samples = jnp.concatenate([samples[..., :-1], last[..., None]], axis=-1)
    warped = (samples + hc.cells[idx].astype(samples.dtype)) * hc.unit
    return warped, pdf * hc.num_cells


def hypercube_pdf(hc: HyperCube, p: jax.Array) -> jax.Array:
    """Density at points p (..., ndim) in [0,1)^ndim (cube_distrb.cpp:53-66)."""
    reso = hc.resolution
    ip = jnp.floor(p * reso.astype(p.dtype)).astype(jnp.int32)
    valid = jnp.all((ip >= 0) & (ip < reso), axis=-1)
    ndim = hc.ndim
    idx = ip[..., 0]
    for i in range(1, ndim):
        idx = idx * reso[i] + ip[..., i]
    idx = jnp.clip(idx, 0, hc.num_cells - 1)
    pdf_norm = hc.distrb.pmf[idx] / hc.distrb.total
    return jnp.where(valid, pdf_norm * hc.num_cells, 0.0)
