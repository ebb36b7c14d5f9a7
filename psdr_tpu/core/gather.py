"""Wavefront row gather with a configurable backward.

The transpose of ``table[idx]`` (idx: N wavefront lanes, table: F rows) is
a scatter-add of N cotangent rows into F table rows. XLA lowers that to a
TPU scatter, which serializes per duplicate index — and the hit-recompute
face-table gather funnels every interior-lane cotangent through it
(CLAUDE.md roadmap 2). The sorted modes below reorder the cotangent rows
by destination first, turning the reduction into a sorted segment sum or a
cumsum difference, both of which vectorize on the VPU.

Parity note: the reference accumulates these gradients with CUDA atomics
(enoki ``scatter_add``, e.g. /root/reference/src/core/bitmap.cpp grads);
on TPU the equivalent question is which XLA lowering to force.

Modes
-----
- ``native``: plain ``table[idx]`` — XLA's own gather transpose (default
  until the on-chip A/B says otherwise).
- ``scatter``: explicit ``zeros.at[idx].add(ct)`` (same lowering as
  native; exists so the A/B has a named baseline).
- ``sorted``: argsort lanes by destination row, then
  ``segment_sum(..., indices_are_sorted=True)``.
- ``cumsum``: argsort, exclusive-padded cumsum, per-row difference at
  segment bounds — no scatter at all, but float32 prefix-sum association
  error grows with N (validated to 1e-3 relative at 2^20 lanes in
  tests/test_core.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MODES = ("native", "scatter", "sorted", "cumsum")
_default_mode = "native"


def set_gather_vjp_mode(mode: str) -> None:
    """Set the process-wide default backward mode (trace-time static)."""
    global _default_mode
    if mode not in _MODES:
        raise ValueError(f"gather vjp mode {mode!r} not in {_MODES}")
    _default_mode = mode


def get_gather_vjp_mode() -> str:
    return _default_mode


@functools.lru_cache(maxsize=None)
def _gather_with_vjp(mode: str):
    @jax.custom_vjp
    def g(table, idx):
        return table[idx]

    def fwd(table, idx):
        # (F, 0) empty array carries the static row count through the
        # residual pytree at zero bytes
        return table[idx], (idx, jnp.empty((table.shape[0], 0), table.dtype))

    def bwd(res, ct):
        idx, shape_ref = res
        F = shape_ref.shape[0]
        # flatten lane dims (bitmap eval gathers with (...,)-shaped idx)
        row_shape = ct.shape[idx.ndim:]
        ct = ct.reshape((-1,) + row_shape)
        idx = idx.reshape(-1)
        if mode == "scatter":
            d = jnp.zeros((F,) + row_shape, ct.dtype).at[idx].add(ct)
        else:
            order = jnp.argsort(idx).astype(jnp.int32)
            idx_s = idx[order]
            ct_s = ct[order]
            if mode == "sorted":
                d = jax.ops.segment_sum(ct_s, idx_s, num_segments=F,
                                        indices_are_sorted=True)
            else:  # cumsum
                csum = jnp.concatenate(
                    [jnp.zeros((1,) + ct.shape[1:], ct.dtype),
                     jnp.cumsum(ct_s, axis=0)], axis=0)
                rows = jnp.arange(F, dtype=idx_s.dtype)
                left = jnp.searchsorted(idx_s, rows, side="left")
                right = jnp.searchsorted(idx_s, rows, side="right")
                d = csum[right] - csum[left]
        return d, None

    g.defvjp(fwd, bwd)
    return g


def gather_rows(table: jax.Array, idx: jax.Array,
                mode: str | None = None) -> jax.Array:
    """``table[idx]`` whose backward reduction strategy is selectable.

    ``mode=None`` reads the process default (``set_gather_vjp_mode``) at
    trace time; jit caching is per-traced-program, so flip the default
    before tracing, not between calls of a compiled function.
    """
    mode = mode or _default_mode
    if mode == "native":
        return table[idx]
    if mode not in _MODES:
        raise ValueError(f"gather vjp mode {mode!r} not in {_MODES}")
    return _gather_with_vjp(mode)(table, idx)
