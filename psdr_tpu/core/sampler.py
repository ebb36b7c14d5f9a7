"""Random-sample streams.

The reference (psdr-cuda src/core/sampler.cpp) uses a vectorized PCG32 with
per-lane TEA-hashed seeds and three independent streams owned by the scene
(interior / primary-edge / secondary-edge). On TPU we use JAX's counter-based
PRNG instead: a stream is a base key, and every draw folds a trace-time
static counter into it, so the whole render remains a pure function of the
key with no mutable state threading.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class RngStream:
    """Trace-time helper: each ``.next_*`` call derives a fresh subkey by
    folding an incrementing *static* counter into the base key. Safe inside
    ``jit`` because the counter advances at trace time only.
    """

    def __init__(self, key: jax.Array, salt: int | None = None):
        self.key = jax.random.fold_in(key, salt) if salt is not None else key
        self._i = 0

    def _subkey(self) -> jax.Array:
        k = jax.random.fold_in(self.key, self._i)
        self._i += 1
        return k

    def next_1d(self, shape) -> jax.Array:
        if isinstance(shape, int):
            shape = (shape,)
        return jax.random.uniform(self._subkey(), shape, dtype=jnp.float32)

    def next_2d(self, n: int) -> jax.Array:
        return self.next_1d((n, 2))

    def next_3d(self, n: int) -> jax.Array:
        return self.next_1d((n, 3))

    def next_nd(self, n: int, d: int) -> jax.Array:
        return self.next_1d((n, d))


def make_streams(seed: int, n: int = 3) -> list[jax.Array]:
    """The scene's independent sampler streams (scene.cpp:23, 64-79)."""
    return list(jax.random.split(jax.random.PRNGKey(seed), n))
