"""A/B the memory layout of hot elementwise vector math: (N, 3) arrays
(current codebase shape) vs (3, N) planar arrays.

Round-1 observation: XLA lane-pads some (N, 3) f32 temporaries 42x on TPU
(CLAUDE.md landmine b). If that padding also applies to compute temps, the
non-kernel ~60% of the frame (recompute/frame/shading chains) is paying
42x HBM traffic, and a planar refactor of the hot sections would reclaim
most of it. Each variant is one jit; chain of ~25 representative ops
(normalize, cross, dot, where, frame build, bilinear).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def chain_rows(a, b, c):
    """(N,3) layout, mirroring core/math.py idioms."""
    for _ in range(5):
        n = a / jnp.sqrt(jnp.maximum((a * a).sum(-1, keepdims=True), 1e-16))
        cr = jnp.cross(n, b)
        d = (cr * c).sum(-1)
        w = jnp.where((d > 0)[..., None], cr, b)
        a = w + 0.1 * c
        b = jnp.where((d < 0.5)[..., None], a + b, b - cr)
        c = c * 0.999 + 0.001 * n
    return a.sum() + b.sum() + c.sum()


def chain_planar(a, b, c):
    """(3,N) layout: each component is a flat lane vector."""
    def nrm(x):
        s = jnp.sqrt(jnp.maximum(x[0] * x[0] + x[1] * x[1] + x[2] * x[2],
                                 1e-16))
        return x / s
    def cross(x, y):
        return jnp.stack([x[1] * y[2] - x[2] * y[1],
                          x[2] * y[0] - x[0] * y[2],
                          x[0] * y[1] - x[1] * y[0]])
    for _ in range(5):
        n = nrm(a)
        cr = cross(n, b)
        d = (cr * c).sum(0)
        w = jnp.where(d > 0, cr, b)
        a = w + 0.1 * c
        b = jnp.where(d < 0.5, a + b, b - cr)
        c = c * 0.999 + 0.001 * n
    return a.sum() + b.sum() + c.sum()


def main():
    n = 1 << 21
    key = jax.random.PRNGKey(0)
    r = jax.random.normal(key, (3, 3, n), jnp.float32)
    a_p, b_p, c_p = r[0], r[1], r[2]
    a_r, b_r, c_r = r[0].T, r[1].T, r[2].T

    dt_r = bench(jax.jit(chain_rows), a_r, b_r, c_r)
    print(f"rows   (N,3): {dt_r*1e3:8.2f} ms", flush=True)
    dt_p = bench(jax.jit(chain_planar), a_p, b_p, c_p)
    print(f"planar (3,N): {dt_p*1e3:8.2f} ms   rows/planar = "
          f"{dt_r/dt_p:.2f}x", flush=True)


if __name__ == "__main__":
    main()
