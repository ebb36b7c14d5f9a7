"""A/B the HBM gather layout used by the differentiable recompute.

ray_intersect gathers ~14 per-face arrays (p0/e1/e2/n0/n1/n2/fn/area,
uv0/1/2, 3 id columns) at N ray lanes. Hypothesis: one packed (F, 32) f32
row-gather moves the same data much faster than 14 separate gathers
(row = 128 contiguous bytes vs 14 scattered 4-12 byte pulls).

Variants (all N=2M lanes, F=82k faces, random indices):
  sep-14        fourteen separate gathers (current codebase shape)
  packed-32     one (F,32) row gather, then column slices
  packed-sorted same, indices pre-sorted (bounce lanes are direction- not
                index-sorted, but camera lanes are nearly index-sorted)
  onehot-64     one-hot @ table MXU gather for a tiny 64-row table
                (the emitter-set recompute case)
Small programs: safe to chain in one process (CLAUDE.md rule 7).
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


def main():
    n = 1 << 21
    f = 81920
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    cols = jax.random.normal(k1, (f, 32), jnp.float32)
    seps = [cols[:, i * 3:i * 3 + 3] for i in range(8)]          # 8 vec3s
    seps += [cols[:, 24 + i * 2:26 + i * 2] for i in range(3)]   # 3 vec2s
    seps += [cols[:, 30], cols[:, 31], cols[:, 0]]               # 3 scalars
    idx = jax.random.randint(k2, (n,), 0, f, jnp.int32)
    idx_sorted = jnp.sort(idx)
    small = cols[:64]
    idx_small = jax.random.randint(k2, (n,), 0, 64, jnp.int32)

    @jax.jit
    def sep14(idx):
        return sum(g[idx].sum() for g in seps)

    @jax.jit
    def packed(idx):
        rows = cols[idx]
        return rows.sum()

    @jax.jit
    def onehot64(idx):
        oh = jax.nn.one_hot(idx, 64, dtype=jnp.bfloat16)
        rows = jnp.dot(oh, small.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return rows.sum()

    @jax.jit
    def sep_small(idx):
        return sum(g[:64][idx].sum() for g in seps)

    # discrete_sample_reuse cost model: searchsorted (log2 F dependent
    # gathers) vs a broadcast compare+reduce for small tables
    u = jax.random.uniform(k2, (n,))
    cmf_big = jnp.cumsum(jax.random.uniform(k1, (8192,)))
    cmf_small = jnp.cumsum(jax.random.uniform(k1, (64,)))

    def make_ss(cmf):
        @jax.jit
        def ss(u):
            s = u * cmf[-1]
            i = jnp.searchsorted(cmf, s, side="left").astype(jnp.int32)
            i = jnp.clip(i, 0, cmf.shape[0] - 1)
            prev = jnp.where(i > 0, cmf[jnp.maximum(i - 1, 0)], 0.0)
            return i.sum() + prev.sum()
        return ss

    @jax.jit
    def bcast64(u):
        s = (u * cmf_small[-1])[:, None]
        ge = cmf_small[None, :] >= s
        i = jnp.sum(~ge, axis=1, dtype=jnp.int32)
        prev = jnp.max(jnp.where(~ge, cmf_small[None, :], 0.0), axis=1)
        return i.sum() + prev.sum()

    # sort-machinery pieces (the _octant_sort path): segmented stable
    # argsort of 65-value keys, permutation scatter (.at[perm].set) vs
    # argsort-of-argsort for the inverse, and scatter-add reference
    key65 = jax.random.randint(k1, (n,), 0, 65, jnp.int32)
    seg = 1 << 15

    @jax.jit
    def seg_argsort(key):
        ks = key.reshape(n // seg, seg)
        local = jnp.argsort(ks, axis=1, stable=True).astype(jnp.int32)
        return local.sum()

    @jax.jit
    def perm_scatter_inv(perm):
        return jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32)).sum()

    @jax.jit
    def argsort_inv(perm):
        ps = perm.reshape(n // seg, seg)
        return jnp.argsort(ps, axis=1).astype(jnp.int32).sum()

    @jax.jit
    def scatter_add_hist(key):
        return jnp.zeros((65,), jnp.int32).at[key].add(1).sum()

    @jax.jit
    def counting_sort_inv(key):
        # segmented counting sort over the 65 key values: one-hot running
        # count gives each lane's rank within its key; exclusive histogram
        # cumsum gives the key's base offset. Produces the INVERSE
        # permutation directly (where each lane lands), no compare-exchange
        # network — candidate replacement for seg-argsort + inv
        ks = key.reshape(n // seg, seg)
        oh = jax.nn.one_hot(ks, 65, dtype=jnp.int32)
        run = jnp.cumsum(oh, axis=1)
        hist = run[:, -1, :]
        offs = jnp.cumsum(hist, axis=1) - hist
        rank = jnp.take_along_axis(run, ks[..., None], axis=2)[..., 0] - 1
        off = jnp.take_along_axis(offs, ks, axis=1)
        return (off + rank).sum()

    @jax.jit
    def perm_row_gather(perm):
        rows = cols[:n // 64].reshape(-1, 32)
        rows = jnp.broadcast_to(rows, (n // rows.shape[0],) +
                                rows.shape).reshape(n, 32)
        return rows[perm].sum()

    @jax.jit
    def perm_row_scatter(perm):
        # permute packed rows by scattering into position (the counting-
        # sort sort path needs this instead of a gather-by-perm)
        rows = cols[:n // 64].reshape(-1, 32)
        rows = jnp.broadcast_to(rows, (n // rows.shape[0],) +
                                rows.shape).reshape(n, 32)
        return jnp.zeros((n, 32), jnp.float32).at[perm].set(rows).sum()

    perm_in = jax.random.permutation(k2, n).astype(jnp.int32)

    for name, fn, a in [("sep-14", sep14, idx),
                        ("packed-32", packed, idx),
                        ("packed-sorted", packed, idx_sorted),
                        ("sep-small-64", sep_small, idx_small),
                        ("onehot-64", onehot64, idx_small),
                        ("searchsort-8k", make_ss(cmf_big), u),
                        ("searchsort-64", make_ss(cmf_small), u),
                        ("bcast-64", bcast64, u),
                        ("seg-argsort", seg_argsort, key65),
                        ("scatter-inv", perm_scatter_inv, perm_in),
                        ("argsort-inv", argsort_inv, perm_in),
                        ("scatter-hist", scatter_add_hist, key65),
                        ("counting-inv", counting_sort_inv, key65),
                        ("perm-row-gather", perm_row_gather, perm_in),
                        ("perm-row-scatter", perm_row_scatter, perm_in)]:
        dt = bench(fn, a)
        print(f"{name:14s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
