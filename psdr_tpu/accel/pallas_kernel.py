"""Pallas TPU intersection kernel: dense Moller-Trumbore over streamed
triangle chunks with an in-VMEM closest-hit accumulator.

The XLA backends (bruteforce/culled) already implement the algorithm; this
kernel owns the schedule explicitly: the ray block's components and the
running (t, id, u, v) state live in VMEM across the whole triangle stream
(grid accumulation pattern — the output BlockSpec ignores the triangle-chunk
grid axis, so Pallas keeps the block resident), and each grid step DMAs one
(9, T) triangle chunk. All compute is (T, R) f32 VPU tiles.

Layouts: rays (8, N) rows [ox oy oz dx dy dz tmax active]; triangles (9, F)
rows [p0 e1 e2] xyz; out (8, N) rows [t, id(bitcast), u, v, 0...].
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import RayEpsilon
from .bruteforce import HitRecord, _ceil_to, _pad_to

_INF = jnp.float32(jnp.inf)


def _kernel(rays_ref, tris_ref, out_ref, *, n_tris, tri_block):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = rays_ref[6, :]                      # t = tmax
        out_ref[1:2, :] = pltpu.bitcast(
            jnp.full_like(rays_ref[0:1, :], -1, jnp.int32), jnp.float32)
        out_ref[2, :] = jnp.zeros_like(rays_ref[0, :])
        out_ref[3, :] = jnp.zeros_like(rays_ref[0, :])

    # ray components as (1, R); triangle components as (T, 1)
    ox, oy, oz = (rays_ref[k:k + 1, :] for k in range(3))
    dx, dy, dz = (rays_ref[k:k + 1, :] for k in range(3, 6))
    active = rays_ref[7:8, :] > 0.0

    tri = [tris_ref[k, :].reshape(tri_block, 1) for k in range(9)]
    p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = tri

    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
    sx = ox - p0x
    sy = oy - p0y
    sz = oz - p0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)

    t_best = out_ref[0:1, :]
    tid = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + j * tri_block
    ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > RayEpsilon)
          & (t < t_best) & (tid < n_tris) & active)
    t_m = jnp.where(ok, t, float("inf"))
    row = jnp.argmin(t_m, axis=0)                           # (R,)
    cols = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
    pick = row[None, :] == jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 0)
    t_c = jnp.min(t_m, axis=0)
    closer = t_c < t_best[0, :]
    u_c = jnp.sum(jnp.where(pick, u, 0.0), axis=0)
    v_c = jnp.sum(jnp.where(pick, v, 0.0), axis=0)
    del cols

    out_ref[0, :] = jnp.where(closer, t_c, out_ref[0, :])
    ids = pltpu.bitcast(out_ref[1:2, :], jnp.int32)
    new_ids = jnp.where(closer[None, :],
                        row[None, :].astype(jnp.int32) + j * tri_block, ids)
    out_ref[1:2, :] = pltpu.bitcast(new_ids, jnp.float32)
    out_ref[2, :] = jnp.where(closer, u_c, out_ref[2, :])
    out_ref[3, :] = jnp.where(closer, v_c, out_ref[3, :])


def ray_intersect_pallas(p0: jax.Array, e1: jax.Array, e2: jax.Array,
                         ray_o: jax.Array, ray_d: jax.Array,
                         active: jax.Array | None = None,
                         tmax: jax.Array | None = None,
                         ray_block: int = 1024,
                         tri_block: int = 256,
                         interpret: bool = False) -> HitRecord:
    """Brute-force closest hit as a Pallas kernel. Same contract as
    ray_intersect_brute (detached, global tri ids)."""
    sg = jax.lax.stop_gradient
    p0, e1, e2, ray_o, ray_d = map(sg, (p0, e1, e2, ray_o, ray_d))
    n_rays = ray_o.shape[0]
    n_tris = p0.shape[0]

    if active is None:
        active = jnp.ones((n_rays,), bool)
    if tmax is None:
        tmax = jnp.full((n_rays,), _INF)
    tmax = jnp.broadcast_to(sg(tmax), (n_rays,))

    rb = min(ray_block, max(128, n_rays))
    r_pad = _ceil_to(n_rays, rb)
    tb = min(tri_block, max(8, n_tris))
    f_pad = _ceil_to(n_tris, tb)

    rays = jnp.stack([
        _pad_to(ray_o[:, 0], r_pad), _pad_to(ray_o[:, 1], r_pad),
        _pad_to(ray_o[:, 2], r_pad), _pad_to(ray_d[:, 0], r_pad),
        _pad_to(ray_d[:, 1], r_pad), _pad_to(ray_d[:, 2], r_pad),
        _pad_to(tmax, r_pad, value=0.0),
        _pad_to(sg(active).astype(jnp.float32), r_pad),
    ])                                                      # (8, r_pad)
    tris = jnp.stack([
        _pad_to(arr[:, c], f_pad) for arr in (p0, e1, e2) for c in range(3)
    ])                                                      # (9, f_pad)

    grid = (r_pad // rb, f_pad // tb)
    out = pl.pallas_call(
        partial(_kernel, n_tris=n_tris, tri_block=tb),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, rb), lambda i, j: (0, i)),
            pl.BlockSpec((9, tb), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((8, rb), lambda i, j: (0, i)),
        interpret=interpret,
    )(rays, tris)

    t = out[0, :n_rays]
    tri_id = jax.lax.bitcast_convert_type(out[1, :n_rays], jnp.int32)
    uv = jnp.stack([out[2, :n_rays], out[3, :n_rays]], axis=-1)
    valid = tri_id >= 0
    return HitRecord(valid=valid, tri_id=tri_id, uv=uv,
                     t=jnp.where(valid, t, _INF))


def _culled_kernel(count_ref, rays_ref, occ_hbm, tris_hbm,
                   out_ref, occ_smem, scratch, osem, sems, *,
                   tri_block, n_blocks, occ_cols):
    """Grid: (n_ray_blocks,). Scalar-prefetch: per-ray-block occupied
    count. The occupied id list lives in HBM (too large for SMEM prefetch)
    and is DMA'd per ray block into SMEM scratch; triangle rows stream as
    (16, T) blocks (9 components + validity + pad, sublane-aligned) with
    double buffering; dense (T, R) MT tiles in VMEM."""
    i = pl.program_id(0)
    T = tri_block

    out_ref[0, :] = rays_ref[6, :]                      # t = tmax
    out_ref[1:2, :] = pltpu.bitcast(
        jnp.full_like(rays_ref[0:1, :], -1, jnp.int32), jnp.float32)
    out_ref[2, :] = jnp.zeros_like(rays_ref[0, :])
    out_ref[3, :] = jnp.zeros_like(rays_ref[0, :])

    count = count_ref[i]

    def dma(slot, j):
        b = occ_smem[j // occ_cols, j % occ_cols]
        return pltpu.make_async_copy(tris_hbm.at[b], scratch.at[slot],
                                     sems.at[slot])

    @pl.when(count > 0)
    def _():
        occ_dma = pltpu.make_async_copy(occ_hbm.at[i], occ_smem, osem)
        occ_dma.start()
        occ_dma.wait()
        dma(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < count)
            def _():
                dma(1 - slot, j + 1).start()

            dma(slot, j).wait()

            ox, oy, oz = (rays_ref[k:k + 1, :] for k in range(3))
            dx, dy, dz = (rays_ref[k:k + 1, :] for k in range(3, 6))
            active = rays_ref[7:8, :] > 0.0
            row = scratch[slot]                        # (16, T)
            tri = [row[k, :].reshape(T, 1) for k in range(9)]
            p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = tri

            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
            sx = ox - p0x
            sy = oy - p0y
            sz = oz - p0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (dx * qx + dy * qy + dz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)

            t_best = out_ref[0:1, :]
            tvalid = row[9, :].reshape(T, 1) > 0.0
            ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t > RayEpsilon) & (t < t_best) & tvalid & active)
            t_m = jnp.where(ok, t, float("inf"))
            rsel = jnp.argmin(t_m, axis=0)
            pick = rsel[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, t_m.shape, 0)
            t_c = jnp.min(t_m, axis=0)
            closer = t_c < t_best[0, :]
            u_c = jnp.sum(jnp.where(pick, u, 0.0), axis=0)
            v_c = jnp.sum(jnp.where(pick, v, 0.0), axis=0)

            b = occ_smem[j // occ_cols, j % occ_cols]
            out_ref[0, :] = jnp.where(closer, t_c, out_ref[0, :])
            ids = pltpu.bitcast(out_ref[1:2, :], jnp.int32)
            new_ids = jnp.where(closer[None, :],
                                rsel[None, :].astype(jnp.int32) + b * T, ids)
            out_ref[1:2, :] = pltpu.bitcast(new_ids, jnp.float32)
            out_ref[2, :] = jnp.where(closer, u_c, out_ref[2, :])
            out_ref[3, :] = jnp.where(closer, v_c, out_ref[3, :])
            return 0

        jax.lax.fori_loop(0, count, body, 0)


def ray_intersect_pallas_culled(bvh, ray_o: jax.Array, ray_d: jax.Array,
                                active: jax.Array | None = None,
                                tmax: jax.Array | None = None,
                                ray_block: int = 512,
                                tri_block: int = 128,
                                interpret: bool = False) -> HitRecord:
    """Block-culled Pallas intersection: XLA computes the (R-block x
    tri-block) slab cull and compacts occupied block ids; the Pallas kernel
    streams only those rows. Same contract as ray_intersect_culled."""
    sg = jax.lax.stop_gradient
    ray_o, ray_d = sg(ray_o), sg(ray_d)
    n_rays = ray_o.shape[0]
    P, L = bvh.num_leaves, bvh.leaf_size

    n_tris_padded = P * L
    T = min(tri_block, n_tris_padded)
    n_blocks = max(1, n_tris_padded // T)
    blocks = bvh.nodes[n_blocks:2 * n_blocks]
    lpb = P // n_blocks
    tri_rows = (bvh.leaf_tris.reshape(n_blocks, lpb, 9, L)
                .transpose(0, 2, 1, 3).reshape(n_blocks, 9, T))
    valid_rows = bvh.tri_valid.reshape(n_blocks, 1, T).astype(jnp.float32)
    # 16 sublane-aligned rows per block: 9 components + validity + zero pad
    tri_rows = jnp.concatenate(
        [tri_rows, valid_rows,
         jnp.zeros((n_blocks, 6, T), jnp.float32)], axis=1)
    block_mask = bvh.node_mask[n_blocks:2 * n_blocks]

    if active is None:
        active = jnp.ones((n_rays,), bool)
    else:
        active = sg(active)
    if tmax is None:
        tmax = jnp.full((n_rays,), _INF)
    tmax = jnp.broadcast_to(sg(tmax), (n_rays,))

    rb = min(ray_block, max(128, n_rays))
    r_pad = _ceil_to(n_rays, rb)
    n_rblocks = r_pad // rb

    rays = jnp.stack([
        _pad_to(ray_o[:, 0], r_pad), _pad_to(ray_o[:, 1], r_pad),
        _pad_to(ray_o[:, 2], r_pad), _pad_to(ray_d[:, 0], r_pad),
        _pad_to(ray_d[:, 1], r_pad), _pad_to(ray_d[:, 2], r_pad),
        _pad_to(tmax, r_pad, value=0.0),
        _pad_to(active.astype(jnp.float32), r_pad),
    ])                                                  # (8, r_pad)

    # XLA-side cull: (n_rblocks, B) occupancy -> compacted id lists
    o_b = rays[:3].reshape(3, n_rblocks, rb)
    d_b = rays[3:6].reshape(3, n_rblocks, rb)
    act_b = rays[7].reshape(n_rblocks, rb) > 0.0
    inv = 1.0 / jnp.where(jnp.abs(d_b) < 1e-20,
                          jnp.where(d_b < 0, -1e-20, 1e-20), d_b)
    tn = jnp.full((n_rblocks, rb, n_blocks), RayEpsilon)
    tf = jnp.broadcast_to(rays[6].reshape(n_rblocks, rb, 1),
                          (n_rblocks, rb, n_blocks))
    for c in range(3):
        t0 = (blocks[None, None, :, c] - o_b[c][..., None]) * inv[c][..., None]
        t1 = (blocks[None, None, :, c + 3] - o_b[c][..., None]) * inv[c][..., None]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    occ_mask = (jnp.any((tn <= tf) & act_b[..., None], axis=1)
                & block_mask[None, :])                  # (n_rblocks, B)
    order = jnp.argsort(~occ_mask, axis=1).astype(jnp.int32)
    counts = jnp.sum(occ_mask, axis=1).astype(jnp.int32)
    # pad id rows to (8, 128k) tiles so the per-row HBM->SMEM DMA is aligned
    b_pad = max(1024, -(-n_blocks // 1024) * 1024)
    occ_cols = b_pad // 8
    order = jnp.pad(order, ((0, 0), (0, b_pad - n_blocks))) \
        .reshape(n_rblocks, 8, occ_cols)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rblocks,),
        in_specs=[
            pl.BlockSpec((8, rb), lambda i, *_: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, rb), lambda i, *_: (0, i)),
        scratch_shapes=[
            pltpu.SMEM((8, occ_cols), jnp.int32),
            pltpu.VMEM((2, 16, T), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(_culled_kernel, tri_block=T, n_blocks=n_blocks,
                occ_cols=occ_cols),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts, rays, order, tri_rows)

    t = out[0, :n_rays]
    slot = jax.lax.bitcast_convert_type(out[1, :n_rays], jnp.int32)
    uv = jnp.stack([out[2, :n_rays], out[3, :n_rays]], axis=-1)
    tri_id = jnp.where(slot >= 0, bvh.perm[jnp.maximum(slot, 0)], -1)
    return HitRecord(valid=tri_id >= 0, tri_id=tri_id, uv=uv,
                     t=jnp.where(tri_id >= 0, t, _INF))


# ---------------------------------------------------------------------------
# v2: the cull lives inside the kernel.
#
# One grid step per ray block. Phase A interval-slab-tests the whole ray
# block's bounds against every leaf-block AABB in VMEM (O(B) work, no HBM
# temporaries — the XLA-side cull materialized (n_rblocks, R, B) tensors).
# Phase B compacts the occupancy row with an MXU prefix sum. Phase C is the
# double-buffered triangle-stream MT loop, with (a) a per-lane slab refine —
# each streamed block's AABB (scalar reads from SMEM) is slab-tested against
# every lane bounded by that lane's *current best t*, and the whole MT tile
# is skipped when no lane can improve (recovers per-ray cull precision that
# the interval test over-approximates, at ~0.5% of the tile's cost) — and
# (b), in any-hit mode, a whole-block early exit once every active lane is
# decided (shadow rays, scene.py ray_test).
# ---------------------------------------------------------------------------

def _culled2_kernel(rays_ref, boxes_ref, subboxes_ref, tris_hbm,
                    out_ref, occ_v, tn_v, occ_smem, boxes_smem,
                    subboxes_smem, osem, bsem, ssem, scratch, sems, *,
                    tri_block, b_pad, cull_chunk, any_hit, n_slots,
                    sub_split, n_buckets, debug_counters=False):
    T = tri_block
    R = rays_ref.shape[1]
    NB = n_buckets

    out_ref[0, :] = rays_ref[6, :]                      # t = tmax
    out_ref[1:2, :] = pltpu.bitcast(
        jnp.full_like(rays_ref[0:1, :], -1, jnp.int32), jnp.float32)
    out_ref[2, :] = jnp.zeros_like(rays_ref[0, :])
    out_ref[3, :] = jnp.zeros_like(rays_ref[0, :])
    if debug_counters:
        # rows 4/5: MT tiles executed / candidate blocks, per ray block
        out_ref[4, :] = jnp.zeros_like(rays_ref[0, :])
        out_ref[5, :] = jnp.zeros_like(rays_ref[0, :])

    # --- phase A: conservative interval cull -------------------------------
    # Bound the whole ray block (origin box, per-axis direction range, max
    # tmax over active lanes) and interval-slab-test it against every leaf
    # block: O(B) work instead of O(R*B), sound by interval arithmetic
    # (direction components straddling zero widen that axis to (-inf, inf)).
    actm = rays_ref[7:8, :] > 0.0
    big = jnp.float32(3e38)

    def lane_min(row):
        return jnp.min(jnp.where(actm, row, big))

    def lane_max(row):
        return jnp.max(jnp.where(actm, row, -big))

    o_lo = [lane_min(rays_ref[c:c + 1, :]) for c in range(3)]
    o_hi = [lane_max(rays_ref[c:c + 1, :]) for c in range(3)]
    d_lo = [lane_min(rays_ref[3 + c:4 + c, :]) for c in range(3)]
    d_hi = [lane_max(rays_ref[3 + c:4 + c, :]) for c in range(3)]
    tmax_hi = lane_max(rays_ref[6:7, :])
    any_active = jnp.max(actm.astype(jnp.float32)) > 0.0

    def cull_chunk_body(c, _):
        s = pl.ds(c * cull_chunk, cull_chunk)
        tn_lo = jnp.full((1, cull_chunk), RayEpsilon)
        tf_hi = jnp.full((1, cull_chunk), tmax_hi)
        for k in range(3):
            lo = boxes_ref[k:k + 1, s]
            hi = boxes_ref[3 + k:4 + k, s]
            # slab-coordinate intervals: (slab - o) * (1/d) over the block
            a_lo = lo - o_hi[k]
            a_hi = lo - o_lo[k]
            b_lo = hi - o_hi[k]
            b_hi = hi - o_lo[k]
            straddles = (d_lo[k] < 1e-20) & (d_hi[k] > -1e-20)
            i_lo = 1.0 / jnp.where(d_hi[k] == 0.0, -1e-20, d_hi[k])
            i_hi = 1.0 / jnp.where(d_lo[k] == 0.0, 1e-20, d_lo[k])
            # extreme products of {a_lo..b_hi} x {i_lo, i_hi}
            cands = [a_lo * i_lo, a_lo * i_hi, a_hi * i_lo, a_hi * i_hi,
                     b_lo * i_lo, b_lo * i_hi, b_hi * i_lo, b_hi * i_hi]
            t_lo = cands[0]
            t_hi = cands[0]
            for t in cands[1:]:
                t_lo = jnp.minimum(t_lo, t)
                t_hi = jnp.maximum(t_hi, t)
            t_lo = jnp.where(straddles, -big, t_lo)
            t_hi = jnp.where(straddles, big, t_hi)
            tn_lo = jnp.maximum(tn_lo, t_lo)
            tf_hi = jnp.minimum(tf_hi, t_hi)
        hitm = (tn_lo <= tf_hi) & (boxes_ref[6:7, s] > 0.0)
        occ_v[0:1, s] = hitm.astype(jnp.float32)
        if NB > 1:
            tn_v[0:1, s] = jnp.maximum(tn_lo, 0.0)
        return 0

    # Fully-inactive ray blocks (common in sparse sorted queries — the
    # emitter-first occlusion sweep activates ~1% of lanes) skip the cull,
    # bucketing, SMEM copies, and prefix matmul entirely; ``count`` is
    # forced to 0 below so phase C never reads the stale scratch.
    @pl.when(any_active)
    def _():
        jax.lax.fori_loop(0, b_pad // cull_chunk, cull_chunk_body, 0)

        if NB > 1:
            # --- phase A2: front-to-back distance bucketing ----------------
            # Bucket candidates by the interval cull's conservative entry
            # distance so near blocks stream first: early close hits shrink
            # each lane's best t and the per-lane refine then skips far
            # tiles.
            occ0 = occ_v[0:1, :]
            tnr = tn_v[0:1, :]
            tn_min = jnp.min(jnp.where(occ0 > 0.0, tnr, big))
            tn_max = jnp.max(jnp.where(occ0 > 0.0, tnr, -big))
            scale = NB / jnp.maximum(tn_max - tn_min, 1e-20)
            bkt = jnp.clip(jnp.floor((tnr - tn_min) * scale), 0, NB - 1)
            for k in range(NB):
                occ_v[k:k + 1, :] = occ0 * (bkt == k).astype(jnp.float32)
        # boxes to SMEM for scalar per-block reads in the phase-C lane
        # refine
        bcp = pltpu.make_async_copy(boxes_ref, boxes_smem, bsem)
        bcp.start()
        if sub_split > 1:
            scp = pltpu.make_async_copy(subboxes_ref, subboxes_smem, ssem)
            scp.start()

        # --- phase B: prefix-sum compaction (MXU) --------------------------
        # inclusive prefix of the occupancy row via a lower-triangular ones
        # matmul: prefix[k] = sum_{j<=k} occ[j]; the pos-th occupied block
        # id is then recovered in the stream loop with a binary search over
        # the SMEM prefix (log2(B) scalar reads, vs a B-iteration scalar
        # scan)
        rows = jax.lax.broadcasted_iota(jnp.int32, (b_pad, b_pad), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (b_pad, b_pad), 1)
        lower_tri = (rows <= cols).astype(jnp.float32)
        occ_v[:, :] = jax.lax.dot_general(
            occ_v[:, :], lower_tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cp = pltpu.make_async_copy(occ_v, occ_smem, osem)
        cp.start()
        cp.wait()
        bcp.wait()
        if sub_split > 1:
            scp.wait()

    count = occ_smem[0, b_pad - 1].astype(jnp.int32)
    for k in range(1, NB):
        count = count + occ_smem[k, b_pad - 1].astype(jnp.int32)
    # stale-scratch guard: scratch persists across grid steps, so a block
    # skipped above may see the previous block's prefix sums
    count = jnp.where(any_active, count, jnp.int32(0))
    if debug_counters:
        out_ref[5, :] = out_ref[5, :] + count.astype(jnp.float32)

    # enough halvings to shrink [0, b_pad] to a single index (one more
    # than log2(b_pad): the final width-1 interval still needs a probe)
    n_steps = max(1, b_pad.bit_length())

    def nth_occupied(pos):
        """Block id of global stream position ``pos``: buckets are drained
        nearest-first, and within a bucket the smallest j with
        prefix[k][j] >= in-bucket rank."""
        tgt = jnp.asarray(pos + 1, jnp.float32)
        row = jnp.int32(NB - 1)
        target = tgt
        acc = jnp.float32(0.0)
        for k in range(NB - 1):
            ck = occ_smem[k, b_pad - 1]
            hit_k = (tgt > acc) & (tgt <= acc + ck)
            row = jnp.where(hit_k, jnp.int32(k), row)
            target = jnp.where(hit_k, tgt - acc, target)
            acc = acc + ck
        if NB > 1:
            # fall-through: position lands in the last bucket
            target = jnp.where(row == NB - 1, tgt - acc, target)
        lo = jnp.int32(0)
        hi = jnp.int32(b_pad)
        for _ in range(n_steps):
            mid = (lo + hi) // 2
            go_right = occ_smem[row, mid] < target
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        return lo

    # --- phase C: double-buffered triangle stream -------------------------
    ox, oy, oz = (rays_ref[k:k + 1, :] for k in range(3))
    dx, dy, dz = (rays_ref[k:k + 1, :] for k in range(3, 6))
    active = rays_ref[7:8, :] > 0.0
    o3 = (ox, oy, oz)
    inv3 = tuple(
        1.0 / jnp.where(jnp.abs(d) < 1e-20,
                        jnp.where(d < 0, -1e-20, 1e-20), d)
        for d in (dx, dy, dz))

    def dma(slot, b):
        return pltpu.make_async_copy(tris_hbm.at[b],
                                     scratch.at[slot], sems.at[slot])

    def lane_refine(b, undecided=None, smem=None):
        """True iff some active lane's slab interval for box ``b`` of
        ``smem`` (default: block boxes) intersects (RayEpsilon, that lane's
        current best t)."""
        if smem is None:
            smem = boxes_smem
        tn = jnp.full_like(ox, RayEpsilon)
        tf = out_ref[0:1, :]
        for k in range(3):
            t0 = (smem[k, b] - o3[k]) * inv3[k]
            t1 = (smem[3 + k, b] - o3[k]) * inv3[k]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        live = (tn <= tf) & active
        if undecided is not None:
            live = live & undecided
        return jnp.max(live.astype(jnp.float32)) > 0.0

    def mt_tile(b, slot, j, n_sub):
        """MT on sub-tile j (of n_sub) of the DMA'd block: rows
        [j*T/n_sub, (j+1)*T/n_sub) as a (T/n_sub, R) VPU tile."""
        if debug_counters:
            out_ref[4, :] = out_ref[4, :] + 1.0 / n_sub
        Ts = T // n_sub
        row = scratch[slot]                             # (16, T)
        p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = (
            row[k, :].reshape(T, 1)[j * Ts:(j + 1) * Ts] for k in range(9))

        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
        sx = ox - p0x
        sy = oy - p0y
        sz = oz - p0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)

        t_best = out_ref[0:1, :]
        tvalid = row[9, :].reshape(T, 1)[j * Ts:(j + 1) * Ts] > 0.0
        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > RayEpsilon) & (t < t_best) & tvalid & active)
        t_m = jnp.where(ok, t, float("inf"))
        rsel = jnp.argmin(t_m, axis=0)
        pick = rsel[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, t_m.shape, 0)
        t_c = jnp.min(t_m, axis=0)
        closer = t_c < t_best[0, :]
        u_c = jnp.sum(jnp.where(pick, u, 0.0), axis=0)
        v_c = jnp.sum(jnp.where(pick, v, 0.0), axis=0)

        out_ref[0, :] = jnp.where(closer, t_c, out_ref[0, :])
        ids = pltpu.bitcast(out_ref[1:2, :], jnp.int32)
        new_ids = jnp.where(closer[None, :],
                            rsel[None, :].astype(jnp.int32) + b * T + j * Ts,
                            ids)
        out_ref[1:2, :] = pltpu.bitcast(new_ids, jnp.float32)
        out_ref[2, :] = jnp.where(closer, u_c, out_ref[2, :])
        out_ref[3, :] = jnp.where(closer, v_c, out_ref[3, :])

    def mt_block(b, slot, undecided=None):
        """The block's MT work, split into sub_split independently
        lane-refined sub-tiles (sub-block AABBs = one BVH level down)."""
        if sub_split == 1:
            mt_tile(b, slot, 0, 1)
            return
        for j in range(sub_split):
            @pl.when(lane_refine(sub_split * b + j, undecided,
                                 smem=subboxes_smem))
            def _(j=j):
                mt_tile(b, slot, j, sub_split)

    S = n_slots

    @pl.when(count > 0)
    def _():
        # block ids are resolved once per stream position and carried
        # through the loop as a sliding window of the next S-1 positions;
        # S-deep buffering keeps S-1 triangle DMAs in flight ahead of the
        # MT tile consuming slot pos % S
        window = []
        for k in range(S - 1):
            b_k = jnp.minimum(nth_occupied(k), b_pad - 1)
            window.append(b_k)

            @pl.when(k < count)
            def _(b_k=b_k, k=k):
                dma(k % S, b_k).start()

        def advance(pos, window):
            """Start the DMA for pos+S-1, wait/process pos, slide window."""
            b_cur = window[0]
            b_new = jnp.minimum(nth_occupied(pos + S - 1), b_pad - 1)

            @pl.when(pos + S - 1 < count)
            def _():
                dma((pos + S - 1) % S, b_new).start()

            dma(pos % S, b_cur).wait()
            return b_cur, tuple(window[1:]) + (b_new,)

        if any_hit:
            # exit the stream once every active lane is decided
            def cond(carry):
                pos = carry[0]
                undecided = jnp.sum(
                    ((pltpu.bitcast(out_ref[1:2, :], jnp.int32) < 0)
                     & (rays_ref[7:8, :] > 0.0)).astype(jnp.int32))
                return (pos < count) & (undecided > 0)

            def body(carry):
                pos = carry[0]
                b_cur, window = advance(pos, carry[1:])
                und = pltpu.bitcast(out_ref[1:2, :], jnp.int32) < 0

                @pl.when(lane_refine(b_cur, und))
                def _():
                    mt_block(b_cur, pos % S)

                return (pos + 1,) + window

            fin = jax.lax.while_loop(
                cond, body, (jnp.int32(0),) + tuple(window))
            final = fin[0]

            # early exit leaves the prefetched DMAs for positions
            # final..final+S-2 in flight; an un-awaited DMA semaphore
            # wedges the device (observed as ABORTED on the very next
            # program) — drain them
            for k in range(S - 1):
                @pl.when(final + k < count)
                def _(k=k):
                    dma((final + k) % S, fin[1 + k]).wait()
        else:
            def body(pos, window):
                b_cur, window = advance(pos, window)

                @pl.when(lane_refine(b_cur))
                def _():
                    mt_block(b_cur, pos % S)

                return window

            jax.lax.fori_loop(0, count, body, tuple(window))


def ray_intersect_pallas_culled2(bvh, ray_o: jax.Array, ray_d: jax.Array,
                                 active: jax.Array | None = None,
                                 tmax: jax.Array | None = None,
                                 ray_block: int = 512,
                                 tri_block: int = 128,
                                 any_hit: bool = False,
                                 n_slots: int = 2,
                                 sub_split: int = 1,
                                 front_to_back: bool = False,
                                 n_buckets: int | None = None,
                                 interpret: bool = False,
                                 debug_counters: bool = False) -> HitRecord:
    """Block-culled Pallas intersection, cull and compaction in-kernel.
    Same contract as ray_intersect_culled; ``any_hit=True`` returns *a* hit
    (not necessarily the closest) and exits early — for occlusion queries.
    ``debug_counters=True`` additionally returns per-ray-block (MT tiles
    executed, candidate blocks) counts for occupancy/roofline analysis."""
    # Mosaic kernels only lower on TPU; run interpreted on the CPU backend
    # so the scene-level "pallas" dispatch (and its tests) work there.
    # Checked against "cpu", NOT "== tpu": the tunneled chip registers as
    # the experimental "axon" platform.
    interpret = interpret or jax.default_backend() == "cpu"
    sg = jax.lax.stop_gradient
    ray_o, ray_d = sg(ray_o), sg(ray_d)
    n_rays = ray_o.shape[0]
    P, L = bvh.num_leaves, bvh.leaf_size

    n_tris_padded = P * L
    T = min(tri_block, n_tris_padded)
    n_blocks = max(1, n_tris_padded // T)
    blocks = bvh.nodes[n_blocks:2 * n_blocks]           # (B, 6) leaf-row AABBs
    lpb = P // n_blocks
    tri_rows = (bvh.leaf_tris.reshape(n_blocks, lpb, 9, L)
                .transpose(0, 2, 1, 3).reshape(n_blocks, 9, T))
    valid_rows = bvh.tri_valid.reshape(n_blocks, 1, T).astype(jnp.float32)
    tri_rows = jnp.concatenate(
        [tri_rows, valid_rows,
         jnp.zeros((n_blocks, 6, T), jnp.float32)], axis=1)
    block_mask = bvh.node_mask[n_blocks:2 * n_blocks]

    if active is None:
        active = jnp.ones((n_rays,), bool)
    else:
        active = sg(active)
    if tmax is None:
        tmax = jnp.full((n_rays,), _INF)
    tmax = jnp.broadcast_to(sg(tmax), (n_rays,))

    rb = min(ray_block, max(128, n_rays))
    r_pad = _ceil_to(n_rays, rb)
    n_rblocks = r_pad // rb
    b_pad = _ceil_to(n_blocks, 128)
    cull_chunk = min(256, b_pad)

    rays = jnp.stack([
        _pad_to(ray_o[:, 0], r_pad), _pad_to(ray_o[:, 1], r_pad),
        _pad_to(ray_o[:, 2], r_pad), _pad_to(ray_d[:, 0], r_pad),
        _pad_to(ray_d[:, 1], r_pad), _pad_to(ray_d[:, 2], r_pad),
        _pad_to(tmax, r_pad, value=0.0),
        _pad_to(active.astype(jnp.float32), r_pad),
    ])                                                  # (8, r_pad)
    # (8, b_pad): lo.xyz, hi.xyz, mask, pad
    boxes = jnp.concatenate([
        jnp.pad(blocks.T, ((0, 0), (0, b_pad - n_blocks))),
        jnp.pad(block_mask.astype(jnp.float32)[None, :],
                ((0, 0), (0, b_pad - n_blocks))),
        jnp.zeros((1, b_pad), jnp.float32),
    ])

    # sub-block AABBs: the heap level sub_split*B (one/two levels below the
    # block level), giving T/sub_split-triangle granularity to the phase-C
    # lane refine. Disabled when the level doesn't exist or the sub-tile
    # wouldn't be sublane-aligned.
    G = sub_split
    Ts = T // max(G, 1)
    if (G > 1 and (T % G or Ts % 8 or Ts < L or G * n_blocks > P
                   or n_blocks * G != (n_blocks * G & -(n_blocks * G)))):
        G = 1
    if G > 1:
        sb = bvh.nodes[G * n_blocks:2 * G * n_blocks]   # (G*B, 6)
        sb_mask = bvh.node_mask[G * n_blocks:2 * G * n_blocks]
        sb_pad = _ceil_to(G * n_blocks, 128)
        subboxes = jnp.concatenate([
            jnp.pad(sb.T, ((0, 0), (0, sb_pad - G * n_blocks))),
            jnp.pad(sb_mask.astype(jnp.float32)[None, :],
                    ((0, 0), (0, sb_pad - G * n_blocks))),
            jnp.zeros((1, sb_pad), jnp.float32),
        ])
    else:
        sb_pad = 128
        subboxes = jnp.zeros((8, sb_pad), jnp.float32)

    NB = (n_buckets or 8) if front_to_back else 1
    out = pl.pallas_call(
        partial(_culled2_kernel, tri_block=T, b_pad=b_pad,
                cull_chunk=cull_chunk, any_hit=any_hit, n_slots=n_slots,
                sub_split=G, n_buckets=NB, debug_counters=debug_counters),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        grid=(n_rblocks,),
        in_specs=[
            pl.BlockSpec((8, rb), lambda i: (0, i)),
            pl.BlockSpec((8, b_pad), lambda i: (0, 0)),
            pl.BlockSpec((8, sb_pad), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, rb), lambda i: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((NB, b_pad), jnp.float32),
            pltpu.VMEM((1, b_pad), jnp.float32),
            pltpu.SMEM((NB, b_pad), jnp.float32),
            pltpu.SMEM((8, b_pad), jnp.float32),
            pltpu.SMEM((8, sb_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((n_slots, 16, T), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
        interpret=interpret,
    )(rays, boxes, subboxes, tri_rows)

    t = out[0, :n_rays]
    slot = jax.lax.bitcast_convert_type(out[1, :n_rays], jnp.int32)
    uv = jnp.stack([out[2, :n_rays], out[3, :n_rays]], axis=-1)
    tri_id = jnp.where(slot >= 0, bvh.perm[jnp.maximum(slot, 0)], -1)
    hit = HitRecord(valid=tri_id >= 0, tri_id=tri_id, uv=uv,
                    t=jnp.where(tri_id >= 0, t, _INF))
    if debug_counters:
        tiles = out[4].reshape(n_rblocks, rb)[:, 0]
        cands = out[5].reshape(n_rblocks, rb)[:, 0]
        return hit, (tiles, cands)
    return hit
