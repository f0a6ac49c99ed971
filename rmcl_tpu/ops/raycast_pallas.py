"""Pallas TPU kernel for the dense binned ray caster's hot loop.

One program per ray block: DMA the block's candidate bins from HBM into a
double-buffered VMEM slot while intersecting the previous bin, with a
*per-block dynamic trip count* and nearest-first early exit — the features
the XLA fallback (ops.raycast_binned) approximates per chunk, here exact per
block and fused into a single kernel (no intermediate materialization, no
per-iteration launch overhead).

Layout contract (see rmcl_tpu.bvh.bins): triangle payload is component-major
(n_bins, 14, B) so one bin's DMA lands as 14 sublanes x B lanes in VMEM.

The kernel covers the intersection phase only; candidate selection (block
frustum culling + nearest-first top-k) stays in XLA where it is already
dense and cheap. Use ``cast_rays_binned(..., use_pallas=True)`` — falls
back transparently when Pallas/TPU is unavailable (e.g. CPU test runs use
interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 3.0e38  # python float: see raycast_binned._BIG note


def _intersect_kernel(
    # per-block SMEM metadata (blocks are (1, 1, X) so the trailing two dims
    # equal the array dims — the Mosaic block-shape rule)
    cand_ref,  # (1, 1, cb) int32 candidate bin ids (-1 = empty)
    count_ref,  # (1, 1, 1) int32 candidate count
    tnear_ref,  # (1, 1, cb) f32 conservative entry distance per candidate
    # inputs
    ox_ref, oy_ref, oz_ref,  # (1, 1, Rb) ray origins (block)
    dx_ref, dy_ref, dz_ref,  # (1, 1, Rb) ray directions
    tmin_ref, tmax_ref,  # (1, 1, Rb)
    tri_hbm,  # (n_bins, 14, B) in ANY/HBM
    # outputs
    tbest_ref,  # (1, 1, Rb)
    ref_ref,  # (1, 1, Rb) int32 winning bin*B+j
    # scratch
    tri_buf,  # (2, 14, B) VMEM
    sem,  # DMA semaphores (2,)
):
    Rb = ox_ref.shape[2]
    B = tri_buf.shape[2]

    n_cand = count_ref[0, 0, 0]

    def dma(slot, c):
        bid = cand_ref[0, 0, c]
        safe = jnp.maximum(bid, 0)
        return pltpu.make_async_copy(
            tri_hbm.at[safe], tri_buf.at[slot], sem.at[slot]
        )

    @pl.when(n_cand > 0)
    def _():
        dma(0, 0).start()

    ox = ox_ref[0, 0, :]
    oy = oy_ref[0, 0, :]
    oz = oz_ref[0, 0, :]
    dx = dx_ref[0, 0, :]
    dy = dy_ref[0, 0, :]
    dz = dz_ref[0, 0, :]
    t_min = tmin_ref[0, 0, :]

    def body(state):
        c, t_best, best_ref = state
        slot = c % 2

        @pl.when(c + 1 < n_cand)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(slot, c).wait()

        tw = tri_buf[slot]  # (14, B)
        v0x, v0y, v0z = tw[0, :], tw[1, :], tw[2, :]
        e1x, e1y, e1z = tw[3, :], tw[4, :], tw[5, :]
        e2x, e2y, e2z = tw[6, :], tw[7, :], tw[8, :]

        # Möller–Trumbore on (Rb, B): rays in sublanes, triangles in lanes
        def outer(r, t):
            return r[:, None] * t[None, :]

        pvx = outer(dy, e2z) - outer(dz, e2y)
        pvy = outer(dz, e2x) - outer(dx, e2z)
        pvz = outer(dx, e2y) - outer(dy, e2x)
        det = e1x[None, :] * pvx + e1y[None, :] * pvy + e1z[None, :] * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = ox[:, None] - v0x[None, :]
        tvy = oy[:, None] - v0y[None, :]
        tvz = oz[:, None] - v0z[None, :]
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z[None, :] - tvz * e1y[None, :]
        qvy = tvz * e1x[None, :] - tvx * e1z[None, :]
        qvz = tvx * e1y[None, :] - tvy * e1x[None, :]
        v = (dx[:, None] * qvx + dy[:, None] * qvy + dz[:, None] * qvz) * inv_det
        t = (e2x[None, :] * qvx + e2y[None, :] * qvy + e2z[None, :] * qvz) * inv_det
        eps = 1e-7
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= -eps)
            & (v >= -eps)
            & (u + v <= 1.0 + eps)
            & (t > t_min[:, None])
            & (t < t_best[:, None])
        )
        t_cand = jnp.where(ok, t, 3.0e38)
        # packed-key min: triangle index in the low mantissa bits of the
        # positive float (same trick as the XLA path; avoids argmin)
        jmask = B - 1
        ti = jax.lax.bitcast_convert_type(t_cand, jnp.int32)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (Rb, B), 1)
        key = (ti & ~jmask) | j_iota
        key_min = jnp.min(key, axis=1)  # (Rb,)
        t_min_bin = jax.lax.bitcast_convert_type(key_min | jmask, jnp.float32)
        better = t_min_bin < t_best
        bid = cand_ref[0, 0, c]
        new_ref = bid * B + (key_min & jmask)
        return (
            c + 1,
            jnp.where(better, t_min_bin, t_best),
            jnp.where(better, new_ref, best_ref),
        )

    def cond(state):
        c, t_best, _ = state
        # nearest-first early exit: next candidate starts beyond every ray's
        # current best
        in_range = c < n_cand
        useful = tnear_ref[0, 0, jnp.minimum(c, cand_ref.shape[2] - 1)] <= jnp.max(t_best)
        return in_range & useful

    t0 = tmax_ref[0, 0, :]
    init = (jnp.int32(0), t0, jnp.full((Rb,), -1, jnp.int32))
    c_final, t_best, best_ref = jax.lax.while_loop(cond, body, init)

    # early exit leaves the next candidate's prefetch in flight — it must be
    # consumed before the program ends or the next grid step corrupts scratch
    @pl.when((c_final < n_cand) & (n_cand > 0))
    def _():
        dma(c_final % 2, c_final).wait()

    tbest_ref[0, 0, :] = t_best
    ref_ref[0, 0, :] = best_ref


@functools.partial(
    jax.jit, static_argnames=("block_size", "interpret")
)
def intersect_bins_pallas(
    tri: Array,  # (n_bins, 14, B) f32
    ob: Array,  # (n_blk, Rb, 3)
    db: Array,  # (n_blk, Rb, 3)
    t_min_b: Array,  # (n_blk, Rb)
    t_max_b: Array,  # (n_blk, Rb)
    cand_bin: Array,  # (n_blk, cb) int32
    cand_count: Array,  # (n_blk,) int32
    cand_tnear: Array,  # (n_blk, cb) f32
    block_size: int,
    interpret: bool = False,
):
    """Fused candidate-bin intersection. Returns (t_best, ref_best) with
    shapes (n_blk, Rb)."""
    n_blk, Rb, _ = ob.shape
    B = tri.shape[2]
    cb = cand_bin.shape[1]

    smem3 = lambda k: pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    vmem3 = pl.BlockSpec((1, 1, Rb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    _specs = dict(
        grid=(n_blk,),
        in_specs=[
            smem3(cb),
            smem3(1),
            smem3(cb),
            vmem3, vmem3, vmem3, vmem3, vmem3, vmem3, vmem3, vmem3,
            pl.BlockSpec(memory_space=pl.ANY),  # tri stays in HBM
        ],
        out_specs=[vmem3, vmem3],
    )

    r3 = lambda x: x.reshape(n_blk, 1, -1)
    ox, oy, oz = r3(ob[..., 0]), r3(ob[..., 1]), r3(ob[..., 2])
    dx, dy, dz = r3(db[..., 0]), r3(db[..., 1]), r3(db[..., 2])
    t_best, ref_best = pl.pallas_call(
        _intersect_kernel,
        **_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_blk, 1, Rb), jnp.float32),
            jax.ShapeDtypeStruct((n_blk, 1, Rb), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 14, B), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        cand_bin[:, None, :],
        cand_count[:, None, None],
        cand_tnear[:, None, :],
        ox, oy, oz, dx, dy, dz,
        r3(t_min_b), r3(t_max_b),
        tri,
    )
    return t_best[:, 0, :], ref_best[:, 0, :]
