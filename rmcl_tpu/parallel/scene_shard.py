"""Spatially partitioned scenes across a device mesh.

Removes the replicated-map limitation (SURVEY.md §2.10 P4/P5): each device
owns a spatially compact shard of the triangle bins and casts ALL of its
rays against only that shard; per-ray winners are merged across the
``scene`` mesh axis with two ICI collectives (a packed-key ``pmin`` to
elect the globally nearest hit, then a masked ``psum`` to broadcast the
winner's payload). No ray forwarding, no pointer chasing, no load-balancer:
the dense engine's conservative cull makes a shard that is nowhere near a
ray block terminate its candidate loop almost immediately, so work
concentrates on the shard(s) that actually contain the geometry each ray
hits — the same effect as forwarding rays to the owning device, but with
fixed shapes and exactly two collectives per cast.

Composes with ray data-parallelism: on a 2-D mesh (rays × scene), ray
arrays are sharded over ``rays`` and the bins over ``scene``; every device
processes (its rays × its scene shard).

The shard layout piggybacks on the kd bin builder (bvh/bins.py): supers are
contiguous DFS ranges of a median-split tree, so equal contiguous super
ranges are spatially compact boxes — partitioning is a reshape, not a
clustering problem.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rmcl_tpu.bvh.bins import TriangleBins
from rmcl_tpu.ops.raycast import NO_HIT_T, RayHits
from rmcl_tpu.ops.raycast_binned import cast_rays_binned
from rmcl_tpu.parallel.mesh import RAY_AXIS

Array = jax.Array

SCENE_AXIS = "scene"

_BIG = 3.0e38  # python float: see raycast_binned._BIG note
# sentinel AABB (min > max) for padded bins/supers: every slab/cone test
# yields t_near > t_far, so padded entries are never candidates
_PAD_LO = 1.0e38
_PAD_HI = -1.0e38


def partition_bins(bins: TriangleBins, n_shards: int) -> TriangleBins:
    """Split bins into ``n_shards`` spatially compact shards, stacked along
    a new leading axis (shard with ``P('scene')`` on every leaf).

    Shards are contiguous super ranges (spatially compact by construction
    of the kd bin builder). Every shard is padded to the same super/bin
    counts with sentinel never-hit entries.
    """
    S = bins.bins_per_super
    n_super = bins.n_super
    n_bins = bins.n_bins
    B = bins.bin_size
    sup_per = -(-n_super // n_shards)  # ceil
    bins_per = sup_per * S

    tri = np.zeros((n_shards, bins_per, bins.tri.shape[1], B), np.float32)
    bin_aabb = np.empty((n_shards, bins_per, 6), np.float32)
    bin_aabb[..., 0:3] = _PAD_LO
    bin_aabb[..., 3:6] = _PAD_HI
    super_aabb = np.empty((n_shards, sup_per, 6), np.float32)
    super_aabb[..., 0:3] = _PAD_LO
    super_aabb[..., 3:6] = _PAD_HI

    tri_h = np.asarray(jax.device_get(bins.tri))
    bin_h = np.asarray(jax.device_get(bins.bin_aabb))
    sup_h = np.asarray(jax.device_get(bins.super_aabb))

    aabb_min = np.zeros((n_shards, 3), np.float32)
    aabb_max = np.zeros((n_shards, 3), np.float32)
    for s in range(n_shards):
        s0 = s * sup_per
        s1 = min(s0 + sup_per, n_super)
        if s1 <= s0:  # more shards than supers: shard stays all-sentinel
            continue
        b0 = s0 * S
        b1 = min(s1 * S, n_bins)
        tri[s, : b1 - b0] = tri_h[b0:b1]
        bin_aabb[s, : b1 - b0] = bin_h[b0:b1]
        super_aabb[s, : s1 - s0] = sup_h[s0:s1]
        aabb_min[s] = sup_h[s0:s1, 0:3].min(axis=0)
        aabb_max[s] = sup_h[s0:s1, 3:6].max(axis=0)

    return TriangleBins(
        tri=jnp.asarray(tri),
        bin_aabb=jnp.asarray(bin_aabb),
        super_aabb=jnp.asarray(super_aabb),
        bins_per_super=S,
        aabb_min=jnp.asarray(aabb_min),
        aabb_max=jnp.asarray(aabb_max),
    )


def put_scene_sharded(sbins: TriangleBins, mesh: Mesh) -> TriangleBins:
    """Place a partitioned (stacked) TriangleBins with each leaf sharded
    over the ``scene`` mesh axis (leading dim must equal its size)."""
    sh = NamedSharding(mesh, P(SCENE_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), sbins)


def shard_boxes(sbins: TriangleBins) -> Array:
    """(n_shards, 6) [min, max] boxes of a :func:`partition_bins` result —
    replicate this to every device for per-ray routing
    (:func:`cast_rays_scene_forwarded`)."""
    return jnp.concatenate([sbins.aabb_min, sbins.aabb_max], axis=-1)


def _elect_and_broadcast(h: RayHits, idm) -> RayHits:
    """Global winner election over the scene axis: packed-key pmin (shard
    id in the low mantissa bits of the positive hit distance) + masked
    psum broadcast of the winner's payload."""
    t_loc = jnp.where(h.hit, h.t, _BIG)
    tb = jax.lax.bitcast_convert_type(t_loc, jnp.int32)
    key = (tb & ~idm) | jax.lax.axis_index(SCENE_AXIS)
    kmin = jax.lax.pmin(key, SCENE_AXIS)
    win = key == kmin
    pick_f = lambda x: jax.lax.psum(
        jnp.where(win if x.ndim == 1 else win[:, None], x, 0), SCENE_AXIS
    )
    hit = jax.lax.psum(
        jnp.where(win, h.hit, False).astype(jnp.int32), SCENE_AXIS
    ) > 0
    t = pick_f(h.t * h.hit.astype(jnp.float32))
    point = pick_f(h.point)
    normal = pick_f(h.normal)
    prim = jax.lax.psum(jnp.where(win & h.hit, h.prim_id, 0), SCENE_AXIS)
    inst = jax.lax.psum(jnp.where(win & h.hit, h.inst_id, 0), SCENE_AXIS)
    return RayHits(
        t=jnp.where(hit, t, NO_HIT_T),
        hit=hit,
        prim_id=jnp.where(hit, prim, -1),
        inst_id=jnp.where(hit, inst, -1),
        point=point,
        normal=normal,
    )


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "ray_sharded", "block_size", "c_super", "c_bin",
        "block_chunk", "flip_normals", "sub_blocks", "dir_groups",
        "use_pallas", "pallas_interpret", "shared_dir", "payload",
        "sort_blocks",
    ),
)
def cast_rays_scene_forwarded(
    sbins: TriangleBins,  # stacked: leading dim = mesh.shape['scene']
    orig: Array,
    dirs: Array,
    mesh: Mesh,
    boxes: Array,  # (n_scene, 6) shard AABBs, replicated (shard_boxes())
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    ray_sharded: bool = True,
    **cast_kw,
) -> RayHits:
    """Scene-partitioned closest-hit with RAY FORWARDING by masking
    (VERDICT r4 #6 / SURVEY §7.7): each ray is ASSIGNED to the shard its
    segment enters first; every other shard sees it dead (t_max=0), and
    dead blocks cost ~zero trips under count-sorted chunks — the work
    routing of ppermute forwarding with fixed shapes and no all-to-all.

    Round 1 casts every ray on its assigned shard only. A ray escalates
    to round 2 iff another crossed shard's box entry lies before its
    round-1 hit (or it missed and crosses other shards) — the exactness
    condition: a shard's geometry lies inside its box, so an entry beyond
    the current hit cannot beat it. Round 2 re-casts only escalated rays
    on the other crossed shards, with t_max clamped to the round-1 hit.

    Collectives per cast: one (n,) psum to share round-1 distances + the
    same pmin/psum winner election as :func:`cast_rays_scene_sharded`.
    Rays are processed in assigned-shard-major order internally (blocks
    stay alive/dead-homogeneous) and returned in input order.
    """
    n_scene = mesh.shape[SCENE_AXIS]
    assert sbins.tri.shape[0] == n_scene
    has_rays = ray_sharded and RAY_AXIS in mesh.shape
    ray_spec = P(RAY_AXIS) if has_rays else P()
    cast_kw.setdefault("sort_blocks", True)

    orig, dirs = jnp.broadcast_arrays(
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    batch_shape = orig.shape[:-1]
    o = orig.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    t_min_r = jnp.broadcast_to(
        jnp.asarray(t_min, jnp.float32), batch_shape).reshape(-1)
    t_max_r = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), batch_shape).reshape(-1)

    id_bits = max(1, (n_scene - 1).bit_length())
    idm = jnp.int32((1 << id_bits) - 1)

    def local(bins_s, boxes, o_l, d_l, tmin_l, tmax_l):
        bins_local = jax.tree.map(lambda x: x[0], bins_s)
        my = jax.lax.axis_index(SCENE_AXIS)

        # per-ray slab tests vs every shard box (n_scene is tiny)
        inv = 1.0 / jnp.where(jnp.abs(d_l) > 1e-30, d_l,
                              jnp.where(d_l >= 0, 1e-30, -1e-30))
        lo = (boxes[None, :, 0:3] - o_l[:, None, :]) * inv[:, None, :]
        hi = (boxes[None, :, 3:6] - o_l[:, None, :]) * inv[:, None, :]
        t_near = jnp.max(jnp.minimum(lo, hi), axis=-1)  # (n, n_scene)
        t_far = jnp.min(jnp.maximum(lo, hi), axis=-1)
        t_enter = jnp.maximum(t_near, tmin_l[:, None])
        crosses = (t_far >= t_enter) & (t_enter <= tmax_l[:, None]) & (
            boxes[None, :, 0] <= boxes[None, :, 3]  # sentinel empty shards
        )
        t_enter = jnp.where(crosses, t_enter, _BIG)
        assigned = jnp.argmin(t_enter, axis=1).astype(jnp.int32)  # (n,)

        # assigned-major processing order (identical on every device)
        order = jnp.argsort(assigned)
        inv_order = jnp.argsort(order)
        take = lambda x: jnp.take(x, order, axis=0)
        o_s, d_s = take(o_l), take(d_l)
        tmin_s, tmax_s = take(tmin_l), take(tmax_l)
        assigned_s = take(assigned)
        crosses_s = jnp.take(crosses, order, axis=0)
        t_enter_s = jnp.take(t_enter, order, axis=0)
        any_cross = jnp.any(crosses_s, axis=1)

        # round 1: my rays only; everyone else sees them dead
        mine1 = (assigned_s == my) & any_cross
        h1 = cast_rays_binned(
            bins_local, o_s, d_s, t_min=tmin_s,
            t_max=jnp.where(mine1, tmax_s, 0.0), **cast_kw,
        )
        # share round-1 best distances (one packed psum): owners
        # contribute, others zero
        t1_eff_local = jnp.where(
            mine1, jnp.where(h1.hit, h1.t, tmax_s), 0.0
        )
        t1_all = jax.lax.psum(t1_eff_local, SCENE_AXIS)  # (n,)
        t1_all = jnp.where(any_cross, t1_all, 0.0)

        # escalate iff another crossed shard's entry precedes the
        # round-1 result
        other = crosses_s & (
            jax.lax.broadcasted_iota(jnp.int32, crosses_s.shape, 1)
            != assigned_s[:, None]
        )
        escal = jnp.any(other & (t_enter_s < t1_all[:, None]), axis=1)

        # round 2: escalated rays on my shard (crossed here, not assigned)
        crosses_me = jnp.squeeze(
            jnp.take_along_axis(
                crosses_s,
                jnp.broadcast_to(my, assigned_s.shape).astype(
                    jnp.int32)[:, None],
                axis=1,
            ),
            -1,
        )
        mine2 = escal & crosses_me & (assigned_s != my)
        h2 = cast_rays_binned(
            bins_local, o_s, d_s, t_min=tmin_s,
            t_max=jnp.where(mine2, jnp.minimum(tmax_s, t1_all), 0.0),
            **cast_kw,
        )

        # local best of the two rounds, then the global election
        pick1 = h1.hit & (~h2.hit | (h1.t <= h2.t))
        sel = lambda a, b: jnp.where(
            pick1 if a.ndim == 1 else pick1[:, None], a, b)
        h_loc = RayHits(
            t=sel(h1.t, h2.t), hit=h1.hit | h2.hit,
            prim_id=sel(h1.prim_id, h2.prim_id),
            inst_id=sel(h1.inst_id, h2.inst_id),
            point=sel(h1.point, h2.point), normal=sel(h1.normal, h2.normal),
        )
        out = _elect_and_broadcast(h_loc, idm)
        untake = lambda x: jnp.take(x, inv_order, axis=0)
        return jax.tree.map(untake, out)

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS), P(), ray_spec, ray_spec, ray_spec,
                  ray_spec),
        out_specs=RayHits(
            t=ray_spec, hit=ray_spec, prim_id=ray_spec, inst_id=ray_spec,
            point=ray_spec, normal=ray_spec,
        ),
        check_vma=False,
    )(sbins, jnp.asarray(boxes, jnp.float32), o, d, t_min_r, t_max_r)

    return RayHits(
        t=out.t.reshape(batch_shape),
        hit=out.hit.reshape(batch_shape),
        prim_id=out.prim_id.reshape(batch_shape),
        inst_id=out.inst_id.reshape(batch_shape),
        point=out.point.reshape(batch_shape + (3,)),
        normal=out.normal.reshape(batch_shape + (3,)),
    )


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "ray_sharded", "block_size", "c_super", "c_bin",
        "block_chunk", "flip_normals", "sub_blocks", "dir_groups",
        "use_pallas", "pallas_interpret", "shared_dir", "payload",
        "sort_blocks",
    ),
)
def cast_rays_scene_sharded(
    sbins: TriangleBins,  # stacked: leading dim = mesh.shape['scene']
    orig: Array,
    dirs: Array,
    mesh: Mesh,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    ray_sharded: bool = True,
    **cast_kw,
) -> RayHits:
    """Closest-hit over a scene partitioned across the ``scene`` mesh axis.

    ``orig``/``dirs``: (n, 3) — sharded over the ``rays`` axis when
    ``ray_sharded`` and the mesh has one, else replicated. Returns RayHits
    with the same ray sharding. ``n`` divided by the rays-axis size must be
    a multiple of block_size*block_chunk or padded upstream.
    """
    n_scene = mesh.shape[SCENE_AXIS]
    assert sbins.tri.shape[0] == n_scene, (
        f"bins stacked to {sbins.tri.shape[0]} shards but mesh "
        f"'{SCENE_AXIS}' axis has {n_scene} devices"
    )
    has_rays = ray_sharded and RAY_AXIS in mesh.shape
    ray_spec = P(RAY_AXIS) if has_rays else P()

    orig, dirs = jnp.broadcast_arrays(
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    batch_shape = orig.shape[:-1]
    o = orig.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    t_min_r = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), batch_shape).reshape(-1)
    t_max_r = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), batch_shape).reshape(-1)

    id_bits = max(1, (n_scene - 1).bit_length())
    idm = jnp.int32((1 << id_bits) - 1)

    def local(bins_s, o_l, d_l, tmin_l, tmax_l):
        bins_local = jax.tree.map(lambda x: x[0], bins_s)
        h = cast_rays_binned(
            bins_local, o_l, d_l, t_min=tmin_l, t_max=tmax_l, **cast_kw
        )
        # elect the global winner: pack the shard id into the low mantissa
        # bits of the (positive) hit distance — IEEE positives compare as
        # ints, so one integer pmin finds the nearest hit AND a unique
        # owner (ties broken toward the lower shard id)
        t_loc = jnp.where(h.hit, h.t, _BIG)
        tb = jax.lax.bitcast_convert_type(t_loc, jnp.int32)
        key = (tb & ~idm) | jax.lax.axis_index(SCENE_AXIS)
        kmin = jax.lax.pmin(key, SCENE_AXIS)
        win = key == kmin
        # winner broadcasts its exact payload (one psum; losers add zeros)
        pick_f = lambda x: jax.lax.psum(
            jnp.where(win if x.ndim == 1 else win[:, None], x, 0), SCENE_AXIS
        )
        hit = jax.lax.psum(jnp.where(win, h.hit, False).astype(jnp.int32), SCENE_AXIS) > 0
        t = pick_f(h.t * h.hit.astype(jnp.float32))
        point = pick_f(h.point)
        normal = pick_f(h.normal)
        prim = jax.lax.psum(jnp.where(win & h.hit, h.prim_id, 0), SCENE_AXIS)
        inst = jax.lax.psum(jnp.where(win & h.hit, h.inst_id, 0), SCENE_AXIS)
        return RayHits(
            t=jnp.where(hit, t, NO_HIT_T),
            hit=hit,
            prim_id=jnp.where(hit, prim, -1),
            inst_id=jnp.where(hit, inst, -1),
            point=point,
            normal=normal,
        )

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS), ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=RayHits(
            t=ray_spec, hit=ray_spec, prim_id=ray_spec, inst_id=ray_spec,
            point=ray_spec, normal=ray_spec,
        ),
        check_vma=False,
    )(sbins, o, d, t_min_r, t_max_r)

    return RayHits(
        t=out.t.reshape(batch_shape),
        hit=out.hit.reshape(batch_shape),
        prim_id=out.prim_id.reshape(batch_shape),
        inst_id=out.inst_id.reshape(batch_shape),
        point=out.point.reshape(batch_shape + (3,)),
        normal=out.normal.reshape(batch_shape + (3,)),
    )
