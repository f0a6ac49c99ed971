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
