"""Batched BVH ray casting — the heart of the framework.

TPU-native replacement for every rmagine simulator backend
(``{Sphere,Pinhole,O1Dn,OnDn}Simulator{Embree,Optix,Vulkan}`` — SURVEY.md
§2.9): ONE batched closest-hit kernel over the flattened slot BVH, shared by
all sensor models, both localization algorithms and the map-segmentation ops.

Traversal design (see rmcl_tpu.bvh.types for the slot layout):
  * one uniform 64-byte gather per step — a slot is decoded BOTH as an
    internal node (2 child AABBs + links) and as an inline triangle, and the
    results are select-merged, so the vmapped lockstep loop has no divergent
    branches;
  * per-ray short stack (STACK_DEPTH int32) carried through
    ``lax.while_loop``; ordered near/far descent with t_best pruning;
  * rays are processed in fixed-size chunks (``lax.map``) to bound the
    stack's memory footprint.

Differentiability: the discrete traversal (which triangle was hit) is wrapped
in ``stop_gradient``; the hit distance is then *re-derived from the plane
equation* of the hit triangle, so gradients flow exactly through ray origin
and direction (and, via :func:`cast_rays_diff`, mesh vertices). This is the
"differentiable" capability the reference lacks (BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.types import BVH

Array = jax.Array

STACK_DEPTH = 48  # fits trees of ~2^47 slots; LBVH depth ~2*log2(T)
SENTINEL = jnp.int32(-2147483648)
NO_HIT_T = jnp.float32(3.0e38)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayHits:
    """SoA hit record for a batch of rays.

    Mirrors the attribute bundle the reference requests from rmagine
    simulators (``Bundle<Points, Normals, Hits>`` — RCCEmbree.hpp:18-83)
    plus ids and ranges.
    """

    t: Array  # (...,) hit distance (NO_HIT_T when missed)
    hit: Array  # (...,) bool
    prim_id: Array  # (...,) int32 original face id (-1 when missed)
    inst_id: Array  # (...,) int32 instance id (-1 when missed)
    point: Array  # (..., 3) hit point in ray frame (orig + t*dir)
    normal: Array  # (..., 3) geometric unit normal


def _slab_test(o, inv_d, bmin, bmax, t_min, t_max):
    """Ray/AABB slab test. Returns (t_entry, overlap?)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_max)
    return jnp.maximum(t_near, t_min), hit


def _tri_test(o, d, v0, e1, e2, t_min, t_max):
    """Möller–Trumbore, no backface culling. Returns (t, valid?)."""
    pvec = jnp.cross(d, e2)
    det = jnp.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.dot(d, qvec) * inv_det
    t = jnp.dot(e2, qvec) * inv_det
    eps = 1e-7
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= -eps)
        & (v >= -eps)
        & (u + v <= 1.0 + eps)
        & (t > t_min)
        & (t < t_max)
    )
    return t, valid


def _traverse_one(nodes, root_link, o, d, t_min, t_max):
    """Closest-hit traversal for a single ray. Returns (t, leaf_slot).

    leaf_slot == -1 means no hit. Vmapped over rays by the caller.
    """
    safe_d = jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    inv_d = 1.0 / safe_d

    stack = jnp.full((STACK_DEPTH,), SENTINEL, jnp.int32)

    def cond(state):
        cur, _, _, _, _ = state
        return cur != SENTINEL

    def body(state):
        cur, sp, stack, t_best, best_slot = state
        is_leaf = cur < 0
        idx = jnp.where(is_leaf, ~cur, cur)
        slot = nodes[idx]  # one 64-byte gather

        # -- leaf interpretation: inline triangle ------------------------
        t_tri, tri_ok = _tri_test(
            o, d, slot[0:3], slot[3:6], slot[6:9], t_min, t_best
        )
        leaf_hit = is_leaf & tri_ok
        t_best = jnp.where(leaf_hit, t_tri, t_best)
        best_slot = jnp.where(leaf_hit, idx, best_slot)

        # -- internal interpretation: two child boxes --------------------
        l0 = _bitcast_i32(slot[12])
        l1 = _bitcast_i32(slot[13])
        t0, h0 = _slab_test(o, inv_d, slot[0:3], slot[3:6], t_min, t_best)
        t1, h1 = _slab_test(o, inv_d, slot[6:9], slot[9:12], t_min, t_best)
        h0 = h0 & ~is_leaf
        h1 = h1 & ~is_leaf

        swap = (t1 < t0) & h1
        near_link = jnp.where(swap, l1, l0)
        far_link = jnp.where(swap, l0, l1)
        near_hit = jnp.where(swap, h1, h0)
        far_hit = jnp.where(swap, h0, h1)

        push = near_hit & far_hit
        stack = stack.at[sp].set(jnp.where(push, far_link, stack[sp]))
        sp = sp + push.astype(jnp.int32)

        descend = near_hit | far_hit
        next_link = jnp.where(near_hit, near_link, far_link)

        need_pop = is_leaf | ~descend
        sp_pop = sp - 1
        popped = stack[jnp.maximum(sp_pop, 0)]
        cur = jnp.where(
            need_pop,
            jnp.where(sp_pop >= 0, popped, SENTINEL),
            next_link,
        )
        sp = jnp.where(need_pop, jnp.maximum(sp_pop, 0), sp)
        return cur, sp, stack, t_best, best_slot

    init = (root_link, jnp.int32(0), stack, t_max, jnp.int32(-1))
    _, _, _, t_best, best_slot = jax.lax.while_loop(cond, body, init)
    return t_best, best_slot


def _bitcast_i32(x: Array) -> Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


@partial(jax.jit, static_argnames=("chunk_size", "flip_normals"))
def cast_rays(
    bvh: BVH,
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    chunk_size: int = 65536,
    flip_normals: bool = True,
) -> RayHits:
    """Batch closest-hit query.

    orig, dirs: (..., 3) — broadcastable ray origins and (unit) directions.
    Returns a RayHits with the same leading batch shape. ``t`` is
    differentiable w.r.t. ``orig`` and ``dirs`` (plane-equation rederivation).
    """
    orig, dirs = jnp.broadcast_arrays(jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32))
    batch_shape = orig.shape[:-1]
    o_flat = orig.reshape(-1, 3)
    d_flat = dirs.reshape(-1, 3)
    n = o_flat.shape[0]

    t_min_arr = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), batch_shape).reshape(-1)
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), batch_shape).reshape(-1)

    # pad to a multiple of chunk_size for lax.map
    chunk = min(chunk_size, max(n, 1))
    n_pad = (-n) % chunk
    if n_pad:
        o_flat = jnp.concatenate([o_flat, jnp.ones((n_pad, 3), o_flat.dtype)], 0)
        d_flat = jnp.concatenate([d_flat, jnp.ones((n_pad, 3), d_flat.dtype)], 0)
        t_min_arr = jnp.concatenate([t_min_arr, jnp.zeros((n_pad,), jnp.float32)], 0)
        t_max_arr = jnp.concatenate([t_max_arr, jnp.zeros((n_pad,), jnp.float32)], 0)

    nodes = bvh.nodes
    root = bvh.root_link

    def chunk_fn(args):
        o, d, lo, hi = args
        t, slot = jax.vmap(
            lambda oo, dd, l, h: _traverse_one(nodes, root, oo, dd, l, h)
        )(o, d, lo, hi)
        return t, slot

    n_chunks = (n + n_pad) // chunk
    o_c = o_flat.reshape(n_chunks, chunk, 3)
    d_c = d_flat.reshape(n_chunks, chunk, 3)
    lo_c = t_min_arr.reshape(n_chunks, chunk)
    hi_c = t_max_arr.reshape(n_chunks, chunk)
    if n_chunks == 1:
        t_hit, slot = chunk_fn((o_c[0], d_c[0], lo_c[0], hi_c[0]))
    else:
        t_hit, slot = jax.lax.map(chunk_fn, (o_c, d_c, lo_c, hi_c))
        t_hit = t_hit.reshape(-1)
        slot = slot.reshape(-1)
    t_hit = t_hit.reshape(-1)[:n]
    slot = slot.reshape(-1)[:n]

    # --- differentiable re-derivation of the hit distance ----------------
    slot = jax.lax.stop_gradient(slot)
    hit = slot >= 0
    safe_slot = jnp.where(hit, slot, 0)
    leaf = jax.lax.stop_gradient(nodes[safe_slot])  # (n, 16)
    v0 = leaf[:, 0:3]
    normal = leaf[:, 9:12]
    prim_id = jnp.where(hit, _bitcast_i32(leaf[:, 12]), -1)
    inst_id = jnp.where(hit, _bitcast_i32(leaf[:, 13]), -1)

    o_n = o_flat[:n]
    d_n = d_flat[:n]
    denom = jnp.sum(normal * d_n, axis=-1)
    safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t_plane = jnp.sum(normal * (v0 - o_n), axis=-1) / safe_denom
    t = jnp.where(hit, t_plane, NO_HIT_T)
    point = o_n + t_plane[..., None] * d_n
    point = jnp.where(hit[..., None], point, 0.0)

    if flip_normals:
        # orient normals against the ray (rmagine simulators return normals
        # facing the sensor so the signed P2L distance is well-defined)
        normal = normal * jnp.where(denom > 0, -1.0, 1.0)[..., None]

    return RayHits(
        t=t.reshape(batch_shape),
        hit=hit.reshape(batch_shape),
        prim_id=prim_id.reshape(batch_shape),
        inst_id=inst_id.reshape(batch_shape),
        point=point.reshape(batch_shape + (3,)),
        normal=jnp.where(hit[..., None], normal, 0.0).reshape(batch_shape + (3,)),
    )


def cast_ranges(
    bvh: BVH,
    orig: Array,
    dirs: Array,
    t_min: float = 0.0,
    t_max: float | Array = NO_HIT_T,
    chunk_size: int = 65536,
) -> Array:
    """Differentiable range-only convenience wrapper (NO_HIT_T on miss)."""
    return cast_rays(bvh, orig, dirs, t_min, t_max, chunk_size=chunk_size).t


def occluded(
    bvh: BVH,
    orig: Array,
    target: Array,
    eps: float = 1e-3,
    chunk_size: int = 65536,
) -> Array:
    """Any-hit segment query: is the straight segment orig→target blocked?

    Used by the motion updater's mesh collision kill
    (reference TFMotionUpdaterCPU.cpp:17-50: ray cast between old and new
    particle position; on hit the particle dies).
    """
    seg = target - orig
    dist = jnp.linalg.norm(seg, axis=-1)
    safe = jnp.maximum(dist, 1e-12)[..., None]
    d = seg / safe
    hits = cast_rays(bvh, orig, d, t_min=eps, t_max=jnp.maximum(dist - eps, 0.0), chunk_size=chunk_size)
    return hits.hit
