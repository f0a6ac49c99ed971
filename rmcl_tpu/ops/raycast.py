"""Batched BVH ray casting — the heart of the framework.

TPU-native replacement for every rmagine simulator backend
(``{Sphere,Pinhole,O1Dn,OnDn}Simulator{Embree,Optix,Vulkan}`` — SURVEY.md
§2.9): ONE batched closest-hit kernel over the preorder-threaded slot BVH,
shared by all sensor models, both localization algorithms and the
map-segmentation ops.

Traversal design (see rmcl_tpu.bvh.types for the slot layout):
  * stackless skip-link traversal — per-ray state is THREE registers
    (current link, best t, best slot). Per-lane stack scatters measured
    ~1600x slower than register state on TPU v5e, so the threaded layout is
    load-bearing, not a style choice;
  * one uniform 64-byte gather per step; the slot is decoded BOTH as an
    internal node (own AABB + hit/miss links) and as an inline triangle, and
    the results are select-merged — no divergent branches in the lockstep
    vmapped loop;
  * rays are processed in fixed-size chunks (``lax.map``) so one deep ray
    only stalls its own chunk.

PITFALL: always pass the BVH *as an argument* through jit boundaries. A BVH
closed over by an outer ``jax.jit`` becomes an HLO constant, and multi-MB
constants push the TPU compiler into minutes of constant folding.

Differentiability: the discrete traversal (which triangle was hit) is wrapped
in ``stop_gradient``; the hit distance is then *re-derived from the plane
equation* of the hit triangle, so gradients flow exactly through ray origin
and direction. This is the "differentiable" capability the reference lacks
(BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.types import BVH, SENTINEL_LINK

Array = jax.Array

# python floats/ints (weak-typed), NOT jnp scalars: module-level jnp
# constants become tracers when the module is first imported inside a
# jit trace, poisoning every later trace
NO_HIT_T = 3.0e38
_SENT = int(SENTINEL_LINK)


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


def _bitcast_i32(x: Array) -> Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _traverse_batch(nodes, root_link, o, d, t_min, t_max):
    """Stackless closest-hit traversal, hand-batched over rays.

    o, d: (R, 3); t_min, t_max: (R,). Returns (t_best, best_slot) with
    best_slot == -1 on miss. All loop state is (R,) registers.

    LAYOUT NOTE (load-bearing for TPU): every array inside the loop is
    (R,)-shaped — ray components are split into scalar planes and node words
    are gathered from 16 separate (N,) planes. (R,3)/(R,16)-shaped
    intermediates use only 3/128 or 16/128 vector lanes and profile ~40x
    slower on v5e; the transpose of `nodes` below is a one-time cost.

    INT-GATHER NOTE (load-bearing for TPU correctness): the slot words are
    gathered as INT32 planes and bitcast to float afterwards. Links/ids are
    int32 bit patterns stored in a float array; values below 2^23 are
    DENORMAL float patterns, and the TPU's float data path flushes
    denormals — a float gather/select corrupts every small link to 0,
    sending rays to slot 0 forever. (Found 2026-08-19: the exact engine's
    worker "crash" was this — zombie rays kept the unbounded while_loop
    spinning until the runtime watchdog killed the worker; identical code
    is correct on CPU. Int gathers are bit-exact by construction.) The
    loop is additionally BOUNDED at n_slots iterations — a preorder
    traversal visits each slot at most once, so the bound is semantically
    free and guarantees termination even on corrupted state.
    """
    R = o.shape[0]
    # 14 of the 16 slot words as ONE INT32 (N,14) table (words 14-15 —
    # inst id / pad — are not needed in the loop). Gathered as ROWS: one
    # 56-byte row gather per visit, sliced back to (R,) planes for the
    # arithmetic. Measured on chip (2026-08-20, 32k scattered rays,
    # 433k-slot building BVH): row gather 332k rays/s vs 14 separate
    # (N,)-plane gathers 30k rays/s — per-row cost dominates gather time,
    # so one wide row beats 14 narrow ones 11x. Int32 gathers stay
    # mandatory (see INT-GATHER NOTE above).
    nodes_i = _bitcast_i32(nodes)[:, :14]
    as_f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) > 1e-20, v, 1e-20)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    n_slots = nodes.shape[0]

    def cond(state):
        c, cur, _, _ = state
        return (c < n_slots) & jnp.any(cur != _SENT)

    def body(state):
        c, cur, t_best, best_slot = state
        active = cur != _SENT
        is_leaf = cur < 0
        idx = jnp.where(is_leaf, ~cur, cur)
        idx = jnp.where(active, idx, 0)
        rows = jnp.take(nodes_i, idx, axis=0)  # (R,14) int32 — bit-exact
        wi = [rows[:, k] for k in range(14)]
        w = [as_f(x) for x in wi[:12]]

        # -- leaf interpretation: inline triangle (Möller–Trumbore) -------
        v0x, v0y, v0z = w[0], w[1], w[2]
        e1x, e1y, e1z = w[3], w[4], w[5]
        e2x, e2y, e2z = w[6], w[7], w[8]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t_tri = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        eps = 1e-7
        tri_ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= -eps)
            & (v >= -eps)
            & (u + v <= 1.0 + eps)
            & (t_tri > t_min)
            & (t_tri < t_best)
        )
        leaf_hit = is_leaf & tri_ok & active
        t_best = jnp.where(leaf_hit, t_tri, t_best)
        best_slot = jnp.where(leaf_hit, idx, best_slot)

        # -- internal interpretation: own AABB slab test ------------------
        # (w[0:3] = bmin, w[3:6] = bmax for internal slots)
        tx0 = (v0x - ox) * ix
        tx1 = (e1x - ox) * ix
        ty0 = (v0y - oy) * iy
        ty1 = (e1y - oy) * iy
        tz0 = (v0z - oz) * iz
        tz1 = (e1z - oz) * iz
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        box_hit = (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_best)

        hit_link = wi[12]  # already int32 — no float round trip
        miss_link = wi[13]
        descend = box_hit & ~is_leaf
        cur_next = jnp.where(descend, hit_link, miss_link)
        cur_next = jnp.where(active, cur_next, _SENT)
        return c + 1, cur_next, t_best, best_slot

    cur0 = jnp.where(
        t_max > t_min,
        jnp.broadcast_to(root_link, (R,)).astype(jnp.int32),
        _SENT,
    )
    _, _, t_best, best_slot = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cur0, t_max, jnp.full((R,), -1, jnp.int32))
    )
    return t_best, best_slot


@partial(jax.jit, static_argnames=("chunk_size", "flip_normals"))
def cast_rays(
    bvh: BVH,
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    chunk_size: int = 262144,
    flip_normals: bool = True,
) -> RayHits:
    """Batch closest-hit query.

    orig, dirs: (..., 3) — broadcastable ray origins and (unit) directions.
    Returns a RayHits with the same leading batch shape. ``t`` is
    differentiable w.r.t. ``orig`` and ``dirs`` (plane-equation rederivation).
    """
    orig, dirs = jnp.broadcast_arrays(
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    batch_shape = orig.shape[:-1]
    o_flat = orig.reshape(-1, 3)
    d_flat = dirs.reshape(-1, 3)
    n = o_flat.shape[0]

    t_min_arr = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), batch_shape).reshape(-1)
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), batch_shape).reshape(-1)

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
        return _traverse_batch(nodes, root, o, d, lo, hi)

    n_chunks = (n + n_pad) // chunk
    if n_chunks == 1:
        t_hit, slot = chunk_fn((o_flat, d_flat, t_min_arr, t_max_arr))
    else:
        t_hit, slot = jax.lax.map(
            chunk_fn,
            (
                o_flat.reshape(n_chunks, chunk, 3),
                d_flat.reshape(n_chunks, chunk, 3),
                t_min_arr.reshape(n_chunks, chunk),
                t_max_arr.reshape(n_chunks, chunk),
            ),
        )
    t_hit = t_hit.reshape(-1)[:n]
    slot = slot.reshape(-1)[:n]

    # --- differentiable re-derivation of the hit distance ----------------
    slot = jax.lax.stop_gradient(slot)
    hit = slot >= 0
    safe_slot = jnp.where(hit, slot, 0)
    # int32 row gather: word 12/14 are int ids whose small values are
    # denormal float patterns — a float gather flushes them on TPU (see
    # _traverse_batch INT-GATHER NOTE)
    leaf_i = jax.lax.stop_gradient(
        jnp.take(_bitcast_i32(nodes), safe_slot, axis=0)
    )  # (n, 16)
    leaf = jax.lax.bitcast_convert_type(leaf_i[:, 0:12], jnp.float32)
    v0 = leaf[:, 0:3]
    normal = leaf[:, 9:12]
    prim_id = jnp.where(hit, leaf_i[:, 12], -1)
    inst_id = jnp.where(hit, leaf_i[:, 14], -1)

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
    chunk_size: int = 262144,
) -> Array:
    """Differentiable range-only convenience wrapper (NO_HIT_T on miss)."""
    return cast_rays(bvh, orig, dirs, t_min, t_max, chunk_size=chunk_size).t


def occluded(
    bvh: BVH,
    orig: Array,
    target: Array,
    eps: float = 1e-3,
    chunk_size: int = 262144,
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
    hits = cast_rays(
        bvh, orig, d, t_min=eps, t_max=jnp.maximum(dist - eps, 0.0), chunk_size=chunk_size
    )
    return hits.hit
