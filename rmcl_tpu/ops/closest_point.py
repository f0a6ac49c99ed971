"""Batched closest-point-on-mesh queries over the threaded BVH.

TPU-native replacement for rmagine's ``EmbreeMap::closestPoint`` (SURVEY.md
§2.9; used by CPC correspondences — reference CPCEmbree.cpp:18-44 — and the
CPC particle metric — PCDSensorUpdaterEmbree.cpp:88-95).

Same stackless skip-link loop as the ray caster, but pruned by point-to-AABB
distance instead of ray slabs: descend when ``dist2(q, box) < best_d2``.
Leaves compute the exact closest point on their inline triangle (branchless
Ericson region classification).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.types import BVH, SENTINEL_LINK

Array = jax.Array

_SENT = jnp.int32(SENTINEL_LINK)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClosestPoints:
    point: Array  # (..., 3) closest surface point (map frame)
    normal: Array  # (..., 3) geometric normal of the supporting triangle
    dist: Array  # (...,) unsigned distance
    prim_id: Array  # (...,) int32 (-1 if none within max_dist)
    found: Array  # (...,) bool


def closest_point_on_triangle(q, v0, e1, e2):
    """Branchless closest point on triangle(s). Batched over leading dims.

    Ericson, Real-Time Collision Detection §5.1.5 — regions resolved with
    selects instead of branches (lockstep-friendly)."""
    a = v0
    ab = e1
    ac = e2
    ap = q - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = q - (a + ab)
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = q - (a + ac)
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_face = jnp.maximum(va + vb + vc, 1e-30)
    v_face = vb / denom_face
    w_face = vc / denom_face

    # edge AB
    v_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) > 1e-30, d1 - d3, 1e-30), 0.0, 1.0)
    # edge AC
    w_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) > 1e-30, d2 - d6, 1e-30), 0.0, 1.0)
    # edge BC
    t_bc = jnp.clip(
        (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) > 1e-30, (d4 - d3) + (d5 - d6), 1e-30),
        0.0,
        1.0,
    )

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = ~in_vert_a & ~in_vert_b & ~in_vert_c & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = ~in_vert_a & ~in_vert_b & ~in_vert_c & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (
        ~in_vert_a & ~in_vert_b & ~in_vert_c & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    )

    v = jnp.where(in_vert_a | in_vert_c, 0.0, jnp.where(in_vert_b, 1.0, v_face))
    w = jnp.where(in_vert_a | in_vert_b, 0.0, jnp.where(in_vert_c, 1.0, w_face))
    v = jnp.where(in_edge_ab, v_ab, v)
    w = jnp.where(in_edge_ab, 0.0, w)
    v = jnp.where(in_edge_ac, 0.0, v)
    w = jnp.where(in_edge_ac, w_ac, w)
    v = jnp.where(in_edge_bc, 1.0 - t_bc, v)
    w = jnp.where(in_edge_bc, t_bc, w)

    return a + v[..., None] * ab + w[..., None] * ac


def _dist2_point_aabb(q, bmin, bmax):
    c = jnp.clip(q, bmin, bmax)
    d = q - c
    return jnp.sum(d * d, -1)


def _query_batch(nodes, root_link, q, max_d2):
    """Hand-batched stackless closest-point traversal. Returns
    (best_d2, best_point, best_slot).

    Same (R,)-scalar-plane layout discipline as the ray caster (see
    rmcl_tpu.ops.raycast._traverse_batch): full-lane VPU utilization."""
    R = q.shape[0]
    W = [nodes[:, k] for k in range(14)]
    qx, qy, qz = q[:, 0], q[:, 1], q[:, 2]

    def cond(state):
        return jnp.any(state[0] != _SENT)

    def body(state):
        cur, best_d2, bx, by, bz, best_slot = state
        active = cur != _SENT
        is_leaf = cur < 0
        idx = jnp.where(is_leaf, ~cur, cur)
        idx = jnp.where(active, idx, 0)
        w = [jnp.take(Wk, idx) for Wk in W]
        ax, ay, az = w[0], w[1], w[2]
        abx, aby, abz = w[3], w[4], w[5]
        acx, acy, acz = w[6], w[7], w[8]

        # ---- leaf: closest point on triangle (Ericson, scalar form) -----
        apx, apy, apz = qx - ax, qy - ay, qz - az
        d1 = abx * apx + aby * apy + abz * apz
        d2 = acx * apx + acy * apy + acz * apz
        bpx, bpy, bpz = apx - abx, apy - aby, apz - abz
        d3 = abx * bpx + aby * bpy + abz * bpz
        d4 = acx * bpx + acy * bpy + acz * bpz
        cpx, cpy, cpz = apx - acx, apy - acy, apz - acz
        d5 = abx * cpx + aby * cpy + abz * cpz
        d6 = acx * cpx + acy * cpy + acz * cpz

        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2
        denom_face = jnp.maximum(va + vb + vc, 1e-30)
        v_face = vb / denom_face
        w_face = vc / denom_face

        def safe_div(a, b):
            return a / jnp.where(jnp.abs(b) > 1e-30, b, 1e-30)

        v_ab = jnp.clip(safe_div(d1, d1 - d3), 0.0, 1.0)
        w_ac = jnp.clip(safe_div(d2, d2 - d6), 0.0, 1.0)
        t_bc = jnp.clip(safe_div(d4 - d3, (d4 - d3) + (d5 - d6)), 0.0, 1.0)

        in_a = (d1 <= 0) & (d2 <= 0)
        in_b = (d3 >= 0) & (d4 <= d3)
        in_c = (d6 >= 0) & (d5 <= d6)
        no_vert = ~in_a & ~in_b & ~in_c
        in_ab = no_vert & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
        in_ac = no_vert & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
        in_bc = no_vert & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

        v = jnp.where(in_a | in_c, 0.0, jnp.where(in_b, 1.0, v_face))
        ww = jnp.where(in_a | in_b, 0.0, jnp.where(in_c, 1.0, w_face))
        v = jnp.where(in_ab, v_ab, v)
        ww = jnp.where(in_ab, 0.0, ww)
        v = jnp.where(in_ac, 0.0, v)
        ww = jnp.where(in_ac, w_ac, ww)
        v = jnp.where(in_bc, 1.0 - t_bc, v)
        ww = jnp.where(in_bc, t_bc, ww)

        px = ax + v * abx + ww * acx
        py = ay + v * aby + ww * acy
        pz = az + v * abz + ww * acz
        d2_tri = (qx - px) ** 2 + (qy - py) ** 2 + (qz - pz) ** 2
        leaf_better = is_leaf & active & (d2_tri < best_d2)
        best_d2 = jnp.where(leaf_better, d2_tri, best_d2)
        bx = jnp.where(leaf_better, px, bx)
        by = jnp.where(leaf_better, py, by)
        bz = jnp.where(leaf_better, pz, bz)
        best_slot = jnp.where(leaf_better, idx, best_slot)

        # ---- internal: point-to-AABB distance prune ---------------------
        cx = jnp.clip(qx, w[0], w[3]) - qx
        cy = jnp.clip(qy, w[1], w[4]) - qy
        cz = jnp.clip(qz, w[2], w[5]) - qz
        d2_box = cx * cx + cy * cy + cz * cz
        descend = (~is_leaf) & (d2_box < best_d2)

        hit_link = jax.lax.bitcast_convert_type(w[12], jnp.int32)
        miss_link = jax.lax.bitcast_convert_type(w[13], jnp.int32)
        cur_next = jnp.where(descend, hit_link, miss_link)
        cur_next = jnp.where(active, cur_next, _SENT)
        return cur_next, best_d2, bx, by, bz, best_slot

    init = (
        jnp.broadcast_to(root_link, (R,)).astype(jnp.int32),
        max_d2,
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
        jnp.full((R,), -1, jnp.int32),
    )
    _, best_d2, bx, by, bz, best_slot = jax.lax.while_loop(cond, body, init)
    return best_d2, jnp.stack([bx, by, bz], axis=-1), best_slot


@partial(jax.jit, static_argnames=("chunk_size",))
def closest_points(
    bvh: BVH,
    queries: Array,
    max_dist: float | Array = 3.0e38,
    chunk_size: int = 65536,
) -> ClosestPoints:
    """Closest mesh surface point for each query point (map frame)."""
    queries = jnp.asarray(queries, jnp.float32)
    batch_shape = queries.shape[:-1]
    q = queries.reshape(-1, 3)
    n = q.shape[0]
    max_d2 = jnp.broadcast_to(
        jnp.square(jnp.asarray(max_dist, jnp.float32)), batch_shape
    ).reshape(-1)

    chunk = min(chunk_size, max(n, 1))
    n_pad = (-n) % chunk
    if n_pad:
        q = jnp.concatenate([q, jnp.zeros((n_pad, 3), q.dtype)], 0)
        max_d2 = jnp.concatenate([max_d2, jnp.zeros((n_pad,), jnp.float32)], 0)

    nodes = bvh.nodes
    root = bvh.root_link

    def chunk_fn(args):
        return _query_batch(nodes, root, args[0], args[1])

    n_chunks = (n + n_pad) // chunk
    if n_chunks == 1:
        d2, point, slot = chunk_fn((q, max_d2))
    else:
        d2, point, slot = jax.lax.map(
            chunk_fn, (q.reshape(n_chunks, chunk, 3), max_d2.reshape(n_chunks, chunk))
        )
        d2 = d2.reshape(-1)
        point = point.reshape(-1, 3)
        slot = slot.reshape(-1)
    d2 = d2.reshape(-1)[:n]
    point = point.reshape(-1, 3)[:n]
    slot = slot.reshape(-1)[:n]

    found = slot >= 0
    safe_slot = jnp.where(found, slot, 0)
    leaf = jnp.take(nodes, safe_slot, axis=0)
    normal = jnp.where(found[..., None], leaf[:, 9:12], 0.0)
    prim_id = jnp.where(found, jax.lax.bitcast_convert_type(leaf[:, 12], jnp.int32), -1)

    return ClosestPoints(
        point=jnp.where(found[..., None], point, 0.0).reshape(batch_shape + (3,)),
        normal=normal.reshape(batch_shape + (3,)),
        dist=jnp.where(found, jnp.sqrt(d2), 3.0e38).reshape(batch_shape),
        prim_id=prim_id.reshape(batch_shape),
        found=found.reshape(batch_shape),
    )
