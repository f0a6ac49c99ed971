"""Host-side BVH construction (fully vectorized numpy LBVH).

The reference delegates BVH builds to Embree/OptiX/Vulkan (one build per
backend — SURVEY.md §3.5 "one Assimp parse + BVH build per backend"). Here
the build is a linear BVH over Morton-sorted primitives with Karras-style
highest-differing-bit splits, implemented with *no Python-level recursion*:
the tree is expanded breadth-first with vectorized binary searches, so a
10M-triangle build is a handful of numpy passes.

An optional C++ binned-SAH builder (rmcl_tpu/bvh/native) can replace this for
higher tree quality; both emit the identical flattened slot layout
(see rmcl_tpu.bvh.types).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.geom.mesh import TriangleMesh


def _expand_bits_21(v: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of each uint64 so consecutive bits are 3 apart."""
    v = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def morton_codes_3d(points01: np.ndarray) -> np.ndarray:
    """63-bit Morton codes for points normalized to [0, 1]^3."""
    scaled = np.clip(points01 * (2**21 - 1), 0, 2**21 - 1).astype(np.uint64)
    return (
        (_expand_bits_21(scaled[:, 0]) << np.uint64(2))
        | (_expand_bits_21(scaled[:, 1]) << np.uint64(1))
        | _expand_bits_21(scaled[:, 2])
    )


def _highest_bit(x: np.ndarray) -> np.ndarray:
    """Position of the highest set bit of each uint64 (x must be nonzero)."""
    p = np.zeros(x.shape, np.int64)
    t = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (t >> np.uint64(shift)) != 0
        p += np.where(mask, shift, 0)
        t = np.where(mask, t >> np.uint64(shift), t)
    return p


def _vector_searchsorted(codes: np.ndarray, lo: np.ndarray, hi: np.ndarray, target: np.ndarray) -> np.ndarray:
    """For each i: first index in [lo_i, hi_i) with codes[idx] >= target_i.
    Vectorized binary search (all rows advance in lockstep)."""
    lo = lo.copy()
    hi = hi.copy()
    iters = int(np.ceil(np.log2(max(len(codes), 2)))) + 1
    for _ in range(iters):
        active = lo < hi
        mid = (lo + hi) // 2
        pred = codes[np.minimum(mid, len(codes) - 1)] >= target
        hi = np.where(active & pred, mid, hi)
        lo = np.where(active & ~pred, mid + 1, lo)
    return lo


def _split_ranges(codes: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Karras split: for each range [lo, hi) (size >= 2) over sorted codes,
    return split s with lo < s < hi at the highest differing Morton bit
    (midpoint for duplicate-code runs)."""
    c_lo = codes[lo]
    c_hi = codes[hi - 1]
    diff = c_lo ^ c_hi
    dup = diff == 0
    p = _highest_bit(np.where(dup, np.uint64(1), diff))
    # smallest code with bit p set and the shared prefix above p
    target = (c_hi >> p.astype(np.uint64)) << p.astype(np.uint64)
    s = _vector_searchsorted(codes, lo + 1, hi, target)
    mid = (lo + hi) // 2
    s = np.where(dup, mid, s)
    # guard: keep both children non-empty whatever the code distribution
    return np.clip(s, lo + 1, hi - 1)


def build_bvh(
    mesh: TriangleMesh,
    prim_ids: Optional[np.ndarray] = None,
    inst_ids: Optional[np.ndarray] = None,
    as_numpy: bool = False,
) -> BVH:
    """Build the flattened slot BVH for a triangle mesh.

    prim_ids/inst_ids override the ids burned into leaf slots (used by the
    scene-graph flattener to keep original face/instance indices).
    """
    tri = mesh.triangles().astype(np.float32)  # (T, 3, 3)
    T = tri.shape[0]
    if T == 0:
        raise ValueError("cannot build BVH over empty mesh")
    if prim_ids is None:
        prim_ids = np.arange(T, dtype=np.int32)
    if inst_ids is None:
        inst_ids = np.zeros(T, dtype=np.int32)

    prim_min = tri.min(axis=1)
    prim_max = tri.max(axis=1)
    centroid = 0.5 * (prim_min + prim_max)
    scene_min = prim_min.min(axis=0)
    scene_max = prim_max.max(axis=0)
    extent = np.maximum(scene_max - scene_min, 1e-12)

    codes = morton_codes_3d((centroid - scene_min) / extent)
    order = np.argsort(codes, kind="stable").astype(np.int64)
    codes = codes[order]

    n_internal = T - 1
    n_slots = 2 * T - 1
    leaf_base = n_internal  # leaf slot for sorted position j = leaf_base + j

    nodes = np.zeros((n_slots, 16), np.float32)

    # ---- leaf slots ------------------------------------------------------
    tri_s = tri[order]
    v0 = tri_s[:, 0]
    e1 = tri_s[:, 1] - tri_s[:, 0]
    e2 = tri_s[:, 2] - tri_s[:, 0]
    normal = np.cross(e1, e2)
    normal /= np.maximum(np.linalg.norm(normal, axis=1, keepdims=True), 1e-20)
    leaf = nodes[leaf_base:]
    leaf[:, 0:3] = v0
    leaf[:, 3:6] = e1
    leaf[:, 6:9] = e2
    leaf[:, 9:12] = normal
    leaf[:, 12] = prim_ids[order].view(np.float32)
    leaf[:, 13] = inst_ids[order].view(np.float32)

    if T == 1:
        root_link = np.int32(~leaf_base)
        return _finalize(nodes, root_link, scene_min, scene_max, T, as_numpy)

    # ---- breadth-first internal construction -----------------------------
    child_link = np.zeros((n_internal, 2), np.int32)
    levels: List[np.ndarray] = []

    ids = np.array([0], np.int64)
    lo = np.array([0], np.int64)
    hi = np.array([T], np.int64)
    next_free = 1
    while len(ids):
        levels.append(ids)
        split = _split_ranges(codes, lo, hi)
        new_ids = []
        new_lo = []
        new_hi = []
        for side, (clo, chi) in enumerate(((lo, split), (split, hi))):
            is_leaf = (chi - clo) == 1
            # leaf children link directly to their triangle slot
            child_link[ids[is_leaf], side] = ~(leaf_base + clo[is_leaf]).astype(np.int32)
            n_new = int((~is_leaf).sum())
            fresh = np.arange(next_free, next_free + n_new, dtype=np.int64)
            next_free += n_new
            child_link[ids[~is_leaf], side] = fresh.astype(np.int32)
            new_ids.append(fresh)
            new_lo.append(clo[~is_leaf])
            new_hi.append(chi[~is_leaf])
        ids = np.concatenate(new_ids)
        lo = np.concatenate(new_lo)
        hi = np.concatenate(new_hi)
    assert next_free == n_internal, (next_free, n_internal)

    # ---- bottom-up subtree AABBs ----------------------------------------
    sub_min = np.empty((n_slots, 3), np.float32)
    sub_max = np.empty((n_slots, 3), np.float32)
    sub_min[leaf_base:] = prim_min[order]
    sub_max[leaf_base:] = prim_max[order]

    def slot_of(link: np.ndarray) -> np.ndarray:
        return np.where(link < 0, ~link, link).astype(np.int64)

    for ids in reversed(levels):
        s0 = slot_of(child_link[ids, 0])
        s1 = slot_of(child_link[ids, 1])
        nodes[ids, 0:3] = sub_min[s0]
        nodes[ids, 3:6] = sub_max[s0]
        nodes[ids, 6:9] = sub_min[s1]
        nodes[ids, 9:12] = sub_max[s1]
        nodes[ids, 12] = child_link[ids, 0].view(np.float32)
        nodes[ids, 13] = child_link[ids, 1].view(np.float32)
        sub_min[ids] = np.minimum(sub_min[s0], sub_min[s1])
        sub_max[ids] = np.maximum(sub_max[s0], sub_max[s1])

    return _finalize(nodes, np.int32(0), scene_min, scene_max, T, as_numpy)


def _finalize(nodes, root_link, scene_min, scene_max, n_tris, as_numpy) -> BVH:
    arr = np if as_numpy else jnp
    return BVH(
        nodes=arr.asarray(nodes),
        root_link=arr.asarray(root_link, dtype=arr.int32),
        aabb_min=arr.asarray(scene_min, dtype=arr.float32),
        aabb_max=arr.asarray(scene_max, dtype=arr.float32),
        n_tris=arr.asarray(n_tris, dtype=arr.int32),
    )


def bvh_depth_stats(bvh: BVH) -> Tuple[int, float]:
    """(max_depth, mean_leaf_depth) — tree-quality diagnostics."""
    nodes = np.asarray(bvh.nodes)
    root = int(np.asarray(bvh.root_link))
    depth = {root: 0}
    stack = [root]
    leaf_depths = []
    while stack:
        link = stack.pop()
        d = depth[link]
        if link < 0:
            leaf_depths.append(d)
            continue
        links = nodes[link, 12:14].copy().view(np.int32)
        for child in (int(links[0]), int(links[1])):
            depth[child] = d + 1
            stack.append(child)
    return max(leaf_depths), float(np.mean(leaf_depths))
