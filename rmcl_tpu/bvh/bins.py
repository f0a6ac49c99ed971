"""Two-level triangle binning for the dense (gather-free) ray caster.

Motivation (measured on the target TPU runtime): per-ray BVH pointer chasing
costs one ~10ns-class gather per node visit and is capped around ~100M
gathers/s, while dense VPU/MXU math streams at Tflops. The dense engine
therefore trades pointer chasing for brute-force triangle tests inside
Morton-coherent bins:

  level 0: "supers"  — groups of S bins        (n_super, 6) AABBs
  level 1: "bins"    — B Morton-contiguous tris (n_bins, 6) AABBs
  payload:             packed triangle data     (n_bins, 12, B)
                       [v0(3), e1(3), e2(3), geometric normal(3)] — component-
                       major so B triangles fill vector lanes
                       + prim/inst ids          (n_bins, B) int32

Rays are culled per *block* (conservative interval frustum) against supers
and bins; surviving (block, bin) pairs are tested densely — full vector
lanes, streaming memory, no data-dependent loops.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.builder import morton_codes_3d
from rmcl_tpu.geom.mesh import TriangleMesh

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangleBins:
    # (n_bins, 14, B) packed component-major triangle data:
    # [v0(3), e1(3), e2(3), unit normal(3), prim_id.f32, inst_id.f32].
    # ids ride along as f32 planes (exact to 2^24) so the intersection
    # loop can carry the winner's full shading payload in registers via a
    # one-hot lane select — global winner gathers measured 327 ms/3.7M
    # rays (6 gathers x ~55M elem/s), ~45% of the whole cast
    tri: Array
    bin_aabb: Array  # (n_bins, 6) [min(3), max(3)]
    super_aabb: Array  # (n_super, 6)
    bins_per_super: int = dataclasses.field(metadata=dict(static=True))
    aabb_min: Array = None  # (3,) scene bounds
    aabb_max: Array = None
    # optional middle hierarchy level (groups of bins_per_mid bins) for the
    # 3-level cull: shrinks the level-1 box-test count and the dominant
    # packed-key top_k from c_super*S to c_mid*M keys
    mid_aabb: Array = None  # (n_mid, 6) or None
    bins_per_mid: int = dataclasses.field(default=8, metadata=dict(static=True))
    # optional hyper level ABOVE supers (groups of supers_per_hyper supers):
    # the chunk cull's level-0 tests every sub-block cone against EVERY
    # super, which dominates the cull once the level-1 keys are budgeted
    # (measured 93 ms of a 183 ms cull at 488 supers — probe_cull). With
    # hypers the cull tests n_hyper boxes + the selected hypers' supers.
    hyper_aabb: Array = None  # (n_hyper, 6) or None
    supers_per_hyper: int = dataclasses.field(
        default=8, metadata=dict(static=True)
    )

    @property
    def n_bins(self) -> int:
        return self.tri.shape[0]

    @property
    def bin_size(self) -> int:
        return self.tri.shape[2]

    @property
    def n_super(self) -> int:
        return self.super_aabb.shape[0]

    @property
    def n_mid(self) -> int:
        return 0 if self.mid_aabb is None else self.mid_aabb.shape[0]

    @property
    def n_hyper(self) -> int:
        return 0 if self.hyper_aabb is None else self.hyper_aabb.shape[0]

    def nbytes(self) -> int:
        return int(self.tri.size + self.bin_aabb.size + self.super_aabb.size) * 4


def _median_split_order(centroid: np.ndarray, B: int) -> np.ndarray:
    """kd-style recursive median partition into compact leaves of B tris.

    Splits the widest centroid axis at each node, rounding the left child
    to a multiple of B so every leaf (except possibly the last) is exactly
    full. Leaves come out in DFS order, so consecutive leaves share
    subtrees — groups of S consecutive leaves (the supers) are subtree-
    compact. Produces much tighter bin AABBs than fixed Morton runs,
    which can straddle Morton-cell boundaries and go ragged."""
    T = centroid.shape[0]
    order = np.arange(T)
    out = np.empty(T, np.int64)
    pos = 0
    stack = [(0, T)]
    while stack:
        lo, hi = stack.pop()
        n = hi - lo
        if n <= B:
            out[pos : pos + n] = order[lo:hi]
            pos += n
            continue
        seg = order[lo:hi]
        c = centroid[seg]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        # left gets the largest multiple of B that is <= n/2 (at least B)
        n_left = max(B, ((n // 2) // B) * B)
        part = np.argpartition(c[:, axis], n_left - 1)
        order[lo:hi] = seg[part]
        # DFS: push right first so left is emitted first
        stack.append((lo + n_left, hi))
        stack.append((lo, lo + n_left))
    return out


def build_bins(
    mesh: TriangleMesh,
    bin_size: int = 64,
    bins_per_super: int = 64,
    prim_ids: np.ndarray | None = None,
    inst_ids: np.ndarray | None = None,
    method: str = "median",
    bins_per_mid: int = 8,
    supers_per_hyper: int = 8,
) -> TriangleBins:
    """Build compact triangle bins (host, vectorized numpy).

    method: 'median' (kd median split, tight AABBs — default) or 'morton'
    (legacy fixed Morton runs)."""
    tri = np.asarray(mesh.triangles(), dtype=np.float32)  # no copy if f32
    T = tri.shape[0]
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

    if method == "median":
        # native kd median split when available (the numpy version's python
        # node loop is superlinear in practice: ~2 s at 1M tris, ~60 s at
        # 4M; the C++ nth_element version is ~15-60x faster)
        try:
            from rmcl_tpu.bvh import native

            order = native.bin_order(centroid, bin_size)
        except Exception:
            order = _median_split_order(centroid, bin_size)
    else:
        order = np.argsort(
            morton_codes_3d((centroid - scene_min) / extent), kind="stable"
        )
    tri = tri[order]
    prim_min = prim_min[order]
    prim_max = prim_max[order]
    prim_ids = prim_ids[order]
    inst_ids = inst_ids[order]

    B = bin_size
    n_bins = (T + B - 1) // B
    pad = n_bins * B - T
    if pad:
        # degenerate padding triangles: zero edges -> det == 0, never hit;
        # their AABB collapses onto the last real triangle's corner
        tri = np.concatenate([tri, np.repeat(tri[-1:, :1], pad, 0).repeat(3, 1)], 0)
        prim_min = np.concatenate([prim_min, np.repeat(prim_min[-1:], pad, 0)], 0)
        prim_max = np.concatenate([prim_max, np.repeat(prim_min[-1:], pad, 0)], 0)
        prim_ids = np.concatenate([prim_ids, np.full(pad, -1, np.int32)])
        inst_ids = np.concatenate([inst_ids, np.zeros(pad, np.int32)])

    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    normal = np.cross(e1, e2)
    norm_len = np.linalg.norm(normal, axis=1, keepdims=True)
    normal = normal / np.maximum(norm_len, 1e-20)
    # write component planes straight into the final (n_bins, 14, B) layout
    # (a concatenate + astype + transpose chain costs three full copies of
    # a T*14*4-byte array — 1.7 GB of traffic at 10M faces)
    packed = np.empty((n_bins, 14, B), np.float32)
    for i, comp in enumerate((v0, e1, e2, normal)):
        for k in range(3):
            packed[:, 3 * i + k, :] = comp[:, k].reshape(n_bins, B)
    packed[:, 12, :] = prim_ids.reshape(n_bins, B)
    packed[:, 13, :] = inst_ids.reshape(n_bins, B)

    bin_min = prim_min.reshape(n_bins, B, 3).min(axis=1)
    bin_max = prim_max.reshape(n_bins, B, 3).max(axis=1)
    bin_aabb = np.concatenate([bin_min, bin_max], axis=1)

    S = bins_per_super
    n_super = (n_bins + S - 1) // S
    spad = n_super * S - n_bins
    if spad:
        bm = np.concatenate([bin_min, np.repeat(bin_min[-1:], spad, 0)], 0)
        bM = np.concatenate([bin_max, np.repeat(bin_min[-1:], spad, 0)], 0)
    else:
        bm, bM = bin_min, bin_max
    super_min = bm.reshape(n_super, S, 3).min(axis=1)
    super_max = bM.reshape(n_super, S, 3).max(axis=1)
    super_aabb = np.concatenate([super_min, super_max], axis=1)

    # middle level: groups of M bins (padded grid aligned to the supers, so
    # super s owns mids [s*S/M, (s+1)*S/M)). Degenerate padded bins collapse
    # onto a corner, like the supers above.
    M = max(1, min(bins_per_mid, S))
    while S % M:  # clamp to a divisor of S (both are powers of two normally)
        M -= 1
    if M > 1:
        n_mid = n_super * (S // M)
        mid_min = bm.reshape(n_mid, M, 3).min(axis=1)
        mid_max = bM.reshape(n_mid, M, 3).max(axis=1)
        mid_aabb = jnp.asarray(
            np.concatenate([mid_min, mid_max], axis=1).astype(np.float32)
        )
    else:  # mid level degenerates to the bins themselves: skip it
        mid_aabb = None

    # hyper level: groups of H consecutive supers (kd DFS order keeps them
    # subtree-compact). Padding supers collapse onto the last super's corner.
    H = max(1, supers_per_hyper)
    if H > 1 and n_super > H:
        n_hyper = (n_super + H - 1) // H
        hpad = n_hyper * H - n_super
        if hpad:
            sm = np.concatenate([super_min, np.repeat(super_min[-1:], hpad, 0)], 0)
            sM = np.concatenate([super_max, np.repeat(super_min[-1:], hpad, 0)], 0)
        else:
            sm, sM = super_min, super_max
        hyper_min = sm.reshape(n_hyper, H, 3).min(axis=1)
        hyper_max = sM.reshape(n_hyper, H, 3).max(axis=1)
        hyper_aabb = jnp.asarray(
            np.concatenate([hyper_min, hyper_max], axis=1).astype(np.float32)
        )
    else:
        hyper_aabb = None

    return TriangleBins(
        tri=jnp.asarray(packed),
        bin_aabb=jnp.asarray(bin_aabb.astype(np.float32)),
        super_aabb=jnp.asarray(super_aabb.astype(np.float32)),
        bins_per_super=S,
        aabb_min=jnp.asarray(scene_min.astype(np.float32)),
        aabb_max=jnp.asarray(scene_max.astype(np.float32)),
        mid_aabb=mid_aabb,
        bins_per_mid=M,
        hyper_aabb=hyper_aabb,
        supers_per_hyper=H,
    )
