"""Two-level scene instancing (TLAS) — TPU-native formulation.

The reference instantiates meshes through Embree/OptiX two-level
acceleration structures: a top-level BVH over per-instance transforms whose
hit program re-dispatches into the instance's BLAS (reference
BeamEvaluateProgram.cu:92-102; rmagine scene graphs, SURVEY.md §2.9).
A per-ray top-level traversal is divergence poison on a lockstep vector
machine, so the TPU design inverts the loop:

    for each instance (static Python loop, fused under jit):
        rays -> instance frame (one batched rigid transform, ~free)
        closest-hit against the instance GEOMETRY's bins
        running min-merge of (t, payload)

Each cast is seeded with ``t_max = best t so far``, so the dense engine's
nearest-first early exit and scene-exit caps skip almost all work for
instances that are occluded or far from the rays — the chained casts act
like a top-level traversal without any per-ray branching. Geometry bins are
built once per *geometry* (local frame) and shared by all its instances:
instance poses can change every step without any rebuild (the flattened
:class:`rmcl_tpu.geom.scene.SceneAccel` path instead re-bakes world-space
triangles). Hit ``t`` is re-derived from the winning triangle's plane
equation in the instance frame, so hits stay differentiable w.r.t. ray
origins, directions AND instance poses — pass ``poses`` to get gradients
for pose refinement.

Use the flattened path for many small static geometries (one cast total);
use the TLAS for few large shared geometries or per-step-moving instances.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.bins import TriangleBins, build_bins
from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.geom.scene import SceneGraph
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.ops.closest_point import ClosestPoints, closest_points
from rmcl_tpu.ops.raycast import NO_HIT_T, RayHits
from rmcl_tpu.ops.raycast_binned import cast_rays_binned

Array = jax.Array


@dataclasses.dataclass
class SceneTLAS:
    """Built two-level scene: per-geometry accelerators + instance table."""

    scene: SceneGraph
    geom_bins: Dict[str, TriangleBins]  # local-frame bins per geometry
    geom_bvh: Dict[str, BVH]  # local-frame BVH (closest-point queries)
    inst_geom: List[str]  # geometry name per instance
    poses: Transform  # (n_inst,) world pose per instance
    scales: Array  # (n_inst,) uniform scale per instance

    @property
    def n_instances(self) -> int:
        return len(self.inst_geom)


def build_tlas(
    scene: SceneGraph, bin_size: int = 32, bins_per_super: int = 64
) -> SceneTLAS:
    """Build per-geometry accelerators (deduplicated: instances share their
    geometry's bins/BVH) + the instance pose table."""
    used = {i.geometry for i in scene.instances}
    geom_bins = {
        g: build_bins(scene.geometries[g], bin_size=bin_size,
                      bins_per_super=bins_per_super)
        for g in used
    }
    geom_bvh = {g: build_bvh(scene.geometries[g]) for g in used}
    poses = scene.instance_pose_table()
    scales = jnp.asarray([i.scale for i in scene.instances], jnp.float32)
    return SceneTLAS(
        scene=scene,
        geom_bins=geom_bins,
        geom_bvh=geom_bvh,
        inst_geom=[i.geometry for i in scene.instances],
        poses=poses,
        scales=scales,
    )


def _inst_pose(tlas: SceneTLAS, poses: Optional[Transform], i: int) -> Transform:
    p = tlas.poses if poses is None else poses
    return Transform(rot=p.rot[i], trans=p.trans[i])


def cast_rays_tlas(
    tlas: SceneTLAS,
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    poses: Optional[Transform] = None,
    scales: Optional[Array] = None,
    flip_normals: bool = True,
    **cast_kw,
) -> RayHits:
    """Closest-hit against all instances (drop-in for cast_rays_binned).

    ``poses``/``scales`` override the build-time instance table (same
    leading n_instances dim) — pass current estimates for moving scenes or
    jax.grad through them for differentiable instance-pose refinement.
    Parametric ``t`` is preserved across instance frames (directions are
    mapped by the inverse rigid transform and 1/scale, never renormalized),
    so ``t_min``/``t_max`` and the returned ``t`` mean the same thing as a
    world-frame cast.
    """
    orig, dirs = jnp.broadcast_arrays(
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    batch_shape = orig.shape[:-1]
    o = orig.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    n = o.shape[0]
    sc = tlas.scales if scales is None else scales

    t_best = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), batch_shape
    ).reshape(-1)
    t_min_r = jnp.broadcast_to(
        jnp.asarray(t_min, jnp.float32), batch_shape
    ).reshape(-1)

    hit = jnp.zeros((n,), bool)
    normal = jnp.zeros((n, 3), jnp.float32)
    prim = jnp.full((n,), -1, jnp.int32)
    inst = jnp.full((n,), -1, jnp.int32)

    for i, gname in enumerate(tlas.inst_geom):
        pose = _inst_pose(tlas, poses, i)
        inv = pose.inverse()
        s = sc[i]
        # x_w = R (s x_l) + t  =>  o_l = R^-1 (o_w - t)/s, d_l = R^-1 d_w / s
        o_l = inv.apply(o) / s
        d_l = inv.rotate(d) / s
        h = cast_rays_binned(
            tlas.geom_bins[gname],
            o_l,
            d_l,
            t_min=t_min_r,
            t_max=t_best,  # chained: only closer-than-best hits survive
            flip_normals=flip_normals,
            **cast_kw,
        )
        better = h.hit & (h.t < t_best)
        t_best = jnp.where(better, h.t, t_best)
        n_w = pose.rotate(h.normal)
        normal = jnp.where(better[:, None], n_w, normal)
        prim = jnp.where(better, h.prim_id, prim)
        inst = jnp.where(better, jnp.int32(i), inst)
        hit = hit | better

    point = jnp.where(hit[:, None], o + t_best[:, None] * d, 0.0)
    t_out = jnp.where(hit, t_best, NO_HIT_T)
    return RayHits(
        t=t_out.reshape(batch_shape),
        hit=hit.reshape(batch_shape),
        prim_id=prim.reshape(batch_shape),
        inst_id=inst.reshape(batch_shape),
        point=point.reshape(batch_shape + (3,)),
        normal=jnp.where(hit[:, None], normal, 0.0).reshape(batch_shape + (3,)),
    )


def closest_points_tlas(
    tlas: SceneTLAS,
    queries: Array,
    max_dist: float | Array = 3.0e38,
    poses: Optional[Transform] = None,
    scales: Optional[Array] = None,
) -> Tuple[ClosestPoints, Array]:
    """Closest surface point over all instances. Returns (ClosestPoints,
    inst_id) — inst_id is -1 where nothing is within ``max_dist``.

    Chained like the ray cast: each instance query is bounded by the best
    distance so far, so far-away instances prune almost immediately in the
    local BVH descent."""
    queries = jnp.asarray(queries, jnp.float32)
    batch_shape = queries.shape[:-1]
    q = queries.reshape(-1, 3)
    n = q.shape[0]
    sc = tlas.scales if scales is None else scales

    best = jnp.broadcast_to(
        jnp.asarray(max_dist, jnp.float32), batch_shape
    ).reshape(-1)
    point = jnp.zeros((n, 3), jnp.float32)
    normal = jnp.zeros((n, 3), jnp.float32)
    prim = jnp.full((n,), -1, jnp.int32)
    inst = jnp.full((n,), -1, jnp.int32)
    found = jnp.zeros((n,), bool)

    for i, gname in enumerate(tlas.inst_geom):
        pose = _inst_pose(tlas, poses, i)
        inv = pose.inverse()
        s = sc[i]
        q_l = inv.apply(q) / s
        cp = closest_points(tlas.geom_bvh[gname], q_l, max_dist=best / s)
        d_w = cp.dist * s
        better = cp.found & (d_w < best)
        best = jnp.where(better, d_w, best)
        point = jnp.where(better[:, None], pose.apply(cp.point * s), point)
        normal = jnp.where(better[:, None], pose.rotate(cp.normal), normal)
        prim = jnp.where(better, cp.prim_id, prim)
        inst = jnp.where(better, jnp.int32(i), inst)
        found = found | better

    return (
        ClosestPoints(
            point=point.reshape(batch_shape + (3,)),
            normal=normal.reshape(batch_shape + (3,)),
            dist=jnp.where(found, best, 3.0e38).reshape(batch_shape),
            prim_id=prim.reshape(batch_shape),
            found=found.reshape(batch_shape),
        ),
        inst.reshape(batch_shape),
    )
