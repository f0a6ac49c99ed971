"""Geometric scene graphs: instanced meshes with per-instance transforms.

The reference supports scene graphs through OptiX/Embree instancing (TLAS of
instance transforms over BLAS meshes; the OptiX hit program resolves
instance→geometry through the SBT — reference BeamEvaluateProgram.cu:92-102,
SURVEY.md §2.9 "two-level instancing"). Hit records carry ``inst_id``.

TPU-native design: the scene is *flattened* at build time — every instance's
triangles are transformed into world space and concatenated, with
``inst_id``/``prim_id`` burned into the acceleration structures. Queries are
then exactly the single-mesh fast path (no per-ray transform divergence,
which would be poison for the lockstep engines), at the cost of geometry
duplication per instance. A true two-level TLAS is a planned optimization
for scenes with hundreds of instances of huge meshes.

Differentiable instance poses: :func:`instance_pose_gradients` re-derives
hit distances from instance poses through the plane equation, enabling
gradient-based scene-graph pose refinement (BASELINE.json config 5).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.bins import TriangleBins, build_bins
from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.geom.mesh import TriangleMesh
from rmcl_tpu.math.se3 import Quaternion, Transform

Array = jax.Array


@dataclasses.dataclass
class Instance:
    """One placed mesh: geometry reference + world pose (+ scale)."""

    geometry: str
    pose: Transform
    scale: float = 1.0
    name: str = ""


@dataclasses.dataclass
class SceneGraph:
    """Named geometries + instance list (host-side)."""

    geometries: Dict[str, TriangleMesh] = dataclasses.field(default_factory=dict)
    instances: List[Instance] = dataclasses.field(default_factory=list)

    def add_geometry(self, name: str, mesh: TriangleMesh) -> None:
        self.geometries[name] = mesh

    def add_instance(
        self, geometry: str, pose: Transform, scale: float = 1.0, name: str = ""
    ) -> int:
        if geometry not in self.geometries:
            raise KeyError(f"unknown geometry '{geometry}'")
        self.instances.append(Instance(geometry, pose, scale, name))
        return len(self.instances) - 1

    # -- flattening --------------------------------------------------------

    def instance_pose_table(self) -> "Transform":
        """Stacked (n_instances,) pose batch — shared by the flattened-scene
        and TLAS paths."""
        return Transform(
            rot=jnp.stack([i.pose.rot for i in self.instances]),
            trans=jnp.stack([i.pose.trans for i in self.instances]),
        )

    def flatten(self) -> Tuple[TriangleMesh, np.ndarray, np.ndarray]:
        """World-space triangle soup + per-face (prim_id, inst_id).

        prim_id = face index within the instance's GEOMETRY (so hits can be
        mapped back to source-mesh faces, like the reference's geomID/primID
        pair); inst_id = index into ``self.instances``.
        """
        verts_out, faces_out, prim_ids, inst_ids = [], [], [], []
        v_off = 0
        for ii, inst in enumerate(self.instances):
            g = self.geometries[inst.geometry]
            R = np.asarray(jax.device_get(Quaternion.to_matrix(inst.pose.rot)))
            t = np.asarray(inst.pose.trans)
            verts = (g.vertices * inst.scale) @ R.T + t
            verts_out.append(verts.astype(np.float32))
            faces_out.append(g.faces + v_off)
            prim_ids.append(np.arange(g.n_faces, dtype=np.int32))
            inst_ids.append(np.full(g.n_faces, ii, np.int32))
            v_off += g.n_vertices
        mesh = TriangleMesh(
            np.concatenate(verts_out), np.concatenate(faces_out), "scene"
        )
        return mesh, np.concatenate(prim_ids), np.concatenate(inst_ids)

    def build(
        self, bin_size: int = 64, bins_per_super: int = 64
    ) -> "SceneAccel":
        mesh, prim_ids, inst_ids = self.flatten()
        return SceneAccel(
            scene=self,
            world_mesh=mesh,
            bvh=build_bvh(mesh, prim_ids=prim_ids, inst_ids=inst_ids),
            bins=build_bins(
                mesh,
                bin_size=bin_size,
                bins_per_super=bins_per_super,
                prim_ids=prim_ids,
                inst_ids=inst_ids,
            ),
        )


@dataclasses.dataclass
class SceneAccel:
    """Built scene: world mesh + acceleration structures with instance ids."""

    scene: SceneGraph
    world_mesh: TriangleMesh
    bvh: BVH
    bins: TriangleBins

    def instance_poses(self) -> Transform:
        return self.scene.instance_pose_table()


def refine_instance_pose(
    accel: SceneAccel,
    inst_id: int,
    orig: Array,
    dirs: Array,
    measured_ranges: Array,
    steps: int = 8,
    damping: float = 1e-3,
) -> Tuple[Transform, Array]:
    """Gradient-based pose refinement of one instance through hit distances
    (BASELINE.json config 5, "differentiable scene-graph localization").

    Iterates { cast rays against the instance at the current pose estimate,
    linearize the plane-equation ranges in the 6 pose parameters, damped
    Newton step }. Rays are transformed into the instance frame instead of
    rebuilding the scene, so each outer iteration is one batched cast.
    Returns (delta_pose — apply as ``delta @ instance.pose``, per-step losses).
    """
    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.ops.raycast import cast_rays

    inst = accel.scene.instances[inst_id]
    geom = accel.scene.geometries[inst.geometry]
    if inst.scale != 1.0:
        geom = TriangleMesh(geom.vertices * inst.scale, geom.faces)
    local_bvh = build_bvh(geom)

    pose = inst.pose
    valid_meas = measured_ranges < 1e30
    losses = []
    for _ in range(steps):
        inv = pose.inverse()
        o_l = inv.apply(orig)
        d_l = inv.rotate(dirs)
        hits = cast_rays(local_bvh, o_l, d_l)
        # world-frame plane of each hit
        n_w = pose.rotate(hits.normal)
        p_w = pose.apply(hits.point)
        denom0 = jnp.sum(n_w * dirs, axis=-1)
        mask = hits.hit & valid_meas & (jnp.abs(denom0) > 0.2)
        n_eff = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        n_w = jax.lax.stop_gradient(n_w)
        p_w = jax.lax.stop_gradient(p_w)

        def loss_fn(delta6):
            dq = Quaternion.exp(delta6[3:])
            dt = delta6[:3]
            n_d = Quaternion.rotate(dq, n_w)
            p_d = Quaternion.rotate(dq, p_w) + dt
            denom = jnp.sum(n_d * dirs, axis=-1)
            safe = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
            t = jnp.sum(n_d * (p_d - orig), axis=-1) / safe
            r = jnp.where(mask, t - measured_ranges, 0.0)
            r = jnp.clip(r, -2.0, 2.0)
            return jnp.sum(r * r) / n_eff

        val, g = jax.value_and_grad(loss_fn)(jnp.zeros(6, jnp.float32))
        H = jax.hessian(loss_fn)(jnp.zeros(6, jnp.float32))
        H = H + damping * jnp.eye(6) * jnp.maximum(jnp.trace(H), 1.0)
        step = -jnp.linalg.solve(H, g)
        delta = Transform(rot=Quaternion.exp(step[3:]), trans=step[:3])
        pose = (delta @ pose).normalized()
        losses.append(val)

    total_delta = pose @ inst.pose.inverse()
    return total_delta, jnp.stack(losses)
