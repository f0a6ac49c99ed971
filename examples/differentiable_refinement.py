"""Differentiable scene-graph pose refinement (runnable, CPU-friendly).

    python examples/differentiable_refinement.py

What the reference cannot do: ranges here are differentiable w.r.t.
instance poses (plane-equation rederivation around the frozen hit choice),
so a mis-placed object in a scene graph is recovered by gradient descent
on raw range residuals — no correspondences, no ICP.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # drop for TPU

import jax.numpy as jnp
import numpy as np

from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.geom.scene import SceneGraph, refine_instance_pose
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.ops.raycast import cast_rays


def main():
    # true world: a ball at (4, 0.15, -0.1); our scene believes (4, 0, 0)
    ball = make_sphere(32, 32, radius=1.0)
    true_pose = Transform.from_pose_tuple(jnp.asarray([4.0, 0.15, -0.1, 0, 0, 0]))
    est_pose = Transform.from_pose_tuple(jnp.asarray([4.0, 0.0, 0.0, 0, 0, 0]))

    sg_true = SceneGraph()
    sg_true.add_geometry("ball", ball)
    sg_true.add_instance("ball", true_pose)
    accel_true = sg_true.build(bin_size=16, bins_per_super=8)

    # LiDAR-ish measurement fan from the origin
    n = 512
    rng = np.random.default_rng(0)
    d = np.stack(
        [np.ones(n), rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n)], -1
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    meas = cast_rays(accel_true.bvh, jnp.asarray(o), jnp.asarray(d))

    sg = SceneGraph()
    sg.add_geometry("ball", ball)
    sg.add_instance("ball", est_pose)
    accel = sg.build(bin_size=16, bins_per_super=8)

    delta, losses = refine_instance_pose(
        accel, 0, jnp.asarray(o), jnp.asarray(d), meas.t, steps=10
    )
    refined = delta @ est_pose
    err0 = float(jnp.linalg.norm(est_pose.trans - true_pose.trans))
    err1 = float(jnp.linalg.norm(refined.trans - true_pose.trans))
    for i, l in enumerate(np.asarray(losses)):
        print(f"iter {i:2d}: range-residual loss {float(l):.6f}")
    print(f"instance pose error: {err0:.3f} m -> {err1:.4f} m")
    assert err1 < 0.02, "refinement failed"
    print("Gradient refinement recovered the instance pose. OK")

    vertex_refinement_demo()


def vertex_refinement_demo():
    """Part 2 — VERTEX-level refinement (ops.diff.cast_rays_diff): recover
    a mesh scale error from range residuals by flowing gradients into the
    vertex array itself. The reference has no gradients at all; vertex
    gradients enable map deformation fitting from live scans."""
    import jax

    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.geom.mesh import make_sphere
    from rmcl_tpu.ops.diff import cast_rays_diff
    from rmcl_tpu.ops.raycast import cast_rays

    true = make_sphere(32, 32, radius=2.0)
    bvh_true = build_bvh(true)

    n = 512
    rng = np.random.default_rng(1)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.zeros((n, 3))
    meas = cast_rays(bvh_true, o, jnp.asarray(d))

    # initial map: the same sphere scaled wrong (radius 2.3)
    V0 = jnp.asarray(true.vertices) * (2.3 / 2.0)
    F = jnp.asarray(true.faces)
    # structure from the wrong map; topology is stable under pure scaling,
    # so the frozen winners stay valid throughout the descent
    import dataclasses as _dc

    mesh0 = _dc.replace(true, vertices=np.asarray(V0))
    bvh0 = build_bvh(mesh0)

    # optimize a deformation parameter THROUGH the vertex array (chain rule
    # V(s) = V0 * s): the range residuals pull the map scale back to truth.
    # Raw per-vertex descent also works but needs many more rays/steps for
    # good conditioning — the point here is that d(loss)/d(vertices) is
    # exact and composes with any vertex parameterization.
    def loss(scale):
        V = V0 * scale
        h = cast_rays_diff(bvh0, V, F, o, jnp.asarray(d))
        r = jnp.where(h.hit & meas.hit, h.t - meas.t, 0.0)
        return jnp.mean(r * r)

    s = jnp.float32(1.0)  # V0 already carries the wrong 2.3/2.0 scale
    g_loss = jax.jit(jax.value_and_grad(loss))
    for i in range(25):
        l, g = g_loss(s)
        s = s - 0.08 * g
    r0 = float(jnp.mean(jnp.linalg.norm(V0, axis=1)))
    r1 = float(jnp.mean(jnp.linalg.norm(V0 * s, axis=1)))
    print(f"vertex refinement: mean radius {r0:.3f} m -> {r1:.4f} m "
          f"(true 2.0, loss {float(l):.6f})")
    assert abs(r1 - 2.0) < 0.02, "vertex refinement failed"
    print("Vertex-level gradient refinement recovered the map scale. OK")


if __name__ == "__main__":
    main()
