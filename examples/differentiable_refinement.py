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


if __name__ == "__main__":
    main()
