"""RMCL global localization on a procedural world (runnable, CPU-friendly).

    python examples/rmcl_global_localization.py

Scatters particles uniformly over the room (the kidnapped-robot problem),
then converges to the true pose from static LiDAR scans — the
`rmcl/global_localization` service flow of the reference.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # drop for TPU

import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_room_scene
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.mcl.node import MCLConfig, MCLNode
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate


def main():
    bvh = build_bvh(make_room_scene(n_pillars=3, seed=2))
    true_pose = Transform.from_pose_tuple(jnp.asarray([0.5, -0.5, 1.0, 0, 0, 0.4]))
    model = SphericalModel.create(
        width=180, height=8, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )
    hits = simulate(bvh, model, true_pose)  # sensor-frame scan

    node = MCLNode(
        bvh,
        MCLConfig(
            n_particles=4096,
            sensor=SensorUpdateConfig.create(samples=48, dist_sigma=0.4),
            seed=3,
        ),
    )
    node.global_localization((-4, -3, 0.5, 0, 0, -np.pi), (4, 3, 1.5, 0, 0, np.pi))

    for step in range(25):
        node.motion_update(Transform.identity(), stamp=0.1 * step)
        node.sensor_update(hits.point, hits.hit, Transform.identity())
        node.resample()
        st = node.estimate()
        err = float(np.linalg.norm(np.asarray(st.pose.trans) - np.asarray(true_pose.trans)))
        print(
            f"step {step:2d}: pose err {err:.3f} m, "
            f"likelihood mean {float(st.likelihood_mean):.3e} "
            f"max {float(st.likelihood_max):.3e}"
        )

    assert err < 0.2, "did not converge"
    print("Global localization converged. OK")


if __name__ == "__main__":
    main()
