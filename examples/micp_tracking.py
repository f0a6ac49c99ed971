"""MICP-L pose tracking on a procedural world (runnable, CPU-friendly).

    python examples/micp_tracking.py

Simulates a robot driving an arc through a pillared room with drifting
odometry; MICP corrects the drift each step from simulated LiDAR scans.
Mirrors the reference's rmcl_examples MICP demo without ROS.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # drop for TPU

import jax.numpy as jnp
import numpy as np

from rmcl_tpu.config.tree import ParamTree
from rmcl_tpu.geom.map import MeshMap
from rmcl_tpu.geom.mesh import make_room_scene
from rmcl_tpu.io import msgs
from rmcl_tpu.io.conversions import model_to_scan_info
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.micp.node import MICPLocalization
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate


def main():
    map_ = MeshMap.from_mesh(make_room_scene(n_pillars=3, seed=2))
    model = SphericalModel.create(
        width=360, height=16, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )

    node = MICPLocalization(
        map_,
        ParamTree({
            "optimization_iterations": 5,
            "initial_pose_guess": [0.8, 0.0, 1.0, 0, 0, 0],
            "sensors": {
                "lidar": {"correspondences": {"max_dist": 1.0}},
            },
        }),
    )
    node.print_setup()

    ts = np.linspace(0, 1, 20)
    for i, t in enumerate(ts):
        true_pose = Transform.from_xyz_euler(
            jnp.asarray([0.8 * np.cos(2 * t), 0.8 * np.sin(2 * t), 1.0]),
            jnp.asarray([0.0, 0.0, 0.4 * t]),
        )
        drift = Transform.from_xyz_euler(
            jnp.asarray([0.012 * i, -0.008 * i, 0.0]),
            jnp.asarray([0.0, 0.0, 0.005 * i]),
        )
        tbo = drift @ true_pose  # what odometry believes

        hits = simulate(map_.bvh, model, true_pose)
        msg = msgs.ScanStamped(
            header=msgs.Header(stamp=float(t)),
            info=model_to_scan_info(model),
            data=msgs.RangeData(
                ranges=np.asarray(hits.t), mask=np.asarray(hits.hit)
            ),
        )
        node.on_odometry(tbo, stamp=float(t))
        node.on_scan("lidar", msg)
        for _ in range(3):
            node.step()

        est = node.pose_base_map()
        err = float(jnp.linalg.norm(est.trans - true_pose.trans))
        drift_mag = float(jnp.linalg.norm(drift.trans))
        print(f"step {i:2d}: odom drift {drift_mag:.3f} m -> pose err {err:.4f} m")

    assert err < 0.02, "tracking diverged"
    print("MICP tracked the drifting odometry. OK")


if __name__ == "__main__":
    main()
