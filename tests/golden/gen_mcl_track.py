"""Regenerate the golden MCL stats track (run from repo root):

    python tests/golden/gen_mcl_track.py

Deterministic scenario: room scene, fixed-seed global localization with
2048 particles, 15 static sensor updates + resamples. Pins the particle
pipeline (motion/sensor/resample/stats) numerically.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def run_track():
    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.geom.mesh import make_room_scene
    from rmcl_tpu.math.se3 import Transform
    from rmcl_tpu.mcl.node import MCLConfig, MCLNode
    from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig
    from rmcl_tpu.sensors.models import SphericalModel
    from rmcl_tpu.sensors.simulate import simulate

    bvh = build_bvh(make_room_scene(n_pillars=3, seed=2))
    true_pose = Transform.from_pose_tuple(
        jnp.asarray([0.5, -0.5, 1.0, 0, 0, 0.4])
    )
    model = SphericalModel.create(
        width=180, height=8, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )
    hits = simulate(bvh, model, true_pose)

    node = MCLNode(
        bvh,
        MCLConfig(
            n_particles=2048,
            sensor=SensorUpdateConfig.create(samples=48, dist_sigma=0.4),
            seed=7,
        ),
    )
    node.global_localization((-4, -3, 0.5, 0, 0, -np.pi), (4, 3, 1.5, 0, 0, np.pi))
    rows = []
    for step in range(22):
        node.motion_update(Transform.identity(), stamp=0.1 * step)
        node.sensor_update(hits.point, hits.hit, Transform.identity())
        node.resample()
        st = node.estimate()
        rows.append(
            np.concatenate([
                np.asarray(st.pose.trans),
                np.asarray(st.pose.rot),
                np.asarray(st.likelihood_mean)[None],
                np.asarray(st.likelihood_max)[None],
            ])
        )
    return np.asarray(rows, np.float32), np.asarray(true_pose.trans)


if __name__ == "__main__":
    rows, true_t = run_track()
    out = os.path.join(os.path.dirname(__file__), "mcl_track.npz")
    np.savez(out, rows=rows)
    err = np.linalg.norm(rows[-1, :3] - true_t)
    print(f"saved {out}; final pose err {err:.4f} m")
