"""Regenerate the golden MICP trajectory (run from repo root):

    python tests/golden/gen_micp_track.py

Deterministic scenario: room scene, 12-step arc trajectory, spherical
scans simulated at the true poses, MICP tracks from an offset start.
Commit the refreshed .npz only for intentional pipeline changes.
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
    from rmcl_tpu.micp.pipeline import (
        MICPConfig, MICPSensorConfig, MICPSensorData, correct_once,
    )
    from rmcl_tpu.sensors.models import SphericalModel
    from rmcl_tpu.sensors.simulate import simulate

    bvh = build_bvh(make_room_scene(n_pillars=3, seed=2))
    model = SphericalModel.create(
        width=180, height=8, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )
    cfg = MICPConfig(optimization_iterations=5)
    scfg = MICPSensorConfig.create(max_dist=1.0)

    ts = np.linspace(0, 1, 12)
    true_xyz = np.stack(
        [0.8 * np.cos(2 * ts), 0.8 * np.sin(2 * ts), 1.0 + 0.05 * ts], -1
    ).astype(np.float32)
    true_yaw = (0.4 * ts).astype(np.float32)

    tom = Transform.from_xyz_euler(
        jnp.asarray([0.05, -0.04, 0.03]), jnp.asarray([0.0, 0.0, 0.02])
    )  # initial map->odom error
    track = []
    toms = []
    progress = jnp.float32(0.0)
    for i in range(len(ts)):
        true_pose = Transform.from_xyz_euler(
            jnp.asarray(true_xyz[i]),
            jnp.asarray([0.0, 0.0, float(true_yaw[i])]),
        )
        # deterministic odometry DRIFT (grows linearly): Tom must track it
        drift = Transform.from_xyz_euler(
            jnp.asarray([0.01 * i, -0.006 * i, 0.0]),
            jnp.asarray([0.0, 0.0, 0.004 * i]),
        )
        tbo = drift @ true_pose
        hits = simulate(bvh, model, true_pose)
        sensor = MICPSensorData(
            model=model, points=hits.point, mask=hits.hit,
            tsb=Transform.identity(), config=scfg,
        )
        for _ in range(3):
            tom, stats = correct_once(bvh, [sensor], tom, tbo, progress)
            progress = stats.convergence_progress
        est = tom @ tbo
        track.append(np.concatenate([np.asarray(est.trans), np.asarray(est.rot)]))
        toms.append(np.concatenate([np.asarray(tom.trans), np.asarray(tom.rot)]))
    return np.asarray(track, np.float32), np.asarray(toms, np.float32), true_xyz


if __name__ == "__main__":
    track, toms, true_xyz = run_track()
    out = os.path.join(os.path.dirname(__file__), "micp_track.npz")
    np.savez(out, track=track, toms=toms)
    err = np.linalg.norm(track[:, :3] - true_xyz, axis=1)
    print(f"saved {out}; pose err mean {err.mean():.4f} max {err.max():.4f}")
