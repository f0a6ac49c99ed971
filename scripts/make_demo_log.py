"""Generate a demo world + replay log for the CLI tools.

Writes ``demo_world.obj`` and ``demo_run.npz`` (odometry with synthetic
drift + spherical scans + point clouds simulated from the true
trajectory) so every tool runs out of the box:

    python scripts/make_demo_log.py [outdir]
    python -m rmcl_tpu.tools.micp_localization --map demo_world.obj \
        --log demo_run.npz --initial-pose-guess 0.4 -0.3 1.0 0 0 0.3 \
        --out track.npz --banner
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "."
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.geom.mesh import make_room_scene, save_obj
    from rmcl_tpu.io import msgs
    from rmcl_tpu.io.conversions import model_to_scan_info
    from rmcl_tpu.io.replay import MessageLog
    from rmcl_tpu.math.se3 import Transform
    from rmcl_tpu.sensors.models import SphericalModel
    from rmcl_tpu.sensors.simulate import simulate

    mesh = make_room_scene(n_pillars=4, seed=1)
    map_path = os.path.join(outdir, "demo_world.obj")
    save_obj(mesh, map_path)
    bvh = build_bvh(mesh)

    model = SphericalModel.create(
        width=360, height=16, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )
    info = model_to_scan_info(model)

    log = MessageLog()
    rng = np.random.default_rng(0)
    track = []
    for k in range(40):
        stamp = 0.1 * k
        # figure-eight-ish true trajectory; odometry drifts linearly
        x = 0.4 + 1.5 * np.sin(0.15 * k)
        y = -0.3 + 0.8 * np.sin(0.3 * k)
        yaw = 0.3 + 0.1 * np.sin(0.2 * k)
        true = Transform.from_pose_tuple(jnp.asarray([x, y, 1.0, 0, 0, yaw]))
        track.append([stamp, x, y, 1.0, yaw])
        drift = jnp.asarray([0.006 * k, -0.004 * k, 0.0])
        odom = Transform(rot=true.rot, trans=true.trans + drift)
        hits = simulate(bvh, model, true)
        log.add_odometry(stamp, odom)
        ranges = np.where(np.asarray(hits.hit), np.asarray(hits.t), 0.0)
        log.add(stamp, "scan", "lidar", msgs.ScanStamped(
            header=msgs.Header(stamp=stamp), info=info,
            data=msgs.RangeData(ranges=ranges.astype(np.float32),
                                mask=np.asarray(hits.hit)),
        ))
        pts = np.where(
            np.asarray(hits.hit)[:, None], np.asarray(hits.point), np.nan
        )
        log.add(stamp, "cloud", "lidar",
                {"points": pts.astype(np.float32), "mask": np.asarray(hits.hit)})

    log_path = os.path.join(outdir, "demo_run.npz")
    log.save(log_path)
    np.save(os.path.join(outdir, "demo_true_track.npy"), np.asarray(track))
    print(f"wrote {map_path} ({mesh.n_faces} faces), {log_path} "
          f"({len(log)} records), demo_true_track.npy")


if __name__ == "__main__":
    main()
