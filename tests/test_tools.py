"""End-to-end tests of the CLI tools (the reference's L6 executables)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_room_scene, save_obj
from rmcl_tpu.io import msgs
from rmcl_tpu.io.conversions import model_to_scan_info
from rmcl_tpu.io.replay import MessageLog
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate


@pytest.fixture(scope="module")
def world_and_log(tmp_path_factory):
    """A room world on disk + a replay log of a short drifting run."""
    tmp = tmp_path_factory.mktemp("tools")
    mesh = make_room_scene(n_pillars=3, seed=2)
    map_path = str(tmp / "world.obj")
    save_obj(mesh, map_path)
    bvh = build_bvh(mesh)

    model = SphericalModel.create(
        width=180, height=8, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )
    info = model_to_scan_info(model)

    log = MessageLog()
    true_poses = []
    for k in range(6):
        stamp = 0.1 * k
        true = Transform.from_pose_tuple(
            jnp.asarray([0.4 + 0.05 * k, -0.3, 1.0, 0, 0, 0.3])
        )
        true_poses.append(true)
        hits = simulate(bvh, model, true)
        # odometry = identity-drifting guess (MICP must correct it)
        log.add_odometry(stamp, Transform.from_pose_tuple(
            jnp.asarray([0.4, -0.3, 1.0, 0, 0, 0.3])
        ))
        ranges = np.where(np.asarray(hits.hit), np.asarray(hits.t), 0.0)
        log.add(stamp, "scan", "lidar", msgs.ScanStamped(
            header=msgs.Header(stamp=stamp),
            info=info,
            data=msgs.RangeData(ranges=ranges.astype(np.float32),
                                mask=np.asarray(hits.hit)),
        ))
        # cloud records for the RMCL + convert tools (sensor frame)
        pts = np.where(np.asarray(hits.hit)[:, None], np.asarray(hits.point), np.nan)
        log.add(stamp, "cloud", "lidar", {
            "points": pts.astype(np.float32),
            "mask": np.asarray(hits.hit),
        })
    log_path = str(tmp / "run.npz")
    log.save(log_path)
    return map_path, log_path, true_poses, tmp


def test_micp_localization_cli(world_and_log):
    from rmcl_tpu.tools.micp_localization import main

    map_path, log_path, true_poses, tmp = world_and_log
    out = str(tmp / "track_micp.npz")
    rc = main(["--map", map_path, "--log", log_path, "--out", out,
               "--steps-per-scan", "3",
               "--initial-pose-guess", "0.4", "-0.3", "1.0", "0", "0", "0.3"])
    assert rc == 0
    z = np.load(out)
    assert z["trans"].shape[0] == 6
    # last corrected pose ~ last true pose (odometry was stale by 0.25 m)
    err = np.linalg.norm(z["trans"][-1] - np.asarray(true_poses[-1].trans))
    assert err < 0.05, err


@pytest.mark.slow
def test_rmcl_localization_cli(world_and_log):
    from rmcl_tpu.tools.rmcl_localization import main

    map_path, log_path, true_poses, tmp = world_and_log
    out = str(tmp / "track_rmcl.npz")
    rc = main(["--map", map_path, "--log", log_path, "--out", out,
               "--initial-pose", "0.5", "-0.3", "1.0", "0", "0", "0.3"])
    assert rc == 0
    z = np.load(out)
    assert z["trans"].shape[0] == 6
    err = np.linalg.norm(z["trans"][-1] - np.asarray(true_poses[-1].trans))
    assert err < 0.35, err  # particle filter with few updates: coarse


def test_map_segmentation_cli(world_and_log):
    from rmcl_tpu.tools.map_segmentation import main

    map_path, log_path, true_poses, tmp = world_and_log
    out = str(tmp / "seg.npz")
    rc = main(["--map", map_path, "--log", log_path, "--out", out,
               "--pose", "0.4", "-0.3", "1.0", "0", "0", "0.3"])
    assert rc == 0
    z = np.load(out)
    assert int(z["n_scans"]) == 6
    # first scan was rendered exactly from that pose: nothing is an outlier
    assert z["s0_scan_outlier"].sum() == 0
    assert z["s0_map_outlier"].sum() == 0


def test_convert_cli(world_and_log):
    from rmcl_tpu.tools.convert import main
    from rmcl_tpu.tools.micp_localization import main as micp_main

    map_path, log_path, true_poses, tmp = world_and_log
    out_log = str(tmp / "run_scan.npz")
    rc = main(["--log", log_path, "--to", "scan", "--out", out_log,
               "--width", "180", "--height", "8",
               "--phi-min", "-0.3", "--phi-max", "0.2",
               "--range-min", "0.1", "--range-max", "30"])
    assert rc == 0
    # the converted log drives the MICP CLI end to end
    out = str(tmp / "track_conv.npz")
    rc = micp_main(["--map", map_path, "--log", out_log, "--out", out,
                    "--steps-per-scan", "3",
                    "--initial-pose-guess", "0.4", "-0.3", "1.0", "0", "0", "0.3"])
    assert rc == 0
    z = np.load(out)
    err = np.linalg.norm(z["trans"][-1] - np.asarray(true_poses[-1].trans))
    assert err < 0.08, err


def test_micp_cli_o1dn_records(world_and_log, tmp_path):
    """O1Dn (generic-LiDAR) records roundtrip through MessageLog NPZ and
    drive the MICP CLI."""
    from rmcl_tpu.io.conversions import pointcloud_to_o1dn
    from rmcl_tpu.tools.micp_localization import main

    map_path, log_path, true_poses, tmp = world_and_log
    src = MessageLog.load(log_path)
    log = MessageLog()
    for rec in src:
        if rec.kind == "odom":
            log.add(rec.stamp, "odom", rec.channel, rec.payload)
        elif rec.kind == "cloud":
            cloud = msgs.PointCloud2(
                header=msgs.Header(stamp=rec.stamp),
                points=np.asarray(rec.payload["points"]),
            )
            log.add(rec.stamp, "o1dn", "lidar", pointcloud_to_o1dn(cloud))
    log_o1dn = str(tmp_path / "run_o1dn.npz")
    log.save(log_o1dn)

    out = str(tmp_path / "track_o1dn.npz")
    rc = main(["--map", map_path, "--log", log_o1dn, "--out", out,
               "--steps-per-scan", "3",
               "--initial-pose-guess", "0.4", "-0.3", "1.0", "0", "0", "0.3"])
    assert rc == 0
    z = np.load(out)
    err = np.linalg.norm(z["trans"][-1] - np.asarray(true_poses[-1].trans))
    assert err < 0.05, err


@pytest.mark.slow
def test_micp_cli_depth_and_ondn_records(world_and_log, tmp_path):
    """Depth-camera and OnDn records roundtrip through the NPZ log and
    drive the MICP CLI, with config-driven sensor mounts (sensors.*.tsb =
    the reference's static TF sensor->base) — all four reference sensor
    types are covered."""
    from rmcl_tpu.bvh.builder import build_bvh as _bb
    from rmcl_tpu.geom.mesh import make_room_scene as _mrs
    from rmcl_tpu.sensors.models import PinholeModel
    from rmcl_tpu.tools.micp_localization import main

    map_path, log_path, true_poses, tmp = world_and_log
    mesh = _mrs(n_pillars=3, seed=2)
    bvh = _bb(mesh)

    cam = PinholeModel.create(
        width=96, height=64, fx=80.0, fy=80.0, cx=48.0, cy=32.0,
        range_min=0.1, range_max=30.0,
    )
    # optical->base mount: camera z (forward) -> base x
    tsb_tuple = [0.0, 0.0, 0.0, -np.pi / 2, 0.0, -np.pi / 2]
    tsb = Transform.from_pose_tuple(jnp.asarray(tsb_tuple))
    cfg = tmp_path / "micp.yaml"
    cfg.write_text(
        "initial_pose_guess: [0.4, -0.3, 1.0, 0, 0, 0.3]\n"
        "sensors:\n"
        f"  cam: {{tsb: {tsb_tuple}}}\n"
        f"  generic: {{tsb: {tsb_tuple}}}\n"
    )

    log = MessageLog()
    o_s, d_s = cam.rays()
    for k in range(4):
        stamp = 0.1 * k
        true_base = true_poses[k]
        log.add_odometry(stamp, Transform.from_pose_tuple(
            jnp.asarray([0.4, -0.3, 1.0, 0, 0, 0.3])))
        hits = simulate(bvh, cam, true_base @ tsb)  # sensor pose = base*tsb
        z_depth = np.asarray(hits.t) * np.asarray(d_s)[:, 2]
        z_depth = np.where(np.asarray(hits.hit), z_depth, 0.0)
        log.add(stamp, "depth", "cam", msgs.DepthStamped(
            header=msgs.Header(stamp=stamp),
            info=msgs.DepthInfo(width=96, height=64, fx=80.0, fy=80.0,
                                 cx=48.0, cy=32.0, range_min=0.1,
                                 range_max=30.0),
            data=msgs.RangeData(ranges=z_depth.astype(np.float32),
                                mask=np.asarray(hits.hit)),
        ))
        # ondn record: the same beams as fully generic origins+dirs
        log.add(stamp, "ondn", "generic", msgs.OnDnStamped(
            header=msgs.Header(stamp=stamp),
            info=msgs.OnDnInfo(
                origs=np.zeros_like(np.asarray(d_s, np.float32)),
                dirs=np.asarray(d_s, np.float32),
                range_min=0.1, range_max=30.0,
            ),
            data=msgs.RangeData(ranges=np.where(
                np.asarray(hits.hit), np.asarray(hits.t), 0.0
            ).astype(np.float32), mask=np.asarray(hits.hit)),
        ))
    log_path2 = str(tmp_path / "run_depth_ondn.npz")
    log.save(log_path2)

    out = str(tmp_path / "track_depth.npz")
    rc = main(["--map", map_path, "--log", log_path2, "--out", out,
               "--steps-per-scan", "3", "--config", str(cfg)])
    assert rc == 0
    z = np.load(out)
    assert z["trans"].shape[0] == 8  # 4 depth + 4 ondn corrections
    err = np.linalg.norm(z["trans"][-1] - np.asarray(true_poses[3].trans))
    assert err < 0.05, err


def test_map_segmentation_cli_o1dn(world_and_log, tmp_path):
    """O1Dn records drive the segmentation CLI (reference
    O1DnMapSegmentationEmbreeNode — o1dn_map_segmentation_embree.cpp)."""
    from rmcl_tpu.io.conversions import pointcloud_to_o1dn
    from rmcl_tpu.tools.map_segmentation import main

    map_path, log_path, true_poses, tmp = world_and_log
    src = MessageLog.load(log_path)
    log = MessageLog()
    for rec in src:
        if rec.kind == "cloud":
            cloud = msgs.PointCloud2(
                header=msgs.Header(stamp=rec.stamp),
                points=np.asarray(rec.payload["points"]),
            )
            log.add(rec.stamp, "o1dn", "lidar", pointcloud_to_o1dn(cloud))
    log_o1dn = str(tmp_path / "seg_o1dn.npz")
    log.save(log_o1dn)

    out = str(tmp_path / "seg_o1dn_out.npz")
    rc = main(["--map", map_path, "--log", log_o1dn, "--out", out,
               "--pose", "0.4", "-0.3", "1.0", "0", "0", "0.3"])
    assert rc == 0
    z = np.load(out)
    assert int(z["n_scans"]) == 6
    # the first o1dn scan was rendered exactly from that pose
    assert z["s0_scan_outlier"].sum() == 0
    assert z["s0_map_outlier"].sum() == 0
