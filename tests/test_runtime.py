"""Runtime-layer tests: config tree, conversions, MICP node, segmentation."""

import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.config.tree import ParamTree
from rmcl_tpu.geom.map import MapContainer, MeshMap
from rmcl_tpu.geom.mesh import make_room_scene, make_sphere
from rmcl_tpu.io import msgs
from rmcl_tpu.io.conversions import (
    laser_scan_to_scan,
    model_to_scan_info,
    pointcloud_to_o1dn,
    pointcloud_to_scan,
    scan_info_to_model,
    scan_to_points,
)
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.micp.node import MICPLocalization
from rmcl_tpu.ops.segmentation import segment_scan
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate


# --- ParamTree --------------------------------------------------------------


def test_param_tree_paths():
    t = ParamTree({"sensors": {"lidar": {"weight": 2.0, "correspondences": {"max_dist": 0.7}}}})
    assert t.get("sensors.lidar.weight") == 2.0
    assert t.get("sensors.lidar.correspondences.max_dist") == 0.7
    assert t.get("missing.path", 42) == 42
    assert "sensors.lidar" in t
    names = [k for k, _ in t.subtree("sensors").items()]
    assert names == ["lidar"]


def test_param_tree_from_flat_and_merge():
    t = ParamTree.from_flat({"a.b": 1, "a.c": 2, "d": 3})
    assert t.get("a.b") == 1 and t.get("d") == 3
    o = ParamTree.from_flat({"a.b": 10, "e": 5})
    m = t.merged(o)
    assert m.get("a.b") == 10 and m.get("a.c") == 2 and m.get("e") == 5


def test_param_tree_mini_yaml():
    text = """
map_file: world.obj
optimization_iterations: 5
adaptive_max_dist: true
initial_pose_guess: [0.0, 1.0, 0.0, 0, 0, 0.5]
sensors:
  lidar:
    weight: 2.0
    correspondences:
      type: RC
      max_dist: 0.5
"""
    t = ParamTree.from_yaml(text)
    assert t.get("optimization_iterations") == 5
    assert t.get("adaptive_max_dist") is True
    assert t.get("initial_pose_guess") == [0.0, 1.0, 0.0, 0, 0, 0.5]
    assert t.get("sensors.lidar.correspondences.max_dist") == 0.5


# --- conversions ------------------------------------------------------------


def test_scan_info_model_roundtrip():
    m = SphericalModel.vlp16(width=360)
    info = model_to_scan_info(m)
    m2 = scan_info_to_model(info)
    np.testing.assert_allclose(float(m2.theta_inc), float(m.theta_inc), rtol=1e-6)
    assert m2.width == m.width and m2.height == m.height


def test_scan_to_points_roundtrip(rng):
    m = SphericalModel.create(width=90, height=4)
    info = model_to_scan_info(m)
    r = rng.uniform(1, 50, m.n_rays).astype(np.float32)
    r[::7] = 0.0  # invalid
    msg = msgs.ScanStamped(header=msgs.Header(), info=info, data=msgs.RangeData(ranges=r))
    pts, mask = scan_to_points(msg)
    assert mask.sum() == (r > 0).sum()
    np.testing.assert_allclose(np.linalg.norm(pts[mask], axis=1), r[r > 0], rtol=1e-4)


def test_pointcloud_to_scan_binning(rng):
    # points generated exactly on a scan grid must land in their own bins
    m = SphericalModel.create(width=90, height=4, range_min=0.5, range_max=100.0)
    info = model_to_scan_info(m)
    r = rng.uniform(2, 50, m.n_rays).astype(np.float32)
    pts = np.asarray(m.polar_to_cartesian(jnp.asarray(r)))
    cloud = msgs.PointCloud2(header=msgs.Header(), points=pts)
    scan = pointcloud_to_scan(cloud, info)
    np.testing.assert_allclose(scan.data.ranges, r, rtol=1e-4)


def test_pointcloud_to_o1dn(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32) * 5
    pts[3] = np.nan
    cloud = msgs.PointCloud2(header=msgs.Header(), points=pts)
    o1dn = pointcloud_to_o1dn(cloud)
    assert o1dn.data.mask.sum() == 199
    d = o1dn.info.dirs
    np.testing.assert_allclose(np.linalg.norm(d[o1dn.data.mask], axis=1), 1.0, atol=1e-5)


def test_laser_scan_decimation():
    scan = msgs.LaserScan(
        header=msgs.Header(),
        angle_min=-1.0,
        angle_increment=0.01,
        range_min=0.1,
        range_max=10.0,
        ranges=np.arange(200, dtype=np.float32),
    )
    out = laser_scan_to_scan(scan, skip_begin=10, skip_end=10, increment=2)
    assert out.info.theta_n == 90
    np.testing.assert_allclose(out.info.theta_min, -0.9, atol=1e-6)
    np.testing.assert_allclose(out.data.ranges[:3], [10, 12, 14])


# --- MeshMap / MapContainer -------------------------------------------------


def test_map_container(tmp_path):
    from rmcl_tpu.geom.mesh import save_obj

    mesh = make_sphere(16, 16)
    p = str(tmp_path / "m.obj")
    save_obj(mesh, p)
    c = MapContainer()
    m1 = c.load("world", p)
    m2 = c.get("world")
    assert m1 is m2
    assert m1.bvh.nodes.shape[0] == 2 * m1.mesh.n_faces - 1
    assert m1.bins.n_bins >= 1


# --- MICP node --------------------------------------------------------------


def test_micp_localization_node_tracks():
    world = make_room_scene(n_pillars=3, seed=13)
    map_ = MeshMap.from_mesh(world)
    cfg = ParamTree.from_yaml(
        """
optimization_iterations: 5
initial_pose_guess: [0.45, -0.3, 1.0, 0, 0, 0.28]
sensors:
  lidar:
    weight: 1.0
    correspondences:
      type: RC
      max_dist: 2.0
"""
    )
    node = MICPLocalization(map_, cfg)
    model = SphericalModel.create(width=240, height=8, phi_min=-0.3, phi_max=0.2, range_max=30.0)
    true_pose = Transform.from_pose_tuple(jnp.asarray([0.5, -0.25, 1.0, 0, 0, 0.3]))
    hits = simulate(map_.bvh, model, true_pose)
    node.set_static_dataset("lidar", model, np.asarray(hits.point), np.asarray(hits.hit))
    node.on_odometry(Transform.identity())
    for _ in range(10):
        stats = node.step()
    pose = node.pose_base_map()
    err = np.linalg.norm(np.asarray(pose.trans) - np.asarray(true_pose.trans))
    assert err < 0.02, err
    assert float(np.asarray(stats.convergence_progress)) > 0.5
    s = node.sensor_stats()
    assert s.valid_matches > 0


def test_micp_node_set_pose_resets():
    map_ = MeshMap.from_mesh(make_sphere(24, 24, radius=5.0))
    node = MICPLocalization(map_)
    node.on_odometry(Transform.identity())
    node.set_pose(Transform.from_pose_tuple(jnp.asarray([1.0, 0, 0, 0, 0, 0])))
    np.testing.assert_allclose(np.asarray(node.pose_base_map().trans), [1, 0, 0], atol=1e-6)


# --- segmentation -----------------------------------------------------------


def test_segment_scan_detects_obstacle_and_stale_map():
    world = make_room_scene(n_pillars=0, seed=0)  # empty 10x8x3 room
    bvh = build_bvh(world)
    model = SphericalModel.create(width=180, height=4, phi_min=-0.05, phi_max=0.05, range_max=30.0)
    pose = Transform.from_pose_tuple(jnp.asarray([0.0, 0.0, 1.5, 0, 0, 0]))
    sim = simulate(bvh, model, pose)
    ranges = np.where(np.asarray(sim.hit), np.asarray(sim.t), 0.0).astype(np.float32)

    # inject a dynamic obstacle: pull some +x beams to 1m
    fwd = np.abs(np.linspace(-np.pi, np.pi, 180, endpoint=False)) < 0.2
    obstacle = np.tile(fwd, 4) & (ranges > 2.0)
    ranges_obs = np.where(obstacle, 1.0, ranges)

    out = segment_scan(bvh, model, pose, jnp.asarray(ranges_obs))
    assert bool(np.asarray(out.scan_outlier)[obstacle].all())
    # untouched beams are inliers
    clean = ~obstacle & (ranges > 0)
    assert np.asarray(out.scan_outlier)[clean].sum() == 0
    assert np.asarray(out.map_outlier)[clean].sum() == 0

    # stale map: push some beams farther than the wall
    ranges_far = np.where(obstacle, ranges + 3.0, ranges)
    out2 = segment_scan(bvh, model, pose, jnp.asarray(ranges_far))
    assert bool(np.asarray(out2.map_outlier)[obstacle].all())


def test_scan_to_pointcloud_roundtrip(rng):
    """scan -> cloud renderer: valid rays keep their cartesian points,
    invalid rays become NaN rows; cloud -> scan -> cloud is stable."""
    from rmcl_tpu.io.conversions import scan_to_pointcloud, scan_to_points

    info = msgs.ScanInfo(
        phi_n=4, theta_n=32, phi_min=-0.2, phi_inc=0.1,
        theta_min=-np.pi, theta_inc=2 * np.pi / 32,
        range_min=0.5, range_max=20.0,
    )
    r = rng.uniform(1.0, 10.0, 128).astype(np.float32)
    r[::7] = 0.0  # below range_min -> invalid
    msg = msgs.ScanStamped(
        header=msgs.Header(stamp=1.5), info=info, data=msgs.RangeData(ranges=r)
    )
    cloud = scan_to_pointcloud(msg)
    pts, mask = scan_to_points(msg)
    assert cloud.header.stamp == 1.5
    np.testing.assert_allclose(cloud.points[mask], pts[mask])
    assert np.isnan(cloud.points[~mask]).all()
    np.testing.assert_array_equal(cloud.valid_mask(), mask)


def test_pointcloud_to_o1dn_carries_stamps_and_labels(rng):
    from rmcl_tpu.io.conversions import pointcloud_to_o1dn

    n = 40
    pts = rng.normal(size=(n, 3)).astype(np.float32) + [5, 0, 0]
    cloud = msgs.PointCloud2(
        header=msgs.Header(stamp=2.0),
        points=pts,
        stamps=np.linspace(0, 0.1, n).astype(np.float32),
        labels=np.arange(n, dtype=np.int32),
    )
    msg = pointcloud_to_o1dn(cloud, width_skip=2)
    assert msg.data.stamps is not None and msg.data.stamps.shape == (20,)
    np.testing.assert_allclose(msg.data.stamps, cloud.stamps[::2])
    np.testing.assert_array_equal(msg.data.labels, cloud.labels[::2])


def test_o1dn_to_pointcloud_roundtrip_channels(rng):
    """o1dn -> cloud -> o1dn keeps stamps/intensities (de-skew chain)."""
    from rmcl_tpu.io.conversions import o1dn_to_pointcloud, pointcloud_to_o1dn

    n = 24
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    msg = msgs.O1DnStamped(
        header=msgs.Header(stamp=3.0),
        info=msgs.O1DnInfo(
            orig=np.zeros(3, np.float32), dirs=d, range_min=0.1, range_max=50.0
        ),
        data=msgs.RangeData(
            ranges=rng.uniform(1, 10, n).astype(np.float32),
            stamps=np.linspace(0, 0.1, n).astype(np.float32),
            intensities=rng.uniform(0, 1, n).astype(np.float32),
        ),
    )
    cloud = o1dn_to_pointcloud(msg)
    back = pointcloud_to_o1dn(cloud)
    np.testing.assert_allclose(back.data.stamps, msg.data.stamps)
    np.testing.assert_allclose(back.data.intensities, msg.data.intensities)


def test_pointcloud_to_scan_negative_increment(rng):
    """Flipped-mount lidars have negative angle increments (legal in ROS);
    the binning must not clamp them positive."""
    from rmcl_tpu.io.conversions import pointcloud_to_scan

    n = 64
    theta = np.linspace(0.9, -0.9, n)  # descending sweep
    pts = np.stack(
        [3 * np.cos(theta), 3 * np.sin(theta), np.zeros(n)], -1
    ).astype(np.float32)
    info = msgs.ScanInfo(
        phi_n=1, theta_n=n, phi_min=0.0, phi_inc=0.0,
        theta_min=0.9, theta_inc=-1.8 / (n - 1),
        range_min=0.1, range_max=10.0,
    )
    out = pointcloud_to_scan(msgs.PointCloud2(header=msgs.Header(), points=pts), info)
    assert (np.asarray(out.data.ranges) > 0).mean() > 0.9  # bins filled


def test_pointcloud_to_o1dn_empty_cloud():
    from rmcl_tpu.io.conversions import pointcloud_to_o1dn

    cloud = msgs.PointCloud2(
        header=msgs.Header(), points=np.zeros((0, 3), np.float32)
    )
    msg = pointcloud_to_o1dn(cloud)  # must not raise
    assert msg.data.ranges.shape == (0,)


def test_segment_scan_mask_real():
    """Dropped beams (mask False) are neither scan nor map outliers."""
    import jax.numpy as jnp

    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.geom.mesh import make_box
    from rmcl_tpu.math.se3 import Transform
    from rmcl_tpu.ops.segmentation import segment_scan
    from rmcl_tpu.sensors.models import SphericalModel

    bvh = build_bvh(make_box((6.0, 6.0, 3.0), inward=True))
    model = SphericalModel.create(
        width=32, height=2, phi_min=-0.1, phi_max=0.1,
        range_min=0.0, range_max=20.0,  # range_min 0: sentinel 0.0 is "in range"
    )
    from rmcl_tpu.sensors.simulate import simulate

    sim = simulate(bvh, model, Transform.identity())
    ranges = np.asarray(sim.t, np.float32).copy()
    ranges[::4] = 0.0  # dropped beams, encoded as 0 with range_min == 0
    mask = np.ones(model.n_rays, bool)
    mask[::4] = False

    no_mask = segment_scan(bvh, model, Transform.identity(), ranges)
    masked = segment_scan(bvh, model, Transform.identity(), ranges, mask_real=mask)
    # without the mask the sentinel beams are misclassified as outliers
    assert int(np.asarray(no_mask.scan_outlier).sum()) > 0
    assert int(np.asarray(masked.scan_outlier[::4]).sum()) == 0


def test_pointcloud_to_o1dn_organized_colors(rng):
    """Organized (width x height) clouds and color channels survive the
    estimation (reference conversions.cpp:869-1074 incl. rgb/rgba)."""
    from rmcl_tpu.io import msgs
    from rmcl_tpu.io.conversions import filter_o1dn, pointcloud_to_o1dn

    w, h = 12, 6
    pts = rng.uniform(-5, 5, (w * h, 3)).astype(np.float32)
    pts[7] = np.nan  # one invalid point
    rgb = rng.uniform(0, 1, (w * h, 3)).astype(np.float32)
    cloud = msgs.PointCloud2(
        header=msgs.Header(stamp=1.0, frame_id="cam"),
        points=pts, colors=rgb, width=w, height=h,
    )
    o1dn = pointcloud_to_o1dn(cloud)
    assert o1dn.info.width == w and o1dn.info.height == h
    assert o1dn.data.colors.shape == (w * h, 4)
    np.testing.assert_allclose(o1dn.data.colors[:, :3], rgb)
    np.testing.assert_allclose(o1dn.data.colors[:, 3], 1.0)  # rgb -> a=1
    assert not o1dn.data.mask[7] and o1dn.data.ranges[7] == 0.0
    assert np.all(o1dn.info.dirs[7] == 0.0)  # reference :1001-1007

    # 2-D decimation (reference filter, scan_operations.cpp:41-130)
    f = filter_o1dn(
        o1dn, width_increment=2, height_skip_begin=1, height_increment=2,
        range_min=0.5,
    )
    assert f.info.width == 6
    assert f.info.height == 3  # (6 - 1) / 2 rounds like the arange
    assert f.data.colors.shape == (18, 4)
    assert f.info.range_min == max(o1dn.info.range_min, 0.5)
    # kept cell (i=1, j=0) maps to source cell (row 1, col 0)
    np.testing.assert_allclose(f.data.ranges[0], o1dn.data.ranges[w])


def test_micp_ingest_clock_warnings():
    """Ingest diagnostics (reference MICPSphericalSensorCPU.cpp:104-124):
    moderate skew warns (NETWORK DELAY); wild skew drops the message."""
    import warnings

    import pytest as _pytest

    from rmcl_tpu.config.tree import ParamTree
    from rmcl_tpu.geom.map import MeshMap
    from rmcl_tpu.geom.mesh import make_room_scene
    from rmcl_tpu.micp.node import MICPLocalization
    from rmcl_tpu.sensors.models import SphericalModel
    from rmcl_tpu.sensors.simulate import simulate

    mesh = make_room_scene(n_pillars=1, seed=0)
    mm = MeshMap.from_mesh(mesh)
    model = SphericalModel.create(
        width=30, height=2, phi_min=-0.2, phi_max=0.2,
        theta_min=-np.pi, theta_max=np.pi, range_min=0.1, range_max=30.0,
    )
    hits = simulate(mm.bvh, model, Transform.identity())
    info = model_to_scan_info(model)
    ranges = np.where(np.asarray(hits.hit), np.asarray(hits.t), 0.0).astype(
        np.float32
    )

    def scan_msg(stamp):
        return msgs.ScanStamped(
            header=msgs.Header(stamp=stamp), info=info,
            data=msgs.RangeData(ranges=ranges),
        )

    node = MICPLocalization(mm, ParamTree.from_flat(
        {"ingest_clock_mismatch": 100.0}))
    node.on_odometry(Transform.identity(), stamp=100.0)

    # in-sync stamp: no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        node.on_scan("lidar", scan_msg(100.01))
    assert node.sensors["lidar"].has_data()

    # moderate skew: NETWORK DELAY warning, message still accepted
    with _pytest.warns(UserWarning, match="NETWORK DELAY"):
        node.on_scan("lidar", scan_msg(99.0))

    # wild skew (different clock source): warn + drop
    node2 = MICPLocalization(mm, ParamTree.from_flat(
        {"ingest_clock_mismatch": 100.0}))
    node2.on_odometry(Transform.identity(), stamp=100.0)
    with _pytest.warns(UserWarning, match="STAMP MISMATCH"):
        node2.on_scan("lidar", scan_msg(1e9))
    s = node2.sensors.get("lidar")
    assert s is None or not s.has_data()  # dropped before unpacking
