"""Sensor model ray generators + simulator tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_box, make_sphere
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.sensors.models import O1DnModel, OnDnModel, PinholeModel, SphericalModel
from rmcl_tpu.sensors.simulate import simulate, simulate_ranges


def test_spherical_rays_unit_and_order():
    m = SphericalModel.vlp16(width=90)
    o, d = m.rays()
    assert o.shape == (90 * 16, 3) and d.shape == (90 * 16, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-6)
    # buffer order: id = v * width + u; first ray points at (phi_min, theta_min)
    d0 = np.asarray(d[0])
    th, ph = -0.2617994, -np.pi
    expect = [np.cos(th) * np.cos(ph), np.cos(th) * np.sin(ph), np.sin(th)]
    np.testing.assert_allclose(d0, expect, atol=1e-6)
    # ray (v=0, u=1) differs in phi only
    d1 = np.asarray(d[1])
    assert abs(d1[2] - d0[2]) < 1e-6


def test_spherical_polar_roundtrip(rng):
    m = SphericalModel.create(width=64, height=8)
    r = jnp.asarray(rng.uniform(1, 10, m.n_rays).astype(np.float32))
    pts = m.polar_to_cartesian(r)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pts), axis=1), r, rtol=1e-5)


def test_pinhole_rays():
    m = PinholeModel.create(width=64, height=48, fx=50.0, fy=50.0, cx=32.0, cy=24.0)
    o, d = m.rays()
    d = np.asarray(d).reshape(48, 64, 3)
    # center pixel looks along +z
    np.testing.assert_allclose(d[24, 32], [0, 0, 1], atol=1e-6)
    # right pixel has +x component
    assert d[24, 60, 0] > 0
    # bottom pixel has +y component (y down)
    assert d[40, 32, 1] > 0


def test_pinhole_depth_roundtrip(rng):
    m = PinholeModel.create(width=32, height=24, fx=30.0, fy=30.0, cx=16.0, cy=12.0)
    z = jnp.asarray(rng.uniform(1, 5, m.n_rays).astype(np.float32))
    pts = np.asarray(m.depth_to_cartesian(z))
    np.testing.assert_allclose(pts[:, 2], z, rtol=1e-6)


def test_o1dn_ondn(rng):
    dirs = rng.normal(size=(100, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    m1 = O1DnModel.create(dirs, orig=[0.1, 0.2, 0.3])
    o, d = m1.rays()
    assert o.shape == (100, 3)
    np.testing.assert_allclose(np.asarray(o[5]), [0.1, 0.2, 0.3], atol=1e-7)
    origs = rng.normal(size=(100, 3)).astype(np.float32)
    m2 = OnDnModel.create(origs, dirs)
    o2, d2 = m2.rays()
    np.testing.assert_allclose(np.asarray(o2), origs)


def test_simulate_sphere_from_center():
    mesh = make_sphere(64, 64, radius=3.0)
    bvh = build_bvh(mesh)
    model = SphericalModel.create(width=90, height=8, range_max=10.0)
    hits = simulate(bvh, model, Transform.identity())
    assert bool(np.asarray(hits.hit).all())
    np.testing.assert_allclose(np.asarray(hits.t), 3.0, atol=0.02)
    # sensor-frame points lie on the ray directions
    _, d = model.rays()
    cos = np.einsum("nj,nj->n", np.asarray(hits.point), np.asarray(d)) / np.asarray(hits.t)
    np.testing.assert_allclose(cos, 1.0, atol=1e-4)


def test_simulate_respects_range_limits():
    mesh = make_sphere(48, 48, radius=3.0)
    bvh = build_bvh(mesh)
    model = SphericalModel.create(width=32, height=4, range_max=2.0)
    hits = simulate(bvh, model, Transform.identity())
    assert not bool(np.asarray(hits.hit).any())


def test_simulate_batched_poses_sensor_frame():
    mesh = make_box((8.0, 8.0, 4.0), inward=True)
    bvh = build_bvh(mesh)
    model = SphericalModel.create(width=64, height=4, phi_min=0.0, phi_max=0.0, range_max=50.0)
    # two poses: identity and shifted +1m in x: sensor-frame geometry differs
    poses = Transform(
        rot=jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]),
        trans=jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]]),
    )
    hits = simulate(bvh, model, poses)
    assert hits.t.shape == (2, model.n_rays)
    t = np.asarray(hits.t)
    # pose 1 is closer to the +x wall: its forward ray is shorter
    fwd = np.argmin(np.abs(np.linspace(-np.pi, np.pi, 64, endpoint=False)))
    assert t[1, fwd] < t[0, fwd]
    # ranges in sensor frame equal |point|
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(hits.point), axis=-1)[np.asarray(hits.hit)],
        t[np.asarray(hits.hit)],
        rtol=1e-4,
    )


def test_simulate_rotated_pose():
    mesh = make_box((4.0, 100.0, 100.0), inward=True)
    bvh = build_bvh(mesh)
    # single forward ray
    model = O1DnModel.create(jnp.asarray([[1.0, 0.0, 0.0]]), range_max=500.0)
    t_id = simulate_ranges(bvh, model, Transform.identity())
    # yaw 90deg: the forward ray now sees the far y wall
    tsm = Transform.from_pose_tuple(jnp.asarray([0.0, 0, 0, 0, 0, np.pi / 2]))
    t_rot = simulate_ranges(bvh, model, tsm)
    np.testing.assert_allclose(np.asarray(t_id), 2.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_rot), 50.0, atol=1e-3)


# --- per-ray time motion compensation (de-skew) -----------------------------


def test_deskew_rotating_sensor_reconstructs_world_point():
    """Points captured while the base spins at constant yaw rate must all
    land on the same world point after de-skew."""
    from rmcl_tpu.sensors.deskew import deskew_points

    w = 0.8  # rad/s yaw rate
    T = 0.1  # scan period = odom sample spacing
    P = np.asarray([3.0, 1.0, 0.5], np.float32)  # fixed odom-frame point

    t_i = np.linspace(0.0, T, 33).astype(np.float32)
    yaw_i = w * t_i
    # sensor-frame capture at time t: p_i = R(-yaw_i) @ P (Tsb = identity)
    ca, sa = np.cos(-yaw_i), np.sin(-yaw_i)
    p_i = np.stack(
        [ca * P[0] - sa * P[1], sa * P[0] + ca * P[1], np.full_like(ca, P[2])], -1
    )

    tbo_a = Transform.identity()
    tbo_b = Transform.from_xyz_euler(
        jnp.zeros(3), jnp.asarray([0.0, 0.0, w * T])
    )
    out = deskew_points(
        jnp.asarray(p_i),
        jnp.asarray(t_i),
        jnp.float32(0.0),  # reference stamp = scan start
        Transform.identity(),
        tbo_a,
        jnp.float32(0.0),
        tbo_b,
        jnp.float32(T),
    )
    # sensor frame at t=0 coincides with the odom frame
    np.testing.assert_allclose(np.asarray(out), P[None].repeat(33, 0), atol=1e-5)


def test_deskew_translation_and_extrapolation():
    """Linear base motion: de-skew removes the skew; stamps beyond the last
    odom sample extrapolate along the same velocity."""
    from rmcl_tpu.sensors.deskew import deskew_points

    v = np.asarray([2.0, 0.0, 0.0], np.float32)  # m/s
    P = np.asarray([0.0, 5.0, 0.0], np.float32)
    t_i = np.asarray([0.0, 0.05, 0.1, 0.15], np.float32)  # last two extrapolate
    # capture at time t: base at v*t, sensor point = P - v*t
    p_i = P[None] - v[None] * t_i[:, None]

    tbo_a = Transform.identity()
    tbo_b = Transform.from_xyz_euler(jnp.asarray(v * 0.1), jnp.zeros(3))
    out = deskew_points(
        jnp.asarray(p_i),
        jnp.asarray(t_i),
        jnp.float32(0.0),
        Transform.identity(),
        tbo_a,
        jnp.float32(0.0),
        tbo_b,
        jnp.float32(0.1),
    )
    np.testing.assert_allclose(np.asarray(out), P[None].repeat(4, 0), atol=1e-5)


def test_micp_node_deskew_ingest():
    """motion_compensation: true + stamped odom + per-ray stamps de-skews
    at ingest; without the flag the raw points are kept."""
    from rmcl_tpu.config.tree import ParamTree
    from rmcl_tpu.geom.map import MeshMap
    from rmcl_tpu.io import msgs
    from rmcl_tpu.micp.node import MICPLocalization

    from rmcl_tpu.io.conversions import scan_info_to_model

    map_ = MeshMap.from_mesh(make_box((10.0, 10.0, 4.0)))
    n = 16
    r = np.full(n, 2.0, np.float32)
    stamps = np.linspace(0.0, 0.1, n).astype(np.float32)
    info = msgs.ScanInfo(
        phi_n=1, theta_n=16, phi_min=0.0, phi_inc=0.1,
        theta_min=-np.pi, theta_inc=2 * np.pi / 16,
        range_min=0.1, range_max=20.0,
    )
    msg = msgs.ScanStamped(
        header=msgs.Header(stamp=1.0),
        info=info,
        data=msgs.RangeData(ranges=r, stamps=stamps),
    )

    for enabled in (False, True):
        node = MICPLocalization(
            map_, ParamTree({"motion_compensation": enabled})
        )
        node.on_odometry(Transform.identity(), stamp=1.0)
        node.on_odometry(
            Transform.from_xyz_euler(jnp.asarray([0.2, 0.0, 0.0]), jnp.zeros(3)),
            stamp=1.1,
        )
        node.on_scan("s", msg)
        pts = node.sensors["s"].points
        raw = np.asarray(
            scan_info_to_model(info).polar_to_cartesian(jnp.asarray(r))
        )
        if enabled:
            assert np.abs(pts - raw).max() > 0.01  # actually moved
        else:
            np.testing.assert_allclose(pts, raw, atol=1e-7)


def test_deskew_degenerate_odom_pair_is_identity():
    """Duplicate/equal-stamp odom samples carry no velocity: de-skew must
    become the identity instead of extrapolating the noise delta by ~1e8
    (regression: dt was floored to 1e-9)."""
    from rmcl_tpu.sensors.deskew import deskew_points

    p = np.asarray([[1.0, 2.0, 0.5], [3.0, -1.0, 0.2]], np.float32)
    t_i = np.asarray([0.0, 0.05], np.float32)
    tbo_a = Transform.identity()
    tbo_b = Transform.from_xyz_euler(jnp.asarray([0.01, 0.0, 0.0]), jnp.zeros(3))
    out = deskew_points(
        jnp.asarray(p), jnp.asarray(t_i), jnp.float32(1.0),
        Transform.identity(), tbo_a, jnp.float32(1.0), tbo_b, jnp.float32(1.0),
    )
    np.testing.assert_allclose(np.asarray(out), p, atol=1e-6)


def test_micp_node_dedupes_equal_stamp_odometry():
    from rmcl_tpu.config.tree import ParamTree
    from rmcl_tpu.geom.map import MeshMap
    from rmcl_tpu.micp.node import MICPLocalization

    node = MICPLocalization(
        MeshMap.from_mesh(make_box((2.0, 2.0, 2.0))),
        ParamTree({"motion_compensation": True}),
    )
    node.on_odometry(Transform.identity(), stamp=1.0)
    node.on_odometry(
        Transform.from_xyz_euler(jnp.asarray([0.01, 0, 0]), jnp.zeros(3)),
        stamp=1.0,  # duplicate stamp: replaces, doesn't pair
    )
    assert len(node._odom_hist) == 1
    node.on_odometry(Transform.identity(), stamp=1.1)
    assert len(node._odom_hist) == 2
