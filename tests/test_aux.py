"""Aux subsystem tests: timing, checkpointing, viz exports, replay."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.geom.mesh import make_room_scene
from rmcl_tpu.geom.map import MeshMap
from rmcl_tpu.io.replay import MessageLog, replay
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.mcl.node import MCLConfig, MCLNode
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig
from rmcl_tpu.micp.correspondences import find_rcc
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate
from rmcl_tpu.utils.checkpoint import (
    load_mcl_state,
    load_micp_state,
    save_mcl_state,
    save_micp_state,
)
from rmcl_tpu.utils.timing import StageTimer, StopWatch, timeit_device
from rmcl_tpu.utils.viz import (
    particle_cloud_channels,
    save_correspondences_ply,
    save_particles_ply,
    save_scan_ply,
)


def test_stopwatch_and_stage_timer():
    sw = StopWatch()
    _ = sum(range(100000))
    dt = sw()
    assert dt > 0
    st = StageTimer()
    with st.stage("work"):
        _ = sum(range(100000))
    assert st.mean("work") > 0
    assert "work" in st.report()


def test_timeit_device():
    f = jax.jit(lambda x: x * 2 + 1)
    t = timeit_device(f, jnp.ones(1000))
    assert t > 0


def test_mcl_checkpoint_roundtrip(tmp_path, key):
    cloud = ParticleCloud.create(128)
    cloud = cloud.with_poses(
        Transform.from_xyz_euler(
            jnp.asarray(np.random.default_rng(0).normal(size=(128, 3)), jnp.float32),
            jnp.zeros((128, 3)),
        )
    )
    p = str(tmp_path / "snap.npz")
    save_mcl_state(p, cloud, key, extra={"step": 17})
    cloud2, key2, extra = load_mcl_state(p)
    np.testing.assert_allclose(np.asarray(cloud2.poses.trans), np.asarray(cloud.poses.trans))
    np.testing.assert_array_equal(np.asarray(key2), np.asarray(key))
    assert int(extra["step"]) == 17


def test_micp_checkpoint_roundtrip(tmp_path):
    tom = Transform.from_pose_tuple(jnp.asarray([1.0, 2, 3, 0.1, 0.2, 0.3]))
    tbo = Transform.identity()
    p = str(tmp_path / "micp.npz")
    save_micp_state(p, tom, tbo, jnp.float32(0.7))
    tom2, tbo2, prog, _extra = load_micp_state(p)
    np.testing.assert_allclose(np.asarray(tom2.trans), np.asarray(tom.trans))
    assert float(prog) == np.float32(0.7)


def test_viz_exports(tmp_path):
    world = make_room_scene(n_pillars=1, seed=0)
    map_ = MeshMap.from_mesh(world)
    model = SphericalModel.create(width=60, height=4, phi_min=-0.2, phi_max=0.2, range_max=30.0)
    pose = Transform.from_pose_tuple(jnp.asarray([0, 0, 1.0, 0, 0, 0]))
    hits = simulate(map_.bvh, model, pose)
    corr = find_rcc(map_.bvh, model, pose)

    cloud = ParticleCloud.create(64)
    ch = particle_cloud_channels(cloud)
    assert set(ch) >= {"xyz", "likelihood", "badness"}

    p1 = str(tmp_path / "particles.ply")
    save_particles_ply(p1, cloud)
    p2 = str(tmp_path / "corr.ply")
    save_correspondences_ply(p2, np.asarray(hits.point), corr, np.asarray(hits.hit))
    p3 = str(tmp_path / "scan.ply")
    save_scan_ply(p3, np.asarray(hits.point), np.asarray(hits.hit))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 100
        assert open(p).readline().strip() == "ply"


def test_message_log_replay_roundtrip(tmp_path):
    log = MessageLog()
    log.add_odometry(0.1, Transform.from_pose_tuple(jnp.asarray([1.0, 0, 0, 0, 0, 0])))
    log.add(0.2, "cloud", "lidar", {"points": np.ones((5, 3), np.float32), "mask": np.ones(5, bool)})
    log.add_odometry(0.15, Transform.identity())
    p = str(tmp_path / "log.npz")
    log.save(p)
    log2 = MessageLog.load(p)
    stamps = [r.stamp for r in log2]
    assert stamps == sorted(stamps) and len(log2) == 3

    seen = []
    replay(log2, {"odom": lambda r: seen.append(("o", r.stamp)), "cloud": lambda r: seen.append(("c", r.stamp))})
    assert seen == [("o", 0.1), ("o", 0.15), ("c", 0.2)]


def test_replay_drives_mcl_node():
    world = make_room_scene(n_pillars=3, seed=31)
    map_ = MeshMap.from_mesh(world)
    true_pose = Transform.from_pose_tuple(jnp.asarray([0.5, 0.0, 1.0, 0, 0, 0.2]))
    model = SphericalModel.create(width=180, height=6, phi_min=-0.3, phi_max=0.2, range_max=30.0)
    hits = simulate(map_.bvh, model, true_pose)

    log = MessageLog()
    for i in range(6):
        t = 0.1 * i
        log.add_odometry(t, Transform.identity())
        log.add(t + 0.05, "cloud", "lidar", {
            "points": np.asarray(hits.point), "mask": np.asarray(hits.hit)
        })

    node = MCLNode(map_, MCLConfig(n_particles=1024, sensor=SensorUpdateConfig.create(samples=32, dist_sigma=0.3), seed=2))
    node.initial_pose_guess(true_pose, jnp.diag(jnp.asarray([0.09, 0.09, 0.01, 1e-4, 1e-4, 0.02])))

    def on_odom(rec):
        node.motion_update(rec.payload, rec.stamp)

    def on_cloud(rec):
        node.sensor_update(rec.payload["points"], rec.payload["mask"], Transform.identity())
        node.resample()

    n = replay(log, {"odom": on_odom, "cloud": on_cloud})
    assert n == 12
    stats = node.estimate()
    err = np.linalg.norm(np.asarray(stats.pose.trans) - np.asarray(true_pose.trans))
    assert err < 0.25, err


def test_micp_setup_banner():
    """print_setup renders the reference printSetup-style report."""
    from rmcl_tpu.config.tree import ParamTree
    from rmcl_tpu.geom.map import MeshMap
    from rmcl_tpu.geom.mesh import make_box
    from rmcl_tpu.micp.node import MICPLocalization
    from rmcl_tpu.utils.console import TextColors, colorize

    node = MICPLocalization(
        MeshMap.from_mesh(make_box((2.0, 2.0, 2.0))),
        ParamTree({"sensors": {"lidar": {"weight": 2.0}}}),
    )
    text = node.print_setup(color=False)
    assert "MAP" in text and "SENSORS" in text
    assert "lidar" in text and "weight: 2.0" in text
    assert "triangles: 12" in text
    assert "\033[" not in text  # color off
    assert "\033[" in colorize("x", TextColors.GREEN, force=True)


def test_orbax_sharded_checkpoint_roundtrip(tmp_path, key):
    """Orbax pytree checkpoint path (multi-host-capable superset)."""
    import dataclasses

    import jax.numpy as jnp

    from rmcl_tpu.mcl.particles import ParticleCloud
    from rmcl_tpu.utils.checkpoint import load_sharded, save_sharded

    cloud = ParticleCloud.create(128)
    cloud = dataclasses.replace(
        cloud,
        likelihood=dataclasses.replace(
            cloud.likelihood, mean=jnp.linspace(0, 1, 128)
        ),
    )
    path = str(tmp_path / "ckpt")
    save_sharded(path, cloud)
    out = load_sharded(path, ParticleCloud.create(128))
    np.testing.assert_allclose(
        np.asarray(out.likelihood.mean), np.asarray(cloud.likelihood.mean)
    )
    np.testing.assert_allclose(np.asarray(out.poses.rot), np.asarray(cloud.poses.rot))


def test_message_log_scan_roundtrip(tmp_path):
    """save/load persists 'scan' records (advertised kind)."""
    from rmcl_tpu.io import msgs as _m
    from rmcl_tpu.io.replay import MessageLog

    log = MessageLog()
    log.add(0.0, "odom", "tf", Transform.identity())
    info = _m.ScanInfo(
        phi_n=2, theta_n=8, phi_min=-0.1, phi_inc=0.2,
        theta_min=-np.pi, theta_inc=np.pi / 4, range_min=0.1, range_max=20.0,
    )
    r = np.linspace(1, 5, 16).astype(np.float32)
    log.add(
        0.1, "scan", "lidar",
        _m.ScanStamped(header=_m.Header(stamp=0.1), info=info,
                       data=_m.RangeData(ranges=r, stamps=r * 0.01)),
    )
    p = str(tmp_path / "log.npz")
    log.save(p)
    back = MessageLog.load(p)
    recs = list(back)
    assert [x.kind for x in recs] == ["odom", "scan"]
    sc = recs[1].payload
    assert sc.info.theta_n == 8 and sc.info.phi_n == 2
    np.testing.assert_allclose(sc.data.ranges, r)
    np.testing.assert_allclose(sc.data.stamps, r * 0.01)


def test_param_tree_isolation():
    """Derived trees never alias the parent's nested dicts."""
    from rmcl_tpu.config.tree import ParamTree

    base = ParamTree({"sensors": {"lidar": {"weight": 1.0}}})
    sub = base.subtree("sensors")
    sub.set("lidar.weight", 9.0)
    assert base.get("sensors.lidar.weight") == 1.0
    merged = base.merged(ParamTree({"x": 1}))
    merged.set("sensors.lidar.weight", 5.0)
    assert base.get("sensors.lidar.weight") == 1.0


def test_param_tree_from_yaml_missing_file():
    import pytest

    from rmcl_tpu.config.tree import ParamTree

    with pytest.raises(FileNotFoundError):
        ParamTree.from_yaml("configs/typo_name.yaml")


def test_suggest_budgets_safe_and_tight():
    """utils.tune.suggest_budgets: recommended budgets never lose geometry
    (binned cast with them matches the exact engine) and carry sane
    diagnostics."""
    import numpy as np
    import jax.numpy as jnp

    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.geom.mesh import make_room_scene
    from rmcl_tpu.ops.raycast import cast_rays
    from rmcl_tpu.ops.raycast_binned import cast_rays_binned
    from rmcl_tpu.utils.tune import suggest_budgets

    mesh = make_room_scene(n_pillars=5, seed=6)
    bins = build_bins(mesh, bin_size=16, bins_per_super=32, bins_per_mid=8)
    bvh = build_bvh(mesh)

    rng = np.random.default_rng(0)
    d = rng.normal(size=(2048, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = rng.uniform([-4, -3, 0.3], [4, 3, 2.5], (2048, 3)).astype(np.float32)

    rec = suggest_budgets(bins, jnp.asarray(o), jnp.asarray(d))
    assert not rec.saturated
    assert rec.c_bin >= rec.max_bins
    assert 0 < rec.mean_bins <= rec.p99_bins <= rec.max_bins
    kw = rec.as_config_kwargs()
    assert set(kw) == {"c_super", "c_bin", "c_mid"}

    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    binned = cast_rays_binned(
        bins, jnp.asarray(o), jnp.asarray(d),
        c_super=rec.c_super, c_bin=rec.c_bin, c_mid=rec.c_mid,
    )
    mism = (np.asarray(binned.hit) != np.asarray(exact.hit)).mean()
    assert mism == 0.0, mism
    both = np.asarray(binned.hit)
    np.testing.assert_allclose(
        np.asarray(binned.t)[both], np.asarray(exact.t)[both],
        rtol=1e-4, atol=1e-4,
    )

    # block-granular subsampling path
    rec2 = suggest_budgets(
        bins, jnp.asarray(o), jnp.asarray(d), max_sample_blocks=4
    )
    assert rec2.c_bin > 0
