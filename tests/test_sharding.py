"""Multi-device tests on the virtual 8-device CPU mesh.

Validates the P1 (rays) and P2 (particles) sharding mappings of
SURVEY.md §2.10: sharded results must match single-device results (exactly
for ray-parallel reductions up to float reassociation; statistically for the
per-shard resampling variant).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_room_scene, make_sphere
from rmcl_tpu.math.gaussian import Gaussian1D
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.resampling import ResamplerConfig
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, sensor_update
from rmcl_tpu.micp.pipeline import MICPSensorConfig, MICPSensorData, correct_once
from rmcl_tpu.ops.raycast import cast_rays
from rmcl_tpu.parallel.mesh import make_mesh, put_replicated, put_sharded, shard_rays
from rmcl_tpu.parallel.sharded import (
    psum_likelihood_stats,
    shard_sensor_data,
    sharded_correct_once,
    sharded_gladiator_resample,
    sharded_sensor_update,
)
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_cast_rays_sharded_matches_single(mesh8, rng):
    mesh = make_sphere(48, 48, radius=3.0)
    bvh = build_bvh(mesh)
    n = 4096
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)

    ref = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))

    bvh_r = put_replicated(bvh, mesh8)
    o_s = jax.device_put(jnp.asarray(o), shard_rays(mesh8))
    d_s = jax.device_put(jnp.asarray(d), shard_rays(mesh8))
    out = cast_rays(bvh_r, o_s, d_s, chunk_size=n)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.prim_id), np.asarray(ref.prim_id))


def test_sharded_correct_once_matches_single(mesh8):
    bvh = build_bvh(make_room_scene(n_pillars=3, seed=4))
    model = SphericalModel.create(
        width=256, height=8, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )
    true_pose = Transform.from_pose_tuple(jnp.asarray([0.4, -0.2, 1.0, 0, 0, 0.3]))
    hits = simulate(bvh, model, true_pose)
    sensor = MICPSensorData(
        model=model,
        points=hits.point,
        mask=hits.hit,
        tsb=Transform.identity(),
        config=MICPSensorConfig.create(max_dist=2.0),
    )
    tom = true_pose @ Transform.from_pose_tuple(jnp.asarray([0.08, -0.05, 0.04, 0, 0, 0.04]))
    tbo = Transform.identity()

    tom_ref, stats_ref = correct_once(bvh, [sensor], tom, tbo, jnp.float32(0.0))

    sensors_s = shard_sensor_data([sensor], mesh8)
    tom_s, stats_s = sharded_correct_once(
        bvh, sensors_s, put_replicated(tom, mesh8), put_replicated(tbo, mesh8),
        jnp.float32(0.0), mesh8,
    )
    np.testing.assert_allclose(np.asarray(tom_s.trans), np.asarray(tom_ref.trans), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tom_s.rot), np.asarray(tom_ref.rot), atol=1e-4)
    np.testing.assert_allclose(
        float(stats_s.valid_matches), float(stats_ref.valid_matches), rtol=1e-5
    )


def test_sharded_sensor_update_matches_single(mesh8, key):
    bvh = build_bvh(make_room_scene(n_pillars=2, seed=9))
    true_pose = Transform.from_pose_tuple(jnp.asarray([0.0, 0.0, 1.0, 0, 0, 0]))
    model = SphericalModel.create(width=128, height=4, phi_min=-0.2, phi_max=0.2, range_max=30.0)
    hits = simulate(bvh, model, true_pose)

    n = 1024
    rng = np.random.default_rng(0)
    trans = rng.uniform([-3, -2, 0.8], [3, 2, 1.2], (n, 3)).astype(np.float32)
    cloud = ParticleCloud.create(n).with_poses(
        Transform.from_xyz_euler(jnp.asarray(trans), jnp.zeros((n, 3)))
    )
    cfg = SensorUpdateConfig.create(samples=32, dist_sigma=0.5)

    ref = sensor_update(bvh, cloud, key, hits.point, hits.hit, Transform.identity(), cfg)

    cloud_s = put_sharded(cloud, mesh8)
    out = sharded_sensor_update(
        bvh, cloud_s, key, hits.point, hits.hit, Transform.identity(), cfg, mesh8
    )
    np.testing.assert_allclose(
        np.asarray(out.likelihood.mean), np.asarray(ref.likelihood.mean), rtol=2e-4, atol=1e-6
    )


@pytest.mark.slow
def test_sharded_gladiator_mixes_across_shards(mesh8, key, rng):
    n = 2048
    # one super-strong hypothesis lives in shard 0; exchange must let it
    # spread to other shards over repeated resampling
    w = np.full(n, 0.01, np.float32)
    w[3] = 10.0
    trans = rng.normal(size=(n, 3)).astype(np.float32)
    cloud = ParticleCloud.create(n).with_poses(
        Transform.from_xyz_euler(jnp.asarray(trans), jnp.zeros((n, 3)))
    )
    cloud = dataclasses.replace(
        cloud,
        likelihood=Gaussian1D(
            mean=jnp.asarray(w), sigma=jnp.zeros(n), n_meas=jnp.full(n, 10.0)
        ),
    )
    cloud_s = put_sharded(cloud, mesh8)
    cfg = ResamplerConfig.create(min_noise_t=(0.001, 0.001, 0.001), min_noise_r=(1e-4, 1e-4, 1e-4))
    k = key
    for i in range(16):
        k, sub = jax.random.split(k)
        cloud_s = sharded_gladiator_resample(cloud_s, sub, cfg, mesh8)
    x_target = trans[3, 0]
    frac_near = float(jnp.mean(jnp.abs(cloud_s.poses.trans[:, 0] - x_target) < 0.1))
    assert frac_near > 0.5, frac_near  # strong hypothesis dominates the cloud
    # and it must have reached the other shards (ring is one hop per round)
    second_half = np.asarray(cloud_s.poses.trans[n // 2 :, 0])
    assert (np.abs(second_half - x_target) < 0.1).mean() > 0.2


def test_psum_likelihood_stats(mesh8, rng):
    n = 512
    w = rng.random(n).astype(np.float32)
    cloud = ParticleCloud.create(n)
    cloud = dataclasses.replace(
        cloud,
        likelihood=Gaussian1D(mean=jnp.asarray(w), sigma=jnp.zeros(n), n_meas=jnp.ones(n)),
    )
    s, m = psum_likelihood_stats(put_sharded(cloud, mesh8), mesh8)
    np.testing.assert_allclose(float(s), w.sum(), rtol=1e-5)
    np.testing.assert_allclose(float(m), w.max(), rtol=1e-6)


def test_sharded_sensor_update_binned_engine(mesh8, key):
    """The dense binned engine runs under shard_map (particles sharded,
    bins replicated) and matches the single-device result."""
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.geom.mesh import make_room_scene

    mesh_geo = make_room_scene(n_pillars=2, seed=4)
    bvh = build_bvh(mesh_geo)
    bins = build_bins(mesh_geo, bin_size=32, bins_per_super=8)
    true_pose = Transform.from_pose_tuple(jnp.asarray([0.3, -0.2, 1.0, 0, 0, 0.2]))
    model = SphericalModel.create(
        width=90, height=4, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )
    hits = simulate(bvh, model, true_pose)

    n = 64 * 8
    rng = np.random.default_rng(2)
    trans = rng.uniform([-4, -3, 0.5], [4, 3, 1.5], (n, 3)).astype(np.float32)
    yaw = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    poses = Transform.from_xyz_euler(
        jnp.asarray(trans),
        jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.asarray(yaw)], -1),
    )
    cloud = ParticleCloud.create(n).with_poses(poses)
    cfg = SensorUpdateConfig.create(
        samples=16, engine="binned", c_super=48, c_bin=256
    )

    ref = sensor_update(bins, cloud, key, hits.point, hits.hit, Transform.identity(), cfg)
    out = sharded_sensor_update(
        bins, put_sharded(cloud, mesh8), key, hits.point, hits.hit,
        Transform.identity(), cfg, mesh8,
    )
    np.testing.assert_allclose(
        np.asarray(out.likelihood.mean),
        np.asarray(ref.likelihood.mean),
        rtol=1e-4,
        atol=1e-6,
    )


def test_sharded_correct_once_binned_engine(mesh8):
    """MICP correction over TriangleBins under auto-SPMD (rays sharded,
    bins replicated) converges like the single-device path."""
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.geom.mesh import make_room_scene
    from rmcl_tpu.micp.pipeline import MICPSensorConfig, MICPSensorData
    from rmcl_tpu.parallel.sharded import shard_sensor_data, sharded_correct_once

    geo = make_room_scene(n_pillars=2, seed=4)
    bvh = build_bvh(geo)
    bins = build_bins(geo, bin_size=32, bins_per_super=8)
    model = SphericalModel.create(
        width=128, height=8, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )
    true_pose = Transform.from_pose_tuple(jnp.asarray([0.3, -0.2, 1.0, 0, 0, 0.2]))
    hits = simulate(bvh, model, true_pose)
    sensor = MICPSensorData(
        model=model, points=hits.point, mask=hits.hit,
        tsb=Transform.identity(), config=MICPSensorConfig.create(max_dist=1.0),
    )
    sensors_s = shard_sensor_data([sensor], mesh8)
    tom = put_replicated(
        Transform.from_xyz_euler(jnp.asarray([0.05, -0.04, 0.03]), jnp.zeros(3)),
        mesh8,
    )
    tbo = put_replicated(true_pose, mesh8)
    for _ in range(3):
        tom, stats = sharded_correct_once(
            bins, sensors_s, tom, tbo, jnp.float32(0.0), mesh8
        )
    err = float(jnp.linalg.norm((tom @ tbo).trans - true_pose.trans))
    assert err < 1e-3, err


@pytest.mark.slow
def test_sharded_mcl_full_loop_converges(mesh8, key):
    """The COMPLETE MCL loop composes under particle sharding: sharded
    global init -> motion update (auto-partitioned elementwise) ->
    sharded sensor update -> sharded gladiator resample -> stats induction
    (auto-partitioned reductions). Converges like the single-device loop
    and the cloud stays sharded across iterations."""
    from rmcl_tpu.math.stats import sample_pose_uniform
    from rmcl_tpu.mcl.motion import MotionUpdateConfig, motion_update
    from rmcl_tpu.mcl.stats import estimate_stats

    world = make_room_scene(n_pillars=4, seed=1)
    bvh = build_bvh(world)
    model = SphericalModel.create(width=180, height=8, range_max=25.0)
    true_pose = Transform.from_pose_tuple(
        jnp.asarray([1.2, -0.8, 1.0, 0.0, 0.0, 0.7])
    )
    scan = simulate(bvh, model, true_pose)

    n = 2048
    poses = sample_pose_uniform(
        jax.random.PRNGKey(1),
        jnp.asarray([-5, -4, 0.5, 0, 0, -np.pi], jnp.float32),
        jnp.asarray([5, 4, 1.5, 0, 0, np.pi], jnp.float32),
        n,
    )
    cloud = put_sharded(
        ParticleCloud.create(n).with_poses(poses), mesh8
    )
    bvh_r = put_replicated(bvh, mesh8)
    tsb = put_replicated(Transform.identity(), mesh8)
    mcfg = MotionUpdateConfig.create()
    scfg = SensorUpdateConfig.create(samples=48, dist_sigma=0.4)
    rcfg = ResamplerConfig.create()

    # per-shard duels + one ring hop per round mix slower than the global
    # gladiator: ~24 rounds to convergence (vs ~15 single-device)
    for step in range(30):
        k1, k2 = jax.random.split(jax.random.fold_in(key, step))
        cloud = motion_update(cloud, Transform.identity(), jnp.float32(0.1), mcfg)
        cloud = sharded_sensor_update(
            bvh_r, cloud, k1, scan.point, scan.hit, tsb, scfg, mesh8
        )
        cloud = sharded_gladiator_resample(cloud, k2, rcfg, mesh8)

    # still sharded after the whole loop (no silent full replication)
    assert len(cloud.likelihood.mean.sharding.device_set) == 8

    est = estimate_stats(cloud)
    err = np.linalg.norm(np.asarray(est.pose.trans) - np.asarray(true_pose.trans))
    assert err < 0.15, err


@pytest.mark.slow
def test_gladiator_mixing_time_doubling_schedule(mesh8, key, rng):
    """Mixing-time comparison (VERDICT r1 #7): ticks until the strong
    hypothesis dominates EVERY shard, for the global tournament vs the
    sharded one under the doubling exchange schedule. The schedule must
    keep 8-shard mixing within ~1.5x of global (+ the log2(n_shards) ring
    latency)."""
    from rmcl_tpu.mcl.resampling import gladiator_resample
    from rmcl_tpu.parallel.sharded import gladiator_mixing_shifts

    n = 1024
    w = np.full(n, 0.01, np.float32)
    w[3] = 10.0  # the strong hypothesis lives in shard 0
    trans = rng.normal(size=(n, 3)).astype(np.float32)
    x_target = trans[3, 0]

    def fresh_cloud():
        cloud = ParticleCloud.create(n).with_poses(
            Transform.from_xyz_euler(jnp.asarray(trans), jnp.zeros((n, 3)))
        )
        return dataclasses.replace(
            cloud,
            likelihood=Gaussian1D(
                mean=jnp.asarray(w), sigma=jnp.zeros(n),
                n_meas=jnp.full(n, 10.0),
            ),
        )

    cfg = ResamplerConfig.create(
        min_noise_t=(0.001, 0.001, 0.001), min_noise_r=(1e-4, 1e-4, 1e-4)
    )

    def shard_domination(cloud):
        """Min over shards of the fraction near the strong hypothesis."""
        x = np.asarray(cloud.poses.trans[:, 0]).reshape(8, -1)
        return (np.abs(x - x_target) < 0.1).mean(axis=1).min()

    max_ticks = 14

    def ticks_to_dominate(step):
        cloud, k = fresh_cloud(), key
        for t in range(max_ticks):
            k, sub = jax.random.split(k)
            cloud = step(cloud, sub, t)
            if shard_domination(cloud) > 0.5:
                return t + 1
        return max_ticks + 1

    t_global = ticks_to_dominate(
        lambda c, k, t: gladiator_resample(c, k, cfg)
    )
    cloud0 = put_sharded(fresh_cloud(), mesh8)

    def sharded_step(c, k, t):
        return sharded_gladiator_resample(
            c, k, cfg, mesh8, shifts=gladiator_mixing_shifts(t, 8)
        )

    t_sharded = ticks_to_dominate(sharded_step)
    # doubling ring: log2(8) = 3 extra hops at most on top of the global
    # tournament's dominance-growth time
    assert t_sharded <= np.ceil(1.5 * t_global) + 3, (t_global, t_sharded)
    assert t_global <= max_ticks  # sanity: the metric itself converges


@pytest.mark.slow
def test_sharded_dynamic_residual_counts(mesh8, key, rng):
    """Sharded dynamic-count resampling: the global live budget lands as
    weight-proportional per-shard prefixes summing exactly to n_target."""
    from rmcl_tpu.parallel.sharded import sharded_residual_resample_dynamic

    n = 1024  # 8 shards x 128
    w = rng.random(n).astype(np.float32)
    w[: n // 8] *= 10.0  # shard 0 holds ~10x the mass
    trans = rng.normal(size=(n, 3)).astype(np.float32)
    cloud = ParticleCloud.create(n).with_poses(
        Transform.from_xyz_euler(jnp.asarray(trans), jnp.zeros((n, 3)))
    )
    cloud = dataclasses.replace(
        cloud,
        likelihood=Gaussian1D(
            mean=jnp.asarray(w), sigma=jnp.zeros(n), n_meas=jnp.ones(n)
        ),
    )
    cloud_s = put_sharded(cloud, mesh8)
    cfg = ResamplerConfig.create()
    out = sharded_residual_resample_dynamic(
        cloud_s, key, cfg, jnp.int32(400), mesh8
    )
    alive = np.asarray(out.alive).reshape(8, -1)
    counts = alive.sum(axis=1)
    assert counts.sum() == 400
    # every shard's live set is a compacted prefix
    for s in range(8):
        assert alive[s, : counts[s]].all()
        assert not alive[s, counts[s]:].any()
    # shard 0 (10x mass) gets by far the largest share (capped at its
    # 128-slot capacity; the overflow spills to the other shards)
    assert counts[0] == 128
    # grow-to-capacity distributes everything
    out2 = sharded_residual_resample_dynamic(
        cloud_s, key, cfg, jnp.int32(n), mesh8
    )
    assert int(np.asarray(out2.alive).sum()) == n


def test_sharded_correct_once_umeyama_and_multisensor(mesh8):
    """Packed-psum path parity for the umeyama solver and a 2-sensor
    (RC + CP) rig — the raw-moment monoid and per-sensor weights must
    reproduce the single-device merge (VERDICT r3 #4)."""
    from rmcl_tpu.micp.pipeline import MICPConfig

    bvh = build_bvh(make_room_scene(n_pillars=3, seed=4))
    model = SphericalModel.create(
        width=256, height=8, phi_min=-0.3, phi_max=0.2, range_max=30.0
    )
    true_pose = Transform.from_pose_tuple(jnp.asarray([0.4, -0.2, 1.0, 0, 0, 0.3]))
    hits = simulate(bvh, model, true_pose)
    s_rc = MICPSensorData(
        model=model, points=hits.point, mask=hits.hit,
        tsb=Transform.identity(),
        config=MICPSensorConfig.create(max_dist=2.0, weight=1.0),
    )
    s_cp = MICPSensorData(
        model=model, points=hits.point, mask=hits.hit,
        tsb=Transform.from_pose_tuple(jnp.asarray([0.05, 0.0, 0.1, 0, 0, 0])),
        config=MICPSensorConfig.create(max_dist=2.0, weight=0.5, corr_type="CP"),
    )
    tom = true_pose @ Transform.from_pose_tuple(
        jnp.asarray([0.08, -0.05, 0.04, 0, 0, 0.04])
    )
    tbo = Transform.identity()

    for cfg, sensors in (
        (MICPConfig(solver="umeyama"), [s_rc]),
        (MICPConfig(), [s_rc, s_cp]),
    ):
        tom_ref, stats_ref = correct_once(
            bvh, sensors, tom, tbo, jnp.float32(0.0), config=cfg
        )
        sensors_s = shard_sensor_data(sensors, mesh8)
        tom_s, stats_s = sharded_correct_once(
            bvh, sensors_s, put_replicated(tom, mesh8),
            put_replicated(tbo, mesh8), jnp.float32(0.0), mesh8, config=cfg,
        )
        np.testing.assert_allclose(
            np.asarray(tom_s.trans), np.asarray(tom_ref.trans), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(tom_s.rot), np.asarray(tom_ref.rot), atol=1e-4
        )
        np.testing.assert_allclose(
            float(stats_s.valid_matches), float(stats_ref.valid_matches),
            rtol=1e-4,
        )


def test_sharded_correct_once_collective_budget(mesh8):
    """The packed design's contract: K+1 all-reduces per correction
    (one packed psum per GN iteration + one final stats pack), not the
    ~16 rendezvous auto-SPMD used to insert (VERDICT r3 #4)."""
    import re

    from rmcl_tpu.micp.pipeline import MICPConfig
    from rmcl_tpu.parallel.sharded import _correct_once_shmap

    bvh = build_bvh(make_room_scene(n_pillars=2, seed=1))
    model = SphericalModel.create(
        width=64, height=4, phi_min=-0.2, phi_max=0.2, range_max=30.0
    )
    hits = simulate(bvh, model, Transform.identity())
    sensor = MICPSensorData(
        model=model, points=hits.point, mask=hits.hit,
        tsb=Transform.identity(), config=MICPSensorConfig.create(max_dist=2.0),
    )
    sensors_s = shard_sensor_data([sensor], mesh8)
    for k in (5, 2):
        f = _correct_once_shmap(
            mesh8, MICPConfig(optimization_iterations=k), 1 << 30, 1
        )
        hlo = f.lower(
            put_replicated(bvh, mesh8), tuple(sensors_s),
            put_replicated(Transform.identity(), mesh8),
            put_replicated(Transform.identity(), mesh8), jnp.float32(0.0),
        ).compile().as_text()
        n_ar = len(re.findall(r"\ball-reduce\b", hlo))
        assert n_ar == k + 1, (k, n_ar)


def test_sharded_backward_matches_single_and_collective_budget(mesh8):
    """Sharded value_and_grad over poses/vertices (north-star backward
    clause): must match the single-device gradients and spend exactly ONE
    all-reduce per evaluation (loss packed with the gradient)."""
    import re

    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.geom.mesh import make_sphere
    from rmcl_tpu.ops.diff import cast_rays_diff
    from rmcl_tpu.parallel.diff_sharded import sharded_range_value_and_grad
    from rmcl_tpu.parallel.mesh import shard_rays

    mesh_g = make_sphere(48, 48, radius=5.0)
    bins = build_bins(mesh_g, bin_size=64, bins_per_super=16)
    verts = jnp.asarray(mesh_g.vertices, jnp.float32)
    faces = jnp.asarray(mesh_g.faces, jnp.int32)
    rng = np.random.default_rng(0)
    n_poses, n_dirs = 4, 256
    trans = jnp.asarray(rng.uniform(-1, 1, (n_poses, 3)), jnp.float32)
    d = rng.normal(size=(n_poses * n_dirs, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d)
    pose_id = jnp.repeat(jnp.arange(n_poses, dtype=jnp.int32), n_dirs)

    def loss_ref(trans, verts):
        o = jnp.take(trans, pose_id, axis=0)
        h = cast_rays_diff(bins, verts, faces, o, dirs)
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    dirs_s = jax.device_put(dirs, shard_rays(mesh8))
    pid_s = jax.device_put(pose_id, shard_rays(mesh8))

    for wrt, argnum in (("pose", 0), ("verts", 1)):
        l_ref, g_ref = jax.value_and_grad(loss_ref, argnums=argnum)(
            trans, verts)
        l_s, g_s = sharded_range_value_and_grad(
            bins, verts, faces, trans, dirs_s, pid_s, mesh8, wrt=wrt)
        np.testing.assert_allclose(float(l_s), float(l_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_ref), rtol=2e-4, atol=1e-5)

    from rmcl_tpu.parallel.diff_sharded import _svg

    hlo = _svg.lower(
        bins, verts, faces, trans, dirs_s, pid_s, mesh8, "pose", ()
    ).compile().as_text()
    n_ar = len(re.findall(r"\ball-reduce\b", hlo))
    assert n_ar == 1, n_ar


def test_sharded_mcl_collective_budget(mesh8, key):
    """Collective-budget pin for the sharded MCL path (VERDICT r4 #8c):
    the sensor update is purely shard-local (ZERO collectives), the
    gladiator exchange is ONE packed collective-permute per shift, and
    the dynamic residual share split is ONE all-gather."""
    import re

    from rmcl_tpu.parallel.sharded import sharded_residual_resample_dynamic

    def counts(jitted, *args):
        hlo = jitted.lower(*args).compile().as_text()
        return {
            kind: len(re.findall(rf"\b{kind}\b", hlo))
            for kind in ("all-reduce", "all-gather", "collective-permute")
        }

    n = 1024
    cloud = ParticleCloud.create(n)
    cloud_s = put_sharded(cloud, mesh8)
    cfg = ResamplerConfig.create()

    bvh = build_bvh(make_room_scene(n_pillars=1, seed=3))
    model = SphericalModel.create(
        width=64, height=2, phi_min=-0.1, phi_max=0.1, range_max=30.0
    )
    hits = simulate(bvh, model, Transform.identity())
    scfg = SensorUpdateConfig.create(samples=16, dist_sigma=0.5)
    c = counts(
        jax.jit(
            lambda *a: sharded_sensor_update(*a, config=scfg, mesh=mesh8)
        ),
        bvh, cloud_s, key, hits.point, hits.hit, Transform.identity(),
    )
    assert c == {"all-reduce": 0, "all-gather": 0, "collective-permute": 0}, c

    for shifts in ((1,), (1, 2)):
        c = counts(
            jax.jit(
                lambda cl, k: sharded_gladiator_resample(
                    cl, k, cfg, mesh8, shifts=shifts
                )
            ),
            cloud_s, key,
        )
        assert c["collective-permute"] == len(shifts), (shifts, c)
        assert c["all-reduce"] == 0 and c["all-gather"] == 0, (shifts, c)

    c = counts(
        jax.jit(
            lambda cl, k, nt: sharded_residual_resample_dynamic(
                cl, k, cfg, nt, mesh8
            )
        ),
        cloud_s, key, jnp.int32(n),
    )
    assert c["all-gather"] + c["all-reduce"] == 1, c
    assert c["collective-permute"] == 0, c
