"""MCL full-cycle throughput at 1M particles — the BASELINE.json metric.

Workload: the reference's RMCL defaults (rmcl_localization.cpp:349,384:
max 1M particles, 100 sampled beams per sensor update) on the procedural
building map, converged-tracking regime (the regime where 1M particles
are actually live: position spread 0.2 m, yaw 3 deg — the binned engine
is oracle-exact here, TPU_NOTES MCL audit). One cycle = motion update
(+forget) -> sensor update (1M x 100 = 100M beam rays, scored + folded)
-> gladiator resample -> stats induction.

The sensor stage is chunked over particles (128k/dispatch) to bound the
(N, S, 3) hit-payload memory; every timing region ends in a readback
(TPU_NOTES block_until_ready rule) and every iteration gets fresh keys /
odometry jitter (relay result-cache hazard).

Writes MCL_1M_r05.json. Usage (TPU): python scripts/bench_mcl_1m.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_building_scene
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.math.stats import sample_pose_gaussian
from rmcl_tpu.mcl.motion import MotionUpdateConfig, motion_update
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.resampling import ResamplerConfig, gladiator_resample
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, sensor_update
from rmcl_tpu.mcl.stats import estimate_stats
from rmcl_tpu.ops.raycast_binned import candidate_stats
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate
from rmcl_tpu.utils.timing import sync

N = int(os.environ.get("MCL_N", 1 << 20))  # 1,048,576 >= the reference's 1M cap
SAMPLES = int(os.environ.get("MCL_SAMPLES", 100))
# 256k chunks (4 lax.map steps, not 8): r5 chip A/B 4.76 -> 4.54 s median
CHUNK = int(os.environ.get("MCL_CHUNK", 262144))
SUBDIV = int(os.environ.get("MCL_SUBDIV", 45))
ITERS = int(os.environ.get("MCL_ITERS", 3))
# c_bin 288: covers the capped-reach worst block (262 measured r3);
# budgets are ~free under count-sorted chunks (TPU_NOTES: 96->288 cost 0.9%)
C_BIN = int(os.environ.get("MCL_CBIN", 288))
# c_super 48: cs=24 TRUNCATED at the super level on this workload (r5 find:
# lossless frac 0.828, checksum moved) while the bin audit read clean;
# cs=48 is checksum-converged (== cs=96/cb=768). c_hyper=8 claws back the
# level-0 cost of the doubled super budget (chip: 1156 -> 1123 ms/chunk).
C_SUP = int(os.environ.get("MCL_CSUP", 48))
C_HYP = int(os.environ.get("MCL_CHYP", 8))
BLOCK = int(os.environ.get("MCL_BLOCK", 128))
SUBB = int(os.environ.get("MCL_SUBB", 8))  # r5 @cs=48: sub 8 edges 16 (1147 vs 1160 ms/chunk)


def main():
    mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=SUBDIV, seed=0,
                               door_t=0.5)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16,
                      supers_per_hyper=16)
    print(f"map: {mesh.faces.shape[0]} faces, {bins.n_bins} bins",
          file=sys.stderr)
    model = SphericalModel.vlp16(width=900)
    truth = Transform(rot=jnp.asarray([1.0, 0, 0, 0]),
                      trans=jnp.asarray([3.0, 3.0, 1.2]))
    hits = simulate(bins, model, truth, c_super=24, c_bin=192)
    ranges = jnp.where(hits.hit, hits.t, 0.0)
    points_s = model.polar_to_cartesian(ranges)
    mask = hits.hit
    tsb = Transform.identity()

    key = jax.random.PRNGKey(0)
    cov = jnp.diag(jnp.asarray(
        [0.04, 0.04, 0.01, 1e-4, 1e-4, 3e-3], jnp.float32))  # 0.2m / ~3deg
    key, k1 = jax.random.split(key)
    poses = sample_pose_gaussian(k1, truth, cov, N)
    cloud = ParticleCloud.create(N).with_poses(poses)

    # cluster=True: measured NECESSARY even in the converged regime —
    # without the Morton(+heading) sort the audit counts rise 51 -> 82
    # mean (beam-major blocks lose their heading tightness) and the cycle
    # is ~25% slower (r4 chip A/B: 7.8 s clustered vs 10.7 s not)
    scfg = SensorUpdateConfig.create(
        samples=SAMPLES, engine="binned",
        cluster=os.environ.get("MCL_CLUSTER", "1") == "1",
        c_super=C_SUP, c_bin=C_BIN, c_hyper=C_HYP, range_max=30.0,
        dist_sigma=0.4, block_size=BLOCK, sub_blocks=SUBB,
    )
    mcfg = MotionUpdateConfig.create()
    rcfg = ResamplerConfig.create()

    # budget audit on the real distribution (lossless evidence): sampled
    # beams from clustered particles, counts must stay under c_bin
    key, kp = jax.random.split(key)
    from rmcl_tpu.mcl.sensor_update import probe_update_rays
    o_p, d_p, t_p = probe_update_rays(
        jax.tree_util.tree_map(lambda x: x[:65536], cloud), kp,
        points_s, mask, tsb, scfg)
    # audit through the engine's REAL fused cull at the run's own config:
    # `sat` catches truncation at EVERY level (candidate_stats' bin counts
    # were blind to c_super truncation — the r5 cs=24 find)
    from rmcl_tpu.ops.raycast_binned import block_cull_stats
    counts, sat = (np.asarray(x) for x in block_cull_stats(
        bins, o_p, d_p, t_max=t_p, block_size=BLOCK, c_super=C_SUP,
        c_bin=C_BIN, sub_blocks=SUBB, c_hyper=C_HYP))
    sat_frac = float(sat.mean())
    print(f"audit: candidates/block mean {counts.mean():.1f} "
          f"max {counts.max()} (budget {C_BIN}); saturated blocks "
          f"{sat_frac:.2%}", file=sys.stderr)
    if sat_frac > 0:
        print("WARNING: budgets truncate — the run is NOT lossless",
              file=sys.stderr)

    # jitted stages; sensor update lax.map'd over particle chunks to bound
    # the (chunk, S) hit-payload memory
    if N % CHUNK:
        raise SystemExit(f"MCL_N={N} must be a multiple of MCL_CHUNK={CHUNK}")
    n_chunks = N // CHUNK

    from rmcl_tpu.mcl.sensor_update import sample_beams

    from rmcl_tpu.ops.order import cluster_order

    @jax.jit
    def cycle(cloud, key, delta_t):
        delta = Transform(rot=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                          trans=delta_t)
        cloud = motion_update(cloud, delta, jnp.float32(0.05), mcfg)
        k_s, k_r = jax.random.split(key)

        # GLOBAL Morton+heading clustering, once per cycle: the cloud is a
        # multiset (resampling/stats are order-free), so permanently
        # reordering it is semantically free — and 1M-wide clustering
        # makes every chunk's blocks ~8x denser than the per-chunk sorts
        # it replaces (one 1M argsort vs n_chunks x 131k argsorts)
        fw = cloud.poses.rotate(jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
        order, _ = cluster_order(cloud.poses.trans, fw)
        cloud = jax.tree_util.tree_map(
            lambda x: jnp.take(x, order, axis=0), cloud)

        # ONE beam sample per update, shared by every particle chunk —
        # reference semantics (each sampled beam is broadcast to ALL
        # particles, PCDSensorUpdaterEmbree.cpp:330-341) and one
        # sample_beams instead of n_chunks (r4 phase split: 114 ms/chunk)
        beams = sample_beams(k_s, points_s, mask, SAMPLES)

        scfg_nc = dataclasses.replace(scfg, cluster=False)

        def upd_chunk(args):
            sub, kc = args
            return sensor_update(bins, sub, kc, points_s, mask, tsb,
                                 scfg_nc, beams=beams)

        subs = jax.tree_util.tree_map(
            lambda x: x.reshape((n_chunks, CHUNK) + x.shape[1:]), cloud)
        keys = jax.random.split(k_s, n_chunks)
        out = jax.lax.map(upd_chunk, (subs, keys))
        cloud = jax.tree_util.tree_map(
            lambda x: x.reshape((N,) + x.shape[2:]), out)
        cloud = gladiator_resample(cloud, k_r, rcfg)
        stats = estimate_stats(cloud, max_induction_particles=50_000)
        return cloud, stats

    rng = np.random.default_rng(0)
    times = []
    est_err = None
    for it in range(ITERS + 1):
        key, kc = jax.random.split(key)
        dt_odo = jnp.asarray(rng.normal(0, 0.002, 3), jnp.float32)
        sync((cloud, kc, dt_odo))
        t0 = time.time()
        cloud2, stats = cycle(cloud, kc, dt_odo)
        sync(stats.pose.trans)
        dt = time.time() - t0
        est_err = float(jnp.linalg.norm(
            stats.pose.trans - truth.trans))
        tag = "warm" if it == 0 else f"it{it}"
        print(f"{tag}: cycle {dt:.3f}s  est err {est_err:.4f} m",
              file=sys.stderr)
        if it > 0:
            times.append(dt)
        cloud = cloud2
    # honest steady state: the converging cloud tightens blocks over the
    # first iterations — report the MEDIAN of the last 5 timed cycles
    # (r4b lesson: min-of-few on a cold cloud overstated the rate)
    tail = sorted(times[-5:])
    steady = tail[len(tail) // 2]
    result = {
        "metric": "mcl_full_cycle_particles_per_sec_1M",
        "n_particles": N,
        "samples_per_update": SAMPLES,
        "map_faces": int(mesh.faces.shape[0]),
        "cycle_seconds": round(steady, 3),
        "cycle_seconds_best": round(min(times), 3),
        "particles_per_sec": round(N / steady, 1),
        "beam_rays_per_sec": round(N * SAMPLES / steady, 1),
        "estimate_error_m": round(est_err, 4),
        "audit_candidates_max": int(counts.max()),
        "audit_budget": C_BIN,
        "audit_saturated_frac": sat_frac,
        "c_super": C_SUP, "c_hyper": C_HYP,
        "reference": "1M max particles, 100 beams, motion 50 Hz / resample "
                     "20 Hz timers (rmcl_localization.cpp:349,384)",
    }
    out_path = os.environ.get("MCL_OUT", "/root/repo/MCL_1M_r05.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
