"""Phase split of the 1M-particle MCL cycle (VERDICT r3 #5).

Times, at the bench_mcl_1m config: motion, beam sampling, clustering,
cull (candidate lists), the full binned cast, the full sensor_update
(cast + fold), resample, stats — so the 9.17 s/cycle has an attribution
before any optimization. One chunk (131072 particles) stands in for the
sensor stages (the cycle runs 8 of them under lax.map).

Usage (TPU): python scripts/probe_mcl_phases.py
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax, jax.numpy as jnp
from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_building_scene
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.math.stats import sample_pose_gaussian
from rmcl_tpu.mcl.motion import MotionUpdateConfig, motion_update
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.resampling import ResamplerConfig, gladiator_resample
from rmcl_tpu.mcl.sensor_update import (SensorUpdateConfig, sensor_update,
                                        probe_update_rays, sample_beams)
from rmcl_tpu.mcl.stats import estimate_stats
from rmcl_tpu.ops.order import cluster_order
from rmcl_tpu.ops.raycast_binned import cast_rays_binned
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate
from rmcl_tpu.utils.timing import sync

N = 1 << 20
CHUNK = int(os.environ.get("MCL_CHUNK", 131072))
SAMPLES = 100
SUBDIV = int(os.environ.get("MCL_SUBDIV", 45))
C_BIN = int(os.environ.get("MCL_CBIN", 96))

mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=SUBDIV, seed=0, door_t=0.5)
bins = build_bins(mesh, bin_size=64, bins_per_super=16, supers_per_hyper=16)
print(f"map: {mesh.faces.shape[0]} faces", file=sys.stderr)
model = SphericalModel.vlp16(width=900)
truth = Transform(rot=jnp.asarray([1.0, 0, 0, 0]), trans=jnp.asarray([3.0, 3.0, 1.2]))
hits = simulate(bins, model, truth, c_super=24, c_bin=192)
points_s = model.polar_to_cartesian(jnp.where(hits.hit, hits.t, 0.0))
mask = hits.hit
tsb = Transform.identity()
key = jax.random.PRNGKey(0)
cov = jnp.diag(jnp.asarray([0.04, 0.04, 0.01, 1e-4, 1e-4, 3e-3], jnp.float32))
key, k1 = jax.random.split(key)
cloud = ParticleCloud.create(N).with_poses(sample_pose_gaussian(k1, truth, cov, N))
sub = jax.tree.map(lambda x: x[:CHUNK], cloud)
scfg = SensorUpdateConfig.create(samples=SAMPLES, engine="binned", cluster=True,
                                 c_super=24, c_bin=C_BIN, range_max=30.0, dist_sigma=0.4)
mcfg = MotionUpdateConfig.create(); rcfg = ResamplerConfig.create()

def timeit(tag, f, *a, iters=3):
    out = f(*a); sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); out = f(*a); sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{tag:34s}: {min(ts)*1000:9.1f} ms")
    return min(ts)

delta = Transform(rot=jnp.asarray([1.0, 0, 0, 0], jnp.float32), trans=jnp.asarray([0.01, 0, 0]))
rows = {}
rows["motion_1M"] = timeit("motion_update @1M", jax.jit(lambda c: motion_update(c, delta, jnp.float32(0.05), mcfg)), cloud)
k = jax.random.fold_in(key, 7)
rows["sample_beams"] = timeit("sample_beams", jax.jit(lambda k: sample_beams(k, points_s, mask, SAMPLES)), k)
fw = cloud.poses.rotate(jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
rows["cluster_chunk"] = timeit("cluster_order @chunk", jax.jit(lambda t, f: cluster_order(t, f)), sub.poses.trans[:CHUNK], fw[:CHUNK])

# ray set for one chunk (the real cast's layout)
o_p, d_p, t_p = probe_update_rays(sub, k, points_s, mask, tsb, scfg)
o_p, d_p, t_p = jax.device_put(o_p), jax.device_put(d_p), jax.device_put(t_p)
print(f"chunk rays: {o_p.shape[0]}", file=sys.stderr)

rows["cast_chunk"] = timeit("binned cast @chunk (full)", jax.jit(lambda o, d, t: cast_rays_binned(
    bins, o, d, t_max=t, c_super=24, c_bin=C_BIN).t.sum()), o_p, d_p, t_p)
rows["cast_chunk_occl"] = timeit("binned cast payload=none", jax.jit(lambda o, d, t: cast_rays_binned(
    bins, o, d, t_max=t, c_super=24, c_bin=C_BIN, payload=False).t.sum()), o_p, d_p, t_p)
rows["sensor_update_chunk"] = timeit("sensor_update @chunk", jax.jit(lambda s, k: sensor_update(
    bins, s, k, points_s, mask, tsb, scfg).likelihood.mean.sum()), sub, k)
rows["resample_1M"] = timeit("gladiator_resample @1M", jax.jit(lambda c, k: gladiator_resample(c, k, rcfg)), cloud, k)
rows["stats_1M"] = timeit("estimate_stats @1M", jax.jit(lambda c: estimate_stats(c)), cloud)

est = rows["motion_1M"] + 8*rows["sensor_update_chunk"] + rows["resample_1M"] + rows["stats_1M"]
print(f"\nimplied cycle = motion + 8*chunk + resample + stats = {est:.2f} s")
print("PHASES_JSON:" + json.dumps(rows))
