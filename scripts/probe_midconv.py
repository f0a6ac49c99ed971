"""Mid-convergence MCL regime audit (VERDICT r2 #7).

The round-2 audit (TPU_NOTES "MCL binned-engine correctness audit") found
the binned engine weak at 0.5 m / 15 deg spread (corr 0.43 @ cb=96) — but
that predates the per-beam range cap (t_max = range + 6*sigma for real-hit
beams) becoming the default, which collapses the cull wedge's reach from
range_max to a few metres past the expected surface. This re-measures:

  for spread in {0.5m/15deg, 0.3m/8deg, 0.2m/3deg}:
    exact-engine oracle likelihoods (budget-free)
    binned likelihoods at cb in {96, 128, 192, 256}
    -> Pearson corr + per-particle max |dlog|, and the TRUE candidate
       distribution (generous-budget candidate_stats on the capped rays)

CPU (hardware-independent correctness counts):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/probe_midconv.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path[:] = [p for p in sys.path if "/root/.axon_site" not in p]

import numpy as np
import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_building_scene
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.math.stats import sample_pose_gaussian
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import (
    SensorUpdateConfig, probe_update_rays, sensor_update,
)
from rmcl_tpu.ops.raycast_binned import candidate_stats
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate

N = int(os.environ.get("MC_N", 8192))
SAMPLES = int(os.environ.get("MC_SAMPLES", 50))
SUBDIV = int(os.environ.get("MC_SUBDIV", 30))

mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=SUBDIV, seed=0,
                           door_t=0.5)
bins = build_bins(mesh, bin_size=64, bins_per_super=16, supers_per_hyper=16)
bvh = build_bvh(mesh)
print(f"map: {mesh.faces.shape[0]} faces, {bins.n_bins} bins", flush=True)

model = SphericalModel.vlp16(width=360)
truth = Transform(rot=jnp.asarray([1.0, 0, 0, 0]),
                  trans=jnp.asarray([3.0, 3.0, 1.2]))
hits = simulate(bvh, model, truth)
ranges = jnp.where(hits.hit, hits.t, 0.0)
points_s = model.polar_to_cartesian(ranges)
mask = hits.hit
tsb = Transform.identity()

SPREADS = [
    ("0.5m/15deg", 0.25, (15 * np.pi / 180) ** 2),
    ("0.3m/8deg", 0.09, (8 * np.pi / 180) ** 2),
    ("0.2m/3deg", 0.04, (3 * np.pi / 180) ** 2),
]

for tag, pv, yv in SPREADS:
    key = jax.random.PRNGKey(7)
    cov = jnp.diag(jnp.asarray([pv, pv, 0.01, 1e-4, 1e-4, yv], jnp.float32))
    key, k1, k2 = jax.random.split(key, 3)
    poses = sample_pose_gaussian(k1, truth, cov, N)
    cloud = ParticleCloud.create(N).with_poses(poses)

    cfg_e = SensorUpdateConfig.create(samples=SAMPLES, engine="bvh",
                                      dist_sigma=0.4, range_max=30.0)
    out_e = sensor_update(bvh, cloud, k2, points_s, mask, tsb, cfg_e)
    ref = np.asarray(out_e.likelihood.mean)

    # true candidate distribution at the capped reach
    cfg_probe = SensorUpdateConfig.create(
        samples=SAMPLES, engine="binned", cluster=True, dist_sigma=0.4,
        range_max=30.0)
    o_p, d_p, t_p = probe_update_rays(cloud, k2, points_s, mask, tsb,
                                      cfg_probe)
    counts = np.asarray(candidate_stats(bins, o_p, d_p, t_max=t_p,
                                        c_super=128, c_bin=1024))
    print(f"[{tag}] true candidates: mean {counts.mean():.1f} "
          f"p95 {np.percentile(counts, 95):.0f} "
          f"p99 {np.percentile(counts, 99):.0f} max {counts.max()}",
          flush=True)

    for cb in (96, 128, 192, 256):
        cs = max(24, cb // 4)
        cfg_b = SensorUpdateConfig.create(
            samples=SAMPLES, engine="binned", cluster=True,
            c_super=cs, c_bin=cb, dist_sigma=0.4, range_max=30.0)
        out_b = sensor_update(bins, cloud, k2, points_s, mask, tsb, cfg_b)
        lb = np.asarray(out_b.likelihood.mean)
        corr = float(np.corrcoef(ref, lb)[0, 1])
        dlog = np.abs(np.log(np.maximum(lb, 1e-12))
                      - np.log(np.maximum(ref, 1e-12)))
        print(f"[{tag}] cb={cb:4d} cs={cs}: corr {corr:.4f}  "
              f"max|dlog| {dlog.max():.3f}  p99|dlog| "
              f"{np.percentile(dlog, 99):.3f}", flush=True)
