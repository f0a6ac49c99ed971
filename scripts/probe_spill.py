"""Budget-spill feasibility for the scattered-MCL regime (VERDICT r4 #1).

The kidnap global phase runs the exact traversal at ~5.4 s/update
(131k x 64 = 8.4M rays). The proposal: cast scattered, cluster-ordered
particle-major blocks with the DENSE binned engine at modest budgets and
SPILL saturated blocks (true candidate count > c_bin) into a second round
(bigger budget or the exact engine) — exact by construction.

This probe measures the decision inputs on CPU (counts are hardware
independent): the TRUE per-block candidate-count distribution of the
kidnap scattered workload under the fused sub-block cull, per block size,
with the real per-beam capped reach. From it: certified fractions at
candidate budgets and the modeled pair work of round-1 + spill.

Usage (CPU): PYTHONPATH=/root/repo python scripts/probe_spill.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_building_scene
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.math.stats import sample_pose_uniform
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, probe_update_rays
from rmcl_tpu.ops.raycast_binned import _chunk_candidates
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate

N = int(os.environ.get("SPILL_N", 16384))  # subsample of the 131k seeds
SAMPLES = int(os.environ.get("SPILL_SAMPLES", 64))
SUBDIV = int(os.environ.get("SPILL_SUBDIV", 30))  # the kidnap map
CB_TRUE = 4096  # uncapped audit budget


def counts_for(bins, o, d, t_cap, Rb, sub_blocks, cs=48):
    n = o.shape[0]
    n_pad = (-n) % Rb
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), jnp.float32)], 0)
        d = jnp.concatenate([d, jnp.ones((n_pad, 3), jnp.float32)], 0)
        t_cap = jnp.concatenate([t_cap, jnp.zeros((n_pad,), jnp.float32)], 0)
    n_blk = o.shape[0] // Rb
    ob = o.reshape(n_blk, Rb, 3)
    db = d.reshape(n_blk, Rb, 3)
    tmin = jnp.zeros((n_blk, Rb), jnp.float32)
    tmax = t_cap.reshape(n_blk, Rb)
    chunk = 256
    pad_b = (-n_blk) % chunk
    if pad_b:
        padz = lambda x, f: jnp.concatenate(
            [x, jnp.full((pad_b,) + x.shape[1:], f, x.dtype)], 0)
        ob, db = padz(ob, 0.0), padz(db, 1.0)
        tmin, tmax = padz(tmin, 0.0), padz(tmax, 0.0)
    n_chunks = ob.shape[0] // chunk
    cs_eff = min(cs, bins.n_super)
    cb = min(CB_TRUE, bins.n_bins, cs_eff * bins.bins_per_super)

    def one(args):
        _, count, _, sat = _chunk_candidates(bins, *args, cs_eff, cb, sub_blocks)
        return count, sat

    parts = jax.tree.map(
        lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]),
        (ob, db, tmin, tmax))
    counts, sat = jax.lax.map(one, parts)
    counts = np.asarray(counts).reshape(-1)[:n_blk]
    sat = np.asarray(sat).reshape(-1)[:n_blk]
    return counts, sat


def main():
    mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=SUBDIV, seed=0,
                               door_t=0.5)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16,
                      supers_per_hyper=16)
    print(f"map: {mesh.faces.shape[0]} faces, {bins.n_bins} bins, "
          f"{bins.n_super} supers", file=sys.stderr)
    model = SphericalModel.vlp16(width=360)
    truth = Transform(rot=jnp.asarray([1.0, 0, 0, 0]),
                      trans=jnp.asarray([3.0, 3.0, 1.2]))
    hits = simulate(bins, model, truth, c_super=24, c_bin=192)
    points_s = model.polar_to_cartesian(jnp.where(hits.hit, hits.t, 0.0))
    mask = hits.hit

    lo = mesh.vertices.min(0) + 0.5
    hi = mesh.vertices.max(0) - 0.5
    key = jax.random.PRNGKey(3)
    key, k1 = jax.random.split(key)
    poses = sample_pose_uniform(
        k1,
        (float(lo[0]), float(lo[1]), 0.9, 0.0, 0.0, -np.pi),
        (float(hi[0]), float(hi[1]), 1.5, 0.0, 0.0, np.pi),
        N,
    )
    cloud = ParticleCloud.create(N).with_poses(poses)

    out = {"map_faces": int(mesh.faces.shape[0]), "n_particles": N,
           "samples": SAMPLES, "rows": []}
    for Rb, sub in ((32, 8), (64, 16), (128, 16), (128, 32)):
        scfg = SensorUpdateConfig.create(
            samples=SAMPLES, engine="binned", cluster=True,
            layout="particle", range_max=30.0, dist_sigma=0.4,
            block_size=Rb, sub_blocks=sub,
        )
        key, kp = jax.random.split(key)
        o, d, t_cap = probe_update_rays(cloud, kp, points_s, mask,
                                        Transform.identity(), scfg)
        counts, sat = counts_for(bins, np.asarray(o), np.asarray(d),
                                 np.asarray(t_cap), Rb, sub)
        # `sat` marks upstream (super-level) truncation: those blocks'
        # counts are lower bounds — they spill regardless of cb
        row = {
            "block_size": Rb, "sub_blocks": sub,
            "count_mean": round(float(counts.mean()), 1),
            "count_p50": int(np.percentile(counts, 50)),
            "count_p90": int(np.percentile(counts, 90)),
            "count_p99": int(np.percentile(counts, 99)),
            "count_max": int(counts.max()),
            "sat_upstream_frac": round(float(sat.mean()), 4),
        }
        for cb in (64, 96, 128, 192, 256, 384, 512):
            cert = float(((counts <= cb) & ~sat).mean())
            # round-1 pair work: every block pays min(count, cb) bins;
            # spill blocks re-pay their full count in round 2
            spill = (counts > cb) | sat
            r1 = np.minimum(counts, cb).sum() * 64 * Rb
            r2 = counts[spill].sum() * 64 * Rb
            row[f"cb{cb}"] = {
                "certified_frac": round(cert, 3),
                "round1_Gpairs": round(r1 / 1e9, 2),
                "spill_Gpairs": round(r2 / 1e9, 2),
                "spill_ray_frac": round(float(spill.mean()), 3),
            }
        # full-exact cost reference: count_sum at no budget
        row["unbudgeted_Gpairs"] = round(counts.sum() * 64 * Rb / 1e9, 2)
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
    print("SPILL_JSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
