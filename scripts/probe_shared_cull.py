"""Shared per-beam cull feasibility for the converged MCL regime (r5).

Today the binned MCL cast culls EVERY 128-ray block (819k block culls per
1M-particle update) — measured 181 ms of a 1053 ms chunk cast (17%).
For a CONVERGED cloud, one conservative bound covers every particle:
  origin box  = AABB of all particle sensor origins
  cone        = axis R_mean*d_j, half-angle = max rotation angle of any
                particle quaternion to the mean (covers R_i*d_j for all i)
so the cull can run ONCE PER SAMPLED BEAM (100 culls/update, shared by
every block and chunk). Exactness contract unchanged: conservative
superset candidates; only budget truncation can lose geometry.

This probe (CPU — counts are hardware-independent) compares, at the 1M
bench regime (0.2 m / 3 deg cloud):
  per-block counts (the shipped cull, sub=16)     vs
  per-beam shared-cone counts (the proposed cull)
and reports the pair-work inflation + budget needs.

Usage: PYTHONPATH=/root/repo python scripts/probe_shared_cull.py
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
from rmcl_tpu.math.stats import sample_pose_gaussian
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import (
    SensorUpdateConfig,
    probe_update_rays,
    sample_beams,
)
from rmcl_tpu.ops.raycast_binned import _chunk_candidates
from rmcl_tpu.sensors.models import RangeInterval, SphericalModel
from rmcl_tpu.sensors.simulate import simulate
from rmcl_tpu.utils.timing import sync

N = int(os.environ.get("SC_N", 65536))
SAMPLES = int(os.environ.get("SC_SAMPLES", 100))
SUBDIV = int(os.environ.get("SC_SUBDIV", 45))
CB_TRUE = 4096
SPREAD = float(os.environ.get("SC_SPREAD", 0.2))  # m
YAW = float(os.environ.get("SC_YAW", 3.0))  # deg


def shared_beam_counts(bins, cloud, tsb, dirs_s, tmax_s):
    """Per-beam candidate counts from ONE conservative cloud bound."""
    tsm = cloud.poses @ tsb
    o = tsm.trans  # (N, 3) sensor origins
    o_lo, o_hi = jnp.min(o, axis=0), jnp.max(o, axis=0)
    oc1 = 0.5 * (o_lo + o_hi)
    oh1 = 0.5 * (o_hi - o_lo)
    # mean quaternion (sign-aligned to the first) + max angle to it
    q = tsm.rot
    q = jnp.where(jnp.sum(q * q[0:1], -1, keepdims=True) < 0, -q, q)
    qm = jnp.mean(q, axis=0)
    qm = qm / jnp.maximum(jnp.linalg.norm(qm), 1e-12)
    cos_half = jnp.clip(jnp.abs(jnp.sum(q * qm[None], -1)), 0.0, 1.0)
    theta_max = 2.0 * jnp.arccos(jnp.min(cos_half))
    tan_th = jnp.tan(jnp.minimum(theta_max, 1.4))
    rm = Transform(rot=qm, trans=jnp.zeros(3))
    axes = rm.rotate(dirs_s)  # (S, 3) mean-frame beam dirs

    S = dirs_s.shape[0]
    cs = min(48, bins.n_super)
    cb = min(CB_TRUE, bins.n_bins, cs * bins.bins_per_super)

    def bounds_fn(r):
        assert r == 1
        oc = jnp.broadcast_to(oc1, (S, 1, 3))
        oh = jnp.broadcast_to(oh1, (S, 1, 3))
        ax = axes[:, None, :]
        tt = jnp.broadcast_to(tan_th, (S, 1))
        t_hi = tmax_s[:, None]
        n_hi = jnp.ones((S, 1), jnp.float32)
        dead = jnp.zeros((S, 1), bool)
        return oc, oh, ax, tt, t_hi, n_hi, dead

    dummy_o = jnp.zeros((S, 1, 3), jnp.float32)
    dummy_d = jnp.ones((S, 1, 3), jnp.float32)
    dummy_tmin = jnp.zeros((S, 1), jnp.float32)
    dummy_tmax = tmax_s[:, None]
    _, count, _, sat = _chunk_candidates(
        bins, dummy_o, dummy_d, dummy_tmin, dummy_tmax, cs, cb, 1,
        bounds_fn=bounds_fn,
    )
    return np.asarray(count), np.asarray(sat), float(theta_max)


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
    points_s = model.polar_to_cartesian(jnp.where(hits.hit, hits.t, 0.0))
    mask = hits.hit
    tsb = Transform.identity()

    yaw_sig = np.deg2rad(YAW) / 2
    cov = jnp.diag(jnp.asarray(
        [SPREAD**2 / 4, SPREAD**2 / 4, 0.01, 1e-4, 1e-4, yaw_sig**2],
        jnp.float32))
    key = jax.random.PRNGKey(0)
    key, k1 = jax.random.split(key)
    cloud = ParticleCloud.create(N).with_poses(
        sample_pose_gaussian(k1, truth, cov, N))

    scfg = SensorUpdateConfig.create(
        samples=SAMPLES, engine="binned", cluster=True, c_super=24,
        c_bin=288, range_max=30.0, dist_sigma=0.4, block_size=128,
        sub_blocks=16,
    )
    # shipped per-block counts (uncapped)
    key, kp = jax.random.split(key)
    o, d, t_cap = probe_update_rays(cloud, kp, points_s, mask, tsb, scfg)
    n = o.shape[0]
    Rb = 128
    n_blk = n // Rb
    cs = min(48, bins.n_super)
    cb = min(CB_TRUE, bins.n_bins, cs * bins.bins_per_super)

    def block_counts(o, d, t):
        ob = o.reshape(n_blk, Rb, 3)
        db = d.reshape(n_blk, Rb, 3)
        tmin = jnp.zeros((n_blk, Rb), jnp.float32)
        tmax = t.reshape(n_blk, Rb)
        chunk = 256
        n_chunks = n_blk // chunk

        def one(args):
            _, count, _, sat = _chunk_candidates(bins, *args, cs, cb, 16)
            return count, sat

        parts = jax.tree.map(
            lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]),
            (ob, db, tmin, tmax))
        counts, sat = jax.lax.map(one, parts)
        return np.asarray(counts).reshape(-1), np.asarray(sat).reshape(-1)

    blk_counts, blk_sat = block_counts(o, d, t_cap)

    # the SAME beam sample the block path used (probe_update_rays consumed
    # kp identically)
    dirs_s, ranges, valid = sample_beams(kp, points_s, mask, SAMPLES)
    sensor_range = RangeInterval(scfg.range_min, scfg.range_max)
    real_hit = sensor_range.contains(ranges) & valid
    from rmcl_tpu.ops.raycast import NO_HIT_T

    tmax_s = jnp.where(real_hit,
                       ranges + 6.0 * scfg.dist_sigma, jnp.float32(NO_HIT_T))
    beam_counts, beam_sat, theta = shared_beam_counts(
        bins, cloud, tsb, dirs_s, tmax_s)

    # pair-work comparison: block path pays sum(blk_counts)*B*Rb; shared
    # path pays (per beam count) * (N/Rb blocks) * B * Rb
    blocks_per_beam = N // Rb
    pair_blk = blk_counts.sum() * 64 * Rb
    pair_shared = beam_counts.sum() * blocks_per_beam * 64 * Rb
    out = {
        "n_particles": N, "samples": SAMPLES,
        "cloud_spread_m": SPREAD, "yaw_deg": YAW,
        "theta_max_deg": round(np.rad2deg(theta), 2),
        "block_counts": {
            "mean": round(float(blk_counts.mean()), 1),
            "p99": int(np.percentile(blk_counts, 99)),
            "max": int(blk_counts.max()),
            "sat_frac": float(blk_sat.mean()),
        },
        "beam_counts": {
            "mean": round(float(beam_counts.mean()), 1),
            "p99": int(np.percentile(beam_counts, 99)),
            "max": int(beam_counts.max()),
            "sat_frac": float(beam_sat.mean()),
        },
        "pair_inflation": round(float(pair_shared / max(pair_blk, 1)), 3),
    }
    print("SHARED_CULL_JSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
