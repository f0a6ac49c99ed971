"""Cull-vs-intersect split of the MCL binned cast (round 5, VERDICT #2).

The MCL 1M cycle is ~90% binned cast and the cull is re-paid EVERY update
(no cross-correction reuse). Before building per-chunk candidate reuse
into MCL state, measure what the cull actually costs at the shipped
bench_mcl_1m config (BLOCK=128, SUBB=16, cb=288, beam-major): if the cull
is X% of the cast, amortizing it 1/K caps the cycle win at ~0.9*X.

Times, for ONE 131k-particle chunk (13.1M rays):
  cast_full   — cast_rays_binned exactly as sensor_update calls it
  cull_only   — the same blocked rays through _chunk_candidates with the
                cast's own chunking (block_chunk=256, lax.map)

Usage (TPU): python scripts/probe_mcl_cull.py
"""

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
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import (
    SensorUpdateConfig,
    probe_update_rays,
)
from rmcl_tpu.ops.raycast_binned import (
    _chunk_candidates,
    cast_rays_binned,
)
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate
from rmcl_tpu.utils.timing import sync

CHUNK = int(os.environ.get("MCL_CHUNK", 131072))
SAMPLES = int(os.environ.get("MCL_SAMPLES", 100))
SUBDIV = int(os.environ.get("MCL_SUBDIV", 45))
C_BIN = int(os.environ.get("MCL_CBIN", 288))
BLOCK = int(os.environ.get("MCL_BLOCK", 128))
SUBB = int(os.environ.get("MCL_SUBB", 16))
BLOCK_CHUNK = 256


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

    key = jax.random.PRNGKey(0)
    cov = jnp.diag(jnp.asarray(
        [0.04, 0.04, 0.01, 1e-4, 1e-4, 3e-3], jnp.float32))
    key, k1 = jax.random.split(key)
    cloud = ParticleCloud.create(CHUNK).with_poses(
        sample_pose_gaussian(k1, truth, cov, CHUNK))
    scfg = SensorUpdateConfig.create(
        samples=SAMPLES, engine="binned", cluster=True,
        c_super=24, c_bin=C_BIN, range_max=30.0,
        dist_sigma=0.4, block_size=BLOCK, sub_blocks=SUBB,
    )
    key, kp = jax.random.split(key)
    o, d, t_cap = probe_update_rays(cloud, kp, points_s, mask,
                                    Transform.identity(), scfg)
    n = o.shape[0]
    print(f"chunk rays: {n} ({n // BLOCK} blocks)", file=sys.stderr)
    o, d, t_cap = jax.device_put((o, d, t_cap))

    def timeit(tag, f, *a, iters=3):
        out = f(*a)
        sync(out)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = f(*a)
            sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"{tag:28s}: {min(ts)*1000:9.1f} ms", flush=True)
        return min(ts)

    rows = {}
    rows["cast_full"] = timeit(
        "cast full (index payload)",
        jax.jit(lambda o, d, t: cast_rays_binned(
            bins, o, d, t_max=t, block_size=BLOCK, flip_normals=False,
            payload="index", c_super=24, c_bin=C_BIN,
            sub_blocks=SUBB).t.sum()),
        o, d, t_cap)

    # cull-only: mirror cast_rays_binned's blocking + per-chunk cull
    n_blk = n // BLOCK
    cs = min(24, bins.n_super)
    cb = min(C_BIN, bins.n_bins, cs * bins.bins_per_super)

    def cull_only(o, d, t):
        ob = o.reshape(n_blk, BLOCK, 3)
        db = d.reshape(n_blk, BLOCK, 3)
        tmin = jnp.zeros((n_blk, BLOCK), jnp.float32)
        tmax = t.reshape(n_blk, BLOCK)
        n_chunks = n_blk // BLOCK_CHUNK

        def one(args):
            cand, count, tnear, _ = _chunk_candidates(
                bins, *args, cs, cb, SUBB)
            return count.astype(jnp.int32).sum()

        parts = jax.tree.map(
            lambda x: x.reshape((n_chunks, BLOCK_CHUNK) + x.shape[1:]),
            (ob, db, tmin, tmax))
        return jax.lax.map(one, parts).sum()

    rows["cull_only"] = timeit("cull only", jax.jit(cull_only), o, d, t_cap)
    rows["cull_share"] = rows["cull_only"] / rows["cast_full"]
    print(f"cull share of cast: {rows['cull_share']:.2%}")
    print("CULL_JSON:" + json.dumps(rows))


if __name__ == "__main__":
    main()
