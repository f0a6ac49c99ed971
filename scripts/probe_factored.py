"""Phase split of the factored engine on the benchmark workload.

Times, with readback-closed regions and fresh inputs per measurement
(TPU_NOTES methodology):
  1. cull only    — candidate build over all chunks (+ sort perm build)
  2. cast         — full cast_rays_binned_factored
  3. correction   — cast + P2L reduce + solve (bench.py's jitted step)

intersection+payload ~= cast - cull; reduce+solve ~= correction - cast.

Usage: python scripts/probe_factored.py [faces] [poses]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.math.gaussian import CrossStatistics
from rmcl_tpu.math.stats import umeyama_transform
from rmcl_tpu.ops.raycast_binned import (
    TiledSweep,
    _chunk_candidates,
    cast_rays_binned_factored,
)
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.utils.timing import sync

FACES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
POSES = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
CB = int(os.environ.get("CBIN", 64))
CS = int(os.environ.get("CSUPER", 24))
CMID = int(os.environ.get("CMID", 0))
CHUNK = int(os.environ.get("CHUNK", 512))


def main():
    n = int(np.sqrt(FACES / 2))
    mesh = make_sphere(n, n, radius=50.0)
    bins = build_bins(mesh, bin_size=int(os.environ.get("BIN_SIZE", 64)),
                      bins_per_super=int(os.environ.get("BPS", 64)))
    model = SphericalModel.vlp16(width=900)
    _, dirs_s = model.rays()
    rng = np.random.default_rng(0)
    trans = rng.uniform(-5, 5, size=(POSES, 3)).astype(np.float32)
    sweep = TiledSweep(trans, model.width, model.height, 16, 8, 1)
    dirs_j = jnp.asarray(dirs_s)

    P, G = sweep.pt, sweep.dir_groups
    Rb = P * G

    @jax.jit
    def cull_only(bins, o_blk, d_blk):
        n_blk = o_blk.shape[0]
        chunk = min(CHUNK, n_blk)
        pad = (-n_blk) % chunk
        if pad:
            o_blk = jnp.concatenate([o_blk, jnp.zeros((pad, P, 3))], 0)
            d_blk = jnp.concatenate([d_blk, jnp.ones((pad, G, 3))], 0)
        nc = (n_blk + pad) // chunk

        def f(args):
            o_c, d_c = args
            Cb = o_c.shape[0]
            ob = jnp.broadcast_to(o_c[:, None], (Cb, G, P, 3)).reshape(Cb, Rb, 3)
            db = jnp.broadcast_to(d_c[:, :, None], (Cb, G, P, 3)).reshape(Cb, Rb, 3)
            tmin = jnp.zeros((Cb, Rb))
            tmax = jnp.full((Cb, Rb), 3.0e38)
            return _chunk_candidates(bins, ob, db, tmin, tmax, CS,
                                     min(CB, bins.n_bins), 4, CMID)[:3]

        cand, count, tnear = jax.lax.map(
            f, (o_blk.reshape(nc, chunk, P, 3), d_blk.reshape(nc, chunk, G, 3))
        )
        order = jnp.argsort(count.reshape(-1))
        return count.reshape(-1), order

    cast_kw = dict(c_super=CS, c_bin=CB, block_chunk=CHUNK,
                   sort_blocks=True, c_mid=CMID, payload="plane")

    @jax.jit
    def cast_fn(bins, o_blk, d_blk):
        h = cast_rays_binned_factored(bins, o_blk, d_blk, **cast_kw)
        return h.t, h.hit

    @jax.jit
    def corr_fn(bins, o_blk, d_blk, data_points, data_mask, trans_est):
        h = cast_rays_binned_factored(bins, o_blk, d_blk, **cast_kw)
        n_rays = h.t.size
        packed = jnp.concatenate(
            [h.point.reshape(n_rays, 3), h.normal.reshape(n_rays, 3),
             h.hit.reshape(n_rays, 1).astype(jnp.float32)], axis=1)
        up = sweep.unpermute(packed)
        sim_p, sim_n, sim_hit = up[..., 0:3], up[..., 3:6], up[..., 6] > 0.5
        d_map = data_points + trans_est[:, None, :]
        signed = jnp.sum(sim_n * (d_map - sim_p), axis=-1)
        ok = data_mask & sim_hit & (jnp.abs(signed) <= 2.0)
        proj = d_map - signed[..., None] * sim_n
        stats = CrossStatistics.from_masked_points(d_map, proj, ok)
        return umeyama_transform(stats).trans

    def timed(fn, *args, tag=""):
        out = fn(*args)
        sync(out)  # compile + warm
        ts = []
        for i in range(2):
            # fresh jitter -> no relay result-cache hits
            jit_args = list(args)
            jit_args[1] = args[1] + jnp.asarray(
                rng.uniform(-0.02, 0.02, args[1].shape), jnp.float32)
            sync(tuple(jit_args))
            t0 = time.time()
            out = fn(*jit_args)
            sync(out)
            ts.append(time.time() - t0)
        print(f"{tag:12s} {min(ts)*1e3:8.1f} ms  (all: {[round(t*1e3) for t in ts]})")
        return min(ts)

    o_blk, d_blk = sweep.factored_rays(jnp.asarray(trans), dirs_j)
    o_blk = jax.device_put(o_blk)
    d_blk = jax.device_put(d_blk)
    sync((o_blk, d_blk, bins.tri))

    t_cull = timed(cull_only, bins, o_blk, d_blk, tag="cull+sort")
    t_cast = timed(cast_fn, bins, o_blk, d_blk, tag="cast")

    # dataset for the correction
    h = cast_fn(bins, o_blk, d_blk)
    n_rays = sweep.n_rays
    hits = cast_rays_binned_factored(bins, o_blk, d_blk, **cast_kw)
    packed = jnp.concatenate(
        [hits.point.reshape(n_rays, 3),
         hits.hit.reshape(n_rays, 1).astype(jnp.float32)], axis=1)
    up = sweep.unpermute(packed)
    data_points = up[..., 0:3] - jnp.asarray(trans)[:, None, :]
    data_mask = up[..., 3] > 0.5
    sync((data_points, data_mask))
    t_corr = timed(corr_fn, bins, o_blk, d_blk, data_points, data_mask,
                   jnp.asarray(trans), tag="correction")

    rays = POSES * model.n_rays
    print(f"\nfaces={FACES} poses={POSES} rays={rays/1e6:.1f}M  "
          f"cb={CB} cs={CS} cmid={CMID}")
    print(f"cull {t_cull*1e3:.0f} ms | intersect+payload "
          f"{(t_cast-t_cull)*1e3:.0f} ms | reduce+solve+unperm "
          f"{(t_corr-t_cast)*1e3:.0f} ms")
    print(f"cast rate {rays/t_cast/1e6:.1f}M rays/s | "
          f"correction rate {rays/t_corr/1e6:.1f}M corr-rays/s")


if __name__ == "__main__":
    main()
