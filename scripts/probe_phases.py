"""Phase split of the bench workload's cast: candidates vs intersection vs
payload carry. Diagnosis tool for the perf campaign (not the official bench).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
from rmcl_tpu.utils.timing import sync
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops import raycast_binned as rb
from rmcl_tpu.ops.raycast_binned import TiledSweep, cast_rays_binned
from rmcl_tpu.sensors.models import SphericalModel

print = functools.partial(__builtins__.print, flush=True)


def timeit(fn, iters=3):
    out = fn()
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces", type=int, default=1_000_000)
    ap.add_argument("--poses", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--pt", type=int, default=16)
    ap.add_argument("--at", type=int, default=8)
    ap.add_argument("--et", type=int, default=1)
    ap.add_argument("--bin-size", type=int, default=32)
    ap.add_argument("--c-super", type=int, default=24)
    ap.add_argument("--c-bin", type=int, default=96)
    ap.add_argument("--sub-blocks", type=int, default=4)
    ap.add_argument("--c-mid", type=int, default=0)
    args = ap.parse_args()

    print("devices:", jax.devices())
    n = int(np.sqrt(args.faces / 2))
    mesh = make_sphere(n, n, radius=50.0)
    bins = build_bins(mesh, bin_size=args.bin_size)
    sync(bins.tri)
    print(f"mesh {mesh.n_faces} faces; bins {bins.n_bins} x B={bins.bin_size}, "
          f"{bins.n_super} supers")

    model = SphericalModel.vlp16(width=900)
    _, dirs_s = model.rays()
    rng = np.random.default_rng(0)
    trans = rng.uniform(-5, 5, size=(args.poses, 3)).astype(np.float32)
    sweep = TiledSweep(trans, model.width, model.height,
                       poses_per_tile=args.pt, az_tile=args.at, el_tile=args.et)
    kw = dict(block_size=sweep.block_size, dir_groups=sweep.dir_groups,
              c_super=args.c_super, c_bin=args.c_bin, sub_blocks=args.sub_blocks,
              c_mid=args.c_mid)
    trans_j = jnp.asarray(trans)
    dirs_j = jnp.asarray(np.asarray(dirs_s))
    n_rays = args.poses * model.n_rays
    print(f"{n_rays/1e6:.1f}M rays, block={sweep.block_size}, G={sweep.dir_groups}")

    @jax.jit
    def rays_only(t, d):
        return sweep.rays(t, d)

    t_rays, (o, d) = timeit(lambda: rays_only(trans_j, dirs_j), args.iters)
    print(f"ray build              {t_rays*1e3:8.1f} ms")

    @jax.jit
    def full(t, d):
        o, dd = sweep.rays(t, d)
        h = cast_rays_binned(bins, o, dd, **kw)
        return h.t, h.normal

    t_full, _ = timeit(lambda: full(trans_j, dirs_j), args.iters)
    print(f"full cast (payload)    {t_full*1e3:8.1f} ms  "
          f"({n_rays/t_full/1e6:.1f}M rays/s)")

    @jax.jit
    def nopay(t, d):
        o, dd = sweep.rays(t, d)
        h = cast_rays_binned(bins, o, dd, payload=False, **kw)
        return h.t

    t_np, _ = timeit(lambda: nopay(trans_j, dirs_j), args.iters)
    print(f"cast payload=False     {t_np*1e3:8.1f} ms")

    # candidates only, same chunking as the fused pipeline
    Rb = sweep.block_size
    cs = min(args.c_super, bins.n_super)
    cb = min(args.c_bin, bins.n_bins, cs * bins.bins_per_super)

    @jax.jit
    def cands(t, d):
        o, dd = rays_only(t, d)
        nb = o.shape[0] // Rb
        ob = o.reshape(nb, Rb, 3)
        db = dd.reshape(nb, Rb, 3)
        tmin = jnp.zeros((nb, Rb), jnp.float32)
        tmax = jnp.full((nb, Rb), 1e9, jnp.float32)
        chunk = min(256, nb)
        pad = (-nb) % chunk
        if pad:
            padz = lambda x, fill: jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], 0)
            ob, db = padz(ob, 0.0), padz(db, 1.0)
            tmin, tmax = padz(tmin, 0.0), padz(tmax, 0.0)
        nch = (nb + pad) // chunk
        argz = (ob.reshape(nch, chunk, Rb, 3), db.reshape(nch, chunk, Rb, 3),
                tmin.reshape(nch, chunk, Rb), tmax.reshape(nch, chunk, Rb))
        f = lambda a: rb._chunk_candidates(bins, a[0], a[1], a[2], a[3],
                                           cs, cb, args.sub_blocks,
                                           args.c_mid)
        cb_, cc_, tn_, _sat = jax.lax.map(f, argz)
        return cc_

    @jax.jit
    def cand_tests(t, d):
        """Box-test phase alone (no level-1 top_k) — isolates the cull's
        cs*S-key sort cost by difference vs `cands`."""
        o, dd = rays_only(t, d)
        nb = o.shape[0] // Rb
        ob = o.reshape(nb, Rb, 3)
        db = dd.reshape(nb, Rb, 3)
        tmin = jnp.zeros((nb, Rb), jnp.float32)
        tmax = jnp.full((nb, Rb), 1e9, jnp.float32)
        chunk = min(256, nb)
        pad = (-nb) % chunk
        if pad:
            padz = lambda x, fill: jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], 0)
            ob, db = padz(ob, 0.0), padz(db, 1.0)
            tmin, tmax = padz(tmin, 0.0), padz(tmax, 0.0)
        nch = (nb + pad) // chunk
        argz = (ob.reshape(nch, chunk, Rb, 3), db.reshape(nch, chunk, Rb, 3),
                tmin.reshape(nch, chunk, Rb), tmax.reshape(nch, chunk, Rb))

        def f(a):
            if args.c_mid:
                vb, gb, tn, nh, _sat = rb._chunk_cull_tests3(
                    bins, a[0], a[1], a[2], a[3], cs, args.c_mid,
                    args.sub_blocks)
            else:
                vb, gb, tn, nh, _sat = rb._chunk_cull_tests(
                    bins, a[0], a[1], a[2], a[3], cs, args.sub_blocks)
            # reduce (prevents DCE) without a big sort
            return jnp.sum(vb, axis=1), jnp.sum(tn, axis=1)

        return jax.lax.map(f, argz)

    t_t, _ = timeit(lambda: cand_tests(trans_j, dirs_j), args.iters)
    print(f"cull box tests only    {t_t*1e3:8.1f} ms")

    t_c, cc = timeit(lambda: cands(trans_j, dirs_j), args.iters)
    cc = np.asarray(cc).reshape(-1)
    print(f"candidates only        {t_c*1e3:8.1f} ms  "
          f"(level-1 top_k by difference ~{(t_c-t_t)*1e3:.1f} ms)")
    print(f"cand count: mean {cc.mean():.1f}  p50 {np.percentile(cc,50):.0f}  "
          f"p95 {np.percentile(cc,95):.0f}  max {cc.max()}  (budget {cb})")
    pair_work = cc.mean() * bins.bin_size  # tris tested per ray (upper bound)
    print(f"=> avg tris/ray (no early exit) {pair_work:.0f}")
    # effective VPU flops estimate for the dir-group path: ~20 flops/pair
    est = n_rays * pair_work * 20
    print(f"=> pair-work flops ~{est/1e12:.2f} Tflop; at 0.58 Tflops VPU "
          f"=> {est/0.58e12*1e3:.0f} ms floor (ignoring early exit)")


if __name__ == "__main__":
    main()
