"""Probe the binned engine's candidate statistics + phase split on the
benchmark workload (VLP-16 sweep over a 1M-face sphere, direction-major).

Not the official bench — a diagnosis tool for the perf campaign.
"""

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
from rmcl_tpu.utils.timing import sync
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast_binned import cast_rays_binned, direction_major_order
from rmcl_tpu.sensors.models import SphericalModel


print = functools.partial(__builtins__.print, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces", type=int, default=1_000_000)
    ap.add_argument("--poses", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--block-size", type=int, default=256)
    ap.add_argument("--c-bin", type=int, default=192)
    ap.add_argument("--order", default="dir",
                    help="'dir' or 'PTxATxET' tile shape, e.g. 32x8x1")
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--skip-cull", action="store_true")
    args = ap.parse_args()

    print("devices:", jax.devices())
    n = int(np.sqrt(args.faces / 2))
    mesh = make_sphere(n, n, radius=50.0)
    print(f"mesh: {mesh.n_faces} faces")
    bins = build_bins(mesh)
    sync(bins.tri)
    print(f"bins: {bins.n_bins} x B={bins.bin_size}, {bins.n_super} supers, "
          f"{bins.nbytes()/1e6:.0f} MB")

    model = SphericalModel.vlp16(width=900)
    _, dirs_s = model.rays()
    n_dirs = model.n_rays
    rng = np.random.default_rng(0)
    trans = rng.uniform(-5, 5, size=(args.poses, 1, 3)).astype(np.float32)
    o_base = np.broadcast_to(trans, (args.poses, n_dirs, 3)).reshape(-1, 3)
    d_base = np.broadcast_to(
        np.asarray(dirs_s)[None], (args.poses, n_dirs, 3)
    ).reshape(-1, 3)

    if args.order == "dir":
        perm, _ = direction_major_order(args.poses, n_dirs)
    else:
        from rmcl_tpu.ops.raycast_binned import tiled_sweep_order

        pt, at, et = (int(x) for x in args.order.split("x"))
        perm, _ = tiled_sweep_order(
            trans.reshape(-1, 3), model.width, model.height,
            poses_per_tile=pt, az_tile=at, el_tile=et,
        )
    o = jnp.asarray(o_base)[perm]
    d = jnp.asarray(d_base)[perm]
    n_rays = o.shape[0]
    print(f"rays: {n_rays:,} (order={args.order})")

    # --- end-to-end timing ------------------------------------------------
    best = float("nan")
    if not args.skip_e2e:
        f = lambda: cast_rays_binned(bins, o, d, block_size=args.block_size,
                                     c_bin=args.c_bin)
        h = f()
        sync(h.t)
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            sync(f().t)
            times.append(time.time() - t0)
        best = min(times)
        print(f"end-to-end: {best*1e3:.1f} ms -> {n_rays/best/1e6:.2f} M rays/s, "
              f"hit={float(h.hit.mean()):.3f}")

    if args.skip_cull:
        return

    # --- candidate statistics (the engine's own cull) ---------------------
    from rmcl_tpu.ops.raycast_binned import candidate_stats

    cc = sync(candidate_stats(
        bins, o, d, block_size=args.block_size, c_bin=args.c_bin))
    cc = np.asarray(cc)
    print(f"cand bins/block (engine, budget {args.c_bin}): "
          f"mean={cc.mean():.1f} p50={np.percentile(cc,50):.0f} "
          f"p95={np.percentile(cc,95):.0f} max={cc.max()} "
          f"saturated={(cc >= args.c_bin).mean()*100:.2f}%")
    print(f"pairs/ray (upper bound, no early-exit): "
          f"{cc.mean() * bins.bin_size:.0f}")

    f = jax.jit(lambda bins, o, d: candidate_stats(
        bins, o, d, block_size=args.block_size, c_bin=args.c_bin))
    sync(f(bins, o, d))
    t0 = time.time()
    for _ in range(args.iters):
        sync(f(bins, o, d))
    cull_t = (time.time() - t0) / args.iters
    print(f"cull-phase (engine, budgeted): {cull_t*1e3:.1f} ms "
          f"({100*cull_t/best:.0f}% of end-to-end)")


if __name__ == "__main__":
    main()
