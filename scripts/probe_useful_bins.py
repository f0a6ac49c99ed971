"""Probe: lower-bound on required candidate bins per block (bench workload).

The intersection loop's cost is (blocks x candidate bins); the conservative
cone cull currently passes ~18.7 bins/block (count-sorted chunks track the
mean). How many does a block actually NEED? Strict lower bound: the set of
distinct bins containing each ray's winning triangle (the early exit also
has to *reach* the winner through nearer bins, so the true need is higher —
but if this bound is ~15 there is nothing left to win from tighter frusta).

Runs the headline bench cast once and reports the distribution.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast_binned import TiledSweep, cast_rays_binned, candidate_stats
from rmcl_tpu.sensors.models import SphericalModel


def main():
    faces = int(os.environ.get("BENCH_FACES", 1_000_000))
    n_poses = int(os.environ.get("BENCH_POSES", 1000))
    n = int(np.sqrt(faces / 2))
    mesh = make_sphere(n, n, radius=50.0)
    bins = build_bins(mesh, bin_size=64)

    model = SphericalModel.vlp16(width=900)
    _, dirs_s = model.rays()
    rng = np.random.default_rng(0)
    trans = rng.uniform(-5, 5, size=(n_poses, 3)).astype(np.float32)
    sweep = TiledSweep(trans, model.width, model.height, 16, 8, 1)
    o, d = sweep.rays(jnp.asarray(trans), jnp.asarray(dirs_s))

    hits = cast_rays_binned(
        bins, o, d, block_size=sweep.block_size,
        dir_groups=sweep.dir_groups, c_bin=64, block_chunk=512,
        sort_blocks=True,
    )
    prim = np.asarray(hits.prim_id)  # permuted-flat (n_rays,)

    # prim -> bin map from the bin payload (components 12 = prim id)
    tri_prim = np.asarray(bins.tri[:, 12, :]).astype(np.int64)  # (n_bins, B)
    n_prims = int(tri_prim.max()) + 1
    prim2bin = np.full(n_prims + 1, -1, np.int64)
    bin_ids = np.repeat(np.arange(tri_prim.shape[0]), tri_prim.shape[1])
    flat = tri_prim.reshape(-1)
    ok = flat >= 0
    prim2bin[flat[ok]] = bin_ids[ok]

    win_bin = prim2bin[np.where(prim >= 0, prim, n_prims)]
    blocks = win_bin.reshape(-1, sweep.block_size)
    # distinct winner bins per block
    distinct = np.asarray(
        [len(np.unique(b[b >= 0])) for b in blocks[:: max(1, len(blocks) // 20000)]]
    )
    print(
        f"distinct winner bins/block: mean {distinct.mean():.2f} "
        f"p50 {np.percentile(distinct, 50):.0f} "
        f"p95 {np.percentile(distinct, 95):.0f} max {distinct.max()}"
    )

    # subsample for the conservative-count pass: candidate_stats is global
    # (unchunked) and OOMs the compile at the full 14.4M rays
    n_sub = 2_000_000 - (2_000_000 % sweep.block_size)
    cand = np.asarray(
        candidate_stats(
            bins, o[:n_sub], d[:n_sub],
            block_size=sweep.block_size, c_super=24, c_bin=192,
        )
    )
    print(
        f"conservative candidates/block:  mean {cand.mean():.2f} "
        f"p50 {np.percentile(cand, 50):.0f} "
        f"p95 {np.percentile(cand, 95):.0f} max {cand.max()}"
    )


if __name__ == "__main__":
    main()
