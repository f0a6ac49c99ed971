"""Phase attribution of the 10M-face factored correction (VERDICT r3 #2).

Times, at the shipped 10M bench config (B=64/cb=512/cs=64/8x4 tiles,
c_hyper=24): the cull alone, the cast with precomputed candidates
(payload plane vs none), and sub-phases via config deltas. All timings
on-chip; fresh jitters per iteration.

Usage (TPU): python scripts/probe_10m_phases.py [faces]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import functools
import numpy as np
import jax, jax.numpy as jnp
from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast_binned import (TiledSweep, cast_rays_binned_factored,
                                         factored_candidates)
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.utils.timing import sync

faces = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
n = int(np.sqrt(faces / 2))
mesh = make_sphere(n, n, radius=50.0)
bins = build_bins(mesh, bin_size=64, bins_per_super=16, supers_per_hyper=16)
print(f"{mesh.faces.shape[0]} faces, {bins.n_bins} bins", file=sys.stderr)
model = SphericalModel.vlp16(width=900)
_, dirs_s = model.rays()
rng = np.random.default_rng(0)
trans = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
sweep = TiledSweep(trans, model.width, model.height, poses_per_tile=8,
                   az_tile=4, el_tile=1)
fact_kw = dict(c_bin=512, c_super=64, c_hyper=24, c_mid=0, block_chunk=512,
               sub_blocks=4, sort_blocks=True)
dirs_j = jnp.asarray(dirs_s)
o_blk, d_blk = jax.jit(sweep.factored_rays)(jnp.asarray(trans), dirs_j)
sync((o_blk, d_blk))
print(f"blocks {o_blk.shape}", file=sys.stderr)

def timeit(tag, f, *a, iters=3):
    out = f(*a); sync(out)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter(); out = f(*a); sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{tag:40s}: {min(ts)*1000:9.1f} ms")
    return min(ts), out

# PITFALL (ops/raycast.py): pass bins as an ARGUMENT through jit — a
# closed-over 10M-face structure becomes HLO constants and blows the
# remote compiler's request limit
cull_j = jax.jit(lambda b, o, d: factored_candidates(b, o, d,
    origin_margin=0.03, **{k: fact_kw[k] for k in ("c_bin","c_super","c_hyper","c_mid","block_chunk","sub_blocks")}))
tc, cands = timeit("cull (factored_candidates)", cull_j, bins, o_blk, d_blk)
cnt = np.asarray(cands[1]); print(f"  candidates/block mean {cnt.mean():.1f} p99 {np.percentile(cnt,99):.0f} max {cnt.max()}", file=sys.stderr)

for tag, kw in (
    ("cast plane (reused candidates)", dict(payload="plane")),
    ("cast none (reused candidates)", dict(payload="none")),
    ("cast index (reused candidates)", dict(payload="index")),
):
    f = jax.jit(lambda b, o, d, c, kw=kw: cast_rays_binned_factored(
        b, o, d, candidates=c, **fact_kw, **kw).t.sum())
    timeit(tag, f, bins, o_blk, d_blk, cands)
