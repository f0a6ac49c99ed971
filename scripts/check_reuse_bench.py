"""Bench-scale lossless audit of candidate reuse (CPU — counts and hit
sets are hardware-independent).

At the shipped bench config (1M-face sphere, VLP-16 sweep, 4-level cull),
verify that casts reusing margin-inflated candidates built at est0 are
BITWISE identical to fresh-cull casts at every jittered estimate, and
report the margin's candidate-count inflation (budget-saturation check:
max count must stay below c_bin).

Usage: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/check_reuse_bench.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path[:] = [p for p in sys.path if "/root/.axon_site" not in p]

import numpy as np
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast_binned import (
    TiledSweep, cast_rays_binned_factored, factored_candidates,
)
from rmcl_tpu.sensors.models import SphericalModel

faces = int(os.environ.get("CHECK_FACES", 1_000_000))
n_poses = int(os.environ.get("CHECK_POSES", 100))  # CPU time; counts scale-free
margin = float(os.environ.get("BENCH_MARGIN", 0.03))

n = int(np.sqrt(faces / 2))
mesh = make_sphere(n, n, radius=50.0)
big = faces > 4_000_000
bins = build_bins(mesh, bin_size=64, bins_per_super=16,
                  supers_per_hyper=16)
model = SphericalModel.vlp16(width=900)
_, dirs_s = model.rays()
rng = np.random.default_rng(0)
trans = rng.uniform(-5, 5, size=(n_poses, 3)).astype(np.float32)
sweep = TiledSweep(trans, model.width, model.height,
                   poses_per_tile=16, az_tile=8, el_tile=1)
cull_kw = dict(c_bin=512 if big else 64, block_chunk=512,
               c_hyper=24 if big else 20, c_super=128 if big else 24,
               sub_blocks=int(os.environ.get("CHECK_SUBBLOCKS", 64)),
               c_mid=0)
fact_kw = dict(sort_blocks=True, payload="plane", **cull_kw)

dirs_j = jnp.asarray(dirs_s)
o0, d0 = sweep.factored_rays(jnp.asarray(trans), dirs_j)

t0 = time.time()
c_ex, n_ex, _ = factored_candidates(bins, o0, d0, origin_margin=0.0, **cull_kw)
c_m, n_m, _ = factored_candidates(bins, o0, d0, origin_margin=margin, **cull_kw)
n_ex, n_m = np.asarray(n_ex), np.asarray(n_m)
cb = cull_kw["c_bin"]
print(f"cull x2: {time.time()-t0:.1f}s")
print(f"candidates/block exact: mean {n_ex.mean():.2f} max {n_ex.max()}")
print(f"candidates/block margin={margin}: mean {n_m.mean():.2f} "
      f"max {n_m.max()} (budget c_bin={cb}, "
      f"saturated blocks: {(n_m >= cb).sum()})")
# saturated blocks exist even at margin=0 (nearest-first truncation of far
# bins that never win — the round-2 lossless audits passed with them); the
# pass criterion below is bitwise hit equality against the shipped config
if (n_m >= cb).sum() > (n_ex >= cb).sum():
    print(f"note: margin added {(n_m >= cb).sum() - (n_ex >= cb).sum()} "
          "saturated blocks — bitwise check below is the arbiter")

cands = factored_candidates(bins, o0, d0, origin_margin=margin, **cull_kw)
ok_all = True
for trial in range(int(os.environ.get("CHECK_TRIALS", 3))):
    jit = rng.uniform(-0.02, 0.02, size=(n_poses, 3)).astype(np.float32)
    oj, dj = sweep.factored_rays(jnp.asarray(trans + jit), dirs_j)
    t0 = time.time()
    fresh = cast_rays_binned_factored(bins, oj, dj, **fact_kw)
    reuse = cast_rays_binned_factored(bins, oj, dj, candidates=cands,
                                      **fact_kw)
    same_t = np.array_equal(np.asarray(fresh.t), np.asarray(reuse.t))
    same_h = np.array_equal(np.asarray(fresh.hit), np.asarray(reuse.hit))
    nf, nr = np.asarray(fresh.normal), np.asarray(reuse.normal)
    nd = np.any(nf != nr, axis=-1)
    # candidate-order-dependent tie-break: coplanar tessellation triangles
    # sharing the exact hit t may swap winners between candidate lists —
    # t stays bitwise-equal, the normal is the tied twin's. Count them,
    # require they are vanishingly rare AND tie-consistent (t equal there).
    tie_ok = (not nd.any()) or (
        nd.mean() < 1e-5
        and np.array_equal(np.asarray(fresh.t)[nd], np.asarray(reuse.t)[nd])
    )
    hr = float(np.asarray(reuse.hit).mean())
    ok = same_t and same_h and tie_ok
    ok_all &= ok
    print(f"trial {trial}: bitwise t={same_t} hit={same_h} "
          f"normal_tie_flips={int(nd.sum())} (tie_ok={tie_ok}) "
          f"hit_rate={hr:.6f} ({time.time()-t0:.1f}s)")
# cross-check vs a maximally-budgeted coarse-cone cast: the shipped
# (tight-cone, budgeted, reused) candidates must reproduce its hits —
# budgets and cone granularity are the only loss sources
loose_kw = dict(cull_kw, c_super=256, c_bin=2048, sub_blocks=4)
loose = cast_rays_binned_factored(
    bins, oj, dj, sort_blocks=True, payload="plane", **loose_kw)
same_t = np.allclose(np.asarray(reuse.t), np.asarray(loose.t),
                     rtol=1e-5, atol=1e-5, equal_nan=True)
same_h = np.array_equal(np.asarray(reuse.hit), np.asarray(loose.hit))
print(f"vs unbudgeted coarse-cone cast: t_allclose={same_t} hit={same_h}")
ok_all &= same_t and same_h
print("AUDIT:", "LOSSLESS — reuse bitwise-equal at every jittered estimate"
      if ok_all else "FAILED")
sys.exit(0 if ok_all else 1)
