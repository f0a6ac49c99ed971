"""Check the bench correction actually computes: n_meas + delta + hit rate."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax, jax.numpy as jnp
from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.math.gaussian import CrossStatistics
from rmcl_tpu.math.stats import umeyama_transform
from rmcl_tpu.ops.raycast_binned import TiledSweep, cast_rays_binned
from rmcl_tpu.sensors.models import SphericalModel

faces = 1_000_000; n_poses = 1000
n = int(np.sqrt(faces / 2))
mesh = make_sphere(n, n, radius=50.0)
bins = build_bins(mesh, bin_size=64, bins_per_super=64)
model = SphericalModel.vlp16(width=900)
_, dirs_s = model.rays()
rng = np.random.default_rng(0)
trans_true = rng.uniform(-5, 5, size=(n_poses, 3)).astype(np.float32)
sweep = TiledSweep(trans_true, model.width, model.height, poses_per_tile=16, az_tile=8, el_tile=1)
cast_kw = dict(block_size=sweep.block_size, dir_groups=sweep.dir_groups, c_bin=64, block_chunk=512, sort_blocks=True, c_mid=0)

def cast_sweep(bins, trans, dirs):
    o, d = sweep.rays(trans, dirs)
    hits = cast_rays_binned(bins, o, d, **cast_kw)
    packed = jnp.concatenate([hits.point, hits.normal, hits.hit[:, None].astype(jnp.float32)], axis=1)
    up = sweep.unpermute(packed)
    return up[..., 0:3], up[..., 3:6], up[..., 6] > 0.5

@jax.jit
def make_dataset(bins, trans, dirs):
    point, _, hit = cast_sweep(bins, trans, dirs)
    return point - trans[:, None, :], hit

@jax.jit
def correction(bins, data_points, data_mask, trans_est, dirs):
    sim_p, sim_n, sim_hit = cast_sweep(bins, trans_est, dirs)
    d_map = data_points + trans_est[:, None, :]
    signed = jnp.sum(sim_n * (d_map - sim_p), axis=-1)
    ok = data_mask & sim_hit & (jnp.abs(signed) <= 2.0)
    proj = d_map - signed[..., None] * sim_n
    stats = CrossStatistics.from_masked_points(d_map, proj, ok)
    delta = umeyama_transform(stats)
    return delta.trans, stats.n_meas, jnp.mean(sim_hit.astype(jnp.float32))

dirs_j = jnp.asarray(dirs_s); trans_j = jnp.asarray(trans_true)
t0=time.time()
data_points, data_mask = jax.block_until_ready(make_dataset(bins, trans_j, dirs_j))
print(f"dataset: {time.time()-t0:.2f}s hit_rate={float(jnp.mean(data_mask)):.4f}", flush=True)
for i in range(3):
    est = trans_j + jnp.asarray([0.0, 0.0, 0.2 + 1e-3 * i])
    jax.block_until_ready(est)
    t0 = time.time()
    dt, nm, hr = jax.block_until_ready(correction(bins, data_points, data_mask, est, dirs_j))
    print(f"iter {i}: {time.time()-t0:.4f}s n_meas={float(jnp.sum(nm)):.3e} sim_hit={float(hr):.4f} dz={np.asarray(dt)[:, 2].mean():+.4f}", flush=True)
