"""Config sweep of the binned engine on the bench workload — full-cast
timings only. Diagnosis tool (not the official bench)."""

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
from rmcl_tpu.ops.raycast_binned import TiledSweep, cast_rays_binned
from rmcl_tpu.sensors.models import SphericalModel

print = functools.partial(__builtins__.print, flush=True)

FACES = int(os.environ.get("SWEEP_FACES", 1_000_000))
POSES = int(os.environ.get("SWEEP_POSES", 1000))

# (bin_size, c_super, c_bin, sub_blocks, pt, at, et, block_chunk)
CONFIGS = [
    (64, 24, 48, 4, 16, 8, 1, 128),
    (64, 24, 48, 8, 16, 8, 1, 256),
    (64, 24, 64, 4, 16, 8, 1, 256),
    (64, 16, 32, 4, 16, 8, 1, 256),
    (64, 24, 48, 4, 32, 4, 1, 256),
    (64, 24, 48, 4, 16, 8, 1, 64),
]


def main():
    print("devices:", jax.devices())
    n = int(np.sqrt(FACES / 2))
    mesh = make_sphere(n, n, radius=50.0)
    model = SphericalModel.vlp16(width=900)
    _, dirs_s = model.rays()
    rng = np.random.default_rng(0)
    trans = rng.uniform(-5, 5, size=(POSES, 3)).astype(np.float32)
    n_rays = POSES * model.n_rays
    dirs_j = jnp.asarray(np.asarray(dirs_s))

    bins_cache = {}
    for (B, cs, cb, sub, pt, at, et, chunk) in CONFIGS:
        if B not in bins_cache:
            bins_cache[B] = build_bins(mesh, bin_size=B)
            sync(bins_cache[B].tri)
        bins = bins_cache[B]
        sweep = TiledSweep(trans, model.width, model.height,
                           poses_per_tile=pt, az_tile=at, el_tile=et)
        kw = dict(block_size=sweep.block_size, dir_groups=sweep.dir_groups,
                  c_super=cs, c_bin=cb, sub_blocks=sub, block_chunk=chunk)

        @jax.jit
        def full(t, d):
            o, dd = sweep.rays(t, d)
            h = cast_rays_binned(bins, o, dd, **kw)
            return h.t, h.normal, h.hit

        # fresh translations per timed run (relay memoization guard)
        runs = []
        for i in range(4):
            tj = jnp.asarray(trans + np.float32(i) * 1e-4)
            t0 = time.perf_counter()
            out = full(tj, dirs_j)
            sync(out[0])
            dt = time.perf_counter() - t0
            runs.append(dt)
            del out
        hot = min(runs[1:])
        hitr = float(jnp.mean(full(jnp.asarray(trans), dirs_j)[2]))
        print(f"B={B:3d} cb={cb:3d} sub={sub} tile={pt}x{at}x{et} chunk={chunk:4d}: "
              f"cold {runs[0]*1e3:7.1f} ms, hot {hot*1e3:7.1f} ms "
              f"({n_rays/hot/1e6:5.1f}M rays/s)  hit={hitr:.3f}")


if __name__ == "__main__":
    main()
