"""Forward+backward ray-kernel timing (north star: "forward+backward ray
kernels"; VERDICT r2 #8).

Workload: bench-class rays (100 poses x VLP-16 = 1.44M rays) against the
1M-face sphere via the differentiable cast (ops.diff.cast_rays_diff over
the dense binned engine). Times three jitted programs, readback-closed,
fresh pose jitters per iteration (relay cache hazard):

  fwd        value only: L(trans) = sum of hit ranges
  fwd+bwd    jax.value_and_grad w.r.t. the 100 pose translations
  fwd+bwd_v  value_and_grad w.r.t. the MESH VERTICES (500k x 3)

Writes BACKWARD_r03.json. Usage (TPU): python scripts/bench_backward.py
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
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.diff import cast_rays_diff
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.utils.timing import sync

FACES = int(os.environ.get("BW_FACES", 1_000_000))
POSES = int(os.environ.get("BW_POSES", 100))
ITERS = int(os.environ.get("BW_ITERS", 3))


def main():
    n = int(np.sqrt(FACES / 2))
    mesh = make_sphere(n, n, radius=50.0)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16,
                      supers_per_hyper=16)
    verts = jnp.asarray(mesh.vertices, jnp.float32)
    faces = jnp.asarray(mesh.faces, jnp.int32)
    model = SphericalModel.vlp16(width=900)
    _, dirs_s = model.rays()
    nd = model.n_rays
    rng = np.random.default_rng(0)
    trans0 = jnp.asarray(rng.uniform(-5, 5, (POSES, 3)), jnp.float32)
    dirs = jnp.asarray(dirs_s)
    n_rays = POSES * nd
    kw = dict(c_super=24, c_bin=64, c_hyper=20, sort_blocks=True,
              block_size=128, dir_groups=0)

    def loss_t(trans, verts):
        o = jnp.broadcast_to(trans[:, None, :], (POSES, nd, 3)).reshape(-1, 3)
        d = jnp.broadcast_to(dirs[None], (POSES, nd, 3)).reshape(-1, 3)
        h = cast_rays_diff(bins, verts, faces, o, d, **kw)
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    fwd = jax.jit(loss_t)
    vg_pose = jax.jit(jax.value_and_grad(loss_t, argnums=0))
    vg_vert = jax.jit(jax.value_and_grad(loss_t, argnums=1))

    rows = {}
    for name, fn, nout in (("fwd", fwd, 1), ("fwd+bwd_pose", vg_pose, 2),
                           ("fwd+bwd_verts", vg_vert, 2)):
        times = []
        for it in range(ITERS + 1):
            tj = trans0 + jnp.asarray(
                rng.uniform(-0.02, 0.02, (POSES, 3)), jnp.float32)
            sync(tj)
            t0 = time.time()
            out = fn(tj, verts)
            sync(out)
            dt = time.time() - t0
            print(f"{name} it{it}: {dt:.3f}s", file=sys.stderr)
            if it > 0:
                times.append(dt)
        best = min(times)
        rows[name] = {"seconds": round(best, 4),
                      "rays_per_sec": round(n_rays / best, 1)}
    rows["bwd_overhead_pose"] = round(
        rows["fwd+bwd_pose"]["seconds"] / rows["fwd"]["seconds"], 3)
    rows["bwd_overhead_verts"] = round(
        rows["fwd+bwd_verts"]["seconds"] / rows["fwd"]["seconds"], 3)
    result = {"metric": "diff_raycast_fwd_bwd", "faces": FACES,
              "rays": n_rays, **rows}
    with open(os.environ.get("BW_OUT", "/root/repo/BACKWARD_r03.json"),
              "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
