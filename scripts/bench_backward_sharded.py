"""Sharded forward+backward rows — BACKWARD_r05 (VERDICT r4 #7).

Runs the single-chip fwd / fwd+bwd timings (same workload as
bench_backward.py) PLUS the sharded value_and_grad over a virtual
8-device CPU mesh, counts its collectives from the compiled HLO, and
inspects the HLO schedule for async collective overlap
(all-reduce-start/done split with compute scheduled between).

Usage:
  TPU rows:   python scripts/bench_backward.py          (unchanged)
  this file:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
              JAX_PLATFORMS=cpu python scripts/bench_backward_sharded.py
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.diff import cast_rays_diff
from rmcl_tpu.parallel.diff_sharded import _svg, sharded_range_value_and_grad
from rmcl_tpu.parallel.mesh import make_mesh, shard_rays
from rmcl_tpu.utils.timing import sync

FACES = int(os.environ.get("BWS_FACES", 200_000))
POSES = int(os.environ.get("BWS_POSES", 32))
DIRS = int(os.environ.get("BWS_DIRS", 4096))
ITERS = int(os.environ.get("BWS_ITERS", 3))


def main():
    n = int(np.sqrt(FACES / 2))
    mesh_g = make_sphere(n, n, radius=50.0)
    bins = build_bins(mesh_g, bin_size=64, bins_per_super=16,
                      supers_per_hyper=16)
    verts = jnp.asarray(mesh_g.vertices, jnp.float32)
    faces = jnp.asarray(mesh_g.faces, jnp.int32)
    rng = np.random.default_rng(0)
    trans = jnp.asarray(rng.uniform(-5, 5, (POSES, 3)), jnp.float32)
    d = rng.normal(size=(POSES * DIRS, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d)
    pose_id = jnp.repeat(jnp.arange(POSES, dtype=jnp.int32), DIRS)
    n_dev = min(8, jax.device_count())
    mesh = make_mesh(n_dev)
    dirs_s = jax.device_put(dirs, shard_rays(mesh))
    pid_s = jax.device_put(pose_id, shard_rays(mesh))

    def loss_ref(trans, verts):
        o = jnp.take(trans, pose_id, axis=0)
        h = cast_rays_diff(bins, verts, faces, o, dirs)
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    def timeit(name, fn, *a):
        out = fn(*a)
        sync(out)
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = fn(*a)
            sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:26s}: {min(ts)*1000:9.1f} ms", file=sys.stderr)
        return min(ts)

    rows = {}
    rows["single_fwd"] = timeit(
        "single fwd", jax.jit(loss_ref), trans, verts)
    rows["single_fwd_bwd_pose"] = timeit(
        "single fwd+bwd pose",
        jax.jit(jax.value_and_grad(loss_ref, argnums=0)), trans, verts)
    rows["single_fwd_bwd_verts"] = timeit(
        "single fwd+bwd verts",
        jax.jit(jax.value_and_grad(loss_ref, argnums=1)), trans, verts)
    rows[f"sharded{n_dev}_fwd_bwd_pose"] = timeit(
        f"sharded x{n_dev} fwd+bwd pose",
        lambda: sharded_range_value_and_grad(
            bins, verts, faces, trans, dirs_s, pid_s, mesh, wrt="pose"))
    rows[f"sharded{n_dev}_fwd_bwd_verts"] = timeit(
        f"sharded x{n_dev} fwd+bwd verts",
        lambda: sharded_range_value_and_grad(
            bins, verts, faces, trans, dirs_s, pid_s, mesh, wrt="verts"))

    # gradient parity (the pose tracks clause)
    l_ref, g_ref = jax.value_and_grad(loss_ref, argnums=0)(trans, verts)
    l_s, g_s = sharded_range_value_and_grad(
        bins, verts, faces, trans, dirs_s, pid_s, mesh, wrt="pose")
    gdiff = float(np.max(np.abs(np.asarray(g_s) - np.asarray(g_ref))))

    # collective count + schedule shape from the compiled HLO
    overlap = {}
    for wrt in ("pose", "verts"):
        hlo = _svg.lower(
            bins, verts, faces, trans, dirs_s, pid_s, mesh, wrt, ()
        ).compile().as_text()
        n_ar = len(re.findall(r"\ball-reduce\b", hlo))
        n_start = len(re.findall(r"all-reduce-start", hlo))
        overlap[wrt] = {
            "all_reduce": n_ar,
            "async_start_done_pairs": n_start,
        }
    result = {
        "metric": "diff_raycast_sharded_fwd_bwd",
        "backend": jax.default_backend(),
        "n_devices": n_dev,
        "faces": int(mesh_g.faces.shape[0]),
        "rays": POSES * DIRS,
        "rows_seconds": {k: round(v, 4) for k, v in rows.items()},
        "pose_grad_max_abs_diff_vs_single": gdiff,
        "collectives": overlap,
        "note": "ONE packed all-reduce per evaluation (loss rides the "
                "gradient psum). async_start_done_pairs > 0 means XLA "
                "emitted split-phase collectives the scheduler can "
                "overlap with backward compute.",
    }
    out = os.environ.get("BWS_OUT", "/root/repo/BACKWARD_r05.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
