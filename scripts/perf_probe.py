"""Quick TPU perf probe for the ray-cast kernel (not the official bench).

Workload mirrors the reference benchmark: VLP-16 spherical scan (900x16 =
14,400 rays/pose) x N poses against a synthetic sphere mesh
(reference lidar_corrector_embree_benchmark.cpp:104-135).
"""

import argparse
import time

import jax
from rmcl_tpu.utils.timing import sync
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast import cast_rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces", type=int, default=1_000_000)
    ap.add_argument("--poses", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    print("devices:", jax.devices())

    n = int(np.sqrt(args.faces / 2))
    t0 = time.time()
    mesh = make_sphere(n, n, radius=50.0)
    print(f"mesh: {mesh.n_faces} faces  ({time.time()-t0:.2f}s)")
    t0 = time.time()
    bvh = build_bvh(mesh)
    sync(bvh.nodes)
    print(f"bvh: {bvh.nodes.shape[0]} slots, {bvh.nbytes()/1e6:.1f} MB  ({time.time()-t0:.2f}s)")

    # VLP-16-ish rays from poses near the center
    W, H = 900, 16
    phi = np.linspace(-np.pi, np.pi, W, endpoint=False)
    theta = np.linspace(np.deg2rad(-15), np.deg2rad(15), H)
    PH, TH = np.meshgrid(phi, theta, indexing="ij")
    dirs1 = np.stack(
        [np.cos(TH) * np.cos(PH), np.cos(TH) * np.sin(PH), np.sin(TH)], -1
    ).reshape(-1, 3)

    rng = np.random.default_rng(0)
    origins = rng.uniform(-5, 5, size=(args.poses, 1, 3)).astype(np.float32)
    o = jnp.asarray(np.broadcast_to(origins, (args.poses, W * H, 3)).reshape(-1, 3))
    d = jnp.asarray(np.broadcast_to(dirs1[None], (args.poses, W * H, 3)).reshape(-1, 3).astype(np.float32))
    n_rays = o.shape[0]
    print(f"rays: {n_rays:,}")

    # NB: cast_rays is itself jitted with the BVH as an argument — do NOT
    # close over the BVH in an outer jit (a large closed-over constant sends
    # the TPU compiler into minutes of constant folding).
    f = lambda o, d: cast_rays(bvh, o, d, chunk_size=args.chunk).t
    t0 = time.time()
    t = f(o, d)
    sync(t)
    print(f"compile+first run: {time.time()-t0:.2f}s")

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        t = f(o, d)
        sync(t)
        times.append(time.time() - t0)
    best = min(times)
    print(f"best: {best*1e3:.1f} ms -> {n_rays/best/1e6:.1f} M rays/s")
    hit_frac = float(jnp.isfinite(jnp.where(t < 1e37, t, jnp.inf)).mean())
    print(f"hit fraction: {hit_frac:.3f}")


if __name__ == "__main__":
    main()
