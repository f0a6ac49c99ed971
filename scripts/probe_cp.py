"""Probe: closest-point query throughput, exact BVH vs dense binned engine.

Workload: N query points near the surface of the 1M-face bench sphere
(the CPC correspondence pattern). One config per process; retry from the
shell (relay flakiness).

Usage: python scripts/probe_cp.py [n_queries] [engine: exact|binned] [faces]
"""

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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    engine = sys.argv[2] if len(sys.argv) > 2 else "binned"
    faces = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    from rmcl_tpu.geom.mesh import make_sphere

    m = int(np.sqrt(faces / 2))
    mesh = make_sphere(m, m, radius=50.0)

    rng = np.random.default_rng(0)
    # near-surface queries: points at radius 48-52 in random directions
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = rng.uniform(48.0, 52.0, n).astype(np.float32)
    q_np = d * r[:, None]

    if engine == "binned":
        from rmcl_tpu.bvh.bins import build_bins
        from rmcl_tpu.ops.closest_point import closest_points_binned

        accel = build_bins(mesh, bin_size=64)
        run = lambda q: closest_points_binned(accel, q, max_dist=5.0)
    elif engine == "seeded":
        from rmcl_tpu.bvh.bins import build_bins
        from rmcl_tpu.bvh.builder import build_bvh
        from rmcl_tpu.ops.closest_point import closest_points_seeded

        bins = build_bins(mesh, bin_size=64)
        bvh = build_bvh(mesh)
        chunk = int(os.environ.get("CP_CHUNK", "16384"))
        run = lambda q: closest_points_seeded(
            bvh, bins, q, max_dist=5.0, chunk_size=chunk
        )
    else:
        from rmcl_tpu.bvh.builder import build_bvh
        from rmcl_tpu.ops.closest_point import closest_points

        accel = build_bvh(mesh)
        run = lambda q: closest_points(accel, q, max_dist=5.0)

    q = jnp.asarray(q_np)
    out = run(q)
    sync(out.dist)
    # cold iterations: distinct inputs (relay memoizes identical executions)
    times = []
    for i in range(3):
        qi = q + jnp.float32(1e-4 * (i + 1))
        sync(qi)
        t0 = time.time()
        out = run(qi)
        sync(out.dist)
        times.append(time.time() - t0)
    best = min(times)
    print(
        f"{engine}: {best*1e3:.1f} ms for {n} queries "
        f"({n/best/1e6:.2f} M queries/s), found {float(out.found.mean()):.3f}"
    )


if __name__ == "__main__":
    main()
