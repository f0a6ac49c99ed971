"""Scaling benchmark: headline correction with rays sharded over K devices.

Reports corr-rays/s and parallel efficiency for K = 1, 2, 4, ... up to the
available device count. On real multi-chip TPU this measures the ICI
scaling the north-star metric asks for (>= 0.85 efficiency at 4 hosts);
on a single relay chip it degenerates to K=1. Runnable on a virtual CPU
mesh for wiring validation (numbers then mean nothing):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --faces 50000 --width 720

Workload: one dense spherical scan (default 3600x64 = 230k rays — the
ray axis is the scaling axis) against the bench sphere, routed through
parallel.sharded.sharded_correct_once: rays sharded, structures
replicated, GN statistics psum-merged.
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=3600)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--engine", choices=("bvh", "binned"), default="binned")
    args = ap.parse_args()

    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.geom.mesh import make_sphere
    from rmcl_tpu.math.se3 import Transform
    from rmcl_tpu.micp.pipeline import MICPSensorConfig, MICPSensorData
    from rmcl_tpu.parallel.mesh import make_mesh, put_replicated
    from rmcl_tpu.parallel.sharded import shard_sensor_data, sharded_correct_once
    from rmcl_tpu.sensors.models import SphericalModel
    from rmcl_tpu.sensors.simulate import simulate

    n = int(np.sqrt(args.faces / 2))
    mesh_geom = make_sphere(n, n, radius=50.0)
    struct = (
        build_bins(mesh_geom, bin_size=64)
        if args.engine == "binned"
        else build_bvh(mesh_geom)
    )
    bvh_exact = build_bvh(mesh_geom)

    # one dense scan — the ray axis is the scaling axis (SURVEY §2.10 P1);
    # width*height rays shard over the mesh
    model = SphericalModel.create(
        width=args.width, height=args.height, phi_min=-0.4, phi_max=0.3,
        range_max=200.0,
    )
    true_pose = Transform.from_xyz_euler(
        jnp.asarray([1.0, -2.0, 0.5]), jnp.zeros(3)
    )
    hits = simulate(bvh_exact, model, true_pose)
    points = hits.point.reshape(-1, 3)  # sensor frame
    mask = hits.hit.reshape(-1)

    sensor = MICPSensorData(
        model=model,
        points=points,
        mask=mask,
        tsb=Transform.identity(),
        config=MICPSensorConfig.create(max_dist=2.0),
    )
    n_rays = points.shape[0]
    devices = jax.device_count()
    print(f"{devices} devices, {n_rays/1e6:.2f}M rays, engine={args.engine}")

    base_rate = None
    k = 1
    while k <= devices:
        mesh = make_mesh(k)
        sensors_s = shard_sensor_data([sensor], mesh)
        tom = put_replicated(
            Transform.from_xyz_euler(jnp.asarray([0.0, 0.0, 0.2]), jnp.zeros(3)),
            mesh,
        )
        tbo = put_replicated(Transform.identity(), mesh)

        def step(z):
            t = jax.tree.map(
                lambda x: x, tom
            )  # fresh pytree; z jitters the estimate to defeat memoization
            t = Transform(rot=t.rot, trans=t.trans + z)
            out, _ = sharded_correct_once(
                struct, sensors_s, t, tbo, jnp.float32(0.0), mesh
            )
            return out.trans

        sync(step(jnp.zeros(3)))  # compile + warm
        ts = []
        for i in range(args.iters):
            z = jnp.asarray([0.0, 0.0, 1e-4 * (i + 1)])
            t0 = time.perf_counter()
            sync(step(z))
            ts.append(time.perf_counter() - t0)
        rate = n_rays / min(ts)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * k)
        print(
            f"K={k:3d}: {min(ts)*1e3:8.1f} ms  {rate/1e6:8.2f} M corr-rays/s  "
            f"efficiency {eff:.3f}"
        )
        k *= 2


if __name__ == "__main__":
    main()
