"""Headline benchmark — reference workload parity.

Reproduces the reference's corrector benchmark (BASELINE.md,
rmcl_ros/src/benchmarks/lidar_corrector_embree_benchmark.cpp): VLP-16
spherical model (900x16 = 14,400 rays/pose), N poses corrected at once
against a synthetic ~1M-face sphere; one "correction" = full
simulate → masked P2L reduce → SE(3) solve for all poses.

Metric: correspondence rays/second for the full correction iteration.
vs_baseline: ratio against the reference's Embree desktop-CPU number at
1M faces (71.6 M corr-rays/s — lidar_corrector_embree_benchmark.cpp:146).

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_EMBREE_1M = 71.6e6  # corr-rays/s, reference DPC desktop CPU


def main():
    import jax
    import jax.numpy as jnp

    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.geom.mesh import make_sphere
    from rmcl_tpu.math.gaussian import CrossStatistics
    from rmcl_tpu.math.se3 import Transform
    from rmcl_tpu.micp.pipeline import (
        MICPConfig,
        MICPSensorConfig,
        MICPSensorData,
        correct_once,
    )
    from rmcl_tpu.sensors.models import SphericalModel
    from rmcl_tpu.sensors.simulate import simulate

    faces = int(os.environ.get("BENCH_FACES", 1_000_000))
    n_poses = int(os.environ.get("BENCH_POSES", 50))
    iters = int(os.environ.get("BENCH_ITERS", 3))

    n = int(np.sqrt(faces / 2))
    mesh = make_sphere(n, n, radius=50.0)
    bvh = build_bvh(mesh)

    model = SphericalModel.vlp16(width=900)  # 900 x 16 = 14,400 rays/pose
    rays_per_pose = model.n_rays

    # poses near the center (reference offsets poses by +0.2 z; exact values
    # don't change the workload)
    rng = np.random.default_rng(0)
    trans = rng.uniform(-5, 5, size=(n_poses, 3)).astype(np.float32)
    poses = Transform.from_xyz_euler(jnp.asarray(trans), jnp.zeros((n_poses, 3)))

    # dataset scans at the true poses (one-time)
    hits = simulate(bvh, model, poses)
    offset = Transform.from_xyz_euler(
        jnp.asarray([0.0, 0.0, 0.2]), jnp.zeros(3)
    )

    def correction(bvh, points, mask, poses_est):
        """One full correction for all poses: simulate → P2L reduce → solve.
        vmapped over poses (batched pose Transform)."""
        sim = simulate(bvh, model, poses_est)
        d = points
        nrm = sim.normal
        signed = jnp.sum(nrm * (d - sim.point), axis=-1)
        ok = mask & sim.hit & (jnp.abs(signed) <= 2.0)
        proj = d - signed[..., None] * nrm
        stats = CrossStatistics.from_masked_points(d, proj, ok)
        from rmcl_tpu.math.stats import umeyama_transform

        delta = umeyama_transform(stats)
        return (poses_est @ delta).normalized()

    f = jax.jit(correction)
    poses_est = Transform(
        rot=jnp.broadcast_to(offset.rot, (n_poses, 4)) * 0 + poses.rot,
        trans=poses.trans + offset.trans,
    )

    out = f(bvh, hits.point, hits.hit, poses_est)
    jax.block_until_ready(out.trans)

    times = []
    for _ in range(iters):
        t0 = time.time()
        out = f(bvh, hits.point, hits.hit, poses_est)
        jax.block_until_ready(out.trans)
        times.append(time.time() - t0)
    best = min(times)
    total_rays = n_poses * rays_per_pose
    value = total_rays / best

    print(
        json.dumps(
            {
                "metric": "micp_correction_rays_per_sec_1Mfaces",
                "value": round(value, 1),
                "unit": "corr-rays/s",
                "vs_baseline": round(value / BASELINE_EMBREE_1M, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
