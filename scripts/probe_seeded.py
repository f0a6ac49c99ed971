"""Chip probe: scattered-phase MCL sensor update, exact vs seeded engine.

The seeded engine (ops.raycast.cast_rays_seeded) primes the exact
traversal's per-ray t_max with a dense-engine hit (a true upper bound),
collapsing the subtree descent the way closest_points_seeded does for
distance queries (VERDICT r3 next-round #3). This probe times ONE
scattered sensor update — the kidnap bench's global-phase workload
(131k particles x 64 beams on the 4x3-room building map) — per engine.

Usage (TPU):  python scripts/probe_seeded.py [bvh|seeded|binned] [N] [S]
One engine per process (relay crash hygiene); run from the shell:
  for e in bvh seeded; do python scripts/probe_seeded.py $e; done
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.geom.map import MeshMap
from rmcl_tpu.geom.mesh import make_building_scene
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, sensor_update
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate
from rmcl_tpu.utils.timing import sync


def main():
    engine = sys.argv[1] if len(sys.argv) > 1 else "seeded"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    subdiv = int(os.environ.get("SEED_SUBDIV", 30))

    mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=subdiv, seed=0,
                               door_t=0.5)
    map_ = MeshMap.from_mesh(mesh)
    print(f"map: {mesh.faces.shape[0]} faces, engine={engine}, N={N}, S={S}",
          file=sys.stderr)
    lo = mesh.vertices.min(0)
    hi = mesh.vertices.max(0)

    model = SphericalModel.vlp16(width=360)
    true_pose = Transform.from_xyz_euler(
        jnp.asarray([lo[0] + 2.5, lo[1] + 2.5, 1.0]), jnp.zeros(3)
    )
    hits = simulate(map_.bvh, model, true_pose)

    # scattered global-init cloud (the kidnap global phase)
    rng = np.random.default_rng(0)
    trans = rng.uniform(lo + 0.5, hi - 0.5, (N, 3)).astype(np.float32)
    trans[:, 2] = 1.0
    yaw = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
    from rmcl_tpu.math.se3 import Transform as T

    poses = T.from_xyz_euler(
        jnp.asarray(trans),
        jnp.stack([jnp.zeros(N), jnp.zeros(N), jnp.asarray(yaw)], -1),
    )
    cloud = ParticleCloud.create(N).with_poses(poses)

    cfg = SensorUpdateConfig.create(samples=S, engine=engine, dist_sigma=0.4)
    if engine == "binned":
        accel = map_.bins
    elif engine == "seeded":
        accel = (map_.bvh, map_.bins)
    else:
        accel = map_.bvh

    key = jax.random.PRNGKey(1)
    pts = jnp.asarray(hits.point)
    msk = jnp.asarray(hits.hit)
    tsb = Transform.identity()

    rows = []
    for it in range(3):
        k = jax.random.fold_in(key, it)  # fresh beams per run (memoization)
        t0 = time.perf_counter()
        out = sensor_update(accel, cloud, k, pts, msk, tsb, cfg)
        sync(out.likelihood.mean)
        dt = time.perf_counter() - t0
        rows.append(dt)
        rate = N * S / dt / 1e6
        print(f"iter {it}: {dt:.3f} s = {rate:.2f} M beam-rays/s", file=sys.stderr)
    best = min(rows)
    mean_lik = float(np.asarray(out.likelihood.mean).mean())
    print(
        f'{{"engine": "{engine}", "N": {N}, "S": {S}, '
        f'"best_s": {best:.4f}, "rays_per_s": {N * S / best:.0f}, '
        f'"mean_lik": {mean_lik:.6f}}}'
    )


if __name__ == "__main__":
    main()
