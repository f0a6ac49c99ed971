"""Probe: MCL sensor-update throughput (binned engine), cluster on/off.

Workload: scattered particle cloud inside the benchmark sphere (worst-case
incoherence: random positions + random yaws), S sampled beams per update.
Measures particles*samples rays/s for the full sensor_update (cast + score
+ likelihood fold).

Usage: python scripts/probe_mcl.py [n_particles] [samples] [faces] [mode] [scene]

mode:  0|1 (cluster off/on, beam-major) | pm (particle-major layout) | both
scene: sphere (50 m shell — pathological long-range) | rooms (multi-room
       building, the binned engine's home turf: short beam footprints)

One config per process (cluster = 0|1|both): the relay backend crashes
nondeterministically on long-lived processes; keep each run small and retry
from the shell.
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

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, sensor_update
from rmcl_tpu.sensors.models import SphericalModel


def main():
    n_particles = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    faces = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    which = sys.argv[4] if len(sys.argv) > 4 else "both"
    scene = sys.argv[5] if len(sys.argv) > 5 else "sphere"

    if scene == "rooms":
        from rmcl_tpu.geom.mesh import make_building_scene

        subdiv = max(2, int(np.sqrt(faces / 550)))
        mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=subdiv)
        lo = mesh.vertices.min(0) + 0.5
        hi = mesh.vertices.max(0) - 0.5
        hi[2] = min(hi[2], 2.0)
    else:
        n = int(np.sqrt(faces / 2))
        mesh = make_sphere(n, n, radius=50.0)
        lo, hi = np.float32([-40, -40, -40]), np.float32([40, 40, 40])
    print(f"scene={scene} faces={mesh.n_faces}")
    bins = build_bins(
        mesh,
        bin_size=int(os.environ.get("BIN_SIZE", 64)),
        bins_per_super=int(os.environ.get("BPS", 64)),
        supers_per_hyper=int(os.environ.get("SPH", 8)),
    )

    # analytic scan from the sphere center: every range is exactly the
    # radius (no TPU casts needed to build the dataset — the flaky relay
    # backend crashes intermittently on eager dispatch storms)
    model = SphericalModel.vlp16(width=360)
    _, dirs_scan = model.rays()
    points = jnp.asarray(np.asarray(dirs_scan) * (50.0 if scene == "sphere" else 4.0))
    mask = jnp.ones(points.shape[0], bool)

    rng = np.random.default_rng(0)
    trans = rng.uniform(lo, hi, (n_particles, 3)).astype(np.float32)
    yaw = rng.uniform(-np.pi, np.pi, n_particles).astype(np.float32)
    poses = Transform.from_xyz_euler(
        jnp.asarray(trans),
        jnp.stack(
            [jnp.zeros(n_particles), jnp.zeros(n_particles), jnp.asarray(yaw)], -1
        ),
    )
    cloud = ParticleCloud.create(n_particles).with_poses(poses)
    key = jax.random.PRNGKey(0)

    modes = {
        "0": ((False, "beam"),),
        "1": ((True, "beam"),),
        "pm": ((True, "particle"),),
        "exact": ((True, "beam"),),
        "both": ((False, "beam"), (True, "beam"), (True, "particle")),
    }[which]
    CB = int(os.environ.get("CBIN", 96))
    CS = int(os.environ.get("CSUPER", 24))
    CH = int(os.environ.get("CHYPER", 0))
    # exact-engine oracle likelihoods (budget-free) for agreement checks
    ref_mean = None
    if os.environ.get("REF", "1") == "1" or which == "exact":
        bvh = build_bvh(mesh)
        cfg_e = SensorUpdateConfig.create(samples=samples, engine="bvh")
        out_e = sensor_update(bvh, cloud, key, points, mask,
                              Transform.identity(), cfg_e)
        sync(out_e.likelihood.mean)
        ref_mean = np.asarray(out_e.likelihood.mean)
        if which == "exact":
            times = []
            for _ in range(3):
                t0 = time.time()
                out_e = sensor_update(bvh, cloud, key, points, mask,
                                      Transform.identity(), cfg_e)
                sync(out_e.likelihood.mean)
                times.append(time.time() - t0)
            best = min(times)
            rays = n_particles * samples
            print(f"engine=bvh (exact): {best*1e3:.1f} ms, "
                  f"{rays/best/1e6:.2f} M particle-beam rays/s")
            return
    for cluster, layout in modes:
        cfg = SensorUpdateConfig.create(
            samples=samples, engine="binned", cluster=cluster, layout=layout,
            c_super=CS, c_bin=CB, c_hyper=CH,
        )
        out = sensor_update(bins, cloud, key, points, mask, Transform.identity(), cfg)
        sync(out.likelihood.mean)
        times = []
        for _ in range(3):
            t0 = time.time()
            out = sensor_update(
                bins, cloud, key, points, mask, Transform.identity(), cfg
            )
            sync(out.likelihood.mean)
            times.append(time.time() - t0)
        best = min(times)
        rays = n_particles * samples
        agree = ""
        if ref_mean is not None:
            m = np.asarray(out.likelihood.mean)
            agree = (f"  | mean-likelihood {m.mean():.4f} vs exact "
                     f"{ref_mean.mean():.4f}, max|d| {np.abs(m-ref_mean).max():.4f}")
        print(
            f"cluster={cluster} layout={layout}: {best*1e3:.1f} ms, "
            f"{rays/best/1e6:.2f} M particle-beam rays/s  "
            f"(times {['%.3f' % t for t in times]}){agree}"
        )


if __name__ == "__main__":
    main()
