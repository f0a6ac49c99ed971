"""Multi-PROCESS dry run: the full sharded step over a jax.distributed mesh.

The virtual-device tests (tests/test_sharding.py) validate the sharded
pipelines inside ONE process; this script validates the true multi-host
path — N separate processes, a global mesh spanning all of them, and the
psum/ppermute collectives riding the cross-process transport (gloo on
CPU; the same program shape rides ICI/DCN on real TPU pods).

Usage:  python scripts/multihost_dryrun.py [n_processes] [devices_per_proc]
        (defaults 2 x 2 — a 4-device global mesh)

The parent spawns the children and aggregates; exit code 0 means every
process compiled and executed the sharded MICP correction and the MCL
sensor-update + gladiator-resample step with finite, agreeing results.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("MH_PORT", 12731))


def child(proc: int, nproc: int, dev_per_proc: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dev_per_proc}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{PORT}", num_processes=nproc, process_id=proc
    )
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from __graft_entry__ import _build_world
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.geom.mesh import make_sphere
    from rmcl_tpu.math.se3 import Transform
    from rmcl_tpu.mcl.particles import ParticleCloud
    from rmcl_tpu.mcl.resampling import ResamplerConfig
    from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig
    from rmcl_tpu.parallel.mesh import make_mesh, put_replicated, put_sharded
    from rmcl_tpu.parallel.sharded import (
        shard_sensor_data,
        sharded_correct_once,
        sharded_gladiator_resample,
        sharded_sensor_update,
    )

    n_dev = jax.device_count()
    assert n_dev == nproc * dev_per_proc, (n_dev, nproc, dev_per_proc)
    mesh = make_mesh()  # global: spans every process
    bvh, sensor = _build_world(24, 24)

    # MICP: rays sharded across processes, GN statistics psum-merged
    sensors_s = shard_sensor_data([sensor], mesh)
    tom = put_replicated(
        Transform.from_xyz_euler(jnp.asarray([0.0, 0.0, 0.05]), jnp.zeros(3)),
        mesh,
    )
    tbo = put_replicated(Transform.identity(), mesh)
    tom_new, _ = sharded_correct_once(
        bvh, sensors_s, tom, tbo, jnp.float32(0.0), mesh
    )
    jax.block_until_ready(tom_new.trans)
    t = np.asarray(tom_new.trans)  # replicated -> addressable everywhere
    assert np.isfinite(t).all()

    # same through the dense binned engine
    bins = build_bins(make_sphere(24, 24, radius=5.0), bin_size=16)
    tom_b, _ = sharded_correct_once(
        bins, sensors_s, tom, tbo, jnp.float32(0.0), mesh
    )
    tb = np.asarray(jax.block_until_ready(tom_b.trans))
    assert np.isfinite(tb).all()

    # MCL: particles sharded across processes; ppermute resampling ring
    n_particles = 64 * n_dev
    cloud = put_sharded(ParticleCloud.create(n_particles), mesh)
    key = jax.random.PRNGKey(0)
    cloud = sharded_sensor_update(
        bvh,
        cloud,
        key,
        sensor.points,
        sensor.mask,
        put_replicated(Transform.identity(), mesh),
        SensorUpdateConfig.create(samples=8),
        mesh,
    )
    cloud = sharded_gladiator_resample(
        cloud, key, ResamplerConfig.create(), mesh
    )
    lik = float(jnp.mean(cloud.likelihood.mean))  # global reduce -> replicated
    assert np.isfinite(lik)
    print(
        f"proc {proc}/{nproc}: {n_dev} global devices, "
        f"tom={t.round(4).tolist()} tom_binned={tb.round(4).tolist()} "
        f"mcl_mean_lik={lik:.4f}",
        flush=True,
    )


def parent(nproc: int, dev_per_proc: int) -> int:
    env = dict(os.environ, PYTHONPATH=REPO, MH_CHILD="1")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(nproc),
             str(dev_per_proc), str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    ok, lines = True, []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=float(os.environ.get("MH_TIMEOUT", 600)))
        lines += [l for l in out.splitlines() if l.startswith("proc ")]
        if p.returncode != 0:
            ok = False
            print(f"-- process {i} FAILED (rc={p.returncode}):\n{out[-2000:]}")
    for l in lines:
        print(l)
    # replicated outputs must agree bit-for-bit across processes
    toms = {l.split("tom=")[1].split(" tom_binned")[0] for l in lines}
    if ok and len(toms) != 1:
        ok = False
        print(f"-- replicated results DISAGREE across processes: {toms}")
    print("multihost dryrun:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    if os.environ.get("MH_CHILD"):
        nproc, dev_per_proc, proc = (int(a) for a in sys.argv[1:4])
        child(proc, nproc, dev_per_proc)
    else:
        nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
        dev_per_proc = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        sys.exit(parent(nproc, dev_per_proc))
