"""Multi-process scaling-efficiency harness (VERDICT r1 #6).

Runs the sharded MICP correction workload over a true jax.distributed
mesh (N separate processes, gloo collectives on CPU — the same program
shape rides ICI/DCN on TPU pods) for N = 1, 2, 4, ... and reports a JSON
efficiency table:

  - rays/s per process count + parallel efficiency vs N=1
  - pose-track agreement across process counts (allclose) and bitwise
    repeatability at fixed N (two runs, same seed)
  - scene_shard work inflation + load imbalance on an in-process mesh

North star (BASELINE.md): >= 0.85 rays/s efficiency at 4 hosts with
allclose pose tracks. CPU-host caveat: contention on a small core count
depresses the efficiency number; the harness measures the real transport
+ partitioning overheads either way.

Usage: python scripts/multihost_scaling.py [--max-procs 4] [--iters 4]
Emits one JSON line prefixed SCALING_JSON: for CI scraping.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("MH_PORT", 12761))


def child(proc: int, nproc: int, iters: int, width: int, height: int,
          faces: int, steps: int) -> None:
    # one core per process, INCLUDING the N=1 baseline: without pinning,
    # XLA's intra-op pool gives the single process every core, which makes
    # multi-process strong scaling look like pure overhead on a small host
    try:
        os.sched_setaffinity(0, {proc % os.cpu_count()})
    except (AttributeError, OSError):
        pass
    # single-thread everything: each process owns ONE core, and XLA's
    # default per-process eigen pool (n_cores threads) thrashes it —
    # without this the rows measure oversubscription, not transport
    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ["OPENBLAS_NUM_THREADS"] = "1"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1 "
        "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if nproc > 1:
        jax.distributed.initialize(
            f"localhost:{PORT}", num_processes=nproc, process_id=proc
        )
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.geom.mesh import make_sphere
    from rmcl_tpu.math.se3 import Transform
    from rmcl_tpu.micp.pipeline import MICPSensorConfig, MICPSensorData
    from rmcl_tpu.parallel.mesh import make_mesh, put_replicated
    from rmcl_tpu.parallel.sharded import shard_sensor_data, sharded_correct_once
    from rmcl_tpu.sensors.models import SphericalModel
    from rmcl_tpu.sensors.simulate import simulate
    from rmcl_tpu.utils.timing import sync

    mesh = make_mesh()
    n = int(np.sqrt(faces / 2))
    world = make_sphere(n, n, radius=20.0)
    bvh = build_bvh(world)
    model = SphericalModel.create(
        width=width, height=height, phi_min=-0.4, phi_max=0.4,
        range_min=0.05, range_max=100.0,
    )
    true_pose = Transform.identity()
    hits = simulate(bvh, model, true_pose)
    sensor = MICPSensorData(
        model=model, points=hits.point, mask=hits.hit,
        tsb=Transform.identity(), config=MICPSensorConfig.create(max_dist=2.0),
    )
    sensors_s = shard_sensor_data([sensor], mesh)
    bvh_r = put_replicated(bvh, mesh)

    def track(offset_z, readback_each=True):
        """steps corrections from a z-offset start — the pose track.

        The timed variant keeps the chain on-device and reads back once at
        the end (per-step host syncs serialize the multi-process dispatch
        and would measure the harness, not the pipeline)."""
        tom = put_replicated(
            Transform.from_xyz_euler(
                jnp.asarray([0.0, 0.0, offset_z]), jnp.zeros(3)
            ),
            mesh,
        )
        tbo = put_replicated(Transform.identity(), mesh)
        poses = []
        for _ in range(steps):
            tom, _ = sharded_correct_once(
                bvh_r, sensors_s, tom, tbo, jnp.float32(0.0), mesh
            )
            if readback_each:
                poses.append(np.asarray(sync(tom.trans)))
        if not readback_each:
            return np.asarray(sync(tom.trans))[None]
        return np.stack(poses)

    track(0.05)  # compile + warm
    # timed iterations: fresh offset each -> no caching anywhere
    t0 = time.time()
    for i in range(iters):
        track(0.05 + 0.001 * (i + 1), readback_each=False)
    dt = (time.time() - t0) / iters

    # transport floor: time K bare scalar psums over the same mesh — the
    # per-collective rendezvous cost that the efficiency rows pay (on TPU
    # ICI this is ~µs; on gloo/loopback it DOMINATES the small workload,
    # which is what makes the host-CPU efficiency an undercount)
    from rmcl_tpu.parallel.mesh import RAY_AXIS
    from jax.sharding import PartitionSpec as P_

    @jax.jit
    def psum_chain(x):
        def body(c, _):
            return jax.lax.psum(c, RAY_AXIS) * 0.5, None
        y, _ = jax.lax.scan(body, x, None, length=20)
        return y

    pc = jax.shard_map(
        psum_chain, mesh=mesh, in_specs=P_(), out_specs=P_(),
        check_vma=False,
    )
    xs = jnp.float32(1.0)
    sync(pc(xs))
    t0 = time.time()
    for _ in range(3):
        sync(pc(xs + 1.0))
    psum_floor = (time.time() - t0) / 3 / 20

    # deterministic track for cross-N comparison + bitwise repeat
    tr_a = track(0.1)
    tr_b = track(0.1)
    if proc == 0:
        out = {
            "nproc": nproc,
            "sec_per_track": dt,
            "rays": model.n_rays * steps,
            "track": tr_a.tolist(),
            "bitstable_repeat": bool((tr_a == tr_b).all()),
            "psum_rendezvous_sec": psum_floor,
        }
        print("CHILD_JSON:" + json.dumps(out), flush=True)


def run_group(nproc: int, args, width: int | None = None,
              port_salt: int = 0) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, MH_SCALING_CHILD="1",
               MH_PORT=str(PORT + nproc + port_salt))
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(nproc), str(i),
             str(args.iters), str(width or args.width), str(args.height),
             str(args.faces), str(args.steps)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    result = None
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=float(os.environ.get("MH_TIMEOUT", 1200)))
        if p.returncode != 0:
            print(f"-- nproc={nproc} process {i} FAILED:\n{out[-1500:]}")
            return {"nproc": nproc, "error": f"rc={p.returncode}"}
        for line in out.splitlines():
            if line.startswith("CHILD_JSON:"):
                result = json.loads(line[len("CHILD_JSON:"):])
    return result or {"nproc": nproc, "error": "no result line"}


def scene_shard_stats(args) -> dict:
    """In-process scene_shard work inflation + imbalance on a virtual mesh."""
    code = r"""
import os, sys, time, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, %r)
from jax.sharding import Mesh
from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast_binned import cast_rays_binned
from rmcl_tpu.parallel.scene_shard import (
    SCENE_AXIS, cast_rays_scene_forwarded, cast_rays_scene_sharded,
    partition_bins, put_scene_sharded, shard_boxes)
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.utils.timing import sync

# building map, sensor inside one room: the scene-partitioning use case
# (city/building maps too big to replicate). A sphere-shell map with
# center rays is the forwarding-pathological case — every shard box
# contains the origin, so every ray escalates (measured 3.6x; kept in
# TPU_NOTES as the degenerate bound).
from rmcl_tpu.geom.mesh import make_building_scene
world = make_building_scene(rooms_x=4, rooms_y=3, subdiv=30, seed=0,
                            door_t=0.5)
bins = build_bins(world, bin_size=32, bins_per_super=16)
_ = %d  # faces arg unused for the building map
model = SphericalModel.create(width=%d, height=%d, phi_min=-0.4, phi_max=0.4,
                              range_min=0.05, range_max=100.0)
o, d = model.rays()
lo = world.vertices.min(0); hi = world.vertices.max(0)
pose = jnp.asarray([lo[0]*0.7 + hi[0]*0.3, lo[1]*0.7 + hi[1]*0.3, 1.2],
                   jnp.float32)
o = jnp.broadcast_to(pose, d.shape)

mesh = Mesh(np.array(jax.devices()).reshape(4), (SCENE_AXIS,))
sb0 = partition_bins(bins, 4)
boxes = shard_boxes(sb0)
sb = put_scene_sharded(sb0, mesh)

def timed(f, *a):
    out = f(*a); sync(out)
    t0 = time.time(); out = f(*a); sync(out)
    return time.time() - t0

t_single = timed(lambda: cast_rays_binned(bins, o, d, c_super=256, c_bin=768))
t_shard = timed(lambda: cast_rays_scene_sharded(sb, o, d, mesh, c_super=256, c_bin=768))
t_fwd = timed(lambda: cast_rays_scene_forwarded(sb, o, d, mesh, boxes, c_super=256, c_bin=768))
h1 = cast_rays_binned(bins, o, d, c_super=256, c_bin=768)
h2 = cast_rays_scene_sharded(sb, o, d, mesh, c_super=256, c_bin=768)
h3 = cast_rays_scene_forwarded(sb, o, d, mesh, boxes, c_super=256, c_bin=768)
agree = float(jnp.mean((h1.hit == h2.hit)))
agree_f = float(jnp.mean((h1.hit == h3.hit)))
print("SCENE_JSON:" + json.dumps({
    "t_single": t_single, "t_scene_sharded_4": t_shard,
    "t_scene_forwarded_4": t_fwd,
    "work_inflation_wall": t_shard / t_single,
    "forwarded_inflation_wall": t_fwd / t_single,
    "hit_agreement": agree, "hit_agreement_forwarded": agree_f}))
""" % (REPO, args.faces, args.width, args.height)
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1200)
    for line in r.stdout.splitlines():
        if line.startswith("SCENE_JSON:"):
            return json.loads(line[len("SCENE_JSON:"):])
    return {"error": r.stdout[-800:] + r.stderr[-800:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-procs", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--width", type=int, default=1440)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--faces", type=int, default=100_000)
    ap.add_argument("--weak", action="store_true", default=True,
                    help="add constant-work-per-process rows")
    ap.add_argument("--no-weak", dest="weak", action="store_false")
    args = ap.parse_args()

    rows, base = [], None
    n = 1
    while n <= args.max_procs:
        r = run_group(n, args)
        if "error" not in r:
            rps = r["rays"] / r["sec_per_track"]
            if base is None:
                base = rps
            r["rays_per_sec"] = rps
            r["efficiency"] = rps / (base * n)
        rows.append(r)
        n *= 2

    # cross-N pose-track agreement (strong rows share one workload)
    tracks = [np.asarray(r["track"]) for r in rows if "track" in r]
    allclose = all(
        np.allclose(tracks[0], t, rtol=1e-4, atol=1e-5) for t in tracks[1:]
    )
    for r in rows:
        r.pop("track", None)

    # weak scaling: constant rays PER PROCESS (width scales with N), the
    # throughput-scaling reading of the >=0.85 @ 4 hosts north star — the
    # strong rows above pin a small fixed workload and so measure the gloo
    # rendezvous floor, not the pipeline's scaling
    weak_rows = []
    if args.weak and base is not None:
        n = 2
        while n <= args.max_procs:
            r = run_group(n, args, width=args.width * n, port_salt=64)
            if "error" not in r:
                rps = r["rays"] / r["sec_per_track"]
                r["rays_per_sec"] = rps
                r["efficiency"] = rps / (base * n)
            r.pop("track", None)
            weak_rows.append(r)
            n *= 2

    scene = scene_shard_stats(args)
    table = {
        "workload": {"faces": args.faces, "rays_per_step": args.width * args.height,
                     "steps": args.steps},
        # honest context: with nproc approaching the host's core count the
        # pinned processes + gloo rendezvous oversubscribe the box and the
        # strong rows measure the CPU-distributed runtime's floor, not the
        # pipeline's scaling (this harness's value is the transport-level
        # correctness: bit-stable repeats + allclose tracks across nproc)
        "host_cores": os.cpu_count(),
        "rows": rows,
        "weak_rows": weak_rows,
        "pose_tracks_allclose_across_nproc": bool(allclose),
        "scene_shard": scene,
    }
    print("SCALING_JSON:" + json.dumps(table))
    import numpy as _np  # noqa
    ok = allclose and all("error" not in r for r in rows)
    return 0 if ok else 1


if __name__ == "__main__":
    if os.environ.get("MH_SCALING_CHILD"):
        nproc, proc, iters, width, height, faces, steps = (
            int(a) for a in sys.argv[1:8]
        )
        child(proc, nproc, iters, width, height, faces, steps)
    else:
        import numpy as np  # parent-side only
        sys.exit(main())
