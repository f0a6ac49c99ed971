"""Chip: round-4b window-schedule + chunk-size sweep for the scattered cast.

Question 1: the shipped cast_rays default caps the last window at 48
((1,64),(3/8,48),(1/8,48)) while TPU_NOTES' measured best uncaps it
((1,64),(3/8,48),(1/8,None)) — stragglers beyond 160 visits currently run
in the FULL-width safety pass (max 189 visits => ~29 full-width rounds).
Question 2: per-iteration gather cost had a fixed component at 262k lanes
(probe_gather_width) — do bigger chunks amortize it?
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from rmcl_tpu.geom.map import MeshMap
from rmcl_tpu.geom.mesh import make_building_scene
from rmcl_tpu.math.se3 import Transform as T
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, probe_update_rays
from rmcl_tpu.ops.raycast import cast_rays
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate
from rmcl_tpu.utils.timing import sync

N, S = 32768, 64
mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=30, seed=0, door_t=0.5)
map_ = MeshMap.from_mesh(mesh)
lo, hi = mesh.vertices.min(0), mesh.vertices.max(0)
model = SphericalModel.vlp16(width=360)
tp = T.from_xyz_euler(jnp.asarray([float(lo[0])+2.5, float(lo[1])+2.5, 1.0]), jnp.zeros(3))
hits = simulate(map_.bvh, model, tp)
rng = np.random.default_rng(0)
tr = rng.uniform(lo+0.5, hi-0.5, (N,3)).astype(np.float32); tr[:,2]=1.0
yaw = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
poses = T.from_xyz_euler(jnp.asarray(tr), jnp.stack([jnp.zeros(N), jnp.zeros(N), jnp.asarray(yaw)],-1))
cloud = ParticleCloud.create(N).with_poses(poses)
cfg = SensorUpdateConfig.create(samples=S, engine="bvh", dist_sigma=0.4)
o, d, tm = probe_update_rays(cloud, jax.random.PRNGKey(1), jnp.asarray(hits.point), jnp.asarray(hits.hit), T.identity(), cfg)
R = o.shape[0]
print(f"rays {R}", file=sys.stderr)


_ref_checksum = [None]


def run(tag, schedule, chunk=262144):
    f = jax.jit(partial(cast_rays, chunk_size=chunk, rounds=schedule))
    ts = []
    for it in range(3):
        t0 = time.perf_counter()
        h = f(map_.bvh, o, d, jnp.zeros_like(tm), tm)
        sync(h.t)
        ts.append(time.perf_counter() - t0)
    cs = float(jnp.sum(jnp.where(h.hit, h.t, 0.0)))
    # `rounds` is documented bitwise-identical across schedules — enforce
    # it instead of eyeballing stderr (ADVICE r4)
    if _ref_checksum[0] is None:
        _ref_checksum[0] = cs
    else:
        assert cs == _ref_checksum[0], (
            f"{tag}: checksum {cs} != reference {_ref_checksum[0]}"
        )
    print(f"{tag}: best {min(ts[1:]):.3f}s (cold {ts[0]:.1f}s) checksum {cs:.1f}", flush=True)


run("shipped  w[64,(3/8,48),(1/8,48)] c256k", ((1.0,64),(0.375,48),(0.125,48)))
run("uncapped w[64,(3/8,48),(1/8,un)] c256k", ((1.0,64),(0.375,48),(0.125,None)))
run("uncapped w[64,(3/8,48),(1/8,48),(1/32,un)] c256k", ((1.0,64),(0.375,48),(0.125,48),(0.03125,None)))
run("uncapped c512k", ((1.0,64),(0.375,48),(0.125,None)), chunk=524288)
run("uncapped c1M  ", ((1.0,64),(0.375,48),(0.125,None)), chunk=1048576)
run("uncapped c2M  ", ((1.0,64),(0.375,48),(0.125,None)), chunk=2097152)
run("deep c1M w[56,(1/2,24),(1/4,24),(1/8,24),(1/16,un)]",
    ((1.0,56),(0.5,24),(0.25,24),(0.125,24),(0.0625,None)), chunk=1048576)
