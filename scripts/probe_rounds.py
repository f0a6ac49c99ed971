"""Chip sweep: capped-round schedules for the exact traversal on the
scattered kidnap ray set. Times cast_rays alone (no sensor-update wrap)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp, numpy as np
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
o, d, tm = jax.device_put(o), jax.device_put(d), jax.device_put(tm)
print(f"rays {o.shape[0]}", file=sys.stderr)

def run(tag, **kw):
    ts = []
    for it in range(3):
        t0 = time.perf_counter()
        out = cast_rays(map_.bvh, o, d, t_max=tm, **kw)
        sync(out.t)
        ts.append(time.perf_counter() - t0)
    cs = float(jnp.sum(jnp.where(out.hit, out.t, 0.0)))
    print(f"{tag}: best {min(ts[1:]):.3f}s (cold {ts[0]:.1f}s) checksum {cs:.1f}")

run("single-shot            ", rounds=None)
run("r(32x4) sub8192        ")
run("r(48,48) sub8192       ", rounds=(48,48), sub_chunk=8192)
run("r(32x4) sub16384       ", sub_chunk=16384)
run("r(64) sub8192          ", rounds=(64,), sub_chunk=8192)
run("r(32x4) sub8192 ck64k  ", chunk_size=65536)
run("r(32x4) sub4096        ", sub_chunk=4096)
run("single ck32k           ", rounds=None, chunk_size=32768)
