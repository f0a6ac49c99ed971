"""Chip: cumsum-partition compaction + window rounds (sort-cost fix)."""
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
from rmcl_tpu.ops.raycast import _traverse_batch, _SENT
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
nodes, root = map_.bvh.nodes, map_.bvh.root_link
R = o.shape[0]
print(f"rays {R}", file=sys.stderr)

def partition_order(cur):
    """Stable alive-first permutation via cumsums (no argsort)."""
    R = cur.shape[0]
    alive = (cur != _SENT).astype(jnp.int32)
    ca = jnp.cumsum(alive)
    na = ca[-1]
    dest = jnp.where(alive == 1, ca - 1, na + jnp.cumsum(1 - alive) - 1)
    return jnp.zeros((R,), jnp.int32).at[dest].set(
        jnp.arange(R, dtype=jnp.int32))

# microbench partition vs argsort
@jax.jit
def part_perm(cur, o, d, tmin, tb, bs, idx):
    order = partition_order(cur)
    t = lambda x: jnp.take(x, order, axis=0)
    return t(cur), t(o), t(d), t(tmin), t(tb), t(bs), t(idx)
n0 = 262144
curx = jnp.asarray(np.where(np.random.rand(n0) < 0.5, 5, _SENT), jnp.int32)
args = (curx, o[:n0], d[:n0], tm[:n0], tm[:n0], jnp.zeros(n0, jnp.int32), jnp.arange(n0, dtype=jnp.int32))
outs = part_perm(*args); sync(outs[0])
t0 = time.perf_counter()
for _ in range(10): outs = part_perm(*args)
sync(outs[0])
print(f"cumsum-partition + 7 permutes @262k: {(time.perf_counter()-t0)/10*1000:.2f} ms")

@partial(jax.jit, static_argnames=("schedule",))
def cast_windows(nodes, root, o, d, t_min, t_max, schedule):
    R = o.shape[0]
    idx = jnp.arange(R, dtype=jnp.int32)
    t_best, best_slot, cur = _traverse_batch(
        nodes, root, o, d, t_min, t_max, max_iters=schedule[0][1])
    for frac, K in schedule[1:]:
        order = partition_order(cur)
        t = lambda x: jnp.take(x, order, axis=0)
        idx = t(idx)
        cur, t_best, best_slot = t(cur), t(t_best), t(best_slot)
        W = int(R * frac)
        iw = idx[:W]
        ow, dw, tminw = (jnp.take(o, iw, axis=0), jnp.take(d, iw, axis=0),
                         jnp.take(t_min, iw))
        tb_w, bs_w, cur_w = _traverse_batch(
            nodes, root, ow, dw, tminw, t_best[:W],
            max_iters=K, cur=cur[:W], t_best=t_best[:W], best_slot=best_slot[:W])
        t_best = jnp.concatenate([tb_w, t_best[W:]])
        best_slot = jnp.concatenate([bs_w, best_slot[W:]])
        cur = jnp.concatenate([cur_w, cur[W:]])
    # safety: full-width uncapped (0 iterations when nothing is alive)
    ow, dw, tminw = (jnp.take(o, idx, axis=0), jnp.take(d, idx, axis=0),
                     jnp.take(t_min, idx))
    t_best, best_slot, cur = _traverse_batch(
        nodes, root, ow, dw, tminw, t_best, cur=cur, t_best=t_best,
        best_slot=best_slot)
    return (jnp.zeros((R,), t_best.dtype).at[idx].set(t_best),
            jnp.zeros((R,), jnp.int32).at[idx].set(best_slot))

def run(tag, schedule, chunk=262144):
    nch = R // chunk
    f = jax.jit(lambda o_, d_, tm_: jax.lax.map(
        lambda a: cast_windows(nodes, root, a[0], a[1], jnp.zeros_like(a[2]), a[2], schedule),
        (o_.reshape(nch, chunk, 3), d_.reshape(nch, chunk, 3), tm_.reshape(nch, chunk))))
    ts = []
    for it in range(3):
        t0 = time.perf_counter()
        tb, bs = f(o, d, tm)
        sync(tb)
        ts.append(time.perf_counter() - t0)
    cs = float(jnp.sum(jnp.where(bs >= 0, tb, 0.0)))
    print(f"{tag}: best {min(ts[1:]):.3f}s (cold {ts[0]:.1f}s) checksum {cs:.1f}")

run("w[64,(3/8,48),(1/8,un)]       ", ((1.0,64),(0.375,48),(0.125,None)))
run("w[64,(1/2,32),(1/4,32),(1/8,un)]", ((1.0,64),(0.5,32),(0.25,32),(0.125,None)))
run("w[56,(1/2,24),(1/4,24),(1/8,24),(1/16,un)]", ((1.0,56),(0.5,24),(0.25,24),(0.125,24),(0.0625,None)))
run("w[64,(1/2,un)]                ", ((1.0,64),(0.5,None)))
run("w[48,(3/4,24),(3/8,24),(1/4,24),(1/8,un)]", ((1.0,48),(0.75,24),(0.375,24),(0.25,24),(0.125,None)))
