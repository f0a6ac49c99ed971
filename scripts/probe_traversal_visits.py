"""Measure exact-traversal visit statistics on the kidnap scattered workload.

Decides which lever buys the VERDICT-r3 #3 target (global-phase update
8.4 s -> <=2 s): lockstep waste (chunk max vs mean visits), gather row
cost, or unordered descent (preorder-threaded vs ideal near-first).

CPU-only (visit counts are hardware-independent).
Usage: python scripts/probe_traversal_visits.py [N_particles] [S]
"""
import sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.geom.map import MeshMap
from rmcl_tpu.geom.mesh import make_building_scene
from rmcl_tpu.math.se3 import Transform as T
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, probe_update_rays
from rmcl_tpu.ops.raycast import _bitcast_i32, _SENT
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
S = int(sys.argv[2]) if len(sys.argv) > 2 else 64
SUBDIV = int(os.environ.get("SEED_SUBDIV", 30))

mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=SUBDIV, seed=0, door_t=0.5)
map_ = MeshMap.from_mesh(mesh)
bvh = map_.bvh
print(f"map: {mesh.faces.shape[0]} faces, {bvh.n_slots} slots", file=sys.stderr)
lo = mesh.vertices.min(0); hi = mesh.vertices.max(0)
model = SphericalModel.vlp16(width=360)
true_pose = T.from_xyz_euler(jnp.asarray([float(lo[0])+2.5, float(lo[1])+2.5, 1.0]), jnp.zeros(3))
hits = simulate(bvh, model, true_pose)
rng = np.random.default_rng(0)
trans = rng.uniform(lo + 0.5, hi - 0.5, (N, 3)).astype(np.float32)
trans[:, 2] = 1.0
yaw = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
poses = T.from_xyz_euler(jnp.asarray(trans),
    jnp.stack([jnp.zeros(N), jnp.zeros(N), jnp.asarray(yaw)], -1))
cloud = ParticleCloud.create(N).with_poses(poses)
cfg = SensorUpdateConfig.create(samples=S, engine="bvh", dist_sigma=0.4)
orig, dirs, tmax = probe_update_rays(cloud, jax.random.PRNGKey(1),
    jnp.asarray(hits.point), jnp.asarray(hits.hit), T.identity(), cfg)
o = np.asarray(orig); d = np.asarray(dirs); tm = np.asarray(tmax)
R = o.shape[0]
print(f"rays: {R}", file=sys.stderr)

# ---- instrumented preorder traversal: per-ray finish iteration ----------
nodes_i = np.asarray(_bitcast_i32(bvh.nodes))[:, :14]
nodes_f = np.asarray(bvh.nodes)
root = int(np.asarray(bvh.root_link))

def visits_preorder(o, d, t_min, t_max):
    """Vectorized numpy mirror of _traverse_batch counting per-ray visits."""
    R = o.shape[0]
    cur = np.full(R, root, np.int64)
    cur[t_max <= t_min] = _SENT
    t_best = t_max.astype(np.float32).copy()
    fin = np.zeros(R, np.int64)
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)
    it = 0
    act_idx = np.arange(R)
    # compact actives in numpy (we only want counts, order-free)
    while True:
        live = cur != _SENT
        if not live.any():
            break
        it += 1
        li = np.nonzero(live)[0]
        c = cur[li]
        isl = c < 0
        idx = np.where(isl, ~c, c).astype(np.int64)
        rows_i = nodes_i[idx]
        rows_f = rows_i[:, :12].view(np.float32)
        ox, oy, oz = o[li, 0], o[li, 1], o[li, 2]
        dx, dy, dz = d[li, 0], d[li, 1], d[li, 2]
        ix, iy, iz = inv[li, 0], inv[li, 1], inv[li, 2]
        w = rows_f
        # leaf MT
        e1 = w[:, 3:6]; e2 = w[:, 6:9]; v0 = w[:, 0:3]
        dd = np.stack([dx, dy, dz], 1)
        pv = np.cross(dd, e2)
        det = np.einsum('ij,ij->i', e1, pv)
        inv_det = np.where(np.abs(det) > 1e-12, 1.0/det, 0.0)
        tv = np.stack([ox, oy, oz], 1) - v0
        u = np.einsum('ij,ij->i', tv, pv) * inv_det
        qv = np.cross(tv, e1)
        v = np.einsum('ij,ij->i', dd, qv) * inv_det
        t_tri = np.einsum('ij,ij->i', e2, qv) * inv_det
        eps = 1e-7
        tri_ok = (np.abs(det) > 1e-12) & (u >= -eps) & (v >= -eps) & (u+v <= 1+eps) & (t_tri > 0.0) & (t_tri < t_best[li])
        leaf_hit = isl & tri_ok
        tb = t_best[li]
        tb[leaf_hit] = t_tri[leaf_hit]
        t_best[li] = tb
        # box
        tx0 = (w[:, 0]-ox)*ix; tx1 = (w[:, 3]-ox)*ix
        ty0 = (w[:, 1]-oy)*iy; ty1 = (w[:, 4]-oy)*iy
        tz0 = (w[:, 2]-oz)*iz; tz1 = (w[:, 5]-oz)*iz
        tn = np.maximum(np.maximum(np.minimum(tx0,tx1), np.minimum(ty0,ty1)), np.minimum(tz0,tz1))
        tf = np.minimum(np.minimum(np.maximum(tx0,tx1), np.maximum(ty0,ty1)), np.maximum(tz0,tz1))
        box_hit = (tn <= tf) & (tf >= 0.0) & (tn <= tb)
        nxt = np.where(box_hit & ~isl, rows_i[:, 12], rows_i[:, 13]).astype(np.int64)
        fin[li] += 1
        cur[li] = nxt
    return fin

fin = visits_preorder(o, d, np.zeros(R, np.float32), tm)
print(f"preorder visits: mean {fin.mean():.0f}  p50 {np.percentile(fin,50):.0f}  "
      f"p90 {np.percentile(fin,90):.0f}  p99 {np.percentile(fin,99):.0f}  max {fin.max()}")

# lockstep waste: chunk pays max-visits; compare orderings
for cs in (262144, 65536, 16384):
    if R < cs: continue
    nch = R // cs
    f2 = fin[:nch*cs].reshape(nch, cs)
    cost_cur = f2.max(1).sum() * cs
    fs = np.sort(fin[:nch*cs]).reshape(nch, cs)
    cost_sorted = fs.max(1).sum() * cs
    ideal = fin[:nch*cs].sum()
    print(f"chunk {cs}: lockstep-cost/ideal  current-order {cost_cur/ideal:.2f}x  "
          f"visit-sorted {cost_sorted/ideal:.2f}x")

# ---- ideal near-first ordered descent (stack traversal) on a sample -----
sample = rng.choice(R, 4000, replace=False)
def visits_ordered(o, d, t_max):
    cnt = np.zeros(len(o), np.int64)
    for k in range(len(o)):
        ox = o[k]; dd = d[k]
        inv = 1.0 / np.where(np.abs(dd) > 1e-20, dd, 1e-20)
        t_best = t_max[k]
        stack = [root]
        n = 0
        while stack:
            link = stack.pop()
            isl = link < 0
            idx = ~link if isl else link
            n += 1
            row_i = nodes_i[idx]
            w = row_i[:12].view(np.float32)
            if isl:
                e1 = w[3:6]; e2 = w[6:9]; v0 = w[0:3]
                pv = np.cross(dd, e2)
                det = float(e1 @ pv)
                if abs(det) > 1e-12:
                    tv = ox - v0
                    u = float(tv @ pv) / det
                    qv = np.cross(tv, e1)
                    v = float(dd @ qv) / det
                    t = float(e2 @ qv) / det
                    if u >= -1e-7 and v >= -1e-7 and u+v <= 1+1e-7 and 0.0 < t < t_best:
                        t_best = t
                continue
            tx = sorted(((w[0]-ox[0])*inv[0], (w[3]-ox[0])*inv[0]))
            ty = sorted(((w[1]-ox[1])*inv[1], (w[4]-ox[1])*inv[1]))
            tz = sorted(((w[2]-ox[2])*inv[2], (w[5]-ox[2])*inv[2]))
            tn = max(tx[0], ty[0], tz[0]); tf = min(tx[1], ty[1], tz[1])
            if tn > tf or tf < 0 or tn > t_best:
                continue
            # children: hit link chain = first child; siblings via miss links
            # enumerate the two children of a preorder-threaded node:
            c1 = row_i[12]
            # child 1's subtree skip = child 2
            c1i = ~c1 if c1 < 0 else c1
            c2 = nodes_i[c1i, 13]
            kids = [c1]
            if c2 != row_i[13]:  # c2 inside this subtree
                kids.append(c2)
            # near-first: order by child box tnear
            def tnear_of(lk):
                i2 = ~lk if lk < 0 else lk
                ww = nodes_i[i2][:12].view(np.float32)
                if lk < 0:
                    return 0.0  # leaf: no box; test immediately
                a = sorted(((ww[0]-ox[0])*inv[0], (ww[3]-ox[0])*inv[0]))
                b = sorted(((ww[1]-ox[1])*inv[1], (ww[4]-ox[1])*inv[1]))
                cc = sorted(((ww[2]-ox[2])*inv[2], (ww[5]-ox[2])*inv[2]))
                return max(a[0], b[0], cc[0])
            kids.sort(key=tnear_of, reverse=True)  # far first (stack pops near)
            stack.extend(kids)
        cnt[k] = n
    return cnt

# note: ordered traversal counts node+leaf pops; preorder counts visits --
# same unit (one gather per pop/visit)
ov = visits_ordered(o[sample], d[sample], tm[sample])
pv = fin[sample]
print(f"sampled {len(sample)} rays: preorder mean {pv.mean():.0f} vs ordered-descent mean {ov.mean():.0f} "
      f"(ratio {pv.mean()/max(ov.mean(),1):.2f}x)  p99 {np.percentile(pv,99):.0f} vs {np.percentile(ov,99):.0f}")

# ---- predictor quality: sort keys we can compute BEFORE the traversal ---
def lockstep(key, cs=16384):
    nch = R // cs
    idx = np.argsort(key[:nch*cs], kind="stable")
    f2 = fin[:nch*cs][idx].reshape(nch, cs)
    return f2.max(1).sum() * cs / fin[:nch*cs].sum()

print("\npredictor lockstep-cost/ideal at chunk 16384:")
print(f"  oracle (true visits): {lockstep(fin):.2f}x")
print(f"  t_max:                {lockstep(tm):.2f}x")
# morton of origin (xy) + tmax bucket
def morton2(x, y, bits=8):
    def spread(v):
        v = v.astype(np.uint32)
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return (spread(x) << 1) | spread(y)
qx = np.clip(((o[:,0]-lo[0])/(hi[0]-lo[0])*255), 0, 255).astype(np.uint32)
qy = np.clip(((o[:,1]-lo[1])/(hi[1]-lo[1])*255), 0, 255).astype(np.uint32)
mo = morton2(qx, qy)
print(f"  origin morton:        {lockstep(mo.astype(np.float64)):.2f}x")
tmb = np.clip(tm, 0, 40.0)
print(f"  (tmax_bucket, morton): {lockstep(np.floor(tmb/2.0)*1e9 + mo):.2f}x")
# direction octant + morton
octant = (d[:,0]>0).astype(int)*4 + (d[:,1]>0).astype(int)*2 + (d[:,2]>0).astype(int)
print(f"  (octant, morton):     {lockstep(octant*1e9 + mo):.2f}x")
print(f"  (morton, tmax):       {lockstep(mo.astype(np.float64)*1e3 + tmb):.2f}x")

np.save("/tmp/fin.npy", fin)
