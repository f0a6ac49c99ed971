"""Multi-slot window gathers for the exact traversal (round 5).

The traversal is gather-bound (~one 56 B row per visit). In the preorder
layout, BOTH descend (internal pass) and leaf-advance transitions go to
``cur + 1`` — only internal MISSES jump. So one WIDE row of W adjacent
slots (112 B / 224 B — probe_gather_width measured >=224 B rows at ~4x
the narrow byte rate) can serve an adjacency RUN of up to W visits per
gather, with W sub-steps of select-masked arithmetic per iteration.

Measures:
  1. adjacency-run statistics of the kidnap scattered workload (numpy
     walk on a subsample): expected visits served per W-slot gather;
  2. chip A/B: W=1 (shipped cast_rays) vs W=2 vs W=4 traversal on the
     2.1M-ray scattered workload, bitwise checksums compared.

Usage (TPU): python scripts/probe_quad.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.geom.map import MeshMap
from rmcl_tpu.geom.mesh import make_building_scene
from rmcl_tpu.math.se3 import Transform as T
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, probe_update_rays
from rmcl_tpu.ops.raycast import _SENT, cast_rays
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate
from rmcl_tpu.utils.timing import sync

N, S = 32768, 64
mesh = make_building_scene(rooms_x=4, rooms_y=3, subdiv=30, seed=0,
                           door_t=0.5)
map_ = MeshMap.from_mesh(mesh)
lo, hi = mesh.vertices.min(0), mesh.vertices.max(0)
model = SphericalModel.vlp16(width=360)
tp = T.from_xyz_euler(
    jnp.asarray([float(lo[0]) + 2.5, float(lo[1]) + 2.5, 1.0]), jnp.zeros(3))
hits = simulate(map_.bvh, model, tp)
rng = np.random.default_rng(0)
tr = rng.uniform(lo + 0.5, hi - 0.5, (N, 3)).astype(np.float32)
tr[:, 2] = 1.0
yaw = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
poses = T.from_xyz_euler(
    jnp.asarray(tr),
    jnp.stack([jnp.zeros(N), jnp.zeros(N), jnp.asarray(yaw)], -1))
cloud = ParticleCloud.create(N).with_poses(poses)
cfg = SensorUpdateConfig.create(samples=S, engine="bvh", dist_sigma=0.4)
o, d, tm = probe_update_rays(
    cloud, jax.random.PRNGKey(1), jnp.asarray(hits.point),
    jnp.asarray(hits.hit), T.identity(), cfg)
R = o.shape[0]
print(f"rays {R}", file=sys.stderr)

bvh = map_.bvh
nodes_h = np.asarray(jax.device_get(bvh.nodes))
nodes_i_h = nodes_h.view(np.int32)
root = int(np.asarray(bvh.root_link))
SENT = _SENT


# --------------------------------------------------------------------------
# 1. adjacency-run stats (numpy walk, subsample)
# --------------------------------------------------------------------------
def walk_runs(o1, d1, lo1, hi1, W):
    """Visits + gathers-at-window-W for one ray (serial reference walk)."""
    ox, oy, oz = o1
    dx, dy, dz = d1
    inv = lambda v: 1.0 / (v if abs(v) > 1e-20 else 1e-20)
    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    cur = root
    t_best = hi1
    visits = 0
    gathers = 0
    win_base = None
    while cur != SENT and visits < 100000:
        leaf = cur < 0
        idx = ~cur if leaf else cur
        if win_base is None or not (win_base <= idx < win_base + W):
            gathers += 1
            win_base = idx
        visits += 1
        row = nodes_h[idx]
        wi = nodes_i_h[idx]
        if leaf:
            cur = wi[13]
            continue
        bmin = row[0:3]
        bmax = row[3:6]
        tx0, tx1 = (bmin[0] - ox) * ix, (bmax[0] - ox) * ix
        ty0, ty1 = (bmin[1] - oy) * iy, (bmax[1] - oy) * iy
        tz0, tz1 = (bmin[2] - oz) * iz, (bmax[2] - oz) * iz
        tn = max(min(tx0, tx1), min(ty0, ty1), min(tz0, tz1))
        tf = min(max(tx0, tx1), max(ty0, ty1), max(tz0, tz1))
        if tn <= tf and tf >= lo1 and tn <= t_best:
            cur = wi[12]
        else:
            cur = wi[13]
    return visits, gathers


SUB = int(os.environ.get("QUAD_SUB", 2000))
o_h, d_h, tm_h = (np.asarray(x) for x in (o, d, tm))
sel = rng.choice(R, SUB, replace=False)
stats = {}
for W in (1, 2, 4, 8):
    tot_v = tot_g = 0
    for i in sel:
        v, g = walk_runs(o_h[i], d_h[i], 0.0, float(tm_h[i]), W)
        tot_v += v
        tot_g += g
    stats[W] = (tot_v / SUB, tot_g / SUB)
    print(f"W={W}: visits/ray {tot_v/SUB:.1f}, gathers/ray {tot_g/SUB:.1f}, "
          f"visits/gather {tot_v/max(tot_g,1):.2f}", flush=True)


# --------------------------------------------------------------------------
# 2. chip A/B: W-slot window traversal
# --------------------------------------------------------------------------
def make_traverse_w(W):
    n_slots = nodes_h.shape[0]
    as_f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    mode = os.environ.get("QUAD_MODE", "win")
    if mode == "dup":
        # duplicated W-row table: row k = slots k..k+W-1 concatenated.
        # W x memory, but the gather is the known-good jnp.take row path.
        padded = np.concatenate(
            [nodes_i_h, np.zeros((W, 16), np.int32)], 0)
        dup = np.concatenate(
            [padded[j:j + n_slots] for j in range(W)], axis=1)
        dup_j = jnp.asarray(dup)  # (n_slots, 16W)

        def gw(idx):
            return jnp.take(dup_j, idx, axis=0)
    else:
        # flat int32 table padded so window gathers stay in bounds
        flat_i = jnp.asarray(
            np.concatenate(
                [nodes_i_h, np.zeros((W, 16), np.int32)], 0
            ).reshape(-1)
        )
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))

        def gw(idx):
            return jax.lax.gather(
                flat_i, (idx * 16)[:, None], dnums,
                slice_sizes=(16 * W,),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # (R, 16*W)

    def traverse(o, d, t_min, t_max, max_iters, cur, t_best, best_slot):
        Rl = o.shape[0]
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        safe_inv = lambda v: 1.0 / jnp.where(jnp.abs(v) > 1e-20, v, 1e-20)
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
        bound = n_slots if max_iters is None else min(int(max_iters), n_slots)

        def cond(state):
            c, cur, _, _ = state
            return (c < bound) & jnp.any(cur != SENT)

        def body(state):
            c, cur, t_best, best_slot = state
            act0 = cur != SENT
            leaf0 = cur < 0
            idx0 = jnp.where(leaf0, ~cur, cur)
            idx0 = jnp.where(act0, idx0, 0)
            row = gw(idx0)  # (R, 16W) int32
            for j in range(W):
                is_leaf = cur < 0
                idx = jnp.where(is_leaf, ~cur, cur)
                here = (cur != SENT) & (idx == idx0 + j)
                wi = [row[:, j * 16 + k] for k in range(14)]
                w = [as_f(x) for x in wi[:12]]
                v0x, v0y, v0z = w[0], w[1], w[2]
                e1x, e1y, e1z = w[3], w[4], w[5]
                e2x, e2y, e2z = w[6], w[7], w[8]
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                t_tri = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                eps = 1e-7
                tri_ok = ((jnp.abs(det) > 1e-12) & (u >= -eps) & (v >= -eps)
                          & (u + v <= 1.0 + eps) & (t_tri > t_min)
                          & (t_tri < t_best))
                leaf_hit = is_leaf & tri_ok & here
                t_best = jnp.where(leaf_hit, t_tri, t_best)
                best_slot = jnp.where(leaf_hit, idx, best_slot)
                tx0 = (v0x - ox) * ix
                tx1 = (e1x - ox) * ix
                ty0 = (v0y - oy) * iy
                ty1 = (e1y - oy) * iy
                tz0 = (v0z - oz) * iz
                tz1 = (e1z - oz) * iz
                t_near = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1))
                t_far = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1))
                box_hit = (t_near <= t_far) & (t_far >= t_min) & (
                    t_near <= t_best)
                descend = box_hit & ~is_leaf
                nxt = jnp.where(descend, wi[12], wi[13])
                cur = jnp.where(here, nxt, cur)
            return c + 1, cur, t_best, best_slot

        _, cur, t_best, best_slot = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cur, t_best, best_slot))
        return t_best, best_slot, cur

    return traverse


def run_w(W, rounds=((1.0, 64), (0.375, 48), (0.125, None)), chunk=262144):
    tv = make_traverse_w(W)
    # scale round caps by 1/W-ish: each iteration serves ~visits/gather
    # visits, so the same WALL billing needs fewer iterations
    vpg = stats[W][0] / stats[W][1]
    sched = tuple((f, None if K is None else max(8, int(round(K / vpg))))
                  for f, K in rounds)

    from rmcl_tpu.ops.raycast import _partition_alive_first

    def chunk_fn(args):
        o_c, d_c, lo_c, hi_c = args
        Rl = o_c.shape[0]
        idx = jnp.arange(Rl, dtype=jnp.int32)
        cur = jnp.where(hi_c > lo_c, jnp.int32(root), SENT)
        t_best = hi_c
        best_slot = jnp.full((Rl,), -1, jnp.int32)
        t_best, best_slot, cur = tv(o_c, d_c, lo_c, hi_c, sched[0][1],
                                    cur, t_best, best_slot)
        for frac, K in sched[1:]:
            order = _partition_alive_first(cur)
            take = lambda x: jnp.take(x, order, axis=0)
            idx, cur = take(idx), take(cur)
            t_best, best_slot = take(t_best), take(best_slot)
            Wn = max(int(Rl * frac), 1)
            iw = idx[:Wn]
            tb_w, bs_w, cur_w = tv(
                jnp.take(o_c, iw, axis=0), jnp.take(d_c, iw, axis=0),
                jnp.take(lo_c, iw), t_best[:Wn], K, cur[:Wn],
                t_best[:Wn], best_slot[:Wn])
            t_best = jnp.concatenate([tb_w, t_best[Wn:]])
            best_slot = jnp.concatenate([bs_w, best_slot[Wn:]])
            cur = jnp.concatenate([cur_w, cur[Wn:]])
        t_best, best_slot, cur = tv(
            jnp.take(o_c, idx, axis=0), jnp.take(d_c, idx, axis=0),
            jnp.take(lo_c, idx), t_best, None, cur, t_best, best_slot)
        t_out = jnp.zeros((Rl,), t_best.dtype).at[idx].set(t_best)
        s_out = jnp.zeros((Rl,), best_slot.dtype).at[idx].set(best_slot)
        return t_out, s_out

    @jax.jit
    def full(o, d, tmn, tmx):
        n = o.shape[0]
        pad = (-n) % chunk
        if pad:
            o = jnp.concatenate([o, jnp.ones((pad, 3), jnp.float32)], 0)
            d = jnp.concatenate([d, jnp.ones((pad, 3), jnp.float32)], 0)
            tmn = jnp.concatenate([tmn, jnp.zeros(pad, jnp.float32)], 0)
            tmx = jnp.concatenate([tmx, jnp.zeros(pad, jnp.float32)], 0)
        nc = o.shape[0] // chunk
        parts = jax.tree.map(
            lambda x: x.reshape((nc, chunk) + x.shape[1:]), (o, d, tmn, tmx))
        t_hit, slot = jax.lax.map(chunk_fn, parts)
        t_hit = t_hit.reshape(-1)[:n]
        slot = slot.reshape(-1)[:n]
        return jnp.sum(jnp.where(slot >= 0, t_hit, 0.0))

    ts = []
    outv = None
    for it in range(3):
        t0 = time.perf_counter()
        outv = full(o, d, jnp.zeros_like(tm), tm)
        sync(outv)
        ts.append(time.perf_counter() - t0)
    print(f"W={W}: best {min(ts[1:]):.3f}s (cold {ts[0]:.1f}s) "
          f"checksum {float(outv):.1f}", flush=True)
    return min(ts[1:]), float(outv)


RUN = os.environ.get("QUAD_RUN", "base,2,4")
if "base" in RUN:
    f0 = jax.jit(lambda o, d, lo, hi: jnp.sum(
        jnp.where((h := cast_rays(map_.bvh, o, d, lo, hi)).hit, h.t, 0.0)))
    ts = []
    for it in range(3):
        t0 = time.perf_counter()
        cs0 = f0(o, d, jnp.zeros_like(tm), tm)
        sync(cs0)
        ts.append(time.perf_counter() - t0)
    print(f"W=1 (shipped): best {min(ts[1:]):.3f}s checksum {float(cs0):.1f}",
          flush=True)

for W in (2, 4):
    if str(W) in RUN.split(","):
        run_w(W)
