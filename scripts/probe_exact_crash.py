"""Bisect the exact-engine TPU worker crash (TPU_NOTES 2026-08-19 PM).

cast_rays (preorder-threaded BVH while_loop traversal) reproducibly kills
the relay worker; the binned engine and plain matmuls run fine. Each mode
isolates one ingredient, run one per process:

  synth     while_loop + per-iteration (R,) gathers from (N,) planes,
            data-dependent indices, NO traversal logic
  synth_fori  same loop body under a fixed-trip fori_loop
  capped    real traversal but cond capped at 64 iterations
  fori      real traversal body under fori_loop(64) (no while cond)
  nocond    real traversal, cond replaced by pure counter (c < 64)
  full      real cast_rays (control: expected to crash)

Usage: python scripts/probe_exact_crash.py <mode>
Driver: for m in synth synth_fori capped fori nocond full; do
          timeout 300 python scripts/probe_exact_crash.py $m; done
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from rmcl_tpu.utils.timing import sync

mode = sys.argv[1] if len(sys.argv) > 1 else "synth"
R = 8192
N = 100_000


def report(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    print(f"{name}: OK {time.time()-t0:.2f}s "
          f"checksum={float(jnp.sum(jax.tree_util.tree_leaves(out)[0])):.4g}",
          flush=True)


if mode in ("synth", "synth_fori"):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    links = jnp.asarray(rng.integers(0, N, size=(N,)).astype(np.int32))
    idx0 = jnp.asarray(rng.integers(0, N, size=(R,)).astype(np.int32))

    @jax.jit
    def synth(table, links, idx0):
        def body(state):
            c, idx, acc = state
            vals = jnp.take(table, idx)
            nxt = jnp.take(links, idx)
            return c + 1, nxt, acc + vals

        def cond(state):
            return state[0] < 200

        if mode == "synth_fori":
            def fbody(_, st):
                _, idx, acc = body((0, st[0], st[1]))[0:3][1:]
                # (reuse body semantics without the counter)
                return idx, acc
            idx, acc = jax.lax.fori_loop(
                0, 200, lambda i, st: (jnp.take(links, st[0]),
                                       st[1] + jnp.take(table, st[0])),
                (idx0, jnp.zeros((R,), jnp.float32)))
            return acc
        _, _, acc = jax.lax.while_loop(
            cond, lambda st: body(st),
            (jnp.int32(0), idx0, jnp.zeros((R,), jnp.float32)))
        return acc

    report(mode, synth, table, links, idx0)
    sys.exit(0)

# real-BVH modes
from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops import raycast as rc

mesh = make_sphere(80, 80, radius=10.0)
bvh = build_bvh(mesh)
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-2, 2, (R, 3)), jnp.float32)
d = rng.normal(size=(R, 3))
d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)

if mode == "full":
    report("full cast_rays", lambda: rc.cast_rays(bvh, o, d).t)
    sys.exit(0)


def traverse_variant(nodes, root_link, o, d, kind, max_steps=64):
    """_traverse_batch with the loop structure swapped."""
    R_ = o.shape[0]
    W = [nodes[:, k] for k in range(14)]
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    safe_inv = lambda v: 1.0 / jnp.where(jnp.abs(v) > 1e-20, v, 1e-20)
    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    SENT = rc._SENT

    def body(state):
        cur, t_best, best_slot = state
        active = cur != SENT
        is_leaf = cur < 0
        idx = jnp.where(is_leaf, ~cur, cur)
        idx = jnp.where(active, idx, 0)
        w = [jnp.take(Wk, idx) for Wk in W]
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
                  & (u + v <= 1.0 + eps) & (t_tri > 0.0) & (t_tri < t_best))
        leaf_hit = is_leaf & tri_ok & active
        t_best = jnp.where(leaf_hit, t_tri, t_best)
        best_slot = jnp.where(leaf_hit, idx, best_slot)
        tx0 = (v0x - ox) * ix
        tx1 = (e1x - ox) * ix
        ty0 = (v0y - oy) * iy
        ty1 = (e1y - oy) * iy
        tz0 = (v0z - oz) * iz
        tz1 = (e1z - oz) * iz
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
        box_hit = (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_best)
        hit_link = rc._bitcast_i32(w[12])
        miss_link = rc._bitcast_i32(w[13])
        descend = box_hit & ~is_leaf
        cur_next = jnp.where(descend, hit_link, miss_link)
        cur_next = jnp.where(active, cur_next, SENT)
        return cur_next, t_best, best_slot

    cur0 = jnp.broadcast_to(root_link, (R_,)).astype(jnp.int32)
    t0 = jnp.full((R_,), rc.NO_HIT_T, jnp.float32)
    s0 = jnp.full((R_,), -1, jnp.int32)
    if kind == "fori":
        _, t_best, best_slot = jax.lax.fori_loop(
            0, max_steps, lambda i, st: body(st), (cur0, t0, s0))
    elif kind == "capped":
        def cond2(cs):
            c, st = cs
            return (c < max_steps) & jnp.any(st[0] != SENT)
        _, (_, t_best, best_slot) = jax.lax.while_loop(
            cond2, lambda cs: (cs[0] + 1, body(cs[1])),
            (jnp.int32(0), (cur0, t0, s0)))
    elif kind == "nocond":
        def cond3(cs):
            return cs[0] < max_steps
        _, (_, t_best, best_slot) = jax.lax.while_loop(
            cond3, lambda cs: (cs[0] + 1, body(cs[1])),
            (jnp.int32(0), (cur0, t0, s0)))
    return t_best, best_slot


if mode == "unbounded":
    # the EXACT original loop (rc._traverse_batch), no payload phase
    f = jax.jit(lambda nodes, root, o, d: rc._traverse_batch(
        nodes, root, o, d, jnp.zeros((R,), jnp.float32),
        jnp.full((R,), rc.NO_HIT_T, jnp.float32)))
    report("unbounded _traverse_batch", f, bvh.nodes, bvh.root_link, o, d)
    sys.exit(0)

if mode == "payload":
    # capped loop + the post-loop payload row gather + plane rederivation
    def with_payload(nodes, root, o, d):
        t_hit, slot = traverse_variant(
            nodes, root, o, d, "capped",
            int(os.environ.get("MAX_STEPS", 4096)))
        slot = jax.lax.stop_gradient(slot)
        hit = slot >= 0
        safe_slot = jnp.where(hit, slot, 0)
        leaf = jnp.take(nodes, safe_slot, axis=0)  # (n, 16) row gather
        v0 = leaf[:, 0:3]
        normal = leaf[:, 9:12]
        denom = jnp.sum(normal * d, axis=-1)
        safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        t_plane = jnp.sum(normal * (v0 - o), axis=-1) / safe_denom
        return jnp.where(hit, t_plane, 0.0)
    report("capped+payload", jax.jit(with_payload),
           bvh.nodes, bvh.root_link, o, d)
    sys.exit(0)

f = jax.jit(lambda nodes, root, o, d: traverse_variant(
    nodes, root, o, d, mode, int(os.environ.get("MAX_STEPS", 64))))
report(f"traverse[{mode}]", f, bvh.nodes, bvh.root_link, o, d)
