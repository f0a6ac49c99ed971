"""Batched BVH ray casting — the heart of the framework.

TPU-native replacement for every rmagine simulator backend
(``{Sphere,Pinhole,O1Dn,OnDn}Simulator{Embree,Optix,Vulkan}`` — SURVEY.md
§2.9): ONE batched closest-hit kernel over the preorder-threaded slot BVH,
shared by all sensor models, both localization algorithms and the
map-segmentation ops.

Traversal design (see rmcl_tpu.bvh.types for the slot layout):
  * stackless skip-link traversal — per-ray state is THREE registers
    (current link, best t, best slot). Per-lane stack scatters measured
    ~1600x slower than register state on TPU v5e, so the threaded layout is
    load-bearing, not a style choice;
  * one uniform 64-byte gather per step; the slot is decoded BOTH as an
    internal node (own AABB + hit/miss links) and as an inline triangle, and
    the results are select-merged — no divergent branches in the lockstep
    vmapped loop;
  * rays are processed in fixed-size chunks (``lax.map``) so one deep ray
    only stalls its own chunk.

PITFALL: always pass the BVH *as an argument* through jit boundaries. A BVH
closed over by an outer ``jax.jit`` becomes an HLO constant, and multi-MB
constants push the TPU compiler into minutes of constant folding.

Differentiability: the discrete traversal (which triangle was hit) is wrapped
in ``stop_gradient``; the hit distance is then *re-derived from the plane
equation* of the hit triangle, so gradients flow exactly through ray origin
and direction. This is the "differentiable" capability the reference lacks
(BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.types import BVH, SENTINEL_LINK

Array = jax.Array

# python floats/ints (weak-typed), NOT jnp scalars: module-level jnp
# constants become tracers when the module is first imported inside a
# jit trace, poisoning every later trace
NO_HIT_T = 3.0e38
_SENT = int(SENTINEL_LINK)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayHits:
    """SoA hit record for a batch of rays.

    Mirrors the attribute bundle the reference requests from rmagine
    simulators (``Bundle<Points, Normals, Hits>`` — RCCEmbree.hpp:18-83)
    plus ids and ranges.
    """

    t: Array  # (...,) hit distance (NO_HIT_T when missed)
    hit: Array  # (...,) bool
    prim_id: Array  # (...,) int32 original face id (-1 when missed)
    inst_id: Array  # (...,) int32 instance id (-1 when missed)
    point: Array  # (..., 3) hit point in ray frame (orig + t*dir)
    normal: Array  # (..., 3) geometric unit normal


def _bitcast_i32(x: Array) -> Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _traverse_batch(nodes, root_link, o, d, t_min, t_max, max_iters=None,
                    cur=None, t_best=None, best_slot=None):
    """Stackless closest-hit traversal, hand-batched over rays.

    o, d: (R, 3); t_min, t_max: (R,). Returns (t_best, best_slot, cur) with
    best_slot == -1 on miss and cur == SENTINEL_LINK when the ray FINISHED.
    All loop state is (R,) registers.

    ``max_iters`` caps the loop (static); ``cur``/``t_best``/``best_slot``
    resume a paused traversal — together they let
    :func:`_traverse_rounds` run the traversal in capped ROUNDS with
    alive-compaction in between (per-ray serial semantics are untouched,
    so results are bitwise identical to one uncapped run).

    LAYOUT NOTE (load-bearing for TPU): every array inside the loop is
    (R,)-shaped — ray components are split into scalar planes and node words
    are gathered from 16 separate (N,) planes. (R,3)/(R,16)-shaped
    intermediates use only 3/128 or 16/128 vector lanes and profile ~40x
    slower on v5e; the transpose of `nodes` below is a one-time cost.

    INT-GATHER NOTE (load-bearing for TPU correctness): the slot words are
    gathered as INT32 planes and bitcast to float afterwards. Links/ids are
    int32 bit patterns stored in a float array; values below 2^23 are
    DENORMAL float patterns, and the TPU's float data path flushes
    denormals — a float gather/select corrupts every small link to 0,
    sending rays to slot 0 forever. (Found 2026-08-19: the exact engine's
    worker "crash" was this — zombie rays kept the unbounded while_loop
    spinning until the runtime watchdog killed the worker; identical code
    is correct on CPU. Int gathers are bit-exact by construction.) The
    loop is additionally BOUNDED at n_slots iterations — a preorder
    traversal visits each slot at most once, so the bound is semantically
    free and guarantees termination even on corrupted state.
    """
    R = o.shape[0]
    # 14 of the 16 slot words as ONE INT32 (N,14) table (words 14-15 —
    # inst id / pad — are not needed in the loop). Gathered as ROWS: one
    # 56-byte row gather per visit, sliced back to (R,) planes for the
    # arithmetic. Measured on chip (2026-08-20, 32k scattered rays,
    # 433k-slot building BVH): row gather 332k rays/s vs 14 separate
    # (N,)-plane gathers 30k rays/s — per-row cost dominates gather time,
    # so one wide row beats 14 narrow ones 11x. Int32 gathers stay
    # mandatory (see INT-GATHER NOTE above).
    nodes_i = _bitcast_i32(nodes)[:, :14]
    as_f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) > 1e-20, v, 1e-20)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    n_slots = nodes.shape[0]
    # the preorder traversal visits each slot at most once, so n_slots
    # bounds any complete traversal; a smaller max_iters merely PAUSES it
    bound = n_slots if max_iters is None else min(int(max_iters), n_slots)

    def cond(state):
        c, cur, _, _ = state
        return (c < bound) & jnp.any(cur != _SENT)

    def body(state):
        c, cur, t_best, best_slot = state
        active = cur != _SENT
        is_leaf = cur < 0
        idx = jnp.where(is_leaf, ~cur, cur)
        idx = jnp.where(active, idx, 0)
        rows = jnp.take(nodes_i, idx, axis=0)  # (R,14) int32 — bit-exact
        wi = [rows[:, k] for k in range(14)]
        w = [as_f(x) for x in wi[:12]]

        # -- leaf interpretation: inline triangle (Möller–Trumbore) -------
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
        tri_ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= -eps)
            & (v >= -eps)
            & (u + v <= 1.0 + eps)
            & (t_tri > t_min)
            & (t_tri < t_best)
        )
        leaf_hit = is_leaf & tri_ok & active
        t_best = jnp.where(leaf_hit, t_tri, t_best)
        best_slot = jnp.where(leaf_hit, idx, best_slot)

        # -- internal interpretation: own AABB slab test ------------------
        # (w[0:3] = bmin, w[3:6] = bmax for internal slots)
        tx0 = (v0x - ox) * ix
        tx1 = (e1x - ox) * ix
        ty0 = (v0y - oy) * iy
        ty1 = (e1y - oy) * iy
        tz0 = (v0z - oz) * iz
        tz1 = (e1z - oz) * iz
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        box_hit = (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_best)

        hit_link = wi[12]  # already int32 — no float round trip
        miss_link = wi[13]
        descend = box_hit & ~is_leaf
        cur_next = jnp.where(descend, hit_link, miss_link)
        cur_next = jnp.where(active, cur_next, _SENT)
        return c + 1, cur_next, t_best, best_slot

    if cur is None:
        cur = jnp.where(
            t_max > t_min,
            jnp.broadcast_to(root_link, (R,)).astype(jnp.int32),
            _SENT,
        )
    if t_best is None:
        t_best = t_max
    if best_slot is None:
        best_slot = jnp.full((R,), -1, jnp.int32)
    _, cur, t_best, best_slot = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cur, t_best, best_slot)
    )
    return t_best, best_slot, cur


def _partition_alive_first(cur):
    """Stable alive-first permutation via cumsums (cheaper than argsort)."""
    R = cur.shape[0]
    alive = (cur != _SENT).astype(jnp.int32)
    ca = jnp.cumsum(alive)
    dest = jnp.where(alive == 1, ca - 1, ca[-1] + jnp.cumsum(1 - alive) - 1)
    return jnp.zeros((R,), jnp.int32).at[dest].set(
        jnp.arange(R, dtype=jnp.int32)
    )


def _traverse_rounds(nodes, root_link, o, d, t_min, t_max, rounds):
    """Capped-round traversal with alive-compaction — lockstep-waste killer.

    The single-shot lockstep loop bills every ray in a chunk for the
    chunk's MAX visit count; on scattered MCL workloads that is 3.25x the
    per-ray ideal (measured, scripts/probe_traversal_visits.py: visits
    mean 58 / p99 115 / max 189 on the 217k-face building map, and no
    static key — t_max, origin Morton, direction octant — predicts the
    deep rays). This runs the SAME traversal in capped WINDOW rounds:
    ``rounds = ((1.0, K0), (frac1, K1), ...)`` — round j re-orders rays
    alive-first (cumsum partition; argsort measured the same, both ~the
    permute cost) and runs ONE full-vector while_loop over the leading
    ``frac*R`` lanes capped at K iterations; a final FULL-width uncapped
    pass guarantees correctness for any stragglers beyond the last window
    (it costs ZERO iterations when none are alive — the loop cond fails
    before the first body). Per-ray serial semantics are untouched, so
    results are BITWISE identical to the single-shot loop; only billing
    changes.

    Chip A/B (2.1M scattered kidnap rays, 217k-face building map,
    2026-08-20, scripts/probe_rounds{,2,3}.py): single-shot 1.833 s;
    sub-chunk lax.map variants 1.30-1.61 s (serialization + per-dispatch
    overhead eat the model's 3x); window rounds ((1,64),(3/8,48),
    (1/8,None)) **1.296 s = 1.41x** — the best measured schedule, kept as
    the default. Checksums bitwise-equal throughout.

    Round-4b A/B (scripts/probe_rounds4.py, same workload): CAPPING the
    last window at 48 sends the >160-visit stragglers (max 189) to the
    full-width safety pass — 1.536 s vs 1.313 s with the tail window
    uncapped (1.17x); an extra 1/32 window after a capped 1/8 is worse
    (1.358 s), and larger chunks lose outright (512k 2.57 s / 1M 1.46 s /
    2M 1.67 s at this 2.1M-ray workload) — the per-iteration gather cost
    scales with lanes, there is no fixed dispatch term to amortize.
    """
    R = o.shape[0]
    idx = jnp.arange(R, dtype=jnp.int32)
    t_best, best_slot, cur = _traverse_batch(
        nodes, root_link, o, d, t_min, t_max, max_iters=rounds[0][1]
    )
    for frac, K in rounds[1:]:
        order = _partition_alive_first(cur)
        take = lambda x: jnp.take(x, order, axis=0)
        idx, cur = take(idx), take(cur)
        t_best, best_slot = take(t_best), take(best_slot)
        W = max(int(R * frac), 1)
        iw = idx[:W]
        tb_w, bs_w, cur_w = _traverse_batch(
            nodes, root_link, jnp.take(o, iw, axis=0),
            jnp.take(d, iw, axis=0), jnp.take(t_min, iw), t_best[:W],
            max_iters=K, cur=cur[:W], t_best=t_best[:W],
            best_slot=best_slot[:W],
        )
        t_best = jnp.concatenate([tb_w, t_best[W:]])
        best_slot = jnp.concatenate([bs_w, best_slot[W:]])
        cur = jnp.concatenate([cur_w, cur[W:]])
    # safety net: full-width uncapped — 0 iterations when nothing is alive
    t_best, best_slot, cur = _traverse_batch(
        nodes, root_link, jnp.take(o, idx, axis=0),
        jnp.take(d, idx, axis=0), jnp.take(t_min, idx), t_best,
        cur=cur, t_best=t_best, best_slot=best_slot,
    )
    # scatter back to original ray order
    t_out = jnp.zeros((R,), t_best.dtype).at[idx].set(t_best)
    s_out = jnp.zeros((R,), best_slot.dtype).at[idx].set(best_slot)
    return t_out, s_out


@partial(
    jax.jit,
    static_argnames=("chunk_size", "flip_normals", "rounds"),
)
def cast_rays(
    bvh: BVH,
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    chunk_size: int = 262144,
    flip_normals: bool = True,
    rounds: tuple = ((1.0, 64), (0.375, 48), (0.125, None)),
) -> RayHits:
    """Batch closest-hit query.

    orig, dirs: (..., 3) — broadcastable ray origins and (unit) directions.
    Returns a RayHits with the same leading batch shape. ``t`` is
    differentiable w.r.t. ``orig`` and ``dirs`` (plane-equation rederivation).

    ``rounds`` controls the capped window-round compaction schedule (see
    :func:`_traverse_rounds`); it changes BILLING only, never results.
    ``rounds=None`` forces the single-shot loop (small batches use it
    automatically).
    """
    orig, dirs = jnp.broadcast_arrays(
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    batch_shape = orig.shape[:-1]
    o_flat = orig.reshape(-1, 3)
    d_flat = dirs.reshape(-1, 3)
    n = o_flat.shape[0]

    t_min_arr = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), batch_shape).reshape(-1)
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), batch_shape).reshape(-1)

    chunk = min(chunk_size, max(n, 1))
    n_pad = (-n) % chunk
    if n_pad:
        o_flat = jnp.concatenate([o_flat, jnp.ones((n_pad, 3), o_flat.dtype)], 0)
        d_flat = jnp.concatenate([d_flat, jnp.ones((n_pad, 3), d_flat.dtype)], 0)
        t_min_arr = jnp.concatenate([t_min_arr, jnp.zeros((n_pad,), jnp.float32)], 0)
        t_max_arr = jnp.concatenate([t_max_arr, jnp.zeros((n_pad,), jnp.float32)], 0)

    nodes = bvh.nodes
    root = bvh.root_link

    # capped-round compaction only pays off when a chunk is large enough
    # for lockstep waste to exist; small batches keep the single-shot loop
    use_rounds = rounds is not None and chunk >= 32768

    def chunk_fn(args):
        o, d, lo, hi = args
        if use_rounds:
            return _traverse_rounds(nodes, root, o, d, lo, hi, rounds)
        return _traverse_batch(nodes, root, o, d, lo, hi)[:2]

    n_chunks = (n + n_pad) // chunk
    if n_chunks == 1:
        t_hit, slot = chunk_fn((o_flat, d_flat, t_min_arr, t_max_arr))
    else:
        t_hit, slot = jax.lax.map(
            chunk_fn,
            (
                o_flat.reshape(n_chunks, chunk, 3),
                d_flat.reshape(n_chunks, chunk, 3),
                t_min_arr.reshape(n_chunks, chunk),
                t_max_arr.reshape(n_chunks, chunk),
            ),
        )
    t_hit = t_hit.reshape(-1)[:n]
    slot = slot.reshape(-1)[:n]

    # --- differentiable re-derivation of the hit distance ----------------
    slot = jax.lax.stop_gradient(slot)
    hit = slot >= 0
    safe_slot = jnp.where(hit, slot, 0)
    # int32 row gather: word 12/14 are int ids whose small values are
    # denormal float patterns — a float gather flushes them on TPU (see
    # _traverse_batch INT-GATHER NOTE)
    leaf_i = jax.lax.stop_gradient(
        jnp.take(_bitcast_i32(nodes), safe_slot, axis=0)
    )  # (n, 16)
    leaf = jax.lax.bitcast_convert_type(leaf_i[:, 0:12], jnp.float32)
    v0 = leaf[:, 0:3]
    normal = leaf[:, 9:12]
    prim_id = jnp.where(hit, leaf_i[:, 12], -1)
    inst_id = jnp.where(hit, leaf_i[:, 14], -1)

    o_n = o_flat[:n]
    d_n = d_flat[:n]
    denom = jnp.sum(normal * d_n, axis=-1)
    safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t_plane = jnp.sum(normal * (v0 - o_n), axis=-1) / safe_denom
    t = jnp.where(hit, t_plane, NO_HIT_T)
    point = o_n + t_plane[..., None] * d_n
    point = jnp.where(hit[..., None], point, 0.0)

    if flip_normals:
        # orient normals against the ray (rmagine simulators return normals
        # facing the sensor so the signed P2L distance is well-defined)
        normal = normal * jnp.where(denom > 0, -1.0, 1.0)[..., None]

    return RayHits(
        t=t.reshape(batch_shape),
        hit=hit.reshape(batch_shape),
        prim_id=prim_id.reshape(batch_shape),
        inst_id=inst_id.reshape(batch_shape),
        point=point.reshape(batch_shape + (3,)),
        normal=jnp.where(hit[..., None], normal, 0.0).reshape(batch_shape + (3,)),
    )


@partial(
    jax.jit,
    static_argnames=(
        "chunk_size",
        "flip_normals",
        "block_size",
        "c_super",
        "c_bin",
        "c_mid",
        "c_hyper",
        "sub_blocks",
        "sort",
    ),
)
def cast_rays_seeded(
    bvh: BVH,
    bins,  # TriangleBins
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    chunk_size: int = 262144,
    flip_normals: bool = True,
    block_size: int = 128,
    c_super: int = 24,
    c_bin: int = 96,
    c_mid: int = 0,
    c_hyper: int = 0,
    sub_blocks: int = 4,
    sort: bool = True,
) -> RayHits:
    """Exact closest-hit query with a dense-engine seed pass.

    TRUST-OR-REFINE: the dense binned engine is provably exact for every
    ray whose block's candidate budgets did NOT truncate (budgets are the
    engine's only loss source — the basis of every lossless audit in this
    repo), so the seed pass runs with ``with_lossless=True`` and its
    results are accepted OUTRIGHT for certified rays. Only rays from
    saturated blocks enter the exact stackless traversal — the bound sort
    groups the (deactivated) trusted rays into chunks whose lock-step
    while_loop exits on iteration one, so the traversal's cost becomes
    proportional to the SUSPECT fraction, not the ray count.

    For the suspect rays, a seed hit still primes the traversal's initial
    ``t_best``: the dense engine computes genuine ray-triangle
    intersections (saturation only drops candidates), so a reported hit t
    is a TRUE upper bound on the closest-hit t. t_opt <= seed_t <
    seed_t*(1+1e-5)+1e-6 keeps the result exact. A per-ray fallback to
    the seed record covers the f32 code-path mismatch (grazing hits where
    the traversal's Möller–Trumbore t exceeds the inflated bound) —
    mirror of :func:`closest_points_seeded`.

    Measured rationale (TPU chip, 2026-08-20): pure bound-priming WITHOUT
    the trust split is a dead end for range-capped MCL rays (2.00 s vs
    the plain traversal's 2.03 s at 2.1M scattered rays — the per-beam
    range cap already bounds t_max tightly); the win is skipping the
    traversal for certified rays entirely.

    Reference parity: same contract as the rmagine simulators' closest-hit
    (``rtcIntersect1`` — PCDSensorUpdaterEmbree.cpp:44); this is the
    TPU-native way to run exact-result casts at product scale in
    scattered regimes (global MCL) when both map structures exist
    (MeshMap). Tolerance note: "exact" is up to the dense engine's ~1e-5
    relative packed-key tie-break (the same tolerance every binned-vs-
    exact parity audit accepts).
    """
    from rmcl_tpu.ops.raycast_binned import cast_rays_binned

    orig, dirs = jnp.broadcast_arrays(
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    batch_shape = orig.shape[:-1]
    o = orig.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    t_min_r = jnp.broadcast_to(
        jnp.asarray(t_min, jnp.float32), batch_shape
    ).reshape(-1)
    t_max_r = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), batch_shape
    ).reshape(-1)

    seed, lossless = cast_rays_binned(
        bins,
        o,
        d,
        t_min=t_min_r,
        t_max=t_max_r,
        block_size=block_size,
        flip_normals=flip_normals,
        c_super=c_super,
        c_bin=c_bin,
        c_mid=c_mid,
        c_hyper=c_hyper,
        with_lossless=True,
        sub_blocks=sub_blocks,
    )
    bound = jnp.where(
        seed.hit, seed.t * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6), t_max_r
    )
    bound = jnp.minimum(bound, t_max_r)
    # certified rays skip the traversal entirely: t_max < t_min deactivates
    # them in _traverse_batch (cur0 = SENT); the seed fallback below then
    # carries their (exact) dense result into the output
    bound = jnp.where(lossless, jnp.float32(-1.0), bound)

    if sort:
        order = jnp.argsort(bound)
        inv = jnp.argsort(order)
        out = cast_rays(
            bvh,
            jnp.take(o, order, axis=0),
            jnp.take(d, order, axis=0),
            t_min=jnp.take(t_min_r, order),
            t_max=jnp.take(bound, order),
            chunk_size=chunk_size,
            flip_normals=flip_normals,
        )
        out = jax.tree.map(lambda x: jnp.take(x, inv, axis=0), out)
    else:
        out = cast_rays(
            bvh, o, d, t_min=t_min_r, t_max=bound,
            chunk_size=chunk_size, flip_normals=flip_normals,
        )

    # fallback: the seed hit is a real surface intersection — never report
    # a miss the unseeded traversal would not have reported
    fb = seed.hit & ~out.hit
    out = RayHits(
        t=jnp.where(fb, seed.t, out.t),
        hit=out.hit | seed.hit,
        prim_id=jnp.where(fb, seed.prim_id, out.prim_id),
        inst_id=jnp.where(fb, seed.inst_id, out.inst_id),
        point=jnp.where(fb[:, None], seed.point, out.point),
        normal=jnp.where(fb[:, None], seed.normal, out.normal),
    )
    return jax.tree.map(lambda x: x.reshape(batch_shape + x.shape[1:]), out)


def cast_ranges(
    bvh: BVH,
    orig: Array,
    dirs: Array,
    t_min: float = 0.0,
    t_max: float | Array = NO_HIT_T,
    chunk_size: int = 262144,
) -> Array:
    """Differentiable range-only convenience wrapper (NO_HIT_T on miss)."""
    return cast_rays(bvh, orig, dirs, t_min, t_max, chunk_size=chunk_size).t


def occluded(
    bvh: BVH,
    orig: Array,
    target: Array,
    eps: float = 1e-3,
    chunk_size: int = 262144,
) -> Array:
    """Any-hit segment query: is the straight segment orig→target blocked?

    Used by the motion updater's mesh collision kill
    (reference TFMotionUpdaterCPU.cpp:17-50: ray cast between old and new
    particle position; on hit the particle dies).
    """
    seg = target - orig
    dist = jnp.linalg.norm(seg, axis=-1)
    safe = jnp.maximum(dist, 1e-12)[..., None]
    d = seg / safe
    hits = cast_rays(
        bvh, orig, d, t_min=eps, t_max=jnp.maximum(dist - eps, 0.0), chunk_size=chunk_size
    )
    return hits.hit
