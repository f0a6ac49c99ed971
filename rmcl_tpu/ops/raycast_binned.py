"""Dense binned ray caster — the gather-free TPU engine.

Why this exists: on the target TPU runtime, per-ray BVH traversal is bounded
by gather throughput (~10ns per node visit, measured), while dense
vector/matrix math streams at Tflops. This engine therefore does NO per-ray
pointer chasing at all:

  1. rays are processed in coherent *blocks* (callers provide coherent
     order; LiDAR scan grids are coherent by construction, and the
     pose-sweep benchmark becomes super-coherent after a direction-major
     transpose — see :func:`direction_major_order`);
  2. each block is culled against super-bins and bins with a conservative
     interval-arithmetic frustum test (never false-culls);
  3. the surviving ≤ c_bin candidate bins are brute-force intersected:
     (rays x bin triangles) Möller–Trumbore on full vector lanes;
  4. only (best t, best triangle ref) are carried through the loop; the
     winning triangle's shading payload (normal, plane offset, ids) is
     fetched with a single batched gather at the end.

Correctness note: candidate lists are truncated to the static budgets
(c_super, c_bin). Budgets are generous and validated by the parity tests;
blocks needing more candidates than the budget may miss geometry — raise
the budgets for pathological scenes. The intersection loop's *runtime* trip
count adapts per chunk to the actual worst-case candidate count, so a large
c_bin budget costs compile-time shapes, not execution time.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import TriangleBins
from rmcl_tpu.ops.raycast import NO_HIT_T, RayHits

Array = jax.Array

# python float (weak-typed), NOT jnp.float32: a module-level jnp scalar
# becomes a tracer if this module is first imported inside a jit trace
_BIG = 3.0e38


def _interval_div(n_lo, n_hi, d_lo, d_hi):
    """Conservative [n_lo,n_hi]/[d_lo,d_hi].

    Falls to (-inf,inf) only when the denominator interval strictly spans 0;
    intervals *touching* 0 (one-sided cones) keep a half-bounded result —
    nudging the zero endpoint to ±tiny makes the endpoint combinations
    produce the correct ±inf hull automatically."""
    spans0 = (d_lo < 0.0) & (d_hi > 0.0)
    d_lo_s = jnp.where(d_lo == 0.0, 1e-30, d_lo)
    d_hi_s = jnp.where(d_hi == 0.0, -1e-30, d_hi)
    q1 = n_lo / d_lo_s
    q2 = n_lo / d_hi_s
    q3 = n_hi / d_lo_s
    q4 = n_hi / d_hi_s
    lo = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
    hi = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
    return jnp.where(spans0, -_BIG, lo), jnp.where(spans0, _BIG, hi)


def _block_box_test(o_lo, o_hi, d_lo, d_hi, t_hi, bmin, bmax):
    """Conservative block-frustum vs AABB test.

    o_lo/o_hi/d_lo/d_hi: (..., 1, 3) block interval bounds (broadcast over
    the box axis); bmin/bmax: (..., K, 3). Returns (..., K) bool that is
    True whenever ANY ray in the block could enter the box in [0, t_hi].
    """
    n0_lo = bmin - o_hi
    n0_hi = bmin - o_lo
    n1_lo = bmax - o_hi
    n1_hi = bmax - o_lo
    t0_lo, t0_hi = _interval_div(n0_lo, n0_hi, d_lo, d_hi)
    t1_lo, t1_hi = _interval_div(n1_lo, n1_hi, d_lo, d_hi)
    entry_lo = jnp.minimum(t0_lo, t1_lo)  # min possible entry per axis
    exit_hi = jnp.maximum(t0_hi, t1_hi)  # max possible exit per axis
    # axis-parallel blocks (direction exactly 0 on an axis, e.g. sin(0) rays
    # in scan grids): rays never move along that axis, so the box must
    # overlap the origin interval there
    parallel = (d_lo == 0.0) & (d_hi == 0.0)
    par_hit = (bmax >= o_lo) & (bmin <= o_hi)
    entry_lo = jnp.where(parallel, jnp.where(par_hit, -_BIG, _BIG), entry_lo)
    exit_hi = jnp.where(parallel, jnp.where(par_hit, _BIG, -_BIG), exit_hi)
    t_near = jnp.max(entry_lo, axis=-1)
    t_far = jnp.min(exit_hi, axis=-1)
    ok = (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_hi)
    return ok, jnp.maximum(t_near, 0.0), t_far


def _cone_box_test(oc, oh, a, tan_th, t_hi, bmin, bmax):
    """Conservative (origin-box x direction-cone) vs AABB test.

    The ray block is modelled as the Minkowski sum of an origin box
    (center ``oc``, half-extents ``oh``) and a direction cone (unit mean
    axis ``a``, ``tan_th`` = tan of max angular deviation). The target box
    is inflated by the origin half-extents (exact Minkowski) plus the cone
    radius ``t*tan_th`` (refined in a second slab pass: the radius only
    needs to cover the box's own entry interval, not the full [0, t_hi]).

    Never false-culls; tight for small angular spreads — in particular it
    is the exact slab test for zero-spread (shared-direction) blocks,
    where the interval-arithmetic formulation it replaces blew up whenever
    a direction-component interval merely *touched* zero.

    The cone slab is intersected with the *ball* test: every reachable
    point lies in ``origin_box ⊕ ball(t_hi)``, so the box-to-box distance
    must be ≤ t_hi and the geometric hit distance lies in
    [dist(origin_box, box), maxdist(origin_box, box)]. For wide-spread
    blocks (omnidirectional particle beams, where ``tan_th`` saturates at
    its ~20 clip) the ball interval is the binding one — it caps the reach
    at t_hi instead of the cone's ~20·t_hi perpendicular inflation — while
    for narrow cones the slab dominates. Intersection of two conservative
    bounds stays conservative.

    Shapes: oc/oh/a (..., 1, 3), tan_th/t_hi (..., 1), bmin/bmax (..., K, 3).
    Returns (pass (..., K), t_near (..., K), t_far (..., K)).
    """
    a_safe = jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
    inv = 1.0 / a_safe
    b0 = bmin - oh - oc
    b1 = bmax + oh - oc
    # ball bound: per-axis separation intervals between the origin box
    # [oc-oh, oc+oh] and the target box [bmin, bmax]. b0 = bmin - obox_max
    # (gap when the box is above), -b1 = obox_min - bmax (gap below);
    # max(b1, -b0) is the farthest per-axis separation.
    gap = jnp.maximum(jnp.maximum(b0, -b1), 0.0)
    d_near = jnp.sqrt(jnp.sum(gap * gap, axis=-1))
    sep = jnp.maximum(b1, -b0)
    d_far = jnp.sqrt(jnp.sum(sep * sep, axis=-1))
    # anisotropic cone inflation: the displacement off the axis is
    # PERPENDICULAR to it, so its reach along axis k is r*sqrt(1 - a_k^2),
    # not r — exact per-axis projection of the cone cross-section. Strictly
    # tighter than the isotropic r (which spuriously inflated the slab
    # along the dominant direction axis), still never false-culls.
    s_perp = jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0))

    def slab(r):
        rk = r * s_perp
        t0 = (b0 - rk) * inv
        t1 = (b1 + rk) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return tn, tf

    r0 = (t_hi * tan_th)[..., None]
    tn0, tf0 = slab(r0)
    # refine: the cone radius over the box's own param window is bounded by
    # tf0*tan_th (tf0 <= t_hi) — one extra pass tightens near boxes a lot
    r1 = (jnp.clip(tf0, 0.0, t_hi) * tan_th)[..., None]
    tn, tf = slab(r1)
    tn = jnp.maximum(tn, d_near)
    tf = jnp.minimum(tf, d_far)
    ok = (tn <= tf) & (tf >= 0.0) & (tn <= t_hi) & (d_near <= t_hi)
    return ok, jnp.maximum(tn, 0.0), tf


def _block_bounds(ob, db, t_min_b, t_max_b):
    """Per-block cone/box bounds from rays (n_blk, Rb, 3).

    Returns oc, oh, axis, tan_th, t_hi, dead. Rays with t_max<=t_min are
    inert and excluded from the bounds."""
    live = (t_max_b > t_min_b)[..., None]
    any_live = jnp.any(live[..., 0], axis=1)
    o_lo = jnp.min(jnp.where(live, ob, _BIG), axis=1)
    o_hi = jnp.max(jnp.where(live, ob, -_BIG), axis=1)
    o_lo = jnp.where(any_live[:, None], o_lo, 0.0)
    o_hi = jnp.where(any_live[:, None], o_hi, 0.0)
    oc = 0.5 * (o_lo + o_hi)
    oh = 0.5 * (o_hi - o_lo)

    # unit mean direction; rays need not be normalized — normalize locally
    dn = db * jax.lax.rsqrt(jnp.maximum(jnp.sum(db * db, -1, keepdims=True), 1e-30))
    dsum = jnp.sum(jnp.where(live, dn, 0.0), axis=1)
    a = dsum * jax.lax.rsqrt(jnp.maximum(jnp.sum(dsum * dsum, -1, keepdims=True), 1e-30))
    ca = jnp.min(
        jnp.where(live[..., 0], jnp.sum(dn * a[:, None, :], -1), 1.0), axis=1
    )
    # degenerate spread (>= ~87 deg): huge tan -> conservative pass-all
    ca = jnp.clip(ca, 0.05, 1.0)
    tan_th = jnp.sqrt(jnp.maximum(1.0 - ca * ca, 0.0)) / ca
    # |d| scale: parametric t reaches geometric distance t*|d|; the cull
    # operates in geometric units, so bound the reach by max(t_max*|d|)
    nrm = jnp.sqrt(jnp.maximum(jnp.sum(db * db, -1), 1e-30))
    n_hi = jnp.max(jnp.where(live[..., 0], nrm, 1e-30), axis=1)
    t_hi = jnp.max(jnp.where(live[..., 0], t_max_b * nrm, 0.0), axis=1)
    return oc, oh, a, tan_th, t_hi, n_hi, ~any_live


def _build_candidates(bins, ob, db, t_min_b, t_max_b, cs, cb):
    """Two-level cull: nearest-first candidate bins per ray block.

    Returns (cand_bin (n_blk, cb) int32 with -1 padding, cand_count
    (n_blk,), cand_tnear (n_blk, cb) conservative parametric entry)."""
    n_blk = ob.shape[0]
    S = bins.bins_per_super
    n_super = bins.n_super
    n_bins = bins.n_bins

    oc, oh, axis, tan_th, t_hi, n_hi, block_dead = _block_bounds(
        ob, db, t_min_b, t_max_b
    )
    axis = jnp.where(block_dead[:, None], jnp.asarray([1.0, 0.0, 0.0]), axis)
    t_hi = jnp.where(block_dead, 0.0, t_hi)

    # cap every block's reach at its conservative exit from the scene box.
    # The exit query itself needs a bounded t (t*tan_th is the cone radius —
    # unbounded t would inflate the first slab pass into a pass-all): any
    # in-scene intersection lies within |oc - scene_center| + diagonals.
    scene_c = 0.5 * (bins.aabb_min + bins.aabb_max)
    scene_h = 0.5 * (bins.aabb_max - bins.aabb_min)
    t_cap = (
        jnp.linalg.norm(oc - scene_c[None], axis=-1)
        + jnp.linalg.norm(scene_h)
        + jnp.linalg.norm(oh, axis=-1)
    )  # (n_blk,)
    _, _, scene_far = _cone_box_test(
        oc[:, None], oh[:, None], axis[:, None], tan_th[:, None],
        t_cap[:, None],
        jnp.broadcast_to(bins.aabb_min, (1, 1, 3)),
        jnp.broadcast_to(bins.aabb_max, (1, 1, 3)),
    )
    t_hi = jnp.minimum(t_hi, scene_far[:, 0] * 1.0001 + 1e-3)

    # --- level 0: block x supers ------------------------------------------
    sup_min = bins.super_aabb[:, 0:3][None]  # (1, n_super, 3)
    sup_max = bins.super_aabb[:, 3:6][None]
    pass_sup, tn_sup, _ = _cone_box_test(
        oc[:, None], oh[:, None], axis[:, None], tan_th[:, None],
        t_hi[:, None], sup_min, sup_max,
    )  # (n_blk, n_super)
    # nearest-first candidate order: truncation beyond the budget then drops
    # the farthest boxes, which are the least likely to hold the closest hit
    score = jnp.where(pass_sup, -tn_sup, -_BIG)
    sup_score, sup_ids = jax.lax.top_k(score, cs)  # (n_blk, cs)
    sup_valid = sup_score > -_BIG

    # --- level 1: block x candidate-super's bins --------------------------
    bin_aabb_g = bins.bin_aabb  # (n_bins, 6)
    pad_bins = n_super * S - n_bins
    if pad_bins:
        bin_aabb_g = jnp.concatenate(
            [bin_aabb_g, jnp.zeros((pad_bins, 6), jnp.float32)], 0
        )
    bin_aabb_s = bin_aabb_g.reshape(n_super, S, 6)
    sub = jnp.take(bin_aabb_s, sup_ids, axis=0)  # (n_blk, cs, S, 6)
    pass_bin, tn_bin, _ = _cone_box_test(
        oc[:, None, None],
        oh[:, None, None],
        axis[:, None, None],
        tan_th[:, None, None],
        t_hi[:, None, None],
        sub[..., 0:3],
        sub[..., 3:6],
    )  # (n_blk, cs, S)
    gbin = sup_ids[..., None] * S + jnp.arange(S)[None, None, :]  # global bin ids
    valid_bin = (
        pass_bin & sup_valid[..., None] & (gbin < n_bins)
    ).reshape(n_blk, cs * S)
    gbin = gbin.reshape(n_blk, cs * S)
    tn_flat = jnp.maximum(tn_bin.reshape(n_blk, cs * S), 0.0)

    # pack the global bin id into the low mantissa bits of the (positive)
    # entry-distance float: ONE int top_k then selects ids and distances
    # together (the separate take_along_axis id gather measured 51 ms, and
    # the f32+s32 co-sort doubled the sort payload). Mantissa truncation
    # only rounds tnear DOWN — still a conservative lower bound for the
    # early exit; the ~2^-(23-bits) ordering jitter is irrelevant.
    id_bits = max(1, (n_bins - 1).bit_length())
    if id_bits <= 20:
        idm = jnp.int32((1 << id_bits) - 1)
        tb = jax.lax.bitcast_convert_type(tn_flat, jnp.int32)
        key = jnp.where(valid_bin, (tb & ~idm) | gbin, jnp.int32(0x7FFFFFF0))
        topv = jax.lax.top_k(-key, cb)[0]
        kmin = -topv  # ascending packed tnear
        cand_ok = kmin != 0x7FFFFFF0
        cand_bin = jnp.where(cand_ok, kmin & idm, -1)
        cand_tnear = jnp.where(
            cand_ok,
            jax.lax.bitcast_convert_type(kmin & ~idm, jnp.float32)
            / n_hi[:, None],
            _BIG,
        )
    else:  # huge scenes: ids don't fit the mantissa — classic co-sort
        bscore = jnp.where(valid_bin, -tn_flat, -_BIG)
        cand_score, cand_pos = jax.lax.top_k(bscore, cb)
        cand_bin = jnp.where(
            cand_score > -_BIG,
            jnp.take_along_axis(gbin, cand_pos, axis=1),
            -1,
        )
        cand_tnear = jnp.where(
            cand_bin >= 0, -cand_score / n_hi[:, None], _BIG
        )
    # actual candidate count per block — the intersection loop only runs to
    # the chunk's max count, so the generous budget is ~free at runtime
    cand_count = jnp.sum(cand_bin >= 0, axis=1).astype(jnp.int32)  # (n_blk,)
    return cand_bin, cand_count, cand_tnear


@partial(jax.jit, static_argnames=("block_size", "c_super", "c_bin"))
def candidate_stats(
    bins: TriangleBins,
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    block_size: int = 256,
    c_super: int = 48,
    c_bin: int = 192,
) -> Array:
    """Candidate-bin count per ray block — the engine's own cull, exposed
    for diagnosis/tuning (counts saturating at c_bin mean budget overflow,
    i.e. potential false misses)."""
    orig, dirs = jnp.broadcast_arrays(
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    o = orig.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    n = o.shape[0]
    t_min_r = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max_r = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    Rb = block_size
    n_pad = (-n) % Rb
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), jnp.float32)], 0)
        d = jnp.concatenate([d, jnp.ones((n_pad, 3), jnp.float32)], 0)
        t_min_r = jnp.concatenate([t_min_r, jnp.zeros(n_pad, jnp.float32)], 0)
        t_max_r = jnp.concatenate([t_max_r, jnp.zeros(n_pad, jnp.float32)], 0)
    n_blk = o.shape[0] // Rb
    cs = min(c_super, bins.n_super)
    cb = min(c_bin, bins.n_bins, cs * bins.bins_per_super)
    _, cand_count, _ = _build_candidates(
        bins,
        o.reshape(n_blk, Rb, 3),
        d.reshape(n_blk, Rb, 3),
        t_min_r.reshape(n_blk, Rb),
        t_max_r.reshape(n_blk, Rb),
        cs,
        cb,
    )
    return cand_count


@partial(
    jax.jit,
    static_argnames=("block_size", "c_super", "c_bin", "sub_blocks",
                     "c_mid", "c_hyper", "block_chunk"),
)
def block_cull_stats(
    bins: TriangleBins,
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    block_size: int = 128,
    c_super: int = 48,
    c_bin: int = 192,
    sub_blocks: int = 4,
    c_mid: int = 0,
    c_hyper: int = 0,
    block_chunk: int = 256,
) -> Tuple[Array, Array]:
    """Per-block (candidate_count, saturated) through the engine's REAL
    fused cull — the audit that matches what :func:`cast_rays_binned`
    executes at the same config.

    ``saturated[i]`` True means SOME budget level (hyper/super/mid/bin)
    truncated block i's candidate set — the block's results are not
    certified exact. :func:`candidate_stats` only surfaces bin-level
    counts from the fat-block cull and is BLIND to super-level
    truncation (found round 5: c_super=24 silently dropped winners on the
    1M-particle MCL bench while the bin audit read max 178 < 288).
    Budget audits must check ``saturated.any()``, not just counts."""
    orig, dirs = jnp.broadcast_arrays(
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    o = orig.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    n = o.shape[0]
    t_min_r = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max_r = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    Rb = block_size
    n_pad = (-n) % Rb
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), jnp.float32)], 0)
        d = jnp.concatenate([d, jnp.ones((n_pad, 3), jnp.float32)], 0)
        t_min_r = jnp.concatenate([t_min_r, jnp.zeros(n_pad, jnp.float32)], 0)
        t_max_r = jnp.concatenate([t_max_r, jnp.zeros(n_pad, jnp.float32)], 0)
    n_blk = o.shape[0] // Rb
    cs, cb, cm_ = _resolve_budgets(bins, c_super, c_bin, c_mid)
    ob = o.reshape(n_blk, Rb, 3)
    db = d.reshape(n_blk, Rb, 3)
    tmin_b = t_min_r.reshape(n_blk, Rb)
    tmax_b = t_max_r.reshape(n_blk, Rb)
    chunk = min(block_chunk, n_blk)
    blk_pad = (-n_blk) % chunk
    if blk_pad:
        padz = lambda x, f: jnp.concatenate(
            [x, jnp.full((blk_pad,) + x.shape[1:], f, x.dtype)], 0)
        ob, db = padz(ob, 0.0), padz(db, 1.0)
        tmin_b, tmax_b = padz(tmin_b, 0.0), padz(tmax_b, 0.0)
    n_chunks = ob.shape[0] // chunk

    def one(args):
        _, count, _, sat = _chunk_candidates(
            bins, *args, cs, cb, sub_blocks, cm_, c_hyper)
        return count, sat

    parts = jax.tree.map(
        lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]),
        (ob, db, tmin_b, tmax_b))
    if n_chunks == 1:
        counts, sat = one(tuple(p[0] for p in parts))
        counts, sat = counts[None], sat[None]
    else:
        counts, sat = jax.lax.map(one, parts)
    return (
        counts.reshape(-1)[:n_blk],
        sat.reshape(-1)[:n_blk],
    )


def _subblock_bounds(ob, db, t_min_b, t_max_b, sub_blocks):
    """Per-sub-block cone/box bounds: rays (n_blk, Rb, 3) split into
    ``sub_blocks`` contiguous groups. Returns bounds with a leading
    (n_blk, R) sub-block axis."""
    n_blk, Rb, _ = ob.shape
    R = sub_blocks
    Rs = Rb // R
    rs = lambda x: x.reshape(n_blk * R, Rs, *x.shape[2:])
    oc, oh, a, tan_th, t_hi, n_hi, dead = _block_bounds(
        rs(ob), rs(db), rs(t_min_b), rs(t_max_b)
    )
    un = lambda x: x.reshape(n_blk, R, *x.shape[1:])
    return un(oc), un(oh), un(a), un(tan_th), un(t_hi), un(n_hi), un(dead)


def _chunk_level0(bins, ob, db, t_min_b, t_max_b, cs, sub_blocks, c_hyper=0,
                  bounds_fn=None):
    """Shared front of the chunk cull: sub-block cone bounds, scene-exit
    cap, level-0 super tests + top_k. Returns (bounds, sup_ids, sup_valid,
    n_hi_b) where bounds = (oc, oh, axis, tan_th, t_hi) with (Cb, R, ...)
    shapes.

    ``c_hyper > 0`` (and bins built with a hyper level) routes the super
    selection through the hyper boxes: test n_hyper boxes, keep the
    ``c_hyper`` nearest, then test only their supers — cuts the level-0
    box-test count from n_super to n_hyper + c_hyper*H (probe_cull: the
    all-supers test was 93 ms of a 183 ms cull at 488 supers). Like every
    budget, c_hyper is a nearest-first truncation layer: audit with
    passing-hyper counts before lowering.

    Also returns ``sat0`` (Cb,) bool: True when a level-(-1)/0 budget
    truncated (passing hypers > c_hyper or passing supers > c_super) —
    i.e. the block's candidate set may be LOSSY. ~sat0 (plus the
    downstream level flags) certifies the block's result exact: budgets
    are the engine's only loss source (every lossless audit rests on
    this)."""
    raw_bounds = bounds_fn or (
        lambda r: _subblock_bounds(ob, db, t_min_b, t_max_b, r)
    )

    def capped_bounds(r):
        oc, oh, axis, tan_th, t_hi, n_hi, dead = raw_bounds(r)  # (Cb, r, ...)
        axis = jnp.where(dead[..., None], jnp.asarray([1.0, 0.0, 0.0]), axis)
        t_hi = jnp.where(dead, 0.0, t_hi)

        # conservative scene-exit cap per sub-block (see _build_candidates)
        scene_c = 0.5 * (bins.aabb_min + bins.aabb_max)
        scene_h = 0.5 * (bins.aabb_max - bins.aabb_min)
        t_cap = (
            jnp.linalg.norm(oc - scene_c[None, None], axis=-1)
            + jnp.linalg.norm(scene_h)
            + jnp.linalg.norm(oh, axis=-1)
        )  # (Cb, r)
        _, _, scene_far = _cone_box_test(
            oc[:, :, None], oh[:, :, None], axis[:, :, None],
            tan_th[:, :, None], t_cap[:, :, None],
            jnp.broadcast_to(bins.aabb_min, (1, 1, 1, 3)),
            jnp.broadcast_to(bins.aabb_max, (1, 1, 1, 3)),
        )
        t_hi = jnp.minimum(t_hi, scene_far[:, :, 0] * 1.0001 + 1e-3)
        return (oc, oh, axis, tan_th, t_hi), n_hi

    bounds, n_hi = capped_bounds(sub_blocks)
    n_hi_b = jnp.max(n_hi, axis=1)  # (Cb,) |d| scale, max over sub-blocks

    if c_hyper and bins.hyper_aabb is not None:
        Cb = ob.shape[0]
        H = bins.supers_per_hyper
        n_hyper = bins.n_hyper
        n_super = bins.n_super
        ch = min(c_hyper, n_hyper)
        # the coarse levels use ONE fat block cone (R=1): the single-cone
        # bound admits only ~2 extra supers/block into the budgets
        # (CPU-audited) while quartering the hyper+super test flops; the
        # sub-block cones stay for the level-1 bin tests where tightness
        # sets the pair work
        bounds1, _ = (
            capped_bounds(1) if sub_blocks > 1 else (bounds, None)
        )
        oc, oh, axis, tan_th, t_hi = bounds1
        # level -1: fat block cone x hypers
        pass_hyp, tn_hyp, _ = _cone_box_test(
            oc[:, :, None], oh[:, :, None], axis[:, :, None],
            tan_th[:, :, None], t_hi[:, :, None],
            bins.hyper_aabb[None, None, :, 0:3],
            bins.hyper_aabb[None, None, :, 3:6],
        )  # (Cb, 1, n_hyper)
        tnh = jnp.maximum(
            jnp.min(jnp.where(pass_hyp, tn_hyp, _BIG), axis=1), 0.0
        )
        anyh = jnp.any(pass_hyp, axis=1)  # (Cb, n_hyper)
        sat0 = jnp.sum(anyh, axis=1) > ch  # hyper budget truncated
        hyp_bits = max(1, (n_hyper - 1).bit_length())
        if hyp_bits <= 20:
            idm = jnp.int32((1 << hyp_bits) - 1)
            tb = jax.lax.bitcast_convert_type(tnh, jnp.int32)
            gids = jax.lax.broadcasted_iota(jnp.int32, (1, n_hyper), 1)
            key = jnp.where(anyh, (tb & ~idm) | gids, jnp.int32(0x7FFFFFF0))
            kmin = -jax.lax.top_k(-key, ch)[0]
            hyp_sel = jnp.where(kmin != 0x7FFFFFF0, kmin & idm, -1)
        else:
            hscore = jnp.where(anyh, -tnh, -_BIG)
            hsc, hpos = jax.lax.top_k(hscore, ch)
            hyp_sel = jnp.where(hsc > -_BIG, hpos, -1)
        # level 0: selected hypers' supers only
        super_g = bins.super_aabb
        pad_sup = n_hyper * H - n_super
        if pad_sup:
            super_g = jnp.concatenate(
                [super_g, jnp.zeros((pad_sup, 6), jnp.float32)], 0
            )
        super_h = super_g.reshape(n_hyper, H, 6)
        safe_hyp = jnp.where(hyp_sel >= 0, hyp_sel, 0)
        subh = jnp.take(super_h, safe_hyp, axis=0)  # (Cb, ch, H, 6)
        any_sup, tn_sup = _group_box_tests(bounds1, subh)  # (Cb, ch, H)
        gsup = safe_hyp[..., None] * H + jnp.arange(H)[None, None, :]
        valid_sup = (
            any_sup & (hyp_sel >= 0)[..., None] & (gsup < n_super)
        ).reshape(Cb, ch * H)
        gsup = gsup.reshape(Cb, ch * H)
        tns = jnp.maximum(tn_sup.reshape(Cb, ch * H), 0.0)
        sup_bits = max(1, (n_super - 1).bit_length())
        if sup_bits <= 20:
            idm = jnp.int32((1 << sup_bits) - 1)
            tb = jax.lax.bitcast_convert_type(tns, jnp.int32)
            key = jnp.where(
                valid_sup, (tb & ~idm) | gsup, jnp.int32(0x7FFFFFF0)
            )
            kmin = -jax.lax.top_k(-key, cs)[0]
            sup_ids = jnp.where(kmin != 0x7FFFFFF0, kmin & idm, 0)
            sup_valid = kmin != 0x7FFFFFF0
        else:
            sscore = jnp.where(valid_sup, -tns, -_BIG)
            ssc, spos = jax.lax.top_k(sscore, cs)
            sup_ids = jnp.where(
                ssc > -_BIG, jnp.take_along_axis(gsup, spos, axis=1), 0
            )
            sup_valid = ssc > -_BIG
        sat0 = sat0 | (jnp.sum(valid_sup, axis=1) > cs)
        return bounds, sup_ids, sup_valid, n_hi_b, sat0

    # level 0: sub-block cones x supers -> OR over sub-blocks
    oc, oh, axis, tan_th, t_hi = bounds
    pass_sup, tn_sup, _ = _cone_box_test(
        oc[:, :, None], oh[:, :, None], axis[:, :, None], tan_th[:, :, None],
        t_hi[:, :, None],
        bins.super_aabb[None, None, :, 0:3],
        bins.super_aabb[None, None, :, 3:6],
    )  # (Cb, R, n_super)
    tn_sup = jnp.min(jnp.where(pass_sup, tn_sup, _BIG), axis=1)
    any_sup = jnp.any(pass_sup, axis=1)  # (Cb, n_super)
    score = jnp.where(any_sup, -tn_sup, -_BIG)
    sup_score, sup_ids = jax.lax.top_k(score, cs)  # (Cb, cs)
    sup_valid = sup_score > -_BIG
    sat0 = jnp.sum(any_sup, axis=1) > cs
    return bounds, sup_ids, sup_valid, n_hi_b, sat0


def _group_box_tests(bounds, boxes):
    """Sub-block cone tests against grouped boxes (Cb, K, G, 6) -> OR over
    sub-blocks. Returns (any (Cb, K, G), tn (Cb, K, G)).

    The (K, G) box axes are flattened into one K*G minor axis for the test
    itself: the cone-box arithmetic is elementwise over boxes, and a G=32/64
    minor dim wastes 4x/2x of the TPU's 128-lane vregs, while K*G (e.g.
    24*32=768) tiles exactly."""
    oc, oh, axis, tan_th, t_hi = bounds
    Cb, K, G, _ = boxes.shape
    bf = boxes.reshape(Cb, 1, K * G, 6)
    pass_b, tn_b, _ = _cone_box_test(
        oc[:, :, None],
        oh[:, :, None],
        axis[:, :, None],
        tan_th[:, :, None],
        t_hi[:, :, None],
        bf[..., 0:3],
        bf[..., 3:6],
    )  # (Cb, R, K*G)
    tn = jnp.min(jnp.where(pass_b, tn_b, _BIG), axis=1).reshape(Cb, K, G)
    return jnp.any(pass_b, axis=1).reshape(Cb, K, G), tn


def _chunk_cull_tests(bins, ob, db, t_min_b, t_max_b, cs, sub_blocks,
                      c_hyper=0, bounds_fn=None):
    """Box-test phase of the 2-level chunk cull: bounds + level-0 + level-1
    bin tests over the cs candidate supers. Returns (valid_bin (Cb, cs*S),
    gbin, tn_flat, n_hi_b, sat0) for :func:`_chunk_select` — split out so
    the probe harness can time the tests separately from the level-1
    top_k."""
    Cb = ob.shape[0]
    S = bins.bins_per_super
    n_super = bins.n_super
    n_bins = bins.n_bins

    bounds, sup_ids, sup_valid, n_hi_b, sat0 = _chunk_level0(
        bins, ob, db, t_min_b, t_max_b, cs, sub_blocks, c_hyper, bounds_fn
    )

    # level 1: candidate supers' bins, per sub-block cones, OR
    bin_aabb_g = bins.bin_aabb
    pad_bins = n_super * S - n_bins
    if pad_bins:
        bin_aabb_g = jnp.concatenate(
            [bin_aabb_g, jnp.zeros((pad_bins, 6), jnp.float32)], 0
        )
    bin_aabb_s = bin_aabb_g.reshape(n_super, S, 6)
    sub = jnp.take(bin_aabb_s, sup_ids, axis=0)  # (Cb, cs, S, 6)
    any_bin, tn_bin = _group_box_tests(bounds, sub)  # (Cb, cs, S)

    gbin = sup_ids[..., None] * S + jnp.arange(S)[None, None, :]
    valid_bin = (
        any_bin & sup_valid[..., None] & (gbin < n_bins)
    ).reshape(Cb, cs * S)
    gbin = gbin.reshape(Cb, cs * S)
    tn_flat = jnp.maximum(tn_bin.reshape(Cb, cs * S), 0.0)
    return valid_bin, gbin, tn_flat, n_hi_b, sat0


def _chunk_cull_tests3(bins, ob, db, t_min_b, t_max_b, cs, cm, sub_blocks,
                       c_hyper=0, bounds_fn=None):
    """3-level variant: level-0 supers -> level-1a mid boxes (groups of
    M = bins_per_mid bins, top_k to ``cm`` mids) -> level-1b bin tests.
    Same return contract as :func:`_chunk_cull_tests` but with cm*M
    level-1 keys instead of cs*S — both the box-test count and the
    dominant top_k shrink when cm*M << cs*S. Never false-culls beyond the
    cm-mid budget truncation (nearest-first, like every other budget)."""
    assert bins.mid_aabb is not None, "bins built without mid level"
    Cb = ob.shape[0]
    S = bins.bins_per_super
    M = bins.bins_per_mid
    Sm = S // M
    n_super = bins.n_super
    n_bins = bins.n_bins
    n_mid = n_super * Sm

    bounds, sup_ids, sup_valid, n_hi_b, sat0 = _chunk_level0(
        bins, ob, db, t_min_b, t_max_b, cs, sub_blocks, c_hyper, bounds_fn
    )

    # level 1a: candidate supers' mids
    mid_aabb_s = bins.mid_aabb.reshape(n_super, Sm, 6)
    midw = jnp.take(mid_aabb_s, sup_ids, axis=0)  # (Cb, cs, Sm, 6)
    any_mid, tn_mid = _group_box_tests(bounds, midw)  # (Cb, cs, Sm)
    gmid = sup_ids[..., None] * Sm + jnp.arange(Sm)[None, None, :]
    # exclude mids made entirely of padding (their first bin is past n_bins)
    valid_mid = (
        any_mid & sup_valid[..., None] & (gmid * M < n_bins)
    ).reshape(Cb, cs * Sm)
    gmid = gmid.reshape(Cb, cs * Sm)
    tnm = jnp.maximum(tn_mid.reshape(Cb, cs * Sm), 0.0)

    # nearest-first mid selection (packed keys, like _chunk_select)
    mid_bits = max(1, (n_mid - 1).bit_length())
    if mid_bits <= 20:
        idm = jnp.int32((1 << mid_bits) - 1)
        tb = jax.lax.bitcast_convert_type(tnm, jnp.int32)
        key = jnp.where(valid_mid, (tb & ~idm) | gmid, jnp.int32(0x7FFFFFF0))
        kmin = -jax.lax.top_k(-key, cm)[0]
        mid_sel = jnp.where(kmin != 0x7FFFFFF0, kmin & idm, -1)  # (Cb, cm)
    else:
        mscore = jnp.where(valid_mid, -tnm, -_BIG)
        msc, mpos = jax.lax.top_k(mscore, cm)
        mid_sel = jnp.where(
            msc > -_BIG, jnp.take_along_axis(gmid, mpos, axis=1), -1
        )
    sat0 = sat0 | (jnp.sum(valid_mid, axis=1) > cm)

    # level 1b: candidate mids' bins
    bin_aabb_g = bins.bin_aabb
    pad_bins = n_mid * M - n_bins
    if pad_bins:
        bin_aabb_g = jnp.concatenate(
            [bin_aabb_g, jnp.zeros((pad_bins, 6), jnp.float32)], 0
        )
    bin_aabb_m = bin_aabb_g.reshape(n_mid, M, 6)
    safe_mid = jnp.where(mid_sel >= 0, mid_sel, 0)
    sub = jnp.take(bin_aabb_m, safe_mid, axis=0)  # (Cb, cm, M, 6)
    any_bin, tn_bin = _group_box_tests(bounds, sub)  # (Cb, cm, M)

    gbin = safe_mid[..., None] * M + jnp.arange(M)[None, None, :]
    valid_bin = (
        any_bin & (mid_sel >= 0)[..., None] & (gbin < n_bins)
    ).reshape(Cb, cm * M)
    gbin = gbin.reshape(Cb, cm * M)
    tn_flat = jnp.maximum(tn_bin.reshape(Cb, cm * M), 0.0)
    return valid_bin, gbin, tn_flat, n_hi_b, sat0


def _chunk_select(bins, valid_bin, gbin, tn_flat, n_hi_b, cb):
    """Selection phase of the chunk cull: the level-1 top_k over cs*S
    packed keys -> nearest-first candidate list. Returns (cand_bin,
    cand_count, cand_tnear), each (Cb, cb) / (Cb,)."""
    Cb = valid_bin.shape[0]
    n_bins = bins.n_bins

    id_bits = max(1, (n_bins - 1).bit_length())
    if id_bits <= 20:
        idm = jnp.int32((1 << id_bits) - 1)
        tb = jax.lax.bitcast_convert_type(tn_flat, jnp.int32)
        key = jnp.where(valid_bin, (tb & ~idm) | gbin, jnp.int32(0x7FFFFFF0))
        topv = jax.lax.top_k(-key, cb)[0]
        kmin = -topv
        cand_ok = kmin != 0x7FFFFFF0
        cand_bin = jnp.where(cand_ok, kmin & idm, -1)
        cand_tnear = jnp.where(
            cand_ok,
            jax.lax.bitcast_convert_type(kmin & ~idm, jnp.float32)
            / n_hi_b[:, None],
            _BIG,
        )
    else:
        bscore = jnp.where(valid_bin, -tn_flat, -_BIG)
        cand_score, cand_pos = jax.lax.top_k(bscore, cb)
        cand_bin = jnp.where(
            cand_score > -_BIG,
            jnp.take_along_axis(gbin, cand_pos, axis=1),
            -1,
        )
        cand_tnear = jnp.where(
            cand_bin >= 0, -cand_score / n_hi_b[:, None], _BIG
        )
    cand_count = jnp.sum(cand_bin >= 0, axis=1).astype(jnp.int32)
    return cand_bin, cand_count, cand_tnear


def _chunk_candidates(
    bins, ob, db, t_min_b, t_max_b, cs, cb, sub_blocks, c_mid=0, c_hyper=0,
    bounds_fn=None,
):
    """Per-sub-block chunk cull. Identical contract to
    :func:`_build_candidates` but tighter (a union of R narrow cones vs
    one fat block cone) and designed to run inside the fused per-chunk
    pipeline (small intermediates). ``c_mid > 0`` routes through the
    3-level hierarchy (supers -> c_mid mid boxes -> bins).

    Returns (cand_bin (Cb, cb), cand_count (Cb,), cand_tnear (Cb, cb),
    sat (Cb,) bool — True when ANY budget level truncated this block's
    candidate set, i.e. the block's results are not certified exact)."""
    if c_mid:
        valid_bin, gbin, tn_flat, n_hi_b, sat0 = _chunk_cull_tests3(
            bins, ob, db, t_min_b, t_max_b, cs, c_mid, sub_blocks, c_hyper,
            bounds_fn,
        )
    else:
        valid_bin, gbin, tn_flat, n_hi_b, sat0 = _chunk_cull_tests(
            bins, ob, db, t_min_b, t_max_b, cs, sub_blocks, c_hyper,
            bounds_fn,
        )
    sat = sat0 | (jnp.sum(valid_bin, axis=1) > cb)
    cand_bin, cand_count, cand_tnear = _chunk_select(
        bins, valid_bin, gbin, tn_flat, n_hi_b, cb
    )
    return cand_bin, cand_count, cand_tnear, sat


@partial(
    jax.jit,
    static_argnames=(
        "block_size", "c_super", "c_bin", "block_chunk", "flip_normals",
        "use_pallas", "pallas_interpret", "shared_dir", "payload",
        "sub_blocks", "dir_groups", "sort_blocks", "c_mid", "c_hyper",
        "with_lossless",
    ),
)
def cast_rays_binned(
    bins: TriangleBins,
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    block_size: int = 128,
    c_super: int = 24,
    c_bin: int = 96,
    block_chunk: int = 256,
    flip_normals: bool = True,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    shared_dir: bool = False,
    payload: bool | str = True,
    sub_blocks: int = 4,
    dir_groups: int = 0,
    sort_blocks: bool = False,
    c_mid: int = 0,
    c_hyper: int = 0,
    with_lossless: bool = False,
) -> RayHits:
    """Dense closest-hit query (drop-in for ops.raycast.cast_rays).

    ``payload``: True/"select" carries the winner's (normal, plane offset,
    ids) through the loop via one-hot lane selects on the pair grid;
    ``"index"`` carries only (lane, bin) winner indices — two cheap
    (Bc, Rb) int selects per trip instead of pair-grid one-hot sums — and
    gathers the winning triangle's 14-float row ONCE per ray at the end
    (one row gather ~= one narrow gather on this chip, so this replaces
    the 6 channel gathers that originally motivated the select path).
    Outputs are bitwise-identical between the two (same winner, same
    plane re-derivation). False/"none" is the occlusion query (t only).

    ``with_lossless=True`` additionally returns a per-ray bool array:
    True certifies the ray's result EXACT (its block's candidate set was
    not truncated by any budget level — budgets are the engine's only
    loss source). The basis of :func:`ops.raycast.cast_rays_seeded`'s
    trust-or-refine split. Not supported with ``use_pallas``.

    Rays should be in a spatially coherent order (scan grids already are).

    The default path is a fused per-chunk pipeline: per-sub-block cone
    culling (``sub_blocks`` contiguous ray groups per block, OR'd — much
    tighter than one fat block cone) straight into the dense intersection
    loop, with no globally materialized candidate arrays.

    ``dir_groups=G`` promises each block's rays form G contiguous groups
    sharing ONE exact direction per group (pose-sweep workloads ordered by
    :func:`tiled_sweep_order` with ``dir_major=True``). All direction-
    dependent Möller–Trumbore terms then hoist out of the (ray x triangle)
    pair work (~2x fewer VPU ops/pair). Results are undefined if the
    promise is broken. ``shared_dir=True`` is the legacy alias for
    ``dir_groups=1``.

    ``use_pallas=True`` routes the intersection phase through the Pallas
    kernel (global candidate build; for study — the fused XLA path is the
    production default).

    ``c_mid=K`` enables the 3-level cull (supers -> K nearest mid boxes of
    ``bins.bins_per_mid`` bins each -> bins): cuts the level-1 box-test
    count and the dominant packed-key top_k from cs*S to cm*M keys. Keep
    ``K*bins_per_mid`` comfortably above ``c_bin`` — the mid budget is a
    truncation layer like every other budget.
    """
    if shared_dir and not dir_groups:
        dir_groups = 1
    orig, dirs = jnp.broadcast_arrays(
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    batch_shape = orig.shape[:-1]
    o = orig.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    n = o.shape[0]
    pmode = {True: "select", False: "none"}.get(payload, payload)
    assert pmode in ("select", "index", "none"), payload
    t_min_r = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), batch_shape).reshape(-1)
    t_max_r = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), batch_shape).reshape(-1)

    Rb = block_size
    n_pad = (-n) % Rb
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), jnp.float32)], 0)
        d = jnp.concatenate([d, jnp.ones((n_pad, 3), jnp.float32)], 0)
        t_min_r = jnp.concatenate([t_min_r, jnp.zeros(n_pad, jnp.float32)], 0)
        t_max_r = jnp.concatenate([t_max_r, jnp.zeros(n_pad, jnp.float32)], 0)
    n_blk = (n + n_pad) // Rb

    ob = o.reshape(n_blk, Rb, 3)
    db = d.reshape(n_blk, Rb, 3)
    t_min_b = t_min_r.reshape(n_blk, Rb)
    t_max_b = t_max_r.reshape(n_blk, Rb)

    S = bins.bins_per_super
    n_bins = bins.n_bins
    B = bins.bin_size
    cs = min(c_super, bins.n_super)
    cb = min(c_bin, n_bins, cs * S)
    cm_ = 0
    if c_mid:  # 3-level cull: supers -> cm_ mid boxes -> bins
        M = bins.bins_per_mid
        Sm = S // max(M, 1)
        if bins.mid_aabb is None or Sm <= 1:
            cm_ = 0  # degenerate mid level (mids == supers): 2-level is strictly better
        else:
            # never let the mid budget under-cover c_bin — raise cm_ to at
            # least ceil(cb / M) so the only truncation layer is cb itself
            cm_ = min(max(c_mid, -(-cb // M)), bins.n_mid, cs * Sm)
            cb = min(cb, cm_ * M)

    # --- dense intersection over candidate bins ---------------------------
    # sentinel bin at index n_bins: all-zero rows give inv=0 -> u=v=t=0,
    # which fails `t > t_min` (t_min >= 0), so invalid candidate slots can
    # gather the sentinel instead of paying a per-pair ok_bin mask
    tri = jnp.concatenate(
        [bins.tri, jnp.zeros((1,) + bins.tri.shape[1:], jnp.float32)], 0
    )  # (n_bins + 1, 14, B) component-major

    assert B & (B - 1) == 0, "bin_size must be a power of two (packed-key min)"
    jmask = jnp.int32(B - 1)

    assert Rb % sub_blocks == 0, (
        f"block_size ({Rb}) must be a multiple of sub_blocks ({sub_blocks})"
    )
    G = dir_groups
    if G:
        assert Rb % G == 0, "block_size must be a multiple of dir_groups"
        P = Rb // G

    def chunk_fn(args):
        sat_c = None
        if sort_blocks:
            ob_c, db_c, tmin_c, tmax_c, cand_c, count_c, tnear_c = args
        else:
            ob_c, db_c, tmin_c, tmax_c = args
            cand_c, count_c, tnear_c, sat_c = _chunk_candidates(
                bins, ob_c, db_c, tmin_c, tmax_c, cs, cb, sub_blocks, cm_,
                c_hyper,
            )
        Rb_l, G_l = Rb, G
        Bc = ob_c.shape[0]
        limit = jnp.max(count_c)
        # triangle lane indices, packed once into the low bits of the float
        # key (see below)
        j_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, B, 1, 1) if G_l else (1, B, 1), 1
        )
        if G_l:
            # layout: (Bc, B, G, P) — the G*P=Rb rays stay in the two minor
            # dims; per-(triangle, group) precompute broadcasts IMPLICITLY
            # along P inside the fused pair work (the old explicit
            # broadcast_to(...).reshape(Rb) materialized 12 copies per trip)
            o4 = lambda k: ob_c[..., k].reshape(Bc, 1, G_l, P)
            ox, oy, oz = o4(0), o4(1), o4(2)
        else:
            # layout: (Bc, B, Rb) — rays fill the 128-lane dimension
            # regardless of bin size; triangle planes broadcast along
            # sublanes
            ox, oy, oz = ob_c[:, None, :, 0], ob_c[:, None, :, 1], ob_c[:, None, :, 2]
            dx, dy, dz = db_c[:, None, :, 0], db_c[:, None, :, 1], db_c[:, None, :, 2]

        def body(c, state):
            t_best = state[0]
            bid = jax.lax.dynamic_slice_in_dim(cand_c, c, 1, axis=1)[:, 0]  # (Bc,)
            ok_bin = bid >= 0
            safe = jnp.where(ok_bin, bid, n_bins)  # sentinel: never hits
            # index mode reads only v0/e1/e2 in-loop (the winner's full row
            # is gathered once per ray at the end) — stream 9 of 14
            # components; select mode also needs normal/ids (rows 9-13)
            tw = jnp.take(tri if pmode == "select" else tri[:, :9],
                          safe, axis=0)  # (Bc, 14 or 9, B)

            v0x, v0y, v0z = tw[:, 0, :, None], tw[:, 1, :, None], tw[:, 2, :, None]
            e1x, e1y, e1z = tw[:, 3, :, None], tw[:, 4, :, None], tw[:, 5, :, None]
            e2x, e2y, e2z = tw[:, 6, :, None], tw[:, 7, :, None], tw[:, 8, :, None]

            eps = 1e-7
            if G_l:
                # G shared directions per block: hoist every d-dependent
                # Möller–Trumbore term to a (Bc, B, G, 1) precompute; the
                # (Bc, B, G, P) pair work is three premultiplied bilinears +
                # the hit decision (~2x fewer VPU flops/pair than full MT)
                dg = db_c[:, ::P]  # (Bc, G, 3) one exact dir per group
                sdx, sdy, sdz = (
                    dg[:, None, :, 0, None],
                    dg[:, None, :, 1, None],
                    dg[:, None, :, 2, None],
                )  # (Bc, 1, G, 1)
                e1xs, e1ys, e1zs = e1x[..., None], e1y[..., None], e1z[..., None]
                e2xs, e2ys, e2zs = e2x[..., None], e2y[..., None], e2z[..., None]
                v0xs, v0ys, v0zs = v0x[..., None], v0y[..., None], v0z[..., None]
                pvx = sdy * e2zs - sdz * e2ys  # (Bc, B, G, 1)
                pvy = sdz * e2xs - sdx * e2zs
                pvz = sdx * e2ys - sdy * e2xs
                det = e1xs * pvx + e1ys * pvy + e1zs * pvz
                inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                qdx = sdy * e1zs - sdz * e1ys  # d x e1
                qdy = sdz * e1xs - sdx * e1zs
                qdz = sdx * e1ys - sdy * e1xs
                ngx = e1ys * e2zs - e1zs * e2ys  # e1 x e2 (unnormalized)
                ngy = e1zs * e2xs - e1xs * e2zs
                ngz = e1xs * e2ys - e1ys * e2xs
                # premultiplied row vectors and constants:
                #   u =  (o - v0) . pv * inv =  o.pu - cu
                #   v = -(o - v0) . qd * inv =  cv - o.qv
                #   t =  (o - v0) . ng * inv =  o.nt - ct
                pux, puy, puz = pvx * inv, pvy * inv, pvz * inv
                qvx, qvy, qvz = qdx * inv, qdy * inv, qdz * inv
                ntx, nty, ntz = ngx * inv, ngy * inv, ngz * inv
                cu = v0xs * pux + v0ys * puy + v0zs * puz
                cv = v0xs * qvx + v0ys * qvy + v0zs * qvz
                ct = v0xs * ntx + v0ys * nty + v0zs * ntz
                # pair work on (Bc, B, G, P): the G-axis precompute
                # broadcasts along P inside the fusion — no materialized
                # upsample copies
                u = (ox * pux + oy * puy + oz * puz) - cu
                v = cv - (ox * qvx + oy * qvy + oz * qvz)
                t = (ox * ntx + oy * nty + oz * ntz) - ct
                t4min = tmin_c.reshape(Bc, 1, G_l, P)
                # min3 barycentric test (u>=-eps & v>=-eps & u+v<=1+eps);
                # `t < t_best` is omitted — the packed-key min plus the
                # `better` check subsume it; invalid bins hit the sentinel
                ok = (
                    jnp.minimum(jnp.minimum(u, v), (1.0 + eps) - (u + v))
                    >= -eps
                ) & (t > t4min)
            else:
                # Möller–Trumbore on (Bc, B, Rb)
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
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                # min3 barycentric test; degenerate det gives inv_det=0 ->
                # u=v=t=0 which fails `t > t_min` (t_min >= 0); `t < t_best`
                # subsumed by the packed-key min + `better`; invalid bins
                # hit the sentinel
                ok = (
                    jnp.minimum(jnp.minimum(u, v), (1.0 + eps) - (u + v))
                    >= -eps
                ) & (t > tmin_c[:, None, :])
            t_cand = jnp.where(ok, t, _BIG)
            # pack the triangle index into the low mantissa bits of the
            # (positive) float: IEEE754 positives compare like ints, so ONE
            # integer min replaces the expensive argmin (profiled at 57% of
            # the loop). The ~1e-5 relative t perturbation only affects
            # pruning margins; the output t is re-derived exactly from the
            # winner's plane equation.
            ti = jax.lax.bitcast_convert_type(t_cand, jnp.int32)
            key = (ti & ~jmask) | j_iota
            key_min = jnp.min(key, axis=1)  # (Bc, Rb) / (Bc, G, P)
            key_min2 = key_min.reshape(Bc, Rb_l)
            t_min_bin = jax.lax.bitcast_convert_type(key_min2 | jmask, jnp.float32)
            better = t_min_bin < t_best
            t_best = jnp.where(better, t_min_bin, t_best)
            if pmode == "none":
                return (t_best,)
            if pmode == "index":
                # winner indices only — all selects on the (Bc, Rb) ray
                # grid, none on the pair grid; the triangle row itself is
                # gathered once per ray after the loop
                j_win = jnp.where(better, key_min2 & jmask, state[1])
                b_win = jnp.where(better, bid[:, None], state[2])
                return (t_best, j_win, b_win)
            # carry the winner's shading payload in registers: one-hot
            # lane-select from the already-resident tw planes. Replaces the
            # end-of-cast global winner gathers (6 x 3.7M from HBM was
            # measured at 327 ms — ~45% of the cast).
            nxs, nys, nzs = tw[:, 9], tw[:, 10], tw[:, 11]  # (Bc, B)
            if G_l:
                sel = (j_iota == (key_min & jmask)[:, None]) & better.reshape(
                    Bc, 1, G_l, P
                )
                comp_b = lambda comp: comp[:, :, None, None]
            else:
                sel = (j_iota == (key_min & jmask)[:, None, :]) & better[:, None, :]
                comp_b = lambda comp: comp[:, :, None]
            d0s = nxs * tw[:, 0] + nys * tw[:, 1] + nzs * tw[:, 2]
            pick = lambda comp: jnp.sum(
                jnp.where(sel, comp_b(comp), 0.0), axis=1
            ).reshape(Bc, Rb_l)
            upd = lambda old, comp: jnp.where(better, pick(comp), old)
            pl = (
                upd(state[1], nxs),
                upd(state[2], nys),
                upd(state[3], nzs),
                upd(state[4], d0s),
                upd(state[5], tw[:, 12]),
                upd(state[6], tw[:, 13]),
            )
            return (t_best,) + pl

        z = jnp.zeros((Bc, Rb_l), jnp.float32)
        if pmode == "select":
            init = (tmax_c, z, z, z, z, jnp.full((Bc, Rb_l), -1.0), z)
        elif pmode == "index":
            init = (tmax_c, jnp.zeros((Bc, Rb_l), jnp.int32),
                    jnp.full((Bc, Rb_l), -1, jnp.int32))
        else:
            init = (tmax_c,)

        def cond(cs_):
            c, state = cs_
            # early termination: candidates are nearest-first, so once every
            # block's next candidate starts beyond that block's worst
            # remaining best-t, no later bin can improve any ray
            worst_t = jnp.max(state[0], axis=-1)  # (Bc,)
            nxt = jax.lax.dynamic_slice_in_dim(
                tnear_c, jnp.minimum(c, cb - 1), 1, axis=1
            )[:, 0]
            useful = jnp.any(nxt <= worst_t)
            return (c < limit) & useful

        c_final, state = jax.lax.while_loop(
            cond,
            lambda cs_: (cs_[0] + 1, body(cs_[0], cs_[1])),
            (jnp.int32(0), init),
        )
        if with_lossless and sat_c is not None:
            return state + (sat_c,)
        return state

    chunk = min(block_chunk, n_blk)
    blk_pad = (-n_blk) % chunk
    if blk_pad:
        padz = lambda x, fill: jnp.concatenate(
            [x, jnp.full((blk_pad,) + x.shape[1:], fill, x.dtype)], 0
        )
        ob = padz(ob, 0.0)
        db = padz(db, 1.0)
        t_min_b = padz(t_min_b, 0.0)
        t_max_b = padz(t_max_b, 0.0)
    n_chunks = (n_blk + blk_pad) // chunk
    n_blk_p = n_chunks * chunk
    args = (
        ob.reshape(n_chunks, chunk, Rb, 3),
        db.reshape(n_chunks, chunk, Rb, 3),
        t_min_b.reshape(n_chunks, chunk, Rb),
        t_max_b.reshape(n_chunks, chunk, Rb),
    )
    inv_order = None
    if sort_blocks and not use_pallas:
        # phase 1: candidates for every block (same fused sub-block cull,
        # chunked to keep intermediates small), then order blocks by
        # candidate count. Each chunk's trip count is its worst block's, so
        # count-homogeneous chunks track the MEAN count instead of the
        # chunk max (measured: mean 18.7 vs per-chunk max ~40 on the bench
        # workload). Block-granular (take rows of >= 512 B), not a ray
        # gather.
        cand_fn = lambda a: _chunk_candidates(
            bins, a[0], a[1], a[2], a[3], cs, cb, sub_blocks, cm_, c_hyper
        )
        if n_chunks == 1:
            cand_a, count_a, tnear_a, sat_a = cand_fn(tuple(a[0] for a in args))
        else:
            cand_a, count_a, tnear_a, sat_a = jax.lax.map(cand_fn, args)
        cand_a = cand_a.reshape(n_blk_p, cb)
        count_a = count_a.reshape(n_blk_p)
        tnear_a = tnear_a.reshape(n_blk_p, cb)
        sat_blk = sat_a.reshape(n_blk_p)  # original block order
        order = jnp.argsort(count_a)
        inv_order = jnp.argsort(order)
        perm = lambda x: jnp.take(x, order, axis=0)
        args = tuple(
            perm(a.reshape((n_blk_p,) + a.shape[2:])).reshape(a.shape)
            for a in args
        ) + (
            perm(cand_a).reshape(n_chunks, chunk, cb),
            perm(count_a).reshape(n_chunks, chunk),
            perm(tnear_a).reshape(n_chunks, chunk, cb),
        )
    if use_pallas:
        # study path: global candidate build + Pallas intersection kernel,
        # payload via end-of-cast winner gathers
        from rmcl_tpu.ops.raycast_pallas import intersect_bins_pallas

        cand_bin, cand_count, cand_tnear = _build_candidates(
            bins, ob, db, t_min_b, t_max_b, cs, cb
        )
        t_best_b, ref_best_b = intersect_bins_pallas(
            tri,
            ob,
            db,
            t_min_b,
            t_max_b,
            cand_bin,
            cand_count,
            cand_tnear,
            block_size=Rb,
            interpret=pallas_interpret,
        )
        ref = ref_best_b.reshape(-1)[:n]
        hitp = ref >= 0
        safe = jnp.where(hitp, ref, 0)
        flat = tri.reshape(-1)  # (n_bins*14*B,)
        base = (safe // B) * (14 * B) + (safe % B)
        comp = lambda c: jnp.take(flat, base + c * B)
        t_best = t_best_b.reshape(-1)[:n]
        pl = [comp(9), comp(10), comp(11), None, comp(12), comp(13)]
        pl[3] = pl[0] * comp(0) + pl[1] * comp(1) + pl[2] * comp(2)
        pl = [jnp.where(hitp, x, fill) for x, fill in zip(pl, (0, 0, 0, 0, -1, 0))]
    else:
        if n_chunks == 1:
            outs = chunk_fn(tuple(a[0] for a in args))
        else:
            outs = jax.lax.map(chunk_fn, args)
        if with_lossless and not sort_blocks:
            sat_blk = outs[-1].reshape(n_blk_p)
            outs = outs[:-1]
        if inv_order is not None:
            unblk = lambda x: jnp.take(
                x.reshape(n_blk_p, Rb), inv_order, axis=0
            ).reshape(-1)[:n]
        else:
            unblk = lambda x: x.reshape(-1)[:n]
        t_best = unblk(outs[0])
        if pmode == "select":
            pl = [unblk(x) for x in outs[1:]]
        elif pmode == "index":
            j_win = unblk(outs[1])
            b_win = unblk(outs[2])

    if with_lossless:
        if use_pallas:
            raise NotImplementedError("with_lossless is not supported with use_pallas")
        lossless = jnp.broadcast_to(
            (~sat_blk)[:, None], (n_blk_p, Rb)
        ).reshape(-1)[:n].reshape(batch_shape)

    hit = (t_best < t_max_r.reshape(-1)[:n]) & (t_best < _BIG)
    if pmode == "none":
        # occlusion-style query: loop t only (non-differentiable; the ~1e-5
        # packed-key perturbation applies), no ids/normals/points
        zero3 = jnp.zeros((n, 3), jnp.float32)
        neg1 = jnp.full((n,), -1, jnp.int32)
        out_np = RayHits(
            t=jnp.where(hit, t_best, NO_HIT_T).reshape(batch_shape),
            hit=hit.reshape(batch_shape),
            prim_id=neg1.reshape(batch_shape),
            inst_id=neg1.reshape(batch_shape),
            point=zero3.reshape(batch_shape + (3,)),
            normal=zero3.reshape(batch_shape + (3,)),
        )
        return (out_np, lossless) if with_lossless else out_np

    if pmode == "index" and not use_pallas:
        # one 56-byte row gather per ray resolves the winner's full payload
        safe_bid = jnp.where(hit & (b_win >= 0), b_win, n_bins)
        tri_rows = tri.transpose(0, 2, 1).reshape((n_bins + 1) * B, 14)
        rows = jnp.take(tri_rows, safe_bid * B + j_win, axis=0)  # (n, 14)
        nxi, nyi, nzi = rows[:, 9], rows[:, 10], rows[:, 11]
        pl = [
            nxi, nyi, nzi,
            nxi * rows[:, 0] + nyi * rows[:, 1] + nzi * rows[:, 2],
            rows[:, 12], rows[:, 13],
        ]

    nx, ny, nz, d0, prim, inst = pl

    # differentiable plane re-derivation (matches ops.raycast.cast_rays)
    o_n = o[:n]
    d_n = d[:n]
    normal = jnp.stack([nx, ny, nz], axis=-1)
    denom = nx * d_n[:, 0] + ny * d_n[:, 1] + nz * d_n[:, 2]
    safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    num = d0 - (nx * o_n[:, 0] + ny * o_n[:, 1] + nz * o_n[:, 2])
    t_plane = num / safe_denom
    t_out = jnp.where(hit, t_plane, NO_HIT_T)
    point = jnp.where(hit[..., None], o_n + t_plane[..., None] * d_n, 0.0)
    if flip_normals:
        normal = normal * jnp.where(denom > 0, -1.0, 1.0)[..., None]
    normal = jnp.where(hit[..., None], normal, 0.0)

    out = RayHits(
        t=t_out.reshape(batch_shape),
        hit=hit.reshape(batch_shape),
        prim_id=jnp.where(hit, prim, -1.0).astype(jnp.int32).reshape(batch_shape),
        inst_id=jnp.where(hit, inst, -1.0).astype(jnp.int32).reshape(batch_shape),
        point=point.reshape(batch_shape + (3,)),
        normal=normal.reshape(batch_shape + (3,)),
    )
    return (out, lossless) if with_lossless else out


def _resolve_budgets(bins: TriangleBins, c_super: int, c_bin: int,
                     c_mid: int) -> Tuple[int, int, int]:
    """Clamp the static cull budgets to the structure's actual level sizes
    (shared by the cast and the standalone candidate builder so reused
    candidate lists always match the cast's shapes)."""
    S = bins.bins_per_super
    cs = min(c_super, bins.n_super)
    cb = min(c_bin, bins.n_bins, cs * S)
    cm_ = 0
    if c_mid:
        M = bins.bins_per_mid
        Sm = S // max(M, 1)
        if bins.mid_aabb is not None and Sm > 1:
            cm_ = min(max(c_mid, -(-cb // M)), bins.n_mid, cs * Sm)
            cb = min(cb, cm_ * M)
    return cs, cb, cm_


def _pad_factored_blocks(o_blk, d_blk, alive, block_chunk):
    """Chunk-pad factored blocks; padding blocks are dead (t_max = 0 via
    alive = 0 -> zero candidates, no hits)."""
    o_blk = jnp.asarray(o_blk, jnp.float32)
    d_blk = jnp.asarray(d_blk, jnp.float32)
    n_blk = o_blk.shape[0]
    if alive is None:
        alive_f = jnp.ones((n_blk,), jnp.float32)
    else:
        alive_f = jnp.asarray(alive, jnp.float32)
    chunk = min(block_chunk, n_blk)
    blk_pad = (-n_blk) % chunk
    if blk_pad:
        padz = lambda x, fill: jnp.concatenate(
            [x, jnp.full((blk_pad,) + x.shape[1:], fill, x.dtype)], 0
        )
        o_blk = padz(o_blk, 0.0)
        d_blk = padz(d_blk, 1.0)
        alive_f = padz(alive_f, 0.0)
    n_chunks = (n_blk + blk_pad) // chunk
    return o_blk, d_blk, alive_f, n_blk, chunk, n_chunks


def _factored_block_candidates(
    bins, o_blk, d_blk, alive_f, chunk, t_min_s, t_max_s,
    cs, cb, cm_, c_hyper, sub_blocks, origin_margin, dir_margin=0.0,
):
    """Cull phase of the factored cast: per-chunk nearest-first candidate
    bins for (P pose origins x G shared directions) blocks.

    ``origin_margin`` > 0 inflates every block's origin box by +/- margin
    per axis. The resulting candidate lists (and their tnear lower bounds)
    are then conservative for ANY block origins within L-inf distance
    ``margin`` of the originals — the basis for cross-correction candidate
    reuse: cull once at the current estimate, intersect every subsequent
    correction whose pose delta stays under the margin against the same
    lists (the find-once/iterate-K structure of the reference,
    micp_localization.cpp:915-964, applied to the cull).

    ``dir_margin`` (radians) widens every sub-block cone's half-angle so
    the lists additionally survive per-ray direction tilts up to the
    margin — i.e. pose ROTATIONS up to dir_margin between cull and cast
    (tracking corrections rotate the scan directions in the map frame).

    Returns (cand_a, count_a, tnear_a) in (n_chunks, chunk, ...) layout."""
    import math as _math

    n_blk_p, P, _ = o_blk.shape
    G = d_blk.shape[1]
    Rb = P * G
    n_chunks = n_blk_p // chunk
    tan_dm = _math.tan(dir_margin) if dir_margin else 0.0

    def widen_cone(tan_th):
        """tan(theta + dir_margin), conservatively pass-all past ~89 deg."""
        if not tan_dm:
            return tan_th
        den = 1.0 - tan_th * tan_dm
        return jnp.where(den > 1e-4, (tan_th + tan_dm) / jnp.maximum(den, 1e-4), 1e4)

    def expand_rays(o_c, d_c, alive_c):
        """Compact (Cb, P, 3) x (Cb, G, 3) -> cull inputs (Cb, Rb, ...)."""
        Cb = o_c.shape[0]
        ob = jnp.broadcast_to(o_c[:, None], (Cb, G, P, 3)).reshape(Cb, Rb, 3)
        db = jnp.broadcast_to(d_c[:, :, None], (Cb, G, P, 3)).reshape(Cb, Rb, 3)
        tmin_b = jnp.full((Cb, Rb), t_min_s, jnp.float32)
        tmax_b = jnp.broadcast_to(
            (alive_c * t_max_s)[:, None], (Cb, Rb)
        )
        return ob, db, tmin_b, tmax_b

    def cand_fn(args):
        o_c, d_c, alive_c = args
        ob, db, tmin_b, tmax_b = expand_rays(o_c, d_c, alive_c)

        def fact_bounds(r):
            """Sub-block bounds straight from the factored (P origins,
            G dirs) structure — exactly equal to _subblock_bounds on the
            expanded rays (ray = g*P + p, so sub-block r = dirs
            [r*G/r .. ) x ALL origins; the P-fold direction duplication
            is a power of two, so even the mean direction is bitwise
            identical) at ~Rb/(P/r + G/r) = ~5x fewer reduction elements."""
            Cb = o_c.shape[0]
            live = alive_c > 0.0  # (Cb,) whole-block alive flag
            o_lo = jnp.where(
                live[:, None], jnp.min(o_c, axis=1), 0.0
            )  # (Cb, 3)
            o_hi = jnp.where(live[:, None], jnp.max(o_c, axis=1), 0.0)
            oc1 = 0.5 * (o_lo + o_hi)
            oh1 = 0.5 * (o_hi - o_lo)
            if origin_margin:
                oh1 = oh1 + jnp.where(live[:, None], origin_margin, 0.0)
            oc = jnp.broadcast_to(oc1[:, None], (Cb, r, 3))
            oh = jnp.broadcast_to(oh1[:, None], (Cb, r, 3))
            Gr = G // r
            dg = d_c.reshape(Cb, r, Gr, 3)
            dn = dg * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(dg * dg, -1, keepdims=True), 1e-30)
            )
            dsum = jnp.sum(dn, axis=2)  # (Cb, r, 3)
            a = dsum * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(dsum * dsum, -1, keepdims=True), 1e-30)
            )
            ca = jnp.min(jnp.sum(dn * a[:, :, None, :], -1), axis=2)
            ca = jnp.clip(ca, 0.05, 1.0)
            tan_th = widen_cone(jnp.sqrt(jnp.maximum(1.0 - ca * ca, 0.0)) / ca)
            nrm = jnp.sqrt(jnp.maximum(jnp.sum(dg * dg, -1), 1e-30))
            n_hi = jnp.max(nrm, axis=2)  # (Cb, r)
            t_hi = jnp.where(live, t_max_s, 0.0)[:, None] * n_hi
            dead = jnp.broadcast_to(~live[:, None], (Cb, r))
            return oc, oh, a, tan_th, t_hi, n_hi, dead

        def margin_sb_bounds(r):
            oc, oh, a, tan_th, t_hi, n_hi, dead = _subblock_bounds(
                ob, db, tmin_b, tmax_b, r
            )
            oh = oh + jnp.where(dead[..., None], 0.0, origin_margin)
            return oc, oh, a, widen_cone(tan_th), t_hi, n_hi, dead

        if G % sub_blocks == 0:
            bfn = fact_bounds
        elif origin_margin or dir_margin:
            bfn = margin_sb_bounds
        else:
            bfn = None
        return _chunk_candidates(
            bins, ob, db, tmin_b, tmax_b, cs, cb, sub_blocks, cm_, c_hyper,
            bfn,
        )[:3]

    cargs = (
        o_blk.reshape(n_chunks, chunk, P, 3),
        d_blk.reshape(n_chunks, chunk, G, 3),
        alive_f.reshape(n_chunks, chunk),
    )
    if n_chunks == 1:
        cand_a, count_a, tnear_a = cand_fn(tuple(a[0] for a in cargs))
        return cand_a[None], count_a[None], tnear_a[None]
    return jax.lax.map(cand_fn, cargs)


@partial(
    jax.jit,
    static_argnames=(
        "t_min", "t_max", "c_super", "c_bin", "block_chunk", "c_mid",
        "c_hyper", "sub_blocks", "origin_margin", "dir_margin",
    ),
)
def factored_candidates(
    bins: TriangleBins,
    o_blk: Array,  # (n_blk, P, 3) per-block pose origins
    d_blk: Array,  # (n_blk, G, 3) per-block shared directions
    t_min: float = 0.0,
    t_max: float = NO_HIT_T,
    alive: Array | None = None,
    c_super: int = 24,
    c_bin: int = 64,
    block_chunk: int = 512,
    c_mid: int = 0,
    c_hyper: int = 0,
    sub_blocks: int = 4,
    origin_margin: float = 0.0,
    dir_margin: float = 0.0,
) -> Tuple[Array, Array, Array]:
    """Standalone cull for :func:`cast_rays_binned_factored` — build the
    candidate lists once and reuse them across corrections.

    With ``origin_margin`` = m (meters) and ``dir_margin`` = r (radians),
    the returned lists are conservative (superset candidates, lower-bound
    tnear) for any cast whose block origins each moved by < m per axis
    AND whose directions each tilted by < r from ``o_blk``/``d_blk`` at
    unchanged budgets — so consecutive tracking corrections (pose deltas
    of centimeters / fractions of a degree) can skip the cull entirely:
    pass the result as ``candidates=`` to the cast. Re-cull when the
    accumulated pose delta exceeds either margin. Budgets/chunking must
    match the cast's exactly (the cast asserts the shapes).

    Returns (cand (n_blk_padded, cb) int32 with -1 padding,
    count (n_blk_padded,) int32, tnear (n_blk_padded, cb) f32) in
    UNSORTED block order."""
    cs, cb, cm_ = _resolve_budgets(bins, c_super, c_bin, c_mid)
    o_p, d_p, alive_f, _n_blk, chunk, n_chunks = _pad_factored_blocks(
        o_blk, d_blk, alive, block_chunk
    )
    cand_a, count_a, tnear_a = _factored_block_candidates(
        bins, o_p, d_p, alive_f, chunk, float(t_min), float(t_max),
        cs, cb, cm_, c_hyper, sub_blocks, float(origin_margin),
        float(dir_margin),
    )
    n_blk_p = n_chunks * chunk
    return (
        cand_a.reshape(n_blk_p, cb),
        count_a.reshape(n_blk_p),
        tnear_a.reshape(n_blk_p, cb),
    )


@partial(
    jax.jit,
    static_argnames=(
        "t_min", "t_max", "c_super", "c_bin", "block_chunk", "sort_blocks",
        "c_mid", "c_hyper", "sub_blocks", "payload", "flip_normals",
        "origin_margin", "dir_margin", "paired",
    ),
)
def cast_rays_binned_factored(
    bins: TriangleBins,
    o_blk: Array,  # (n_blk, P, 3) per-block pose origins
    d_blk: Array,  # (n_blk, G, 3) per-block shared directions
    t_min: float = 0.0,
    t_max: float = NO_HIT_T,
    alive: Array | None = None,  # (n_blk,) bool; None = all alive
    c_super: int = 24,
    c_bin: int = 64,
    block_chunk: int = 512,
    sort_blocks: bool = True,
    c_mid: int = 0,
    c_hyper: int = 0,
    sub_blocks: int = 4,
    payload: str = "plane",
    flip_normals: bool = True,
    origin_margin: float = 0.0,
    dir_margin: float = 0.0,
    candidates: Tuple[Array, Array, Array] | None = None,
    paired: bool = False,
) -> RayHits:
    """Closest-hit for *factored* ray blocks: each block is the cross
    product of P pose origins x G shared directions (ray = g*P + p within
    the block). This is the pose-sweep structure (reference corrector
    benchmark, lidar_corrector_embree_benchmark.cpp:77-138: many poses x
    one scan grid) — and the engine exploits it structurally:

      * rays are never materialized: the (n_rays, 3) origin/direction
        arrays (and their HBM traffic + build transposes) disappear;
        the cull re-expands rays per chunk inside the fusion;
      * the pair loop uses the Baldwin–Weber barycentric formulation
        [Baldwin & Weber, JCGT 2016] factored over the block structure:
        per-triangle plane/barycentric rows (from the packed v0/e1/e2),
        then No/Au/Av on the (tri x pose) grid and invNd/Bu/Bv on the
        (tri x dir) grid — the per-pair work collapses to
        ``t = No*invNd; u = Au + t*Bu; v = Av + t*Bv`` + the hit decision
        (~3x fewer VPU ops/pair than the hoisted Möller–Trumbore path in
        :func:`cast_rays_binned`).

    ``payload``: "index" (cheapest, full ids) carries only the winning
    (candidate, lane) indices on the small (Cb, G, P) grid — zero extra
    work on the (Cb, B, G, P) pair grid — and gathers the winning
    triangle's 14 packed floats once per ray at the end (exact
    t/point/normal + prim/inst ids); "plane" one-hot-selects the winner's
    unnormalized plane (ng, c0) on the pair grid (~10 VPU ops/pair;
    prim_id/inst_id are -1); "full" = plane + ids (~4 more ops/pair);
    "none" is the occlusion query (t only).

    ``origin_margin``/``candidates``: see :func:`factored_candidates` —
    pass a precomputed (cand, count, tnear) triple to skip the cull phase
    entirely (candidate reuse across corrections); ``origin_margin``
    inflates the origin boxes when the cull DOES run here, so the hits can
    double as reusable candidates.

    ``paired=True``: PER-RAY origins instead of the pose x dir cross
    product — ``o_blk`` must be (n_blk, G, 3), origin i pairing with
    direction i (ray = block-local index i; Rb = G). This is the OnDn
    sensor layout (per-ray origins — reference OnDnSimulator contract) in
    the factored engine: the cull is unchanged (it already bounds the
    block's origin SET with a box and its directions with cones), only
    the pair grid collapses from (B, G, P) to (B, G) by placing origins
    on the direction axis. Enables candidate reuse / TrackedCorrector for
    OnDn rigs (VERDICT r3 #6).

    Constraints: ``t_min >= 0`` (degenerate/padding triangles rely on
    ``t=0`` failing the gate); scalar t_min/t_max.
    """
    assert payload in ("index", "plane", "full", "none")
    o_blk = jnp.asarray(o_blk, jnp.float32)
    d_blk = jnp.asarray(d_blk, jnp.float32)
    n_blk, P, _ = o_blk.shape
    G = d_blk.shape[1]
    if paired:
        assert o_blk.shape == d_blk.shape, (
            "paired=True needs one origin per direction: o_blk (n_blk, G, 3)"
        )
    P_eff = 1 if paired else P
    Rb = P_eff * G
    t_min_s = float(t_min)
    t_max_s = float(t_max)
    assert t_min_s >= 0.0

    n_bins = bins.n_bins
    B = bins.bin_size
    cs, cb, cm_ = _resolve_budgets(bins, c_super, c_bin, c_mid)

    # sentinel bin (see cast_rays_binned): zero rows -> ng = 0 -> Nd = 0 ->
    # invNd = 0 -> t = 0, which fails `t > t_min` (t_min >= 0)
    tri = jnp.concatenate(
        [bins.tri, jnp.zeros((1,) + bins.tri.shape[1:], jnp.float32)], 0
    )
    # the BW loop only reads v0/e1/e2 (+ ids when carried in-loop): slim the
    # per-trip gather stream — rows 9-11 (unit normal) are never used here
    # and ids only for payload="full"; the stream is ~half the intersect
    # phase's time, so dead rows are pure HBM waste
    tri_loop = tri if payload == "full" else tri[:, 0:9]
    assert B & (B - 1) == 0, "bin_size must be a power of two (packed-key min)"
    jmask = jnp.int32(B - 1)

    o_blk, d_blk, alive_f, n_blk, chunk, n_chunks = _pad_factored_blocks(
        o_blk, d_blk, alive, block_chunk
    )
    n_blk_p = n_chunks * chunk

    if candidates is not None:
        cand_f, count_f0, tnear_f = candidates
        assert cand_f.shape == (n_blk_p, cb), (
            f"candidates shape {cand_f.shape} != {(n_blk_p, cb)} — build "
            "with factored_candidates at the SAME block/budget config"
        )
        cand_a = cand_f.reshape(n_chunks, chunk, cb)
        count_a = count_f0.reshape(n_chunks, chunk)
        tnear_a = tnear_f.reshape(n_chunks, chunk, cb)
    else:
        cand_a, count_a, tnear_a = _factored_block_candidates(
            bins, o_blk, d_blk, alive_f, chunk, t_min_s, t_max_s,
            cs, cb, cm_, c_hyper, sub_blocks, float(origin_margin),
            float(dir_margin),
        )

    cargs = (
        o_blk.reshape(n_chunks, chunk, P, 3),
        d_blk.reshape(n_chunks, chunk, G, 3),
        alive_f.reshape(n_chunks, chunk),
    )

    inv_order = None
    if sort_blocks:
        # count-homogeneous chunks: each chunk's trip count tracks its own
        # (sorted) worst block instead of the global worst (see
        # cast_rays_binned sort_blocks)
        count_f = count_a.reshape(n_blk_p)
        order = jnp.argsort(count_f)
        inv_order = jnp.argsort(order)
        perm = lambda x: jnp.take(
            x.reshape((n_blk_p,) + x.shape[2:]), order, axis=0
        ).reshape((n_chunks, chunk) + x.shape[2:])
        cargs = tuple(perm(a) for a in cargs)
        cand_a = perm(cand_a)
        count_a = perm(count_a)
        tnear_a = perm(tnear_a)

    eps = 1e-7
    onep = 1.0 + eps
    carry_ids = payload == "full"

    def chunk_fn(args):
        o_c, d_c, alive_c, cand_c, count_c, tnear_c = args
        Cb = o_c.shape[0]
        limit = jnp.max(count_c)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1, 1), 1)
        # component planes: directions (Cb, 1, G, 1); origins (Cb, 1, 1, P)
        # for the cross-product layout, or (Cb, 1, G, 1) when paired (one
        # origin per direction — the pair grid loses the P axis)
        if paired:
            ox, oy, oz = (o_c[..., k][:, None, :, None] for k in range(3))
        else:
            ox, oy, oz = (o_c[..., k][:, None, None, :] for k in range(3))
        dx, dy, dz = (d_c[..., k][:, None, :, None] for k in range(3))

        def body(c, state):
            t_best = state[0]  # (Cb, G, P)
            bid = jax.lax.dynamic_slice_in_dim(cand_c, c, 1, axis=1)[:, 0]
            safe = jnp.where(bid >= 0, bid, n_bins)
            tw = jnp.take(tri_loop, safe, axis=0)  # (Cb, 9 or 14, B)

            # --- per-triangle Baldwin–Weber rows on (Cb, B) — amortized
            # over all Rb rays of the block (~0.5 VPU ops/pair) -----------
            v0x, v0y, v0z = tw[:, 0], tw[:, 1], tw[:, 2]
            e1x, e1y, e1z = tw[:, 3], tw[:, 4], tw[:, 5]
            e2x, e2y, e2z = tw[:, 6], tw[:, 7], tw[:, 8]
            ngx = e1y * e2z - e1z * e2y  # unnormalized plane normal e1 x e2
            ngy = e1z * e2x - e1x * e2z
            ngz = e1x * e2y - e1y * e2x
            nn = ngx * ngx + ngy * ngy + ngz * ngz
            inv_nn = 1.0 / jnp.maximum(nn, 1e-30)
            c0 = ngx * v0x + ngy * v0y + ngz * v0z  # plane offset ng.v0
            # barycentric rows: u = (p - v0).m1, v = (p - v0).m2 for p on
            # the plane (m1 = e2 x ng / |ng|^2, m2 = ng x e1 / |ng|^2)
            m1x = (e2y * ngz - e2z * ngy) * inv_nn
            m1y = (e2z * ngx - e2x * ngz) * inv_nn
            m1z = (e2x * ngy - e2y * ngx) * inv_nn
            m2x = (ngy * e1z - ngz * e1y) * inv_nn
            m2y = (ngz * e1x - ngx * e1z) * inv_nn
            m2z = (ngx * e1y - ngy * e1x) * inv_nn
            cu = v0x * m1x + v0y * m1y + v0z * m1z
            cv = v0x * m2x + v0y * m2y + v0z * m2z

            b4 = lambda a: a[:, :, None, None]  # (Cb, B) -> (Cb, B, 1, 1)
            # --- per (tri, dir) on (Cb, B, G, 1) — amortized over P ------
            Nd = b4(ngx) * dx + b4(ngy) * dy + b4(ngz) * dz
            invNd = jnp.where(jnp.abs(Nd) > 1e-30, 1.0 / Nd, 0.0)
            Bu = b4(m1x) * dx + b4(m1y) * dy + b4(m1z) * dz
            Bv = b4(m2x) * dx + b4(m2y) * dy + b4(m2z) * dz
            # --- per (tri, pose) on (Cb, B, 1, P) — amortized over G -----
            No = b4(c0) - (b4(ngx) * ox + b4(ngy) * oy + b4(ngz) * oz)
            Au = (b4(m1x) * ox + b4(m1y) * oy + b4(m1z) * oz) - b4(cu)
            Av = (b4(m2x) * ox + b4(m2y) * oy + b4(m2z) * oz) - b4(cv)

            # --- pair work on (Cb, B, G, P) ------------------------------
            t = No * invNd
            u = Au + t * Bu
            v = Av + t * Bv
            ok = (
                jnp.minimum(jnp.minimum(u, v), onep - (u + v)) >= -eps
            ) & (t > t_min_s)
            t_cand = jnp.where(ok, t, _BIG)
            ti = jax.lax.bitcast_convert_type(t_cand, jnp.int32)
            key = (ti & ~jmask) | j_iota
            key_min = jnp.min(key, axis=1)  # (Cb, G, P)
            t_min_bin = jax.lax.bitcast_convert_type(
                key_min | jmask, jnp.float32
            )
            better = t_min_bin < t_best
            t_best = jnp.where(better, t_min_bin, t_best)
            if payload == "none":
                return (t_best,)
            if payload == "index":
                # winner indices only — all selects on the small (Cb, G, P)
                # grid; the triangle itself is gathered once per ray after
                # the loop
                j_win = jnp.where(better, key_min & jmask, state[1])
                c_win = jnp.where(better, c, state[2])
                return (t_best, j_win, c_win)
            # winner payload: one-hot lane select of the resident planes
            sel = (j_iota == (key_min & jmask)[:, None]) & better[:, None]
            pick = lambda comp: jnp.sum(
                jnp.where(sel, b4(comp), 0.0), axis=1
            )
            upd = lambda old, comp: jnp.where(better, pick(comp), old)
            pl = (
                upd(state[1], ngx),
                upd(state[2], ngy),
                upd(state[3], ngz),
                upd(state[4], c0),
            )
            if carry_ids:
                pl = pl + (upd(state[5], tw[:, 12]), upd(state[6], tw[:, 13]))
            return (t_best,) + pl

        z = jnp.zeros((Cb, G, P_eff), jnp.float32)
        t0 = jnp.broadcast_to(
            (alive_c * t_max_s)[:, None, None], (Cb, G, P_eff)
        )
        if payload == "none":
            init = (t0,)
        elif payload == "index":
            zi = jnp.zeros((Cb, G, P_eff), jnp.int32)
            init = (t0, zi, jnp.full((Cb, G, P_eff), -1, jnp.int32))
        else:
            init = (t0,) + (z,) * 4
            if carry_ids:
                init = init + (jnp.full((Cb, G, P_eff), -1.0), z)

        def cond(cs_):
            c, state = cs_
            worst_t = jnp.max(state[0], axis=(1, 2))  # (Cb,)
            nxt = jax.lax.dynamic_slice_in_dim(
                tnear_c, jnp.minimum(c, cb - 1), 1, axis=1
            )[:, 0]
            return (c < limit) & jnp.any(nxt <= worst_t)

        _, state = jax.lax.while_loop(
            cond,
            lambda cs_: (cs_[0] + 1, body(cs_[0], cs_[1])),
            (jnp.int32(0), init),
        )
        return state

    args = cargs + (cand_a, count_a, tnear_a)
    if n_chunks == 1:
        outs = chunk_fn(tuple(a[0] for a in args))
    else:
        outs = jax.lax.map(chunk_fn, args)

    def unblk(x):  # (n_chunks, chunk, G, P) -> (n_blk, Rb)
        x = x.reshape(n_blk_p, Rb)
        if inv_order is not None:
            x = jnp.take(x, inv_order, axis=0)
        return x[:n_blk]

    t_best = unblk(outs[0])
    # per-ray budget: dead blocks start at t_best = 0 and must not read as
    # hits — compare against their own (alive-gated) t_max, not the scalar
    tmax_r = jnp.broadcast_to(
        (alive_f[:n_blk] * t_max_s)[:, None], (n_blk, Rb)
    )
    hit = (t_best < tmax_r) & (t_best < _BIG)
    batch = (n_blk, Rb)
    if payload == "none":
        zero3 = jnp.zeros(batch + (3,), jnp.float32)
        neg1 = jnp.full(batch, -1, jnp.int32)
        return RayHits(
            t=jnp.where(hit, t_best, NO_HIT_T),
            hit=hit, prim_id=neg1, inst_id=neg1,
            point=zero3, normal=zero3,
        )

    # per-ray origins/directions for the exact plane re-derivation
    if paired:
        o_r = o_blk[:n_blk].reshape(batch + (3,))
    else:
        o_r = jnp.broadcast_to(
            o_blk[:n_blk, None], (n_blk, G, P, 3)
        ).reshape(batch + (3,))
    d_r = jnp.broadcast_to(
        d_blk[:n_blk, :, None], (n_blk, G, P_eff, 3)
    ).reshape(batch + (3,))
    if payload == "index":
        # winner (candidate, lane) -> global triangle row, one gather/ray.
        # cand_a is aligned with outs (both in sorted order) — resolve the
        # bin id per block BEFORE unpermuting.
        cand_flat = cand_a.reshape(n_blk_p, cb)
        c_win = outs[2].reshape(n_blk_p, Rb)
        bid = jnp.take_along_axis(
            cand_flat, jnp.maximum(c_win, 0), axis=1
        )  # (n_blk_p, Rb)
        bid = jnp.where(c_win >= 0, bid, -1)
        if inv_order is not None:
            bid = jnp.take(bid, inv_order, axis=0)
            j_win = jnp.take(outs[1].reshape(n_blk_p, Rb), inv_order, axis=0)
        else:
            j_win = outs[1].reshape(n_blk_p, Rb)
        bid = bid[:n_blk]
        j_win = j_win[:n_blk]
        safe_bid = jnp.where(hit & (bid >= 0), bid, n_bins)
        # (n_bins+1, 14, B) -> row-major (bin, lane) rows of 14 floats
        tri_rows = tri.transpose(0, 2, 1).reshape((n_bins + 1) * B, 14)
        rows = jnp.take(
            tri_rows, (safe_bid * B + j_win).reshape(-1), axis=0
        ).reshape(batch + (14,))
        v0 = rows[..., 0:3]
        e1 = rows[..., 3:6]
        e2 = rows[..., 6:9]
        ng = jnp.cross(e1, e2)
        ngx, ngy, ngz = ng[..., 0], ng[..., 1], ng[..., 2]
        c0 = jnp.sum(ng * v0, axis=-1)
        prim, inst = rows[..., 12], rows[..., 13]
        carry_ids = True
    else:
        ngx, ngy, ngz, c0 = (unblk(x) for x in outs[1:5])
        if carry_ids:
            prim, inst = unblk(outs[5]), unblk(outs[6])
    denom = ngx * d_r[..., 0] + ngy * d_r[..., 1] + ngz * d_r[..., 2]
    safe_denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
    num = c0 - (ngx * o_r[..., 0] + ngy * o_r[..., 1] + ngz * o_r[..., 2])
    t_plane = num / safe_denom
    t_out = jnp.where(hit, t_plane, NO_HIT_T)
    point = jnp.where(hit[..., None], o_r + t_plane[..., None] * d_r, 0.0)
    inv_len = jax.lax.rsqrt(
        jnp.maximum(ngx * ngx + ngy * ngy + ngz * ngz, 1e-30)
    )
    normal = jnp.stack([ngx, ngy, ngz], axis=-1) * inv_len[..., None]
    if flip_normals:
        normal = normal * jnp.where(denom > 0, -1.0, 1.0)[..., None]
    normal = jnp.where(hit[..., None], normal, 0.0)
    if carry_ids:
        prim_o = jnp.where(hit, prim, -1.0).astype(jnp.int32)
        inst_o = jnp.where(hit, inst, -1.0).astype(jnp.int32)
    else:
        prim_o = inst_o = jnp.full(batch, -1, jnp.int32)
    return RayHits(
        t=t_out, hit=hit, prim_id=prim_o, inst_id=inst_o,
        point=point, normal=normal,
    )


def tiled_sweep_order(
    origins,
    width: int,
    height: int,
    poses_per_tile: int = 32,
    az_tile: int = 8,
    el_tile: int = 1,
    dir_major: bool = False,
) -> Tuple[Array, Array]:
    """Permutation for pose-sweep workloads producing *compact* ray blocks.

    A direction-major block (one direction x all poses) spans the full pose
    bounding box, which makes the block frustum fat and the candidate-bin
    set large. Mixed tiles of ``poses_per_tile`` Morton-clustered origins x
    ``az_tile*el_tile`` angularly-adjacent scan directions shrink the
    footprint per block: origin spread falls with the cluster size while
    the direction spread stays tiny (LiDAR azimuth steps are ~0.2-0.4 deg).

    Rays are assumed pose-major: ray index = pose * (width*height) + dir,
    with the scan grid flattened row-major (dir = el * width + az) — the
    layout produced by :meth:`sensors.models.SphericalModel.rays`
    (getBufferId semantics, models.py:114).

    Returns (perm, inv_perm): apply ``rays[perm]``; un-apply ``hits[inv]``.
    """
    import numpy as np

    from rmcl_tpu.bvh.builder import morton_codes_3d

    origins = np.asarray(origins, np.float32).reshape(-1, 3)
    n_poses = origins.shape[0]
    n_dirs = width * height

    lo = origins.min(axis=0)
    extent = np.maximum(origins.max(axis=0) - lo, 1e-12)
    pose_order = np.argsort(
        morton_codes_3d((origins - lo) / extent), kind="stable"
    ).astype(np.int64)

    # pad the pose axis so tiles divide evenly (duplicated poses only waste
    # a sliver of the last tile; the inverse perm ignores duplicates)
    pt = max(1, min(poses_per_tile, n_poses))
    at = max(1, min(az_tile, width))
    et = max(1, min(el_tile, height))
    n_pt = (n_poses + pt - 1) // pt
    pose_pad = np.concatenate(
        [pose_order, np.repeat(pose_order[-1:], n_pt * pt - n_poses)]
    ).reshape(n_pt, pt)

    az_ids = np.arange((width + at - 1) * 0 + width)
    el_ids = np.arange(height)
    n_at = (width + at - 1) // at
    n_et = (height + et - 1) // et
    az_pad = np.concatenate([az_ids, np.repeat(az_ids[-1:], n_at * at - width)])
    el_pad = np.concatenate([el_ids, np.repeat(el_ids[-1:], n_et * et - height)])
    az_tiles = az_pad.reshape(n_at, at)
    el_tiles = el_pad.reshape(n_et, et)

    # block layout: (pose_tile, az_tile, el_tile) -> rays
    # ray id = pose * n_dirs + el * width + az
    # (built with jnp so the big perm/inv arrays are born on device — the
    # host->device copy of a multi-M-ray permutation can stall for minutes
    # on the relay backend)
    # dir_major=True orders each tile direction-outer / pose-inner: the
    # tile's at*et directions form contiguous groups of pt same-direction
    # rays — exactly the cast_rays_binned(dir_groups=at*et) contract.
    if dir_major:
        p = jnp.asarray(pose_pad, jnp.int32)[:, None, None, None, None, :]
        a = jnp.asarray(az_tiles, jnp.int32)[None, :, None, :, None, None]
        e = jnp.asarray(el_tiles, jnp.int32)[None, None, :, None, :, None]
    else:
        p = jnp.asarray(pose_pad, jnp.int32)[:, None, None, :, None, None]
        a = jnp.asarray(az_tiles, jnp.int32)[None, :, None, None, :, None]
        e = jnp.asarray(el_tiles, jnp.int32)[None, None, :, None, None, :]
    perm = (p * n_dirs + e * width + a).reshape(-1)

    # inverse that ignores duplicate (padded) entries: last write wins is
    # fine because duplicates compute identical rays
    inv = (
        jnp.zeros(n_poses * n_dirs, jnp.int32)
        .at[perm]
        .set(jnp.arange(perm.shape[0], dtype=jnp.int32))
    )
    return perm, inv


class TiledSweep:
    """Factored tiled pose-sweep ordering — zero big gathers.

    :func:`tiled_sweep_order` returns flat (perm, inv) index arrays; applying
    them to multi-M-ray arrays costs 8+ full random gathers per cast (~40% of
    the benchmark correction, measured). But the permutation it builds is a
    *product* of three small per-axis orderings (Morton pose order x azimuth
    tiles x elevation tiles), so both directions factor into reshapes,
    transposes, broadcasts, slices and tiny per-axis gathers — all
    bandwidth-speed copies on TPU.

    Use for translation sweeps of one shared scan grid (the reference
    corrector benchmark pattern, lidar_corrector_embree_benchmark.cpp:77-138):

        sweep = TiledSweep(trans, width, height, 16, 8, 1)
        o, d = sweep.rays(trans_j, dirs_j)          # permuted-flat rays
        hits = cast_rays_binned(bins, o, d, block_size=sweep.block_size,
                                dir_groups=sweep.dir_groups)
        t = sweep.unpermute(hits.t)                 # (n_poses, n_dirs)

    Ray layout (dir-major): axes (pose_tile, az_tile, el_tile, az_in, el_in,
    pose_in) flattened C-order; each tile cell is one contiguous block of
    ``az_tile*el_tile`` groups x ``poses_per_tile`` same-direction rays —
    exactly the ``cast_rays_binned(dir_groups=az_tile*el_tile)`` contract.
    """

    def __init__(
        self,
        origins,
        width: int,
        height: int,
        poses_per_tile: int = 16,
        az_tile: int = 8,
        el_tile: int = 1,
    ):
        import numpy as np

        from rmcl_tpu.bvh.builder import morton_codes_3d

        origins = np.asarray(origins, np.float32).reshape(-1, 3)
        n_poses = origins.shape[0]
        lo = origins.min(axis=0)
        extent = np.maximum(origins.max(axis=0) - lo, 1e-12)
        pose_order = np.argsort(
            morton_codes_3d((origins - lo) / extent), kind="stable"
        ).astype(np.int32)

        pt = max(1, min(poses_per_tile, n_poses))
        at = max(1, min(az_tile, width))
        et = max(1, min(el_tile, height))
        n_pt = (n_poses + pt - 1) // pt
        n_at = (width + at - 1) // at
        n_et = (height + et - 1) // et
        # pad every axis by repeating its last entry; padding sits at the
        # END of each flattened axis, so the inverse is a plain slice there
        pose_pad = np.concatenate(
            [pose_order, np.repeat(pose_order[-1:], n_pt * pt - n_poses)]
        )
        self.pose_tiles = pose_pad.reshape(n_pt, pt)
        # position of pose p in the padded pose axis (inverse of pose_order)
        self.pose_rank = np.argsort(pose_order, kind="stable").astype(np.int32)

        self.width, self.height = width, height
        self.n_poses, self.n_dirs = n_poses, width * height
        self.pt, self.at, self.et = pt, at, et
        self.n_pt, self.n_at, self.n_et = n_pt, n_at, n_et
        self.block_size = at * et * pt
        self.dir_groups = at * et
        self.n_rays = n_pt * n_at * n_et * self.block_size

        # scan-grid direction ids per (az_tile, el_tile, az_in, el_in)
        az_pad = np.minimum(np.arange(n_at * at), width - 1)
        el_pad = np.minimum(np.arange(n_et * et), height - 1)
        self.dir_ids = (
            el_pad.reshape(1, n_et, 1, et) * width
            + az_pad.reshape(n_at, 1, at, 1)
        ).astype(np.int32)  # (n_at, n_et, at, et)
        # first-occurrence mask (duplicate padded dirs excluded), for
        # per-pose reductions done in permuted layout
        first = (np.arange(n_at * at) < width).reshape(n_at, 1, at, 1) & (
            np.arange(n_et * et) < height
        ).reshape(1, n_et, 1, et)
        self.dir_valid = np.broadcast_to(first, self.dir_ids.shape)

    def rays(self, trans: Array, dirs: Array) -> Tuple[Array, Array]:
        """Permuted-flat (origins, directions) from per-pose translations
        (n_poses, 3) and shared scan directions (n_dirs, 3)."""
        n_pt, n_at, n_et = self.n_pt, self.n_at, self.n_et
        at, et, pt = self.at, self.et, self.pt
        full = (n_pt, n_at, n_et, at, et, pt, 3)
        tp = jnp.take(jnp.asarray(trans, jnp.float32),
                      jnp.asarray(self.pose_tiles), axis=0)  # (n_pt, pt, 3)
        o = jnp.broadcast_to(tp[:, None, None, None, None, :, :], full)
        dg = jnp.take(jnp.asarray(dirs, jnp.float32),
                      jnp.asarray(self.dir_ids), axis=0)  # (n_at, n_et, at, et, 3)
        d = jnp.broadcast_to(dg[None, :, :, :, :, None, :], full)
        return o.reshape(-1, 3), d.reshape(-1, 3)

    def factored_rays(self, trans: Array, dirs: Array) -> Tuple[Array, Array]:
        """Compact per-block rays for :func:`cast_rays_binned_factored`:
        (origins (n_blk, P, 3), directions (n_blk, G, 3)) with P =
        poses_per_tile, G = az_tile*el_tile, block index (pose_tile,
        az_tile, el_tile) C-order and in-block ray order g*P + p — the same
        flat ray order :meth:`rays` produces, so :meth:`unpermute` applies
        unchanged to hits reshaped to (n_blk*block_size, ...)."""
        n_pt, n_at, n_et = self.n_pt, self.n_at, self.n_et
        at, et, pt = self.at, self.et, self.pt
        G = at * et
        tp = jnp.take(jnp.asarray(trans, jnp.float32),
                      jnp.asarray(self.pose_tiles), axis=0)  # (n_pt, pt, 3)
        o_blk = jnp.broadcast_to(
            tp[:, None, None], (n_pt, n_at, n_et, pt, 3)
        ).reshape(-1, pt, 3)
        dg = jnp.take(jnp.asarray(dirs, jnp.float32),
                      jnp.asarray(self.dir_ids), axis=0)  # (n_at, n_et, at, et, 3)
        d_blk = jnp.broadcast_to(
            dg.reshape(n_at, n_et, G, 3)[None], (n_pt, n_at, n_et, G, 3)
        ).reshape(-1, G, 3)
        return o_blk, d_blk

    def permute(self, data: Array) -> Array:
        """Canonical (n_poses, n_dirs, *k) -> sweep-flat (n_rays, *k)
        (the forward counterpart of :meth:`unpermute`; small per-axis
        gathers only). Padded slots replicate their axis's last entry."""
        k = data.shape[2:]
        tp = jnp.take(
            data, jnp.asarray(self.pose_tiles).reshape(-1), axis=0
        ).reshape((self.n_pt, self.pt, self.n_dirs) + k)
        dg = jnp.take(
            tp, jnp.asarray(self.dir_ids).reshape(-1), axis=2
        ).reshape(
            (self.n_pt, self.pt, self.n_at, self.n_et, self.at, self.et) + k
        )
        out = jnp.transpose(
            dg, (0, 2, 3, 4, 5, 1) + tuple(6 + i for i in range(len(k)))
        )
        return out.reshape((self.n_rays,) + k)

    def pose_sums(self, vals: Array) -> Array:
        """Per-pose sums of per-ray values given in sweep-flat order:
        (n_rays, *k) -> (n_poses, *k), excluding padded-dir duplicates and
        padded pose slots. This replaces unpermute + canonical-order
        segment reduction with pure reshapes/reduces — per-pose statistics
        (the P2L reduction) never need the rays back in scan order."""
        k = vals.shape[1:]
        v = vals.reshape(
            (self.n_pt, self.n_at, self.n_et, self.at, self.et, self.pt) + k
        )
        dmask = jnp.asarray(self.dir_valid, vals.dtype).reshape(
            (1, self.n_at, self.n_et, self.at, self.et, 1) + (1,) * len(k)
        )
        s = jnp.sum(v * dmask, axis=(1, 2, 3, 4))  # (n_pt, pt, *k)
        s = s.reshape((self.n_pt * self.pt,) + k)
        # padded pose slots duplicate pose_order[-1]; pose_rank indexes only
        # each pose's original slot, so duplicates are simply never selected
        return jnp.take(s, jnp.asarray(self.pose_rank), axis=0)

    def unpermute(self, y: Array) -> Array:
        """Permuted-flat (n_rays, *k) -> (n_poses, n_dirs, *k) via
        transpose + slices + one small pose gather (no big gathers)."""
        k = y.shape[1:]
        n_pt, n_at, n_et = self.n_pt, self.n_at, self.n_et
        at, et, pt = self.at, self.et, self.pt
        y6 = y.reshape((n_pt, n_at, n_et, at, et, pt) + k)
        # -> (pose_slot, el_slot, az_slot)
        y6 = jnp.transpose(y6, (0, 5, 2, 4, 1, 3) + tuple(6 + i for i in range(len(k))))
        y3 = y6.reshape((n_pt * pt, n_et * et, n_at * at) + k)
        out = y3[:, : self.height, : self.width]
        out = jnp.take(out, jnp.asarray(self.pose_rank), axis=0)
        return out.reshape((self.n_poses, self.n_dirs) + k)


def direction_major_order(n_poses: int, n_dirs: int) -> Tuple[Array, Array]:
    """Permutation turning pose-major rays (pose0's scan, pose1's scan, …)
    into direction-major order (all poses' ray #0, all poses' ray #1, …).

    For pose sweeps with a shared scan pattern (the reference benchmark:
    1000 poses x one VLP-16 grid), direction-major blocks are super-coherent
    — same direction, nearby origins — which slashes the candidate-bin count
    per block. Returns (perm, inv_perm): apply ``rays[perm]``, un-apply with
    ``hits[inv_perm]``."""
    idx = jnp.arange(n_poses * n_dirs).reshape(n_poses, n_dirs)
    perm = idx.T.reshape(-1)
    inv = jnp.argsort(perm)
    return perm, inv
