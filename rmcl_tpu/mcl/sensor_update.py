"""Particle sensor update: beam-sampled 1-D range likelihoods.

TPU-native equivalent of ``PCDSensorUpdater{Embree,Optix}`` and the OptiX
``BeamEvaluateProgram`` (reference PCDSensorUpdaterEmbree.cpp:18-95,197-352;
BeamEvaluateProgram.cu:15-131). The reference loops ``samples`` (default 100)
random beams, each launching one ray per particle; here the whole
particles x samples grid is ONE batched ray cast.

Scoring semantics (verified against the reference source):
  * RCC metric: cast the sampled beam from the particle's hypothetical
    sensor pose; error = |signed point-to-plane distance| between the real
    point and the simulated hit plane; hit/miss mismatches get fixed
    penalty errors (defaults 100 m; real-miss+sim-miss error 0)
    (evaluate_rcc — PCDSensorUpdaterEmbree.cpp:18-86).
  * CPC metric: error = distance from the (map-frame) measured point to the
    closest mesh surface point (evaluate_cpc — :88-95).
  * eval = N(error; 0, dist_sigma) — the Gaussian density (:224)
  * fold: likelihood += {mean: eval, sigma: 0, n_meas: 1} per sample, with
    n_meas clamped to MAX_N_MEAS (:230-240). Here the S per-sample evals
    are folded as one batch Gaussian (associative merge), then merged into
    the prior — identical up to clamp ordering.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.math.gaussian import Gaussian1D, MAX_N_MEAS
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.math.stats import gaussian_pdf
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.ops.order import cluster_order
from rmcl_tpu.ops.raycast_binned import cast_rays_binned
from rmcl_tpu.ops.closest_point import closest_points, closest_points_binned
from rmcl_tpu.ops.raycast import cast_rays
from rmcl_tpu.sensors.models import RangeInterval

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SensorUpdateConfig:
    """Defaults match the reference param block (PCDSensorUpdaterEmbree
    updateParams + config struct; samples default 100 —
    rmcl_localization.cpp:384-386)."""

    samples: int = dataclasses.field(default=100, metadata=dict(static=True))
    correspondence_type: str = dataclasses.field(default="RC", metadata=dict(static=True))
    # bvh    — exact stackless traversal (no budgets; window-round
    #          compaction — the fastest exact path on scattered clouds)
    # binned — dense gather-free caster (fast on coherent blocks; candidate
    #          budgets can saturate => lossy on scattered clouds)
    # seeded — trust-or-refine: a binned pass whose CERTIFIED rays (blocks
    #          with untruncated budgets) are accepted outright, everything
    #          else refined by the exact traversal with the seed hit
    #          priming t_best. Always exact. Pays off ONLY when budgets
    #          certify most blocks (measured: 100% at cs=48/cb=288 in
    #          mid-convergence spreads, ~0% scattered — TPU_NOTES r4);
    #          scattered clouds should use "bvh" (chip A/B: 1.65 s vs
    #          seeded 1.94 s). Needs BOTH structures: accel=(bvh, bins).
    engine: str = dataclasses.field(default="bvh", metadata=dict(static=True))
    # binned engine only: Morton(+heading) cluster the particles per update
    # so beam-major ray blocks stay spatially/angularly tight (resampling
    # shuffles the cloud; the dense engine's frustum cull degrades on
    # incoherent blocks). Pure reordering — results are exactly preserved.
    cluster: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # binned engine candidate budgets (cast_rays_binned c_super/c_bin).
    # RAISE for large maps / scattered clouds: candidate saturation
    # (ops.raycast_binned.candidate_stats hitting c_bin) silently drops
    # geometry, i.e. false sim-misses. The exact 'bvh' engine has no such
    # budget and remains the default for global-localization phases.
    c_super: int = dataclasses.field(default=24, metadata=dict(static=True))
    c_bin: int = dataclasses.field(default=96, metadata=dict(static=True))
    # 3-level cull budget for binned RC ray casts (0 = 2-level)
    c_mid: int = dataclasses.field(default=0, metadata=dict(static=True))
    # binned-engine culling block size: smaller blocks present narrower
    # direction fans to the cull — on fine indoor maps (grazing floor/
    # ceiling crossings) 128-ray blocks saturate any candidate budget while
    # 32-ray blocks stay exact (CPU-audited); cull cost rises ~4x but the
    # pair work (the dominant term) drops with the candidate sets.
    block_size: int = dataclasses.field(default=128, metadata=dict(static=True))
    # hyper-level budget (4-level cull; needs bins built with a hyper
    # level — build_bins(supers_per_hyper=...)). 0 = off. See
    # ops.raycast_binned._chunk_level0: sizes the coarse levels with ONE
    # fat block cone, so c_super must cover the fat-cone passing count.
    c_hyper: int = dataclasses.field(default=0, metadata=dict(static=True))
    # per-sub-block cull cones (cast_rays_binned sub_blocks): finer cones
    # shrink candidate sets conservatively (each cone bounds its own rays;
    # the union covers the block) at higher cull cost. MCL pays the cull
    # EVERY update (no cross-correction reuse here), so the optimum sits
    # lower than the corrector's reuse-amortized sub=128 ladder top.
    sub_blocks: int = dataclasses.field(default=4, metadata=dict(static=True))
    # count-sorted homogeneous chunks for the binned cast (cast_rays_binned
    # sort_blocks): each 256-block chunk's trip count tracks its own sorted
    # worst block instead of the chunk max. Bitwise-identical results
    # (pure reordering + unpermute). Chip r5 A/B at the 1M bench config:
    # 1471 -> 1053 ms per 131k-particle chunk (1.40x) — the MCL cycle was
    # shipping without the corrector's round-1 count-sort win.
    sort_blocks: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # binned engine ray layout:
    #   "beam":     blocks = many particles x one beam (good once the cloud
    #               has concentrated: positions tight, headings aligned)
    #   "particle": blocks = few adjacent particles x their direction-sorted
    #               beams. Origins are as tight as the particle cluster, so
    #               the cull's ball bound (origin_box + ball(range)) selects
    #               only bins within sensor range of the cluster — heading
    #               spread can't blow the candidate set to pass-all. The
    #               right choice on indoor/short-range maps and for clouds
    #               with mixed headings.
    layout: str = dataclasses.field(default="beam", metadata=dict(static=True))
    dist_sigma: Array = dataclasses.field(default_factory=lambda: jnp.float32(2.0))
    real_hit_sim_miss_error: Array = dataclasses.field(default_factory=lambda: jnp.float32(100.0))
    real_miss_sim_hit_error: Array = dataclasses.field(default_factory=lambda: jnp.float32(100.0))
    real_miss_sim_miss_error: Array = dataclasses.field(default_factory=lambda: jnp.float32(0.0))
    range_min: Array = dataclasses.field(default_factory=lambda: jnp.float32(0.1))
    range_max: Array = dataclasses.field(default_factory=lambda: jnp.float32(130.0))
    # per-beam sim-ray reach cap: t_max = range + range_cap_sigmas*dist_sigma.
    # A sim hit beyond the cap scores ~exp(-k^2/2) ~ 0, exactly like the
    # sim-miss penalty, so k=6 is semantically free (measured: capped vs
    # uncapped exact-engine likelihoods agree to 3e-5) while collapsing the
    # dense cull's reach from range_max to beam range + 12 m — the
    # difference between budget-achievable and saturating candidate sets on
    # building-scale maps. 0 disables (strict reference semantics:
    # unbounded rtcIntersect1, grazing far planes can score high).
    range_cap_sigmas: float = dataclasses.field(
        default=6.0, metadata=dict(static=True)
    )

    @staticmethod
    def create(
        samples=100,
        correspondence_type="RC",
        dist_sigma=2.0,
        real_hit_sim_miss_error=100.0,
        real_miss_sim_hit_error=100.0,
        real_miss_sim_miss_error=0.0,
        range_min=0.1,
        range_max=130.0,
        engine="bvh",
        cluster=True,
        c_super=24,
        c_bin=96,
        c_mid=0,
        c_hyper=0,
        layout="beam",
        range_cap_sigmas=6.0,
        block_size=128,
        sub_blocks=4,
        sort_blocks=True,
    ):
        return SensorUpdateConfig(
            samples=samples,
            correspondence_type=correspondence_type,
            engine=engine,
            cluster=cluster,
            c_super=c_super,
            c_bin=c_bin,
            c_mid=c_mid,
            c_hyper=c_hyper,
            layout=layout,
            range_cap_sigmas=float(range_cap_sigmas),
            block_size=block_size,
            sub_blocks=sub_blocks,
            sort_blocks=bool(sort_blocks),
            dist_sigma=jnp.float32(dist_sigma),
            real_hit_sim_miss_error=jnp.float32(real_hit_sim_miss_error),
            real_miss_sim_hit_error=jnp.float32(real_miss_sim_hit_error),
            real_miss_sim_miss_error=jnp.float32(real_miss_sim_miss_error),
            range_min=jnp.float32(range_min),
            range_max=jnp.float32(range_max),
        )


def sample_beams(
    key: Array, points: Array, mask: Array, n_samples: int
) -> Tuple[Array, Array, Array]:
    """Pick ``n_samples`` random valid points from a sensor-frame cloud.

    Returns (dirs (S,3), ranges (S,), valid (S,)). Replaces the reference's
    rejection loop over NaN points (PCDSensorUpdaterEmbree.cpp:290-311) with
    masked categorical sampling."""
    n = points.shape[0]
    p = mask.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1e-30)
    idx = jax.random.choice(key, n, (n_samples,), replace=True, p=p)
    pts = jnp.take(points, idx, axis=0)
    rng = jnp.linalg.norm(pts, axis=-1)
    dirs = pts / jnp.maximum(rng, 1e-12)[..., None]
    valid = jnp.take(mask, idx)
    return dirs, rng, valid


def probe_update_rays(
    cloud: ParticleCloud,
    key: Array,
    points_s: Array,
    points_mask: Array,
    tsb: Transform,
    config: SensorUpdateConfig,
) -> Tuple[Array, Array, Array]:
    """The (orig, dirs, t_max) ray set a binned-RC :func:`sensor_update`
    would cast — mirrors its layout branches (cluster + beam/particle-major)
    AND the per-beam range cap so budget diagnosis (``candidate_stats`` /
    ``suggest_budgets``) sees the real block composition and reach. Keep in
    lockstep with sensor_update."""
    S = config.samples
    N = cloud.capacity
    dirs_s, ranges, valid = sample_beams(key, points_s, points_mask, S)
    # per-beam reach cap — the SAME t_max the real cast uses (real-hit
    # beams capped at range + k*sigma, real-miss beams unbounded); audits
    # with a flat t_max=range_max overstate candidate counts badly (the
    # wedge sweeps the whole map instead of a few metres past the surface)
    from rmcl_tpu.ops.raycast import NO_HIT_T as _NO_HIT_T

    sensor_range = RangeInterval(config.range_min, config.range_max)
    real_hit = sensor_range.contains(ranges) & valid
    if config.range_cap_sigmas <= 0.0:
        tmax_s = jnp.full((S,), jnp.float32(_NO_HIT_T))
    else:
        tmax_s = jnp.where(
            real_hit,
            ranges + jnp.float32(config.range_cap_sigmas) * config.dist_sigma,
            jnp.float32(_NO_HIT_T),
        )
    particle_major = config.layout == "particle"
    if particle_major:
        az = jnp.arctan2(dirs_s[:, 1], dirs_s[:, 0])
        el = jnp.arcsin(jnp.clip(dirs_s[:, 2], -1.0, 1.0))
        band = jnp.clip(
            ((el + jnp.pi * 0.5) * (8.0 / jnp.pi)).astype(jnp.int32), 0, 7
        )
        azq = jnp.clip(
            ((az + jnp.pi) * (512.0 / (2.0 * jnp.pi))).astype(jnp.int32),
            0, 511,
        )
        bsort = jnp.argsort(band * 512 + azq)
        dirs_s = jnp.take(dirs_s, bsort, axis=0)
        tmax_s = jnp.take(tmax_s, bsort, axis=0)
        pad = (-S) % 32
        if pad:
            dirs_s = jnp.concatenate(
                [dirs_s,
                 jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))]
            )
            tmax_s = jnp.concatenate([tmax_s, jnp.zeros(pad, jnp.float32)])
    Sp = dirs_s.shape[0]
    tsm = cloud.poses @ tsb
    if config.cluster:
        fw = cloud.poses.rotate(jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
        order, _ = cluster_order(cloud.poses.trans, fw)
        tsm = jax.tree.map(lambda x: jnp.take(x, order, axis=0), tsm)
    tsm_b = tsm.expand_dims(-1)
    orig_m = jnp.broadcast_to(tsm_b.trans, (N, Sp, 3))
    dirs_m = tsm_b.rotate(dirs_s)
    if particle_major:
        t_pm = jnp.broadcast_to(tmax_s[None, :], (N, Sp)).reshape(-1)
        return orig_m.reshape(-1, 3), dirs_m.reshape(-1, 3), t_pm
    o_bm = jnp.swapaxes(orig_m, 0, 1).reshape(-1, 3)
    d_bm = jnp.swapaxes(dirs_m, 0, 1).reshape(-1, 3)
    t_bm = jnp.broadcast_to(tmax_s[:, None], (Sp, N)).reshape(-1)
    return o_bm, d_bm, t_bm


# config is a pytree argument; its `samples`/`correspondence_type` fields are
# static through the pytree structure (register_dataclass meta fields)
@partial(jax.jit, static_argnames=("chunk_size",))
def sensor_update(
    bvh,  # BVH (engine="bvh") or TriangleBins (engine="binned")
    cloud: ParticleCloud,
    key: Array,
    points_s: Array,  # (M, 3) sensor-frame point cloud (one message)
    points_mask: Array,  # (M,) finite/valid mask
    tsb: Transform,
    config: SensorUpdateConfig = None,
    chunk_size: int = 262144,
    beams: Tuple[Array, Array, Array] | None = None,
) -> ParticleCloud:
    """Evaluate S sampled beams against all particles; fold likelihoods.

    ``beams``: optionally inject a pre-sampled ``(dirs_s, ranges, valid)``
    triple (the :func:`sample_beams` output). The reference samples ONE
    beam set per update and broadcasts it to every particle
    (PCDSensorUpdaterEmbree.cpp:330-341); callers that chunk the cloud
    over several sensor_update dispatches (bench_mcl_1m) pass the shared
    sample here so all chunks score the same beams — reference parity AND
    one sample_beams instead of n_chunks (measured 114 ms/chunk at 1M).
    """
    if config is None:
        config = SensorUpdateConfig.create()
    S = config.samples
    N = cloud.capacity

    if beams is None:
        dirs_s, ranges, beam_valid = sample_beams(key, points_s, points_mask, S)
    else:
        dirs_s, ranges, beam_valid = beams
    sensor_range = RangeInterval(config.range_min, config.range_max)
    real_hit = sensor_range.contains(ranges) & beam_valid  # (S,)

    # particle-major layout: angular-sort the sampled beams (sensor frame —
    # each particle rotates them rigidly, so stream adjacency survives) and
    # pad to a lane-friendly multiple. Pad beams are DEAD rays (t_max=0,
    # excluded from block bounds, never hit) and carry zero fold weight.
    particle_major = config.correspondence_type != "CP" and (
        (config.engine == "binned" and config.layout == "particle")
        # seeded: the dense seed pass culls per particle-major block (tight
        # origins from clustered particles; reach capped per beam), so the
        # beams are always angular-sorted + padded like layout="particle"
        or config.engine == "seeded"
    )
    beam_w = jnp.ones((S,), jnp.float32)
    beam_tmax = None
    from rmcl_tpu.ops.raycast import NO_HIT_T as _NO_HIT_T

    def _cap(r, hit, w=None):
        if config.range_cap_sigmas <= 0.0:
            full = jnp.full(r.shape, jnp.float32(_NO_HIT_T))
        else:
            # the exp(-k^2/2)~0 equivalence argument only covers REAL-HIT
            # beams; a real-miss beam capped at range+k*sigma could flip a
            # far sim surface from sim-hit (real_miss_sim_hit_error) to
            # sim-miss — keep real-miss beams unbounded like the
            # reference's rtcIntersect1 (PCDSensorUpdaterEmbree.cpp:44)
            full = jnp.where(
                hit,
                r + jnp.float32(config.range_cap_sigmas) * config.dist_sigma,
                jnp.float32(_NO_HIT_T),
            )
        if w is not None:
            full = jnp.where(w > 0.0, full, 0.0)
        return full
    if particle_major:
        az = jnp.arctan2(dirs_s[:, 1], dirs_s[:, 0])
        el = jnp.arcsin(jnp.clip(dirs_s[:, 2], -1.0, 1.0))
        band = jnp.clip(
            ((el + jnp.pi * 0.5) * (8.0 / jnp.pi)).astype(jnp.int32), 0, 7
        )
        azq = jnp.clip(
            ((az + jnp.pi) * (512.0 / (2.0 * jnp.pi))).astype(jnp.int32),
            0,
            511,
        )
        bsort = jnp.argsort(band * 512 + azq)
        dirs_s = jnp.take(dirs_s, bsort, axis=0)
        ranges = jnp.take(ranges, bsort, axis=0)
        real_hit = jnp.take(real_hit, bsort, axis=0)
        pad = (-S) % 32
        if pad:
            dirs_s = jnp.concatenate(
                [dirs_s, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))]
            )
            ranges = jnp.concatenate([ranges, jnp.zeros((pad,), jnp.float32)])
            real_hit = jnp.concatenate([real_hit, jnp.zeros((pad,), bool)])
            beam_w = jnp.concatenate([beam_w, jnp.zeros((pad,), jnp.float32)])
        beam_tmax = _cap(ranges, real_hit, beam_w)
    Sp = dirs_s.shape[0]  # S or padded

    # particle sensor poses: Tsm_i = Tbm_i * Tsb  (reference :334-338)
    tsm = cloud.poses @ tsb  # batch (N,)

    # binned engine: cluster particles by position Morton code + heading so
    # the beam-major blocks below present tight frusta to the dense cull.
    # Permutes only the (N,) pose batch before broadcast and un-permutes the
    # two (N,) reduced likelihood arrays at the end — never the (N, S) grid.
    perm_inv = None
    if (
        config.engine in ("binned", "seeded")
        and config.correspondence_type != "CP"
        and config.cluster
    ):
        fw = cloud.poses.rotate(jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
        order, perm_inv = cluster_order(cloud.poses.trans, fw)
        tsm = jax.tree.map(lambda x: jnp.take(x, order, axis=0), tsm)

    # beam rays in map frame for every (particle, sample)
    tsm_b = tsm.expand_dims(-1)  # (N, 1)
    orig_m = jnp.broadcast_to(tsm_b.trans, (N, Sp, 3))
    dirs_m = tsm_b.rotate(dirs_s)  # (N, Sp, 3)

    if config.correspondence_type == "CP":
        # CPC: distance from the measured point (map frame) to the surface
        p_meas_m = tsm_b.apply(dirs_s * ranges[:, None])  # (N, S, 3)
        if config.engine == "binned":
            cp = closest_points_binned(
                bvh, p_meas_m, c_super=config.c_super, c_bin=config.c_bin
            )
        elif config.engine == "seeded":
            from rmcl_tpu.ops.closest_point import closest_points_seeded

            bvh_s, bins_s = bvh
            cp = closest_points_seeded(
                bvh_s,
                bins_s,
                p_meas_m,
                chunk_size=chunk_size,
                c_super=config.c_super,
                c_bin=config.c_bin,
            )
        else:
            cp = closest_points(bvh, p_meas_m, chunk_size=chunk_size)
        error = jnp.where(cp.found, cp.dist, config.real_hit_sim_miss_error)
    else:
        beam_tmax_all = beam_tmax if beam_tmax is not None else _cap(ranges, real_hit)
        if config.engine == "seeded":
            # exact results via the dense seed: binned hit t (a true upper
            # bound) primes the traversal's t_best per ray (see
            # ops.raycast.cast_rays_seeded). Particle-major layout: the seed
            # cull sees tight origin boxes from the clustered particles.
            from rmcl_tpu.ops.raycast import cast_rays_seeded

            bvh_s, bins_s = bvh
            h = cast_rays_seeded(
                bvh_s,
                bins_s,
                orig_m.reshape(-1, 3),
                dirs_m.reshape(-1, 3),
                t_max=jnp.broadcast_to(beam_tmax[None, :], (N, Sp)).reshape(-1),
                chunk_size=chunk_size,
                flip_normals=False,
                block_size=config.block_size,
                c_super=config.c_super,
                c_bin=config.c_bin,
                c_mid=config.c_mid,
                c_hyper=config.c_hyper,
                sub_blocks=config.sub_blocks,
            )
            hits = jax.tree.map(lambda x: x.reshape(N, Sp, *x.shape[1:]), h)
        elif config.engine == "binned" and particle_major:
            # dense engine, particle-major: each block covers few clustered
            # particles x their direction-sorted beams; the cull's ball
            # bound keeps candidates to bins within range of the cluster
            h = cast_rays_binned(
                bvh,
                orig_m.reshape(-1, 3),
                dirs_m.reshape(-1, 3),
                t_max=jnp.broadcast_to(beam_tmax_all[None, :], (N, Sp)).reshape(-1),
                block_size=config.block_size,
                flip_normals=False,
                payload="index",
                c_super=config.c_super,
                c_bin=config.c_bin,
                c_mid=config.c_mid,
                c_hyper=config.c_hyper,
                sub_blocks=config.sub_blocks,
                sort_blocks=config.sort_blocks,
            )
            hits = jax.tree.map(
                lambda x: x.reshape(N, Sp, *x.shape[1:]), h
            )
        elif config.engine == "binned":
            # dense engine: beam-major order (all particles of one beam form
            # coherent-ish blocks once the cloud has concentrated)
            o_bm = jnp.swapaxes(orig_m, 0, 1).reshape(-1, 3)
            d_bm = jnp.swapaxes(dirs_m, 0, 1).reshape(-1, 3)
            t_bm = jnp.broadcast_to(
                beam_tmax_all[:, None], (Sp, N)
            ).reshape(-1)
            h = cast_rays_binned(
                bvh,
                o_bm,
                d_bm,
                t_max=t_bm,
                block_size=config.block_size,
                flip_normals=False,
                payload="index",
                c_super=config.c_super,
                c_bin=config.c_bin,
                c_mid=config.c_mid,
                c_hyper=config.c_hyper,
                sub_blocks=config.sub_blocks,
                sort_blocks=config.sort_blocks,
            )
            resh = lambda x: jnp.swapaxes(
                x.reshape(Sp, N, *x.shape[1:]), 0, 1
            )
            hits = jax.tree.map(resh, h)
        else:
            hits = cast_rays(
                bvh,
                orig_m,
                dirs_m,
                t_min=0.0,
                t_max=jnp.broadcast_to(beam_tmax_all[None, :], (N, Sp)),
                chunk_size=chunk_size,
                flip_normals=False,
            )
        sim_hit = hits.hit & (hits.t > config.range_min)
        # point-to-plane distance between real and simulated hit (map frame)
        p_real_m = orig_m + dirs_m * ranges[None, :, None]
        signed = jnp.sum(hits.normal * (hits.point - p_real_m), axis=-1)
        error = jnp.where(
            sim_hit,
            jnp.where(
                real_hit[None, :], jnp.abs(signed), config.real_miss_sim_hit_error
            ),
            jnp.where(
                real_hit[None, :],
                config.real_hit_sim_miss_error,
                config.real_miss_sim_miss_error,
            ),
        )  # (N, S)

    evals = gaussian_pdf(error, config.dist_sigma)  # (N, Sp)

    # batch-fold the S evals, then merge into the prior likelihood
    # (masked over the real beams — pad beams carry zero weight)
    e_mean = jnp.sum(evals * beam_w[None, :], axis=-1) / S
    e_var = (
        jnp.sum(beam_w[None, :] * (evals - e_mean[:, None]) ** 2, axis=-1) / S
    )
    if perm_inv is not None:  # undo the coherence clustering
        e_mean = jnp.take(e_mean, perm_inv, axis=0)
        e_var = jnp.take(e_var, perm_inv, axis=0)
    batch = Gaussian1D(
        mean=e_mean,
        sigma=e_var,
        n_meas=jnp.full((N,), jnp.float32(S)),
    )
    lik = cloud.likelihood.merge(batch, max_n=MAX_N_MEAS)
    return dataclasses.replace(cloud, likelihood=lik)
