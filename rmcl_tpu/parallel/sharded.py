"""Sharded execution of the MICP and MCL pipelines.

Mapping of the reference's parallelism inventory (SURVEY.md §2.10) onto a
TPU device mesh:

  P1 (rays)      → sensor pixels sharded over the ``rays`` axis; the P2L /
                   GN statistics reductions are commutative monoids, so XLA
                   partitions the einsums and inserts the ``psum`` over ICI
                   automatically under jit-with-shardings.
  P2 (particles) → particle arrays sharded; the per-particle sensor update
                   is purely local; resampling needs cross-particle
                   communication — the gladiator tournament picks enemies
                   *within the local shard* plus a ``ppermute`` rotation of
                   a candidate block so hypotheses still mix globally
                   (per-shard duels keep the reference's local-random
                   semantics — SURVEY.md §7 hard part 3).
  P5 (comm)      → psum/all_gather/ppermute over ICI replace the reference's
                   intra-process shared memory.

The BVH is replicated on every device (spatial partitioning is future work).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.resampling import ResamplerConfig, _perturb_poses
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, sensor_update
from rmcl_tpu.micp.pipeline import MICPConfig, MICPSensorData, MICPStats, correct_once
from rmcl_tpu.parallel.mesh import RAY_AXIS, put_replicated, put_sharded, shard_rays

Array = jax.Array


# ---------------------------------------------------------------------------
# MICP: data-parallel rays via jit + shardings (auto-SPMD)
# ---------------------------------------------------------------------------


def shard_sensor_data(sensors: Sequence[MICPSensorData], mesh: Mesh):
    """Place sensor point/mask arrays sharded over rays; models and frames
    replicated. The rays-axis size must divide the ray count (pad the rays
    up to a multiple of the device count upstream)."""
    out = []
    for s in sensors:
        out.append(
            MICPSensorData(
                model=put_replicated(s.model, mesh),
                points=put_sharded(s.points, mesh),
                mask=put_sharded(s.mask, mesh),
                tsb=put_replicated(s.tsb, mesh),
                config=put_replicated(s.config, mesh),
            )
        )
    return out


import functools


@functools.lru_cache(maxsize=32)
def _correct_once_jit(config: MICPConfig, chunk_size: int):
    # memoized per (config, chunk_size): a fresh jax.jit wrapper per call
    # would re-trace + re-compile the whole correction every tick
    return jax.jit(partial(correct_once, config=config, chunk_size=chunk_size))


@functools.lru_cache(maxsize=32)
def _correct_once_shmap(mesh: Mesh, config: MICPConfig, chunk_size: int,
                        n_sensors: int):
    sensor_spec = MICPSensorData(
        model=P(), points=P(RAY_AXIS), mask=P(RAY_AXIS), tsb=P(), config=P()
    )
    f = jax.shard_map(
        partial(correct_once, config=config, chunk_size=chunk_size,
                psum_axis=RAY_AXIS),
        mesh=mesh,
        in_specs=(P(), (sensor_spec,) * n_sensors, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f)


def sharded_correct_once(
    bvh: BVH,
    sensors: Sequence[MICPSensorData],
    tom: Transform,
    tbo: Transform,
    convergence_progress: Array,
    mesh: Mesh,
    config: MICPConfig = MICPConfig(),
    chunk_size: int = 1 << 30,
) -> Tuple[Transform, MICPStats]:
    """correct_once sharded over rays with an EXPLICIT collective budget.

    Inputs must be placed by :func:`shard_sensor_data` /
    :func:`rmcl_tpu.parallel.mesh.put_replicated`. Runs the whole
    correction inside ``shard_map``: correspondence search is purely
    shard-local; the GN statistics merge (the reference's ``Cmerged += Cs``
    loop, micp_localization.cpp:936-937) is ONE packed psum per GN
    iteration plus one final stats pack — K+1 collectives per correction
    (6 at the default K=5) vs the ~16 rendezvous the previous auto-SPMD
    lowering incurred; on rendezvous-dominated transports (multi-process
    gloo, DCN multi-host) the collective COUNT is the scaling floor
    (SCALING_r03 analysis — VERDICT r3 #4). chunk_size defaults to "no
    chunking" because the per-device ray count is already mesh-divided.
    """
    bvh = put_replicated(bvh, mesh)
    f = _correct_once_shmap(mesh, config, chunk_size, len(sensors))
    return f(bvh, tuple(sensors), tom, tbo, convergence_progress)


# ---------------------------------------------------------------------------
# MCL: particle-parallel via shard_map
# ---------------------------------------------------------------------------


def shard_cloud(cloud: ParticleCloud, mesh: Mesh) -> ParticleCloud:
    return put_sharded(cloud, mesh)


def sharded_sensor_update(
    bvh: BVH,
    cloud: ParticleCloud,
    key: Array,
    points_s: Array,
    points_mask: Array,
    tsb: Transform,
    config: SensorUpdateConfig,
    mesh: Mesh,
    chunk_size: int = 1 << 30,
) -> ParticleCloud:
    """Particle-sharded sensor update. The measurement cloud and the sampled
    beams are replicated (every device scores the SAME beams, like the
    reference's broadcast of each sampled beam to all particles —
    PCDSensorUpdaterEmbree.cpp:330-341)."""
    bvh_r = put_replicated(bvh, mesh)

    def local(bvh, cloud, key, pts, msk, tsb):
        # same key on every shard → identical beam sample (replicated)
        return sensor_update(bvh, cloud, key, pts, msk, tsb, config, chunk_size=chunk_size)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(), P(), P(), P()),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    return f(bvh_r, cloud, key, points_s, points_mask, tsb)


def gladiator_mixing_shifts(tick: int, n_shards: int) -> Tuple[int, ...]:
    """Doubling exchange schedule: on tick ``t`` rotate by ``2^(t mod log2)``
    — a strong hypothesis reaches every shard in O(log n_shards) ticks
    instead of the O(n_shards) a fixed shift-1 ring needs. Use as
    ``shifts=gladiator_mixing_shifts(tick, mesh.shape[RAY_AXIS])``."""
    if n_shards <= 1:
        return ()
    levels = max(1, (n_shards - 1).bit_length())
    return (1 << (tick % levels),)


def sharded_gladiator_resample(
    cloud: ParticleCloud,
    key: Array,
    config: ResamplerConfig,
    mesh: Mesh,
    exchange: bool = True,
    shifts: Tuple[int, ...] | None = None,
) -> ParticleCloud:
    """Tournament resampling with per-shard duels + neighbor exchange.

    Each device duels locally (keeps the reference's local-random pairing,
    GladiatorResamplerCPU.cpp:112-175, without cross-chip gathers); when
    ``exchange`` is set, every device additionally receives one rotated
    block of enemy candidates per entry in ``shifts`` via ``ppermute``, so
    strong hypotheses propagate across shards over successive resampling
    ticks.

    ``shifts`` controls the exchange rate (VERDICT r1 #7): each entry k
    adds the k-hops-away shard's particles to the local duel pool (one
    ppermute + n-particle block each). ``None`` keeps the single shift-1
    ring block. For fastest mixing drive the schedule from the tick:
    ``gladiator_mixing_shifts(tick, n)`` rotates the hop distance through
    1, 2, 4, ... — O(log n_shards) propagation at shift-1 cost per tick;
    or pass several shifts at once (more ICI traffic, fewer ticks).
    """
    n_dev = mesh.shape[RAY_AXIS]  # ring over the rays axis, not all devices
    if shifts is None:
        shifts = (1,)
    shifts = tuple(int(s) % n_dev for s in shifts if int(s) % n_dev != 0)

    def local(cloud: ParticleCloud, key: Array) -> ParticleCloud:
        n = cloud.alive.shape[0]  # local shard size
        my = jax.lax.axis_index(RAY_AXIS)
        key = jax.random.fold_in(key, my)
        k_enemy, k_noise, k_pick = jax.random.split(key, 3)

        # dead particles never win duels (same -inf masking as the
        # single-device gladiator_resample)
        L_self = jnp.where(cloud.alive, cloud.likelihood.mean, -jnp.inf)
        if exchange and n_dev > 1 and shifts:
            # rotate candidate blocks (poses + likelihood) from the
            # configured ring distances. The cloud's 7 leaves are PACKED
            # into one (n, 17) f32 buffer so each shift is ONE
            # collective-permute, not 7 (same discipline as the packed
            # psums in sharded_correct_once — on rendezvous-dominated
            # transports the collective COUNT is the floor). Pinned by
            # tests/test_sharding.py::test_sharded_mcl_collective_budget.
            packed = jnp.concatenate(
                [
                    cloud.poses.rot, cloud.poses.trans,
                    cloud.likelihood.mean[:, None],
                    cloud.likelihood.sigma[:, None],
                    cloud.likelihood.n_meas[:, None],
                    cloud.state_sigma,
                    cloud.alive.astype(jnp.float32)[:, None],
                ],
                axis=1,
            )

            def unpack(p) -> ParticleCloud:
                from rmcl_tpu.math.gaussian import Gaussian1D

                return dataclasses.replace(
                    cloud,
                    poses=Transform(rot=p[:, 0:4], trans=p[:, 4:7]),
                    likelihood=Gaussian1D(
                        mean=p[:, 7], sigma=p[:, 8], n_meas=p[:, 9]
                    ),
                    state_sigma=p[:, 10:16],
                    alive=p[:, 16] > 0.5,
                )

            blocks = [cloud]
            for s in shifts:
                perm = [(i, (i + s) % n_dev) for i in range(n_dev)]
                blocks.append(
                    unpack(jax.lax.ppermute(packed, RAY_AXIS, perm))
                )
            pool = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *blocks
            )
            pool_n = len(blocks) * n
        else:
            pool = cloud
            pool_n = n

        enemy = jax.random.randint(k_enemy, (n,), 0, pool_n)
        L_pool = jnp.where(pool.alive, pool.likelihood.mean, -jnp.inf)
        L_enemy = jnp.take(L_pool, enemy)
        lose = L_enemy > L_self

        idx_self = jnp.arange(n)
        src = jnp.where(lose, enemy, idx_self)
        take = lambda x: jnp.take(x, src, axis=0)
        poses_src = Transform(rot=take(pool.poses.rot), trans=take(pool.poses.trans))
        lik_src = jax.tree.map(take, pool.likelihood)

        perturbed, trans_d2, rot_d = _perturb_poses(k_noise, poses_src, config.min_noise)
        poses_new = Transform(
            rot=jnp.where(lose[:, None], perturbed.rot, poses_src.rot),
            trans=jnp.where(lose[:, None], perturbed.trans, poses_src.trans),
        )
        forget_space = 1.0 - jnp.power(1.0 - config.likelihood_forget_per_meter, trans_d2)
        forget_rot = 1.0 - jnp.power(1.0 - config.likelihood_forget_per_radian, rot_d)
        forget = jnp.where(lose, jnp.maximum(forget_space, forget_rot), 0.0)
        return dataclasses.replace(
            cloud,
            poses=poses_new,
            likelihood=lik_src.forget(forget),
            state_sigma=take(pool.state_sigma),
            alive=take(pool.alive),
        )

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P()),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    return f(cloud, key)


def sharded_residual_resample_dynamic(
    cloud: ParticleCloud,
    key: Array,
    config: ResamplerConfig,
    n_target: Array,
    mesh: Mesh,
) -> ParticleCloud:
    """Dynamic-count residual resampling over a particle-sharded cloud
    (the ParticleUpdaterDynamic contract, reference ParticleUpdater.hpp:
    24-72, threaded through the sharded path — VERDICT r1 #5).

    The global live budget ``n_target`` is split across shards in
    proportion to each shard's total likelihood mass (largest-remainder
    rounding so the shares sum exactly to n_target; computed identically
    on every shard from an all_gather of the n_shards weight sums — no
    host round trip). Each shard then residual-resamples locally into its
    prefix, weighting by the GLOBAL weight normalization, so the joint
    distribution matches the single-device resampler's.
    """
    from rmcl_tpu.mcl.resampling import residual_resample_dynamic

    n_dev = mesh.shape[RAY_AXIS]

    def local(cloud: ParticleCloud, key: Array, n_target: Array) -> ParticleCloud:
        my = jax.lax.axis_index(RAY_AXIS)
        w_local = jnp.sum(
            jnp.where(cloud.alive, jnp.maximum(cloud.likelihood.mean, 0.0), 0.0)
        )
        w_all = jax.lax.all_gather(w_local, RAY_AXIS)  # (n_dev,)
        w_sum = jnp.maximum(jnp.sum(w_all), 1e-30)
        cap = jnp.int32(cloud.alive.shape[0])
        # weight-proportional shares capped at shard capacity; the overflow
        # of heavy shards spills to the rest by a deterministic greedy fill
        # (fractional-part order) so the shares sum to exactly
        # min(n_target, n_dev*cap) — identical arithmetic on every shard
        exact = w_all / w_sum * n_target.astype(jnp.float32)
        base = jnp.minimum(jnp.floor(exact).astype(jnp.int32), cap)
        remaining = n_target - jnp.sum(base)
        room = cap - base
        order = jnp.argsort(-(exact - jnp.floor(exact)))
        room_ord = jnp.take(room, order)
        prefix = jnp.cumsum(room_ord)
        give_ord = jnp.clip(remaining - (prefix - room_ord), 0, room_ord)
        shares = base + jnp.zeros((n_dev,), jnp.int32).at[order].set(give_ord)
        my_share = shares[my]
        return residual_resample_dynamic(
            cloud, jax.random.fold_in(key, my), config, my_share
        )

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(), P()),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    return f(cloud, key, jnp.asarray(n_target, jnp.int32))


def psum_likelihood_stats(cloud: ParticleCloud, mesh: Mesh):
    """Global likelihood sum/max over a sharded cloud (replaces the CUDA
    block reduction ``simple_stats_kernel`` — reference resampling.cu:41-92)."""

    def local(cloud):
        w = jnp.where(cloud.alive, cloud.likelihood.mean, 0.0)
        s = jax.lax.psum(jnp.sum(w), RAY_AXIS)
        m = jax.lax.pmax(jnp.max(w), RAY_AXIS)
        return s, m

    f = jax.shard_map(
        local, mesh=mesh, in_specs=(P(RAY_AXIS),), out_specs=(P(), P()),
        check_vma=False,
    )
    return f(cloud)
