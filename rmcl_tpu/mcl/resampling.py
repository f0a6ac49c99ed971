"""Resampling strategies for the particle filter.

TPU-native equivalents of the reference's resamplers, replacing per-thread
mt19937 / curand state with ``jax.random`` keys:

* :func:`gladiator_resample` — tournament resampling, exact semantic port of
  ``GladiatorResamplerCPU`` (reference GladiatorResamplerCPU.cpp:71-195,
  resampling.cu:108-218; docs/RMCL.md:74-77 "impoverishment-aware").
* :func:`residual_resample` — residual resampling; the reference's
  sequential insert loop (ResidualResamplerCPU.cpp:55-202) reformulated as
  the textbook deterministic-copies + stratified-residual-fill, fully parallel.
* :func:`systematic_resample` — classic low-variance systematic resampling
  (not in the reference; standard MCL practice, included for completeness).

All keep the reference's post-copy behavior: per-axis Gaussian pose noise and
likelihood-confidence forgetting proportional to the perturbation size.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rmcl_tpu.math.gaussian import Gaussian1D
from rmcl_tpu.math.se3 import Quaternion, Transform
from rmcl_tpu.mcl.particles import ParticleCloud

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    """Noise / forget parameters shared by the resamplers (reference
    GladiatorResamplerConfig.hpp:7-20)."""

    min_noise: Array  # (6,) [tx, ty, tz, roll, pitch, yaw] std-devs
    likelihood_forget_per_meter: Array
    likelihood_forget_per_radian: Array

    @staticmethod
    def create(
        min_noise_t=(0.05, 0.05, 0.05),
        min_noise_r=(0.01, 0.01, 0.01),
        likelihood_forget_per_meter=0.5,
        likelihood_forget_per_radian=0.5,
    ):
        return ResamplerConfig(
            min_noise=jnp.asarray(list(min_noise_t) + list(min_noise_r), jnp.float32),
            likelihood_forget_per_meter=jnp.float32(likelihood_forget_per_meter),
            likelihood_forget_per_radian=jnp.float32(likelihood_forget_per_radian),
        )


def _perturb_poses(
    key: Array, poses: Transform, noise6: Array
) -> Tuple[Transform, Array, Array]:
    """Per-axis Gaussian noise in (x,y,z,roll,pitch,yaw) — the reference
    perturbs Euler angles directly (GladiatorResamplerCPU.cpp:140-151).
    Returns (new_poses, trans_dist_sq, rot_dist)."""
    n = poses.batch_shape[0]
    eps = jax.random.normal(key, (n, 6)) * noise6
    t_new = poses.trans + eps[:, :3]
    roll, pitch, yaw = Quaternion.to_euler(poses.rot)
    q_new = Quaternion.from_euler(roll + eps[:, 3], pitch + eps[:, 4], yaw + eps[:, 5])
    # SQUARED translation distance is intentional reference parity: the
    # reference exponentiates forget_per_meter by l2normSquared()
    # (GladiatorResamplerCPU.cpp:156-160, its "// in meter" comment
    # notwithstanding); rot_dist is the quaternion imaginary-part norm
    trans_d2 = jnp.sum(eps[:, :3] ** 2, axis=-1)
    dq = Quaternion.mul(Quaternion.conj(poses.rot), q_new)
    rot_d = jnp.linalg.norm(dq[:, 1:], axis=-1)
    return Transform(rot=q_new, trans=t_new), trans_d2, rot_d


def gladiator_resample(
    cloud: ParticleCloud,
    key: Array,
    config: ResamplerConfig,
) -> ParticleCloud:
    """Tournament: each slot duels a random enemy; if the enemy's likelihood
    mean is higher, copy the enemy with noise + confidence forgetting."""
    n = cloud.capacity
    k_enemy, k_noise = jax.random.split(key)
    enemy = jax.random.randint(k_enemy, (n,), 0, n)

    # dead particles never win a duel (score -inf); every other consumer
    # masks likelihood by `alive`, so must the tournament
    L_self = jnp.where(cloud.alive, cloud.likelihood.mean, -jnp.inf)
    L_enemy = jnp.take(L_self, enemy)
    lose = L_enemy > L_self  # copy the enemy

    src = jnp.where(lose, enemy, jnp.arange(n))
    poses_src = Transform(
        rot=jnp.take(cloud.poses.rot, src, axis=0),
        trans=jnp.take(cloud.poses.trans, src, axis=0),
    )
    lik_src = Gaussian1D(
        mean=jnp.take(cloud.likelihood.mean, src),
        sigma=jnp.take(cloud.likelihood.sigma, src),
        n_meas=jnp.take(cloud.likelihood.n_meas, src),
    )

    perturbed, trans_d2, rot_d = _perturb_poses(k_noise, poses_src, config.min_noise)
    # losers get the perturbed enemy pose; winners keep their own exactly
    poses_new = Transform(
        rot=jnp.where(lose[:, None], perturbed.rot, poses_src.rot),
        trans=jnp.where(lose[:, None], perturbed.trans, poses_src.trans),
    )
    # forget = max(space, rot) form (GladiatorResamplerCPU.cpp:155-165)
    forget_space = 1.0 - jnp.power(1.0 - config.likelihood_forget_per_meter, trans_d2)
    forget_rot = 1.0 - jnp.power(1.0 - config.likelihood_forget_per_radian, rot_d)
    forget = jnp.where(lose, jnp.maximum(forget_space, forget_rot), 0.0)
    lik_new = lik_src.forget(forget)

    return dataclasses.replace(
        cloud,
        poses=poses_new,
        likelihood=lik_new,
        state_sigma=jnp.take(cloud.state_sigma, src, axis=0),
        alive=jnp.take(cloud.alive, src, axis=0),
    )


def _copy_from_indices(
    cloud: ParticleCloud, src: Array, key: Array, config: ResamplerConfig,
    noise_scale: Array,
) -> ParticleCloud:
    poses_src = Transform(
        rot=jnp.take(cloud.poses.rot, src, axis=0),
        trans=jnp.take(cloud.poses.trans, src, axis=0),
    )
    lik_src = Gaussian1D(
        mean=jnp.take(cloud.likelihood.mean, src),
        sigma=jnp.take(cloud.likelihood.sigma, src),
        n_meas=jnp.take(cloud.likelihood.n_meas, src),
    )
    noise6 = config.min_noise[None, :] * noise_scale[:, None]
    perturbed, trans_d2, rot_d = _perturb_poses(key, poses_src, noise6)
    # product-of-powers reduction (ResidualResamplerCPU.cpp:160-166);
    # trans_d2 is SQUARED by reference parity (see _perturb_poses)
    reduction = jnp.power(config.likelihood_forget_per_meter, trans_d2) * jnp.power(
        config.likelihood_forget_per_radian, rot_d
    )
    lik_new = Gaussian1D(
        mean=lik_src.mean, sigma=lik_src.sigma, n_meas=lik_src.n_meas * reduction
    )
    return dataclasses.replace(
        cloud,
        poses=perturbed,
        likelihood=lik_new,
        state_sigma=jnp.take(cloud.state_sigma, src, axis=0),
        alive=jnp.take(cloud.alive, src, axis=0),
    )


def residual_resample(
    cloud: ParticleCloud, key: Array, config: ResamplerConfig
) -> ParticleCloud:
    """Residual resampling: ⌊N·w_i⌋ deterministic copies per particle plus a
    systematic pass over the residual weights. Matches the reference's
    distribution (weight-proportional copies with noise scaled by
    1/L_max_normed — ResidualResamplerCPU.cpp:102-181) without its
    sequential insert loop."""
    n = cloud.capacity
    w = cloud.weights()
    k_resid, k_noise = jax.random.split(key)

    counts = jnp.floor(w * n)  # deterministic copies per source particle
    n_det = jnp.sum(counts).astype(jnp.int32)
    residual = w * n - counts
    r_norm = residual / jnp.maximum(jnp.sum(residual), 1e-30)

    slots = jnp.arange(n)
    # deterministic slots [0, n_det): slot j copies the source whose count
    # prefix covers j  (src = first i with cumsum(counts) > j)
    src_det = jnp.searchsorted(jnp.cumsum(counts), slots.astype(counts.dtype), side="right")
    # residual slots [n_det, n): systematic positions over r_norm
    n_resid = jnp.maximum(n - n_det, 1)
    u0 = jax.random.uniform(k_resid)
    pos = (u0 + (slots - n_det).astype(jnp.float32)) / n_resid.astype(jnp.float32)
    src_resid = jnp.searchsorted(jnp.cumsum(r_norm), pos, side="right")

    src = jnp.where(slots < n_det, src_det, src_resid).astype(jnp.int32)
    src = jnp.clip(src, 0, n - 1)

    # degenerate guard (reference resample sanity :633-639): all-zero
    # weights would collapse the cloud onto slot n-1 with saturated noise —
    # resample becomes the identity with zero perturbation instead
    degenerate = jnp.sum(cloud.weights()) <= 0.0
    src = jnp.where(degenerate, slots, src)

    L_max = jnp.maximum(jnp.max(cloud.likelihood.mean), 1e-30)
    L_max_normed = jnp.take(cloud.likelihood.mean, src) / L_max
    noise_scale = jnp.where(
        degenerate, 0.0, 1.0 / jnp.maximum(L_max_normed, 1e-3)
    )
    return _copy_from_indices(cloud, src, k_noise, config, noise_scale)


def residual_resample_dynamic(
    cloud: ParticleCloud, key: Array, config: ResamplerConfig,
    n_target: Array,
) -> ParticleCloud:
    """Residual resampling with a *dynamic live count* — the
    ``ParticleUpdaterDynamic`` contract (reference ParticleUpdater.hpp:24-72:
    the resampler writes a new buffer and returns the inserted count, which
    RmclNode adopts as ``n_particles_`` — rmcl_localization.cpp:633-639).

    TPU-native form: the capacity stays static; the resampler writes the
    ``n_target`` (device scalar) new particles into the *prefix* slots and
    marks exactly those alive. The reference's ResidualResamplerCPU always
    fills its whole output buffer (the insert loop runs until
    ``insertion_idx == particle_poses_new.size()`` — ResidualResamplerCPU.
    cpp:102-181), i.e. grows to capacity; pass ``n_target = capacity`` for
    that exact behavior, or a policy value (:func:`adaptive_particle_count`)
    for KLD-style shrink/grow the reference's contract allows for.
    """
    n = cloud.capacity
    nt_f = n_target.astype(jnp.float32)
    w = cloud.weights()  # alive-masked, normalized
    k_resid, k_noise = jax.random.split(key)

    counts = jnp.floor(w * nt_f)
    n_det = jnp.sum(counts).astype(jnp.int32)
    residual = w * nt_f - counts
    r_norm = residual / jnp.maximum(jnp.sum(residual), 1e-30)

    slots = jnp.arange(n)
    src_det = jnp.searchsorted(
        jnp.cumsum(counts), slots.astype(counts.dtype), side="right"
    )
    n_resid = jnp.maximum(n_target - n_det, 1)
    u0 = jax.random.uniform(k_resid)
    pos = (u0 + (slots - n_det).astype(jnp.float32)) / n_resid.astype(jnp.float32)
    src_resid = jnp.searchsorted(jnp.cumsum(r_norm), pos, side="right")

    src = jnp.where(slots < n_det, src_det, src_resid).astype(jnp.int32)
    src = jnp.clip(src, 0, n - 1)
    degenerate = jnp.sum(w) <= 0.0
    src = jnp.where(degenerate, slots, src)

    L_max = jnp.maximum(jnp.max(cloud.likelihood.mean), 1e-30)
    L_max_normed = jnp.take(cloud.likelihood.mean, src) / L_max
    noise_scale = jnp.where(
        degenerate, 0.0, 1.0 / jnp.maximum(L_max_normed, 1e-3)
    )
    out = _copy_from_indices(cloud, src, k_noise, config, noise_scale)
    # the live count IS the prefix length: compacted, like the reference's
    # insertion_idx (degenerate clouds keep their old alive set instead)
    alive_new = jnp.where(degenerate, cloud.alive, slots < n_target)
    return dataclasses.replace(out, alive=alive_new)


def adaptive_particle_count(
    cloud: ParticleCloud,
    n_min: int = 256,
    n_max: int | None = None,
    spread_ref: float = 1.0,
) -> Array:
    """Live-count policy for :func:`residual_resample_dynamic` (TPU-native
    superset of the reference's grow-to-capacity behavior; the contract —
    a resampler-chosen count the node adopts — is ParticleUpdater.hpp:48-72).

    KLD-sampling-style heuristic on the cloud's spatial *concentration*: a
    dispersed cloud (global init, kidnapped robot) needs many hypotheses, a
    converged one needs few. The metric is the weight fraction inside a
    ``spread_ref``-radius ball around the weighted mean — robust to the
    scattered low-weight tail the residual resampler's 1/L noise keeps
    re-injecting (a weighted variance is dominated by exactly that tail).
    Returns an int32 device scalar in [n_min, n_max].
    """
    n_max = cloud.capacity if n_max is None else n_max
    w = cloud.weights()
    mu = jnp.sum(w[:, None] * cloud.poses.trans, axis=0)
    d2 = jnp.sum((cloud.poses.trans - mu) ** 2, axis=-1)
    inside = jnp.sum(jnp.where(d2 <= spread_ref * spread_ref, w, 0.0))
    frac = jnp.clip(1.0 - inside, 0.0, 1.0)  # dispersed weight fraction
    return jnp.round(n_min + (n_max - n_min) * frac).astype(jnp.int32)


def systematic_resample(
    cloud: ParticleCloud, key: Array, config: ResamplerConfig
) -> ParticleCloud:
    """Low-variance systematic resampling with the reference's noise/forget
    post-pass."""
    n = cloud.capacity
    w = cloud.weights()
    k_u, k_noise = jax.random.split(key)
    u0 = jax.random.uniform(k_u)
    pos = (u0 + jnp.arange(n)) / n
    src = jnp.searchsorted(jnp.cumsum(w), pos, side="right").astype(jnp.int32)
    src = jnp.clip(src, 0, n - 1)
    degenerate = jnp.sum(w) <= 0.0  # see residual_resample guard
    src = jnp.where(degenerate, jnp.arange(n), src)
    return _copy_from_indices(
        cloud, src, k_noise, config,
        jnp.where(degenerate, 0.0, jnp.ones((n,), jnp.float32)),
    )


def effective_sample_size(cloud: ParticleCloud) -> Array:
    """ESS = 1 / Σ w² — standard impoverishment diagnostic."""
    w = cloud.weights()
    return 1.0 / jnp.maximum(jnp.sum(w * w), 1e-30)
