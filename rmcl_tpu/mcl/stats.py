"""Particle statistics induction: likelihood stats, weighted pose, covariance.

TPU-native equivalent of ``RmclNode::estimateStats``
(reference rmcl_localization.cpp:642-731): likelihood mean/σ/min/max over the
induction subset, translation AABB, weighted Markley quaternion mean pose and
weighted 6x6 pose covariance. The reference subsamples to
``max_induction_particles`` (50k default) because its reduction is a CPU
loop; here the full reduction runs on device, with the subsample kept as an
option for parity.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.math.stats import pose_covariance_6x6, weighted_pose_mean
from rmcl_tpu.mcl.particles import ParticleCloud

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleStats:
    """Mirror of rmcl_msgs/ParticleStats (reference msg/ParticleStats.msg)."""

    pose: Transform  # weighted mean pose (base→map)
    covariance: Array  # (6, 6)
    likelihood_mean: Array
    likelihood_sigma: Array
    likelihood_min: Array
    likelihood_max: Array
    shift: Array  # = likelihood_min (reference keeps the same caveat)
    trans_bb_min: Array  # (3,)
    trans_bb_max: Array  # (3,)
    n_particles: Array


@partial(jax.jit, static_argnames=("max_induction_particles",))
def estimate_stats(
    cloud: ParticleCloud, max_induction_particles: int | None = None
) -> ParticleStats:
    if max_induction_particles is not None and max_induction_particles < cloud.capacity:
        cloud = ParticleCloud(
            poses=cloud.poses[:max_induction_particles],
            likelihood=jax.tree.map(
                lambda x: x[:max_induction_particles], cloud.likelihood
            ),
            state_sigma=cloud.state_sigma[:max_induction_particles],
            alive=cloud.alive[:max_induction_particles],
        )
    L = cloud.likelihood.mean
    alive = cloud.alive
    n = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    Lv = jnp.where(alive, L, 0.0)
    L_mean = jnp.sum(Lv) / n
    L_var = jnp.sum(jnp.where(alive, L * L, 0.0)) / n - L_mean * L_mean
    any_alive = jnp.any(alive)
    fin = lambda x: jnp.where(any_alive, x, 0.0)  # no infs for empty clouds
    L_min = fin(jnp.min(jnp.where(alive, L, jnp.inf)))
    L_max = fin(jnp.max(jnp.where(alive, L, -jnp.inf)))

    t = cloud.poses.trans
    bb_min = fin(jnp.min(jnp.where(alive[:, None], t, jnp.inf), axis=0))
    bb_max = fin(jnp.max(jnp.where(alive[:, None], t, -jnp.inf), axis=0))

    w = Lv  # weight ∝ likelihood mean (reference :703-704 normalizes by sum)
    pose = weighted_pose_mean(cloud.poses, w)
    cov = pose_covariance_6x6(cloud.poses, pose, w)

    return ParticleStats(
        pose=pose,
        covariance=cov,
        likelihood_mean=L_mean,
        likelihood_sigma=jnp.sqrt(jnp.maximum(L_var, 0.0)),
        likelihood_min=L_min,
        likelihood_max=L_max,
        shift=L_min,
        trans_bb_min=bb_min,
        trans_bb_max=bb_max,
        n_particles=n,
    )
