"""Particle motion update (odometry delta + forget factor + collision kill).

TPU-native equivalent of ``TFMotionUpdaterCPU/GPU``
(reference rmcl_ros/src/rmcl/TFMotionUpdaterCPU.cpp:115-231,
particle_motion.cu:11-34). The TF lookup lives in the host runtime
(rmcl_tpu.mcl.node); this module is the pure jitted kernel.

Semantics (verified against the reference source):
  * delta = ~T_bold_o * T_bnew_o;  pose_new = pose_old * delta
    (TFMotionUpdaterCPU.cpp:165,197)
  * forget_rate = (1-(1-rate)^dist) * (1-(1-rate_s)^dt);
    n_meas -= forget_rate * n_meas   (:176-178,207)
  * optional collision kill: if the straight segment between old and new
    particle position crosses the mesh, likelihood ← {mean 0, sigma 0,
    n_meas MAX} (:17-50, 210-219)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.math.gaussian import Gaussian1D, MAX_N_MEAS
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.ops.raycast import occluded

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MotionUpdateConfig:
    """Defaults match reference TFMotionUpdaterCPU::updateParams (:108-114)."""

    forget_rate: Array  # per meter travelled
    forget_rate_per_second: Array
    check_collisions: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @staticmethod
    def create(forget_rate=0.5, forget_rate_per_second=0.1, check_collisions=False):
        return MotionUpdateConfig(
            forget_rate=jnp.float32(forget_rate),
            forget_rate_per_second=jnp.float32(forget_rate_per_second),
            check_collisions=check_collisions,
        )


def motion_update(
    cloud: ParticleCloud,
    delta: Transform,
    dt: Array,
    config: MotionUpdateConfig,
    bvh: Optional[BVH] = None,
    chunk_size: int = 262144,
) -> ParticleCloud:
    """Apply the odometry delta (base_new→base_old) to every particle."""
    old_t = cloud.poses.trans
    poses_new = cloud.poses @ delta

    dist = jnp.linalg.norm(delta.trans)
    forget_space = 1.0 - jnp.power(1.0 - config.forget_rate, dist)
    forget_time = 1.0 - jnp.power(1.0 - config.forget_rate_per_second, jnp.maximum(dt, 0.0))
    forget = forget_space * forget_time
    lik = cloud.likelihood.forget(forget)

    if config.check_collisions and bvh is not None:
        hit_wall = occluded(bvh, old_t, poses_new.trans, chunk_size=chunk_size)
        lik = Gaussian1D(
            mean=jnp.where(hit_wall, 0.0, lik.mean),
            sigma=jnp.where(hit_wall, 0.0, lik.sigma),
            n_meas=jnp.where(hit_wall, MAX_N_MEAS, lik.n_meas),
        )

    return dataclasses.replace(cloud, poses=poses_new, likelihood=lik)
