"""RMCL localization runtime — the RmclNode equivalent.

Host-side orchestration around the pure jitted kernels, replacing the ROS 2
node (reference rmcl_ros/src/nodes/rmcl_localization.cpp:19-111): the three
periodic stages (motion update / sensor update / resampling — reference
timers :82-107), the two re-initialization services
(``rmcl/global_localization`` + ``rmcl/initial_pose_guess`` :54-77), pose
induction and map→odom output (:733-795).

Differences by design (SURVEY.md §7.6):
  * double buffers + cpu/gpu migration (prepareMemory :396-430) collapse to
    donated device arrays — there is no data_location config;
  * dynamic particle counts become a fixed capacity + alive mask;
  * per-stage ROS sub-node parameter groups become the MCLConfig dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.math.stats import sample_pose_gaussian, sample_pose_uniform
from rmcl_tpu.mcl.motion import MotionUpdateConfig, motion_update
from rmcl_tpu.mcl.particles import ParticleCloud
from rmcl_tpu.mcl.resampling import (
    ResamplerConfig,
    effective_sample_size,
    gladiator_resample,
    residual_resample,
    systematic_resample,
)
from rmcl_tpu.mcl.sensor_update import SensorUpdateConfig, sensor_update
from rmcl_tpu.mcl.stats import ParticleStats, estimate_stats

Array = jax.Array

_RESAMPLERS: dict[str, Callable] = {
    "gladiator": gladiator_resample,
    "residual": residual_resample,
    "systematic": systematic_resample,
}


@dataclasses.dataclass
class MCLConfig:
    """Aggregated per-stage configuration (reference param sub-nodes
    motion_update/sensor_update/resampling — rmcl_localization.cpp:31-51,
    defaults :349-386)."""

    n_particles: int = 100_000
    resampler: str = "gladiator"  # reference `type` param
    motion: MotionUpdateConfig = dataclasses.field(
        default_factory=MotionUpdateConfig.create
    )
    sensor: SensorUpdateConfig = dataclasses.field(
        default_factory=SensorUpdateConfig.create
    )
    resampling: ResamplerConfig = dataclasses.field(
        default_factory=ResamplerConfig.create
    )
    max_induction_particles: int = 50_000
    min_particles_for_resample: int = 10  # reference sanity check :633-639
    seed: int = 0

    @staticmethod
    def from_params(params) -> "MCLConfig":
        """Build from a ParamTree with the reference's YAML schema
        (rmcl_localization.cpp:346-393 + per-updater updateParams:
        TFMotionUpdaterCPU.cpp:108-114, PCDSensorUpdaterEmbree.cpp:124-133,
        GladiatorResamplerCPU.cpp:43-52)::

            max_particles: 100000
            motion_update: {forget_rate: 0.5, forget_rate_per_second: 0.1,
                            check_collisions: false}
            sensor_update: {correspondence_type: RC, samples: 100,
                            dist_sigma: 2.0, sensor_range_min: 0.05,
                            sensor_range_max: 80.0,
                            real_hit_sim_miss_error: 100.0, ...,
                            engine: bvh}
            resampling:    {type: gladiator, min_noise_tx: 0.03, ...,
                            likelihood_forget_per_meter: 0.3,
                            likelihood_forget_per_radian: 0.2,
                            max_induction_particles: 50000}
        """
        g = params.get
        corr = g("sensor_update.correspondence_type", "RC")
        corr = {0: "RC", 1: "CP"}.get(corr, str(corr))
        resampler = str(g("resampling.type", "gladiator"))
        if resampler not in _RESAMPLERS:
            raise ValueError(
                f"unknown resampling.type {resampler!r} "
                f"(have {sorted(_RESAMPLERS)})"
            )
        return MCLConfig(
            n_particles=int(g("max_particles", 100_000)),
            seed=int(g("seed", 0)),
            resampler=resampler,
            min_particles_for_resample=int(
                g("resampling.min_particles", 10)
            ),
            max_induction_particles=int(
                g("resampling.max_induction_particles", 50_000)
            ),
            motion=MotionUpdateConfig.create(
                forget_rate=float(g("motion_update.forget_rate", 0.5)),
                forget_rate_per_second=float(
                    g("motion_update.forget_rate_per_second", 0.1)
                ),
                check_collisions=bool(
                    g("motion_update.check_collisions", False)
                ),
            ),
            sensor=SensorUpdateConfig.create(
                samples=int(g("sensor_update.samples", 100)),
                correspondence_type=corr,
                dist_sigma=float(g("sensor_update.dist_sigma", 2.0)),
                real_hit_sim_miss_error=float(
                    g("sensor_update.real_hit_sim_miss_error", 100.0)
                ),
                real_miss_sim_hit_error=float(
                    g("sensor_update.real_miss_sim_hit_error", 100.0)
                ),
                real_miss_sim_miss_error=float(
                    g("sensor_update.real_miss_sim_miss_error", 0.0)
                ),
                range_min=float(g("sensor_update.sensor_range_min", 0.05)),
                range_max=float(g("sensor_update.sensor_range_max", 80.0)),
                engine=str(g("sensor_update.engine", "bvh")),
                cluster=bool(g("sensor_update.cluster", True)),
                c_super=int(g("sensor_update.c_super", 24)),
                c_bin=int(g("sensor_update.c_bin", 96)),
                c_mid=int(g("sensor_update.c_mid", 0)),
                layout=str(g("sensor_update.layout", "beam")),
            ),
            resampling=ResamplerConfig.create(
                min_noise_t=(
                    float(g("resampling.min_noise_tx", 0.03)),
                    float(g("resampling.min_noise_ty", 0.03)),
                    float(g("resampling.min_noise_tz", 0.0)),
                ),
                min_noise_r=(
                    float(g("resampling.min_noise_roll", 0.0)),
                    float(g("resampling.min_noise_pitch", 0.0)),
                    float(g("resampling.min_noise_yaw", 0.01)),
                ),
                likelihood_forget_per_meter=float(
                    g("resampling.likelihood_forget_per_meter", 0.3)
                ),
                likelihood_forget_per_radian=float(
                    g("resampling.likelihood_forget_per_radian", 0.2)
                ),
            ),
        )


class MCLNode:
    """Monte-Carlo localization over a mesh map.

    Stages are called explicitly (the caller owns timing — message replay,
    simulation steps, or real-time loops); each stage is one jit-compiled
    device program.
    """

    def __init__(self, map_: Union[BVH, "MeshMap"], config: Optional[MCLConfig] = None):
        # accept either a raw BVH or a MeshMap container
        self.bvh = map_.bvh if hasattr(map_, "bvh") else map_
        self.bins = getattr(map_, "bins", None)
        self.config = config or MCLConfig()
        if self.config.sensor.engine == "binned" and self.bins is None:
            raise ValueError(
                "sensor.engine='binned' needs a MeshMap (with triangle "
                "bins), not a raw BVH"
            )
        self.key = jax.random.PRNGKey(self.config.seed)
        self.cloud = ParticleCloud.create(self.config.n_particles)
        # per-stage runtimes (the reference updaters' `runtime` Float64
        # topics — PCDSensorUpdaterEmbree.cpp:345-349); read via
        # node.timer.report() / node.timer.ema
        from rmcl_tpu.utils.timing import StageTimer

        self.timer = StageTimer()
        self.tbo_last: Optional[Transform] = None  # odometry bookkeeping
        self.stamp_last: Optional[float] = None
        self.motion_updates = 0
        self.sensor_updates = 0

    # -- services ---------------------------------------------------------

    def _next_key(self) -> Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def initial_pose_guess(
        self, pose: Transform, covariance6: Array | None = None
    ) -> None:
        """Gaussian (re)initialization around a pose guess — the
        ``rmcl/initial_pose_guess`` service (reference initSamples,
        rmcl_localization.cpp:165-275: chol(C), x~N(0,I), deform)."""
        if covariance6 is None:
            covariance6 = jnp.diag(
                jnp.asarray([0.25, 0.25, 0.1, 0.01, 0.01, 0.1], jnp.float32)
            )
        poses = sample_pose_gaussian(
            self._next_key(), pose, jnp.asarray(covariance6), self.config.n_particles
        )
        self.cloud = ParticleCloud.create(self.config.n_particles).with_poses(poses)
        self._reset_updaters()

    def global_localization(self, box_min, box_max) -> None:
        """Uniform re-seeding over a (x,y,z,roll,pitch,yaw) box — the
        ``rmcl/global_localization`` service (reference initSamplesUniform
        :277-342)."""
        poses = sample_pose_uniform(
            self._next_key(), box_min, box_max, self.config.n_particles
        )
        self.cloud = ParticleCloud.create(self.config.n_particles).with_poses(poses)
        self._reset_updaters()

    def _reset_updaters(self) -> None:
        self.tbo_last = None
        self.stamp_last = None
        self.motion_updates = 0
        self.sensor_updates = 0

    # -- periodic stages --------------------------------------------------

    def motion_update(self, tbo: Transform, stamp: float) -> None:
        """Motion stage from the odometry transform base→odom at ``stamp``
        (reference timer :82-89 → TFMotionUpdaterCPU::update)."""
        if self.tbo_last is None:
            self.tbo_last, self.stamp_last = tbo, stamp
            return
        dt = stamp - self.stamp_last
        if dt <= 1e-7:
            return
        delta = self.tbo_last.inverse() @ tbo  # T_bnew_bold
        with self.timer.stage("motion_update"):
            self.cloud = motion_update(
                self.cloud,
                delta,
                jnp.float32(dt),
                self.config.motion,
                bvh=self.bvh if self.config.motion.check_collisions else None,
            )
        self.tbo_last, self.stamp_last = tbo, stamp
        self.motion_updates += 1

    def sensor_update(
        self, points_s: Array, points_mask: Array, tsb: Transform
    ) -> None:
        """Sensor stage on one point-cloud message (reference sensorUpdate
        :482-549)."""
        # binned engine serves both RC ray casts and CP distance queries
        accel = self.bins if self.config.sensor.engine == "binned" else self.bvh
        with self.timer.stage("sensor_update"):
            self.cloud = sensor_update(
                accel,
                self.cloud,
                self._next_key(),
                jnp.asarray(points_s, jnp.float32),
                jnp.asarray(points_mask, bool),
                tsb,
                self.config.sensor,
            )
        self.sensor_updates += 1

    def resample(self) -> bool:
        """Resampling stage; returns False when guarded away (reference
        resampling tick :554-639: requires ≥1 motion AND sensor update)."""
        if self.motion_updates < 1 or self.sensor_updates < 1:
            return False
        if int(np.asarray(self.cloud.n_alive)) < self.config.min_particles_for_resample:
            return False
        fn = _RESAMPLERS[self.config.resampler]
        with self.timer.stage("resampling"):
            self.cloud = fn(self.cloud, self._next_key(), self.config.resampling)
        return True

    # -- outputs ----------------------------------------------------------

    def estimate(self) -> ParticleStats:
        return estimate_stats(
            self.cloud, max_induction_particles=self.config.max_induction_particles
        )

    def pose_map_odom(self, tbo: Transform) -> Transform:
        """map→odom output: Tom = Tbm * ~Tbo (reference publishStats :772)."""
        return estimate_stats(
            self.cloud, self.config.max_induction_particles
        ).pose @ tbo.inverse()

    def ess(self) -> float:
        return float(np.asarray(effective_sample_size(self.cloud)))
