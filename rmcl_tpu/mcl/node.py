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
    adaptive_particle_count,
    effective_sample_size,
    gladiator_resample,
    residual_resample,
    residual_resample_dynamic,
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

# background engine-warm threads (see MCLNode._warm_other_engine). An XLA
# compile caught mid-flight by interpreter teardown segfaults (C++ calling
# back into a dying Python), so short-lived processes join them at exit —
# bounded: a wedged remote compile must not hold the process hostage.
_WARM_THREADS: list = []


def _join_warm_threads():
    import time as _time

    deadline = _time.monotonic() + 30.0
    for t in _WARM_THREADS:
        try:
            t.join(timeout=max(0.0, deadline - _time.monotonic()))
        except RuntimeError:
            # registered but not yet started (append/start race) — nothing
            # is compiling on it, so there is nothing to wait for
            pass


import atexit as _atexit

_atexit.register(_join_warm_threads)


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
    # dynamic live counts (ParticleUpdaterDynamic contract — reference
    # ParticleUpdater.hpp:24-72, adoption rmcl_localization.cpp:633-639):
    #   "off"       — fixed alive set (resamplers preserve aliveness)
    #   "reference" — residual resampler refills to capacity every tick
    #                 (exact ResidualResamplerCPU behavior: the insert loop
    #                 always fills the whole next buffer)
    #   "adaptive"  — spread-driven shrink/grow between adaptive_n_min and
    #                 capacity (adaptive_particle_count policy)
    dynamic_count: str = "off"
    adaptive_n_min: int = 256
    adaptive_spread_ref: float = 1.0  # [m] spread at which count saturates
    # with a dynamic count, run the (expensive) sensor stage on the live
    # prefix only, padded to the next power of two — the TPU-native payoff
    # of shrinking the cloud (one compile per bucket)
    compact_compute: bool = True
    # binned engine only: on the first sensor update (and after every
    # re-initialization) measure the candidate distribution of the actual
    # update rays; if the configured budgets saturate (silent geometry
    # loss), auto-adopt suggest_budgets' recommendation. Set False to get a
    # loud warning instead of a correction. The exact 'bvh' engine needs no
    # budgets (reference rtcIntersect1 parity: safety by default).
    auto_budget: bool = True
    # sensor.engine='auto': choose the ray engine per cloud state. A
    # scattered cloud (global localization) saturates any dense-engine
    # candidate budget (TPU_NOTES: silent geometry loss at c_bin<=384 on
    # big maps) -> exact BVH traversal; once the cloud concentrates below
    # auto_engine_spread [m] (with hysteresis x2 to re-scatter), the dense
    # binned engine's coherent blocks win -> switch to it.
    auto_engine_spread: float = 1.0
    # heading gate for the same flip (sin of the yaw spread): ~0.1 = 6 deg.
    # Audited: the binned engine matches the exact oracle bit-for-bit in
    # this regime at default budgets; at 15 deg it saturates (see
    # _auto_select_engine).
    auto_engine_heading_spread: float = 0.1
    # evaluate the auto-engine spread gate every Nth sensor update: each
    # evaluation costs one device->host readback (~58 ms on the relay),
    # and the spread only evolves at resampling cadence
    auto_engine_period: int = 5

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
            dynamic_count=str(g("resampling.dynamic_count", "off")),
            adaptive_n_min=int(g("resampling.adaptive_n_min", 256)),
            adaptive_spread_ref=float(
                g("resampling.adaptive_spread_ref", 1.0)
            ),
            auto_engine_spread=float(
                g("sensor_update.auto_engine_spread", 1.0)
            ),
            auto_engine_heading_spread=float(
                g("sensor_update.auto_engine_heading_spread", 0.1)
            ),
            auto_engine_period=int(
                g("sensor_update.auto_engine_period", 5)
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
        # persistent compile cache: the reference loop has no warmup cliff
        # (AOT C++); ours re-loads compiled programs across process runs
        # (VERDICT r4 #4 — the 89 s first-update head was a cold compile)
        from rmcl_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
        # accept either a raw BVH or a MeshMap container
        self.bvh = map_.bvh if hasattr(map_, "bvh") else map_
        self.bins = getattr(map_, "bins", None)
        self.config = config or MCLConfig()
        if self.config.sensor.engine in ("binned", "seeded") and self.bins is None:
            raise ValueError(
                f"sensor.engine='{self.config.sensor.engine}' needs a MeshMap "
                "(with triangle bins), not a raw BVH"
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
        # host mirror of the live count (the reference's n_particles_);
        # updated on init and after every dynamic-count resample
        self.n_alive_host: Optional[int] = self.config.n_particles
        self.adaptive_n_min_eff = min(
            self.config.adaptive_n_min, self.config.n_particles
        )
        self._budget_checked = False
        # engine='auto' starts on the exact traversal (init clouds are
        # scattered by definition; chip A/B r4: plain exact with window
        # rounds 1.65 s vs seeded 1.94 s on the scattered kidnap update —
        # the budgeted seed pass certifies ~0% there and only adds its own
        # cost). engine='seeded' stays available explicitly for deployments
        # with certifying budgets (see TPU_NOTES r4 certified-fraction
        # rows). _auto_select_engine flips to the dense binned engine once
        # the cloud concentrates.
        self._engine_choice = "bvh"
        self._engine_gate_seen = False
        self._warmed: set = set()
        self._points_shape = None

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
        self.n_alive_host = self.config.n_particles
        # the cloud distribution just changed drastically — re-audit budgets
        # and re-evaluate the engine gate immediately
        self._budget_checked = False
        self._engine_gate_seen = False

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

    def _check_budgets(self, points_s, points_mask, tsb: Transform) -> None:
        """One-shot candidate-budget audit on the real update rays
        (VERDICT r1 #3: budget saturation must never be silent). Saturation
        means candidate counts pinned at c_bin — i.e. the cull DROPPED
        geometry and likelihoods would be silently wrong. Auto-corrects via
        suggest_budgets when ``auto_budget`` (the default), else warns."""
        import warnings

        from rmcl_tpu.mcl.sensor_update import probe_update_rays
        from rmcl_tpu.ops.raycast_binned import block_cull_stats
        from rmcl_tpu.utils.tune import suggest_budgets

        self._budget_checked = True
        cfg = self.config.sensor
        # deterministic probe key: the check sees the same beam distribution
        # as the updates without consuming filter randomness
        o, d, t_cap = probe_update_rays(
            self.cloud, jax.random.PRNGKey(self.config.seed ^ 0x5AFE),
            points_s, points_mask, tsb, cfg,
        )
        # per-ray capped t_max — the reach the real cast uses; a flat
        # range_max audit overstates counts (the wedge sweeps the map).
        # block_cull_stats runs the REAL fused cull at the configured
        # budgets: its `sat` flag catches truncation at EVERY level —
        # candidate_stats' bin counts were blind to c_super truncation
        # (round-5 find: cs=24 dropped winners while counts read clean)
        counts, sat = (np.asarray(x) for x in block_cull_stats(
            self.bins, o, d, t_max=t_cap,
            block_size=cfg.block_size, c_super=cfg.c_super,
            c_bin=cfg.c_bin, sub_blocks=cfg.sub_blocks,
            c_mid=cfg.c_mid, c_hyper=cfg.c_hyper,
        ))
        if not sat.any():
            return  # no level truncated any sampled block — certified
        frac = float(sat.mean())
        if not self.config.auto_budget:
            warnings.warn(
                f"binned sensor-update budgets saturate on this map/cloud: "
                f"{frac:.0%} of ray blocks truncated at some cull level "
                f"(c_super={cfg.c_super}/c_bin={cfg.c_bin}) — likelihoods "
                f"may silently drop geometry. Raise the budgets or enable "
                f"MCLConfig.auto_budget.",
                stacklevel=3,
            )
            return
        rec = suggest_budgets(
            self.bins, o, d, t_max=t_cap, block_size=cfg.block_size,
        )
        cs, cb = self._budget_rung(
            max(rec.c_super, cfg.c_super), max(rec.c_bin, cfg.c_bin)
        )
        new = dataclasses.replace(cfg, c_super=cs, c_bin=cb, c_mid=rec.c_mid)
        print(
            f"[rmcl_tpu] sensor-update budgets saturated ({frac:.0%} of "
            f"blocks truncated at c_super={cfg.c_super}/c_bin={cfg.c_bin}); "
            f"auto-adopting c_super={new.c_super} c_bin={new.c_bin} "
            f"c_mid={new.c_mid} (worst sampled block: {rec.max_bins} bins)"
        )
        self.config.sensor = new

    # adopted budgets are QUANTIZED to this rung ladder: budgets are ~free
    # under count-sorted chunks (TPU_NOTES — trips bill actual candidate
    # counts), but every distinct (c_super, c_bin) is a fresh XLA program,
    # and the post-flip stall in KIDNAP_r03/r04 was exactly a cold compile
    # of an unpredictable adopted config (c_bin=3387...). Three rungs keep
    # the config space small enough for _warm_other_engine to pre-compile
    # every budget the flip could adopt.
    _BUDGET_RUNGS = ((48, 256), (96, 1024), (192, 4096))

    @classmethod
    def _budget_rung(cls, c_super: int, c_bin: int):
        for cs, cb in cls._BUDGET_RUNGS:
            if cs >= c_super and cb >= c_bin:
                return cs, cb
        return c_super, c_bin  # beyond the ladder: adopt exactly (rare)

    @staticmethod
    @jax.jit
    def _spread_metrics(cloud: ParticleCloud) -> Array:
        """Weighted position std-dev + heading spread, ONE device program
        returning one (2,) array — a single host readback instead of two
        (each round trip costs ~58 ms on the relay backend, VERDICT r2 #4)."""
        w = cloud.weights()
        mu = jnp.sum(w[:, None] * cloud.poses.trans, axis=0)
        var = jnp.sum(w[:, None] * (cloud.poses.trans - mu) ** 2, axis=0)
        spread = jnp.sqrt(jnp.maximum(jnp.mean(var), 0.0))
        fw = cloud.poses.rotate(jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
        fw_mu = jnp.sum(w[:, None] * fw, axis=0)
        fw_mu = fw_mu / jnp.maximum(jnp.linalg.norm(fw_mu), 1e-9)
        ca = jnp.sum(w * jnp.sum(fw * fw_mu[None, :], axis=-1))
        hspread = jnp.sqrt(jnp.maximum(1.0 - ca * ca, 0.0))
        return jnp.stack([spread, hspread])

    def _auto_select_engine(self) -> None:
        """Engine choice for sensor.engine='auto' (VERDICT r1 #4):
        scattered cloud -> exact BVH traversal (no budgets to saturate);
        concentrated cloud -> dense binned engine (coherent blocks, the
        TPU hot path). Spread metric = mean per-axis weighted std-dev of
        the live translations; 2x hysteresis prevents flapping.

        Evaluated every ``auto_engine_period`` sensor updates (the spread
        evolves at resampling cadence, not per message): the readback this
        gate needs is amortized instead of paid per tick."""
        if self.bins is None:
            self._engine_choice = "bvh"
            return
        exact_choice = "bvh"  # measured fastest exact path (see __init__ note)
        period = max(int(self.config.auto_engine_period), 1)
        if self.sensor_updates % period and self._engine_gate_seen:
            return
        self._engine_gate_seen = True
        # heading spread gates the flip too: the dense cull's per-block
        # wedge is (position box) x (heading fan) x (range cap); a tight
        # position cluster with ~15 deg of yaw spread still saturates any
        # candidate budget on fine indoor maps (CPU-audited: corr 0.43 vs
        # the exact oracle at 0.25 rad yaw spread, 1.000 at 0.05 rad)
        spread, hspread = (
            float(x) for x in np.asarray(self._spread_metrics(self.cloud))
        )
        thresh = self.config.auto_engine_spread
        hthresh = self.config.auto_engine_heading_spread
        prev = self._engine_choice
        if prev == "binned":
            choice = (
                exact_choice
                if spread > 2.0 * thresh or hspread > 2.0 * hthresh
                else "binned"
            )
        else:
            choice = (
                "binned" if spread < thresh and hspread < hthresh else exact_choice
            )
        if choice != prev:
            self._engine_choice = choice
            # the binned path needs a fresh budget audit for this cloud
            self._budget_checked = choice != "binned"

    def _compact_slice(self) -> Optional[int]:
        """Prefix length for compact compute, or None for the full cloud.

        Only valid when the live set is a compacted prefix (dynamic-count
        resampling guarantees it; inits are all-alive). Rounded up to the
        next power of two so the jit cache holds at most log2(N) variants.
        """
        if (
            self.config.dynamic_count == "off"
            or not self.config.compact_compute
            or self.n_alive_host is None
            or self.n_alive_host >= self.config.n_particles
        ):
            return None
        k = max(self.n_alive_host, self.config.min_particles_for_resample, 1)
        return min(1 << (k - 1).bit_length(), self.config.n_particles)

    def sensor_update(
        self, points_s: Array, points_mask: Array, tsb: Transform
    ) -> None:
        """Sensor stage on one point-cloud message (reference sensorUpdate
        :482-549). With a dynamic count, only the live prefix (power-of-two
        padded) runs through the expensive per-particle ray casts."""
        self._points_shape = np.shape(points_s)
        if self.config.sensor.engine == "auto":
            self._auto_select_engine()
            eff_cfg = dataclasses.replace(
                self.config.sensor, engine=self._engine_choice
            )
        else:
            eff_cfg = self.config.sensor
        # binned engine serves both RC ray casts and CP distance queries;
        # the seeded engine needs both structures
        if eff_cfg.engine == "binned":
            accel = self.bins
        elif eff_cfg.engine == "seeded":
            accel = (self.bvh, self.bins)
        else:
            accel = self.bvh
        # the audit stays binned-only and therefore FLIP-time: running it on
        # the scattered init cloud would adopt worst-case budgets for the
        # whole run. The seeded engine is exact regardless of budgets (its
        # refine pass covers every uncertified ray), so under-budgeting
        # there costs only speed — see TPU_NOTES r4 certified-fraction rows.
        if (
            not self._budget_checked
            and eff_cfg.engine == "binned"
            and eff_cfg.correspondence_type != "CP"
        ):
            self._check_budgets(
                jnp.asarray(points_s, jnp.float32),
                jnp.asarray(points_mask, bool),
                tsb,
            )
            # adopt any raised budgets into this tick's effective config
            eff_cfg = dataclasses.replace(
                self.config.sensor, engine=eff_cfg.engine
            )
        k = self._compact_slice()
        with self.timer.stage("sensor_update"):
            if k is None:
                self.cloud = sensor_update(
                    accel,
                    self.cloud,
                    self._next_key(),
                    jnp.asarray(points_s, jnp.float32),
                    jnp.asarray(points_mask, bool),
                    tsb,
                    eff_cfg,
                )
            else:
                sub = jax.tree_util.tree_map(lambda x: x[:k], self.cloud)
                sub = sensor_update(
                    accel,
                    sub,
                    self._next_key(),
                    jnp.asarray(points_s, jnp.float32),
                    jnp.asarray(points_mask, bool),
                    tsb,
                    eff_cfg,
                )
                self.cloud = jax.tree_util.tree_map(
                    lambda full, part: jax.lax.dynamic_update_slice_in_dim(
                        full, part.astype(full.dtype), 0, axis=0
                    ),
                    self.cloud,
                    sub,
                )
        self.sensor_updates += 1
        if self.config.sensor.engine == "auto" and self.bins is not None:
            self._warm_other_engine(
                eff_cfg, k,
                jnp.asarray(points_s, jnp.float32),
                jnp.asarray(points_mask, bool), tsb,
            )

    def _accel_for(self, engine: str):
        if engine == "binned":
            return self.bins
        if engine == "seeded":
            return (self.bvh, self.bins)
        return self.bvh

    def _spawn_warm(self, engine: str, n_eff: int, n_points: int,
                    audit_args=None) -> None:
        """AOT ``lower().compile()`` the sensor-update program for
        ``engine`` at (n_eff particles, n_points measurements) in a
        background daemon thread, warming the in-process jit cache AND
        the persistent compilation cache. ``audit_args`` (points, mask,
        tsb) additionally runs the binned budget audit first so the
        compiled budgets are the ones the flip will adopt."""
        import threading

        key_ = (engine, n_eff, n_points, self.config.sensor.samples)
        if key_ in self._warmed:
            return
        self._warmed.add(key_)
        accel = self._accel_for(engine)
        sds = jax.ShapeDtypeStruct
        cloud_abs = jax.tree_util.tree_map(
            lambda x: sds((n_eff,) + x.shape[1:], x.dtype)
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == self.config.n_particles
            else sds(getattr(x, "shape", ()), getattr(x, "dtype", jnp.float32)),
            self.cloud,
        )

        def work():
            try:
                if audit_args is not None and not self._budget_checked:
                    # adopts (rung-quantized) budgets into
                    # self.config.sensor and sets _budget_checked — the
                    # eventual flip then skips its own audit and uses a
                    # config this thread compiles below
                    self._check_budgets(*audit_args)
                cfg_w = dataclasses.replace(self.config.sensor, engine=engine)
                sensor_update.lower(
                    accel, cloud_abs,
                    sds((2,), jnp.uint32),
                    sds((n_points, 3), jnp.float32),
                    sds((n_points,), jnp.bool_),
                    Transform.identity(), cfg_w,
                ).compile()
            except Exception:  # warming is best-effort
                pass

        t = threading.Thread(target=work, daemon=True)
        t.start()  # start BEFORE publishing: the atexit joiner may run now
        _WARM_THREADS.append(t)

    def warm(self, n_points: int) -> None:
        """Pre-compile the FIRST sensor-update program in the background
        (VERDICT r4 #4: the first update paid an ~89 s cold compile; the
        reference's AOT loop has no such cliff —
        micp_localization.cpp:1086-1171). Call right after construction /
        re-initialization with the expected measurement count: the compile
        then overlaps host-side setup (map IO, replay parsing, driver
        logic), and lands in the persistent cache so every later process
        start is warm even when nothing overlaps.
        """
        engine = self.config.sensor.engine
        if engine == "auto":
            engine = self._engine_choice
        n_eff = self._compact_slice() or self.config.n_particles
        self._spawn_warm(engine, n_eff, int(n_points))

    def _warm_other_engine(self, eff_cfg, k, points_s, points_mask,
                           tsb) -> None:
        """Audit + pre-compile the engine auto would flip TO, in a
        background thread (VERDICT r3 #8: the first post-flip update
        stalled 30-62 s — and with the rung ladder STILL raced the warm:
        KIDNAP r4 run 1 paid 255 s when the flip's audit adopted a rung
        the thread hadn't reached). The thread therefore runs the budget
        AUDIT itself on the current cloud first — adopting (quantized)
        budgets minutes before any flip — then AOT ``lower().compile()``s
        the binned program at exactly those budgets, warming the
        persistent compilation cache. A scattered-cloud audit adopts a
        conservative rung; budgets are ~free under count-sorted chunks
        (TPU_NOTES), so over-provisioning costs ~nothing while making the
        flip-time config fully predictable."""
        # the flip target: the engine auto would actually flip TO —
        # exact -> binned on concentration; binned -> the exact 'bvh'
        # traversal on re-scatter (_auto_select_engine's exact_choice;
        # 'seeded' is never an auto target — warming it would leave the
        # real flip-back cold)
        other = "binned" if self._engine_choice != "binned" else "bvh"
        if self._points_shape is None:
            return
        n_eff = k if k is not None else self.config.n_particles
        run_audit = (
            other == "binned"
            and not self._budget_checked
            and self.config.auto_budget
            and eff_cfg.correspondence_type != "CP"
        )
        self._spawn_warm(
            other, n_eff, self._points_shape[0],
            audit_args=(points_s, points_mask, tsb) if run_audit else None,
        )

    def resample(self) -> bool:
        """Resampling stage; returns False when guarded away (reference
        resampling tick :554-639: requires ≥1 motion AND sensor update, and
        rejects live counts below ``min_particles_for_resample``)."""
        if self.motion_updates < 1 or self.sensor_updates < 1:
            return False
        # aliveness only changes at resamples/inits, so the host mirror is
        # exact here — no device readback (each costs ~58 ms on the relay)
        n_live = (
            self.n_alive_host
            if self.n_alive_host is not None
            else int(np.asarray(self.cloud.n_alive))
        )
        if n_live < self.config.min_particles_for_resample:
            return False
        with self.timer.stage("resampling"):
            if self.config.dynamic_count != "off":
                cap = self.config.n_particles
                if (
                    self.config.dynamic_count == "adaptive"
                    and self.config.resampler != "gladiator"
                ):
                    n_target = adaptive_particle_count(
                        self.cloud,
                        n_min=self.adaptive_n_min_eff,
                        n_max=cap,
                        spread_ref=self.config.adaptive_spread_ref,
                    )
                else:
                    # reference parity: ResidualResamplerCPU fills the whole
                    # next buffer (grow-to-capacity); gladiator keeps a
                    # fixed-size cloud in the reference too
                    n_target = jnp.int32(cap)
                if self.config.resampler == "gladiator":
                    new = gladiator_resample(
                        self.cloud, self._next_key(), self.config.resampling
                    )
                else:
                    new = residual_resample_dynamic(
                        self.cloud, self._next_key(), self.config.resampling,
                        n_target,
                    )
                n_new = int(np.asarray(new.n_alive))
                if n_new < self.config.min_particles_for_resample:
                    # adoption guard (rmcl_localization.cpp:633-639) — keep
                    # the previous cloud instead of adopting a collapsed one
                    return False
                self.cloud = new
                self.n_alive_host = n_new
            else:
                fn = _RESAMPLERS[self.config.resampler]
                self.cloud = fn(
                    self.cloud, self._next_key(), self.config.resampling
                )
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
