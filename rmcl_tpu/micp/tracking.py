"""Tracked MICP-L corrections with cross-correction candidate reuse.

The reference's correction loop is a *tracking* workload at up to 1 kHz
(micp_localization.cpp:130,1086-1171): consecutive pose estimates differ
by millimeters and fractions of a degree. This module exploits that
structure on the dense factored engine: the conservative cull runs only
when the pose has drifted past the candidate margins since the last cull
(``origin_margin`` meters / ``dir_margin`` radians — checked device-side,
no host readbacks); every other correction reuses the candidate lists and
pays only intersect + solve. Reused casts are bitwise identical to
fresh-cull casts (tests/test_candidate_reuse.py), so tracking accuracy is
unaffected by reuse — PROVIDED the candidate budget does not saturate:
like every binned-engine budget, a saturated ``c_bin`` truncates
nearest-first, and margin inflation can then push real candidates out.
Audit with ``candidate_stats`` / the node-level auto-budget before
lowering budgets (TPU_NOTES rule: counts at the budget = potential loss).

Single-sensor, shared-origin models (spherical / pinhole / O1Dn). The
optimization half is shared verbatim with the generic pipeline
(:func:`rmcl_tpu.micp.pipeline.correct_from_correspondences` — reference
correctOnce semantics, micp_localization.cpp:915-1016).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import TriangleBins
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.micp.correspondences import Correspondences
from rmcl_tpu.micp.pipeline import (
    MICPConfig,
    MICPSensorData,
    MICPStats,
    correct_from_correspondences,
)
from rmcl_tpu.ops.raycast import NO_HIT_T
from rmcl_tpu.ops.raycast_binned import (
    cast_rays_binned_factored,
    factored_candidates,
)
from rmcl_tpu.sensors.models import SensorModel

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrackedState:
    """Carried tracking state: pose + the reusable candidate lists and the
    sensor pose they were culled at."""

    tom: Transform  # odom → map correction (the tracked output)
    candidates: Tuple[Array, Array, Array]  # (cand, count, tnear)
    ref_trans: Array  # (3,) sensor origin at the last cull
    ref_rot: Array  # (4,) sensor quaternion at the last cull
    progress: Array  # convergence progress (annealing input)
    n_reculls: Array  # int32 — diagnostics: culls actually executed


class TrackedCorrector:
    """MICP-L tracking loop on the dense factored engine.

    Usage::

        tc = TrackedCorrector(bins, sensor_data.model, micp_config)
        state = tc.init(sensor_data, tom0, tbo)
        state, stats = tc.step(bins, sensor_data, state, tbo)   # jitted

    ``step`` re-culls automatically (device-side ``lax.cond``) when the
    sensor pose drifted past the margins since the last cull.
    """

    def __init__(
        self,
        bins: TriangleBins,
        model: SensorModel,
        config: MICPConfig = MICPConfig(),
        origin_margin: float = 0.05,
        dir_margin: float = 0.01,
        group: int = 128,
        block_chunk: int = 512,
        sub_blocks: int = 4,
    ):
        self.config = config
        self.origin_margin = float(origin_margin)
        self.dir_margin = float(dir_margin)
        o_s, d_s = model.rays()
        n = int(d_s.shape[0])
        pad = (-n) % group
        if pad:
            d_s = jnp.concatenate(
                [d_s, jnp.broadcast_to(d_s[-1], (pad, 3))], 0
            )
        self._n_rays = n
        self._d_pad = d_s  # (n+pad, 3) sensor frame
        self._o_sensor = o_s[0]  # shared origin (zeros for spherical/pinhole)
        self._group = group
        self._n_blk = d_s.shape[0] // group
        self._t_min = float(model.range.min)
        self._t_max = float(min(float(model.range.max), NO_HIT_T))
        self._cull_kw = dict(
            c_super=config.c_super, c_bin=config.c_bin, c_mid=config.c_mid,
            c_hyper=config.c_hyper, block_chunk=block_chunk,
            sub_blocks=sub_blocks, t_min=self._t_min, t_max=self._t_max,
        )
        self._step = jax.jit(self._step_impl)
        self._init = jax.jit(self._init_impl)

    # --- factored block layout ------------------------------------------
    def _blocks(self, tsm: Transform) -> Tuple[Array, Array]:
        d_m = tsm.rotate(self._d_pad)  # (N_pad, 3) map frame
        o_m = tsm.apply(self._o_sensor)  # (3,)
        o_blk = jnp.broadcast_to(o_m, (self._n_blk, 1, 3))
        return o_blk, d_m.reshape(self._n_blk, self._group, 3)

    def _cull(self, bins, tsm):
        o_blk, d_blk = self._blocks(tsm)
        return factored_candidates(
            bins, o_blk, d_blk,
            origin_margin=self.origin_margin, dir_margin=self.dir_margin,
            **self._cull_kw,
        )

    # --- public API -------------------------------------------------------
    def init(self, bins: TriangleBins, tom: Transform, tbo: Transform,
             tsb: Transform) -> TrackedState:
        return self._init(bins, tom, tbo, tsb)

    def _init_impl(self, bins, tom, tbo, tsb):
        tsm = (tom @ tbo) @ tsb
        cand = self._cull(bins, tsm)
        return TrackedState(
            tom=tom, candidates=cand, ref_trans=tsm.trans, ref_rot=tsm.rot,
            progress=jnp.float32(0.0), n_reculls=jnp.int32(1),
        )

    def step(self, bins: TriangleBins, sensor: MICPSensorData,
             state: TrackedState, tbo: Transform
             ) -> Tuple[TrackedState, MICPStats]:
        return self._step(bins, sensor, state, tbo)

    def _step_impl(self, bins, sensor, state, tbo):
        tom = state.tom
        tsm = (tom @ tbo) @ sensor.tsb

        # drift since the last cull, in exactly the margin's terms: the
        # sensor origin's L-inf translation and the rotation angle (every
        # direction tilts by <= the quaternion angle)
        dtr = jnp.max(jnp.abs(tsm.trans - state.ref_trans))
        cos_half = jnp.abs(jnp.sum(tsm.rot * state.ref_rot))
        need = (dtr >= self.origin_margin) | (
            cos_half <= math.cos(self.dir_margin / 2.0)
        )

        cand, ref_t, ref_q, reculls = jax.lax.cond(
            need,
            lambda: (self._cull(bins, tsm), tsm.trans, tsm.rot,
                     state.n_reculls + 1),
            lambda: (state.candidates, state.ref_trans, state.ref_rot,
                     state.n_reculls),
        )

        o_blk, d_blk = self._blocks(tsm)
        hits = cast_rays_binned_factored(
            bins, o_blk, d_blk, candidates=cand, payload="plane",
            sort_blocks=True, **self._cull_kw,
        )

        # fold hits back into the sensor frame (simulate() semantics) and
        # drop the block padding rays
        n = self._n_rays
        hit = hits.hit.reshape(-1)[:n]
        p_m = hits.point.reshape(-1, 3)[:n]
        n_m = hits.normal.reshape(-1, 3)[:n]
        inv = tsm.inverse()
        corr = Correspondences(
            model_points=jnp.where(hit[:, None], inv.apply(p_m), 0.0),
            model_normals=jnp.where(hit[:, None], inv.rotate(n_m), 0.0),
            found=hit,
        )

        tom_new, stats = correct_from_correspondences(
            [sensor], [corr], tom, tbo, state.progress, self.config
        )
        new_state = TrackedState(
            tom=tom_new, candidates=cand, ref_trans=ref_t, ref_rot=ref_q,
            progress=stats.convergence_progress, n_reculls=reculls,
        )
        return new_state, stats
