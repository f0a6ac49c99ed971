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

MULTI-SENSOR (VERDICT r3 #6): pass a sequence of models/tsbs/sensor
snapshots — each sensor keeps its OWN candidate lists and cull-reference
pose (sensors drift independently through their mounting transforms), the
statistics merge is shared verbatim with the generic pipeline
(:func:`rmcl_tpu.micp.pipeline.correct_from_correspondences` — the
reference's per-sensor loop + ``Cmerged += Cs``,
micp_localization.cpp:865-871,931-937).

Model support: shared-origin models (spherical / pinhole / O1Dn) use the
pose x direction factored blocks; OnDn (per-ray origins) uses the
factored engine's ``paired`` layout — same cull, same reuse contract.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

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
from rmcl_tpu.sensors.models import OnDnModel, SensorModel

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrackedState:
    """Carried tracking state: pose + per-sensor reusable candidate lists
    and the sensor pose each was culled at."""

    tom: Transform  # odom → map correction (the tracked output)
    candidates: Tuple  # per sensor: (cand, count, tnear)
    ref_trans: Tuple  # per sensor: (3,) sensor origin at the last cull
    ref_rot: Tuple  # per sensor: (4,) sensor quaternion at the last cull
    progress: Array  # convergence progress (annealing input)
    n_reculls: Array  # int32 — diagnostics: culls actually executed


class _SensorLayout:
    """Per-sensor static block layout for the factored engine."""

    def __init__(self, model: SensorModel, group: int):
        self.paired = isinstance(model, OnDnModel)
        o_s, d_s = model.rays()
        n = int(d_s.shape[0])
        pad = (-n) % group
        if pad:
            d_s = jnp.concatenate(
                [d_s, jnp.broadcast_to(d_s[-1], (pad, 3))], 0
            )
        self.n_rays = n
        self.d_pad = d_s  # (n+pad, 3) sensor frame
        if self.paired:
            o_s = jnp.broadcast_to(o_s, d_s[: o_s.shape[0]].shape)
            if pad:
                o_s = jnp.concatenate(
                    [o_s, jnp.broadcast_to(o_s[-1], (pad, 3))], 0
                )
            self.o_pad = o_s  # (n+pad, 3) per-ray origins
        else:
            self.o_pad = o_s[0]  # shared origin (zeros for sph/pinhole)
        self.group = group
        self.n_blk = d_s.shape[0] // group
        self.t_min = float(model.range.min)
        self.t_max = float(min(float(model.range.max), NO_HIT_T))

    def blocks(self, tsm: Transform) -> Tuple[Array, Array]:
        d_m = tsm.rotate(self.d_pad)  # (N_pad, 3) map frame
        d_blk = d_m.reshape(self.n_blk, self.group, 3)
        if self.paired:
            o_m = tsm.apply(self.o_pad)  # (N_pad, 3)
            return o_m.reshape(self.n_blk, self.group, 3), d_blk
        o_m = tsm.apply(self.o_pad)  # (3,)
        return jnp.broadcast_to(o_m, (self.n_blk, 1, 3)), d_blk


class TrackedCorrector:
    """MICP-L tracking loop on the dense factored engine.

    Usage (single- or multi-sensor — scalars and sequences both accepted)::

        tc = TrackedCorrector(bins, [s.model for s in sensors], micp_config)
        state = tc.init(bins, tom0, tbo, [s.tsb for s in sensors])
        state, stats = tc.step(bins, sensors, state, tbo)   # jitted

    ``step`` re-culls each sensor independently (device-side ``lax.cond``)
    when that sensor's pose drifted past the margins since its last cull.
    """

    def __init__(
        self,
        bins: TriangleBins,
        models: SensorModel | Sequence[SensorModel],
        config: MICPConfig = MICPConfig(),
        origin_margin: float = 0.05,
        dir_margin: float = 0.01,
        group: int = 128,
        block_chunk: int = 512,
        sub_blocks: int = 4,
        payload: str = "plane",
    ):
        """``block_chunk``: single-scan casts have ~100-200 blocks total;
        a chunk larger than that makes every trip bill the GLOBAL worst
        block instead of the count-sorted chunk maxima (r5 chip find:
        cb=256 at one 113-block chunk paid 199 trips where chunked-32
        tracks ~the sorted means). Use ~32-64 for single-sensor tracking.
        ``payload``: "plane" (default) or "index" — see
        :func:`ops.raycast_binned.cast_rays_binned_factored`."""
        self.config = config
        self.origin_margin = float(origin_margin)
        self.dir_margin = float(dir_margin)
        self.payload = payload
        models = self._as_seq(models)
        self._layouts = [_SensorLayout(m, group) for m in models]
        self._cull_kw = dict(
            c_super=config.c_super, c_bin=config.c_bin, c_mid=config.c_mid,
            c_hyper=config.c_hyper, block_chunk=block_chunk,
            sub_blocks=sub_blocks,
        )
        self._step = jax.jit(self._step_impl)
        self._init = jax.jit(self._init_impl)

    @staticmethod
    def _as_seq(x):
        return list(x) if isinstance(x, (list, tuple)) else [x]

    def _cull(self, bins, lay: _SensorLayout, tsm):
        o_blk, d_blk = lay.blocks(tsm)
        return factored_candidates(
            bins, o_blk, d_blk,
            origin_margin=self.origin_margin, dir_margin=self.dir_margin,
            t_min=lay.t_min, t_max=lay.t_max, **self._cull_kw,
        )

    # --- public API -------------------------------------------------------
    def init(self, bins: TriangleBins, tom: Transform, tbo: Transform,
             tsb: Transform | Sequence[Transform]) -> TrackedState:
        return self._init(bins, tom, tbo, tuple(self._as_seq(tsb)))

    def _init_impl(self, bins, tom, tbo, tsbs):
        cands, rts, rqs = [], [], []
        for lay, tsb in zip(self._layouts, tsbs):
            tsm = (tom @ tbo) @ tsb
            cands.append(self._cull(bins, lay, tsm))
            rts.append(tsm.trans)
            rqs.append(tsm.rot)
        return TrackedState(
            tom=tom, candidates=tuple(cands), ref_trans=tuple(rts),
            ref_rot=tuple(rqs), progress=jnp.float32(0.0),
            n_reculls=jnp.int32(len(self._layouts)),
        )

    def step(self, bins: TriangleBins,
             sensors: MICPSensorData | Sequence[MICPSensorData],
             state: TrackedState, tbo: Transform
             ) -> Tuple[TrackedState, MICPStats]:
        return self._step(bins, tuple(self._as_seq(sensors)), state, tbo)

    def _step_impl(self, bins, sensors, state, tbo):
        tom = state.tom
        corrs, cands, rts, rqs = [], [], [], []
        reculls = state.n_reculls
        for i, (lay, sensor) in enumerate(zip(self._layouts, sensors)):
            tsm = (tom @ tbo) @ sensor.tsb

            # drift since this sensor's last cull, in exactly the margin's
            # terms: the sensor origin's L-inf translation and the rotation
            # angle (every direction tilts by <= the quaternion angle; for
            # OnDn the per-ray origins also translate by the L-inf delta
            # plus lever-arm x angle, which the rotation gate bounds for
            # the dir_margin it shares)
            dtr = jnp.max(jnp.abs(tsm.trans - state.ref_trans[i]))
            cos_half = jnp.abs(jnp.sum(tsm.rot * state.ref_rot[i]))
            need = (dtr >= self.origin_margin) | (
                cos_half <= math.cos(self.dir_margin / 2.0)
            )

            cand, ref_t, ref_q, reculls = jax.lax.cond(
                need,
                lambda lay=lay, tsm=tsm, i=i: (
                    self._cull(bins, lay, tsm), tsm.trans, tsm.rot,
                    reculls + 1,
                ),
                lambda i=i: (state.candidates[i], state.ref_trans[i],
                             state.ref_rot[i], reculls),
            )

            o_blk, d_blk = lay.blocks(tsm)
            hits = cast_rays_binned_factored(
                bins, o_blk, d_blk, candidates=cand, payload=self.payload,
                sort_blocks=True, paired=lay.paired,
                t_min=lay.t_min, t_max=lay.t_max, **self._cull_kw,
            )

            # fold hits back into the sensor frame (simulate() semantics)
            # and drop the block padding rays
            n = lay.n_rays
            hit = hits.hit.reshape(-1)[:n]
            p_m = hits.point.reshape(-1, 3)[:n]
            n_m = hits.normal.reshape(-1, 3)[:n]
            inv = tsm.inverse()
            corrs.append(Correspondences(
                model_points=jnp.where(hit[:, None], inv.apply(p_m), 0.0),
                model_normals=jnp.where(hit[:, None], inv.rotate(n_m), 0.0),
                found=hit,
            ))
            cands.append(cand)
            rts.append(ref_t)
            rqs.append(ref_q)

        tom_new, stats = correct_from_correspondences(
            list(sensors), corrs, tom, tbo, state.progress, self.config
        )
        new_state = TrackedState(
            tom=tom_new, candidates=tuple(cands), ref_trans=tuple(rts),
            ref_rot=tuple(rqs), progress=stats.convergence_progress,
            n_reculls=reculls,
        )
        return new_state, stats
