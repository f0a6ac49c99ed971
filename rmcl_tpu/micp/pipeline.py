"""The MICP-L correction pipeline as one jitted, differentiable program.

Re-design of the reference's hot path (SURVEY.md §3.1 call stack:
``correctionLoop → correctOnce`` — reference micp_localization.cpp:856-1016):

  1. correspondences are found ONCE per correction (ray casts),
  2. the inner Gauss-Newton loop re-reduces the *pre-transformed* statistics
     ``optimization_iterations`` times without re-raycasting
     (re-linearization — reference :915-964),
  3. the merged CrossStatistics drive one Umeyama solve per GN iteration,
  4. adaptive max-dist annealing from the convergence progress
     (reference CorrespondencesCPU.cpp:21-23, micp_localization.cpp:988-1007).

Multi-sensor fusion = the CrossStatistics ``+`` monoid with per-sensor
weights (reference :931-937). Everything is pure jnp → jit/grad/vmap-able and
shardable: the per-sensor reduction can psum across ray shards.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.math.gaussian import CrossStatistics
from rmcl_tpu.math.se3 import Quaternion, Transform
from rmcl_tpu.math.stats import umeyama_transform
from rmcl_tpu.micp.correspondences import Correspondences, find_cpc, find_rcc
from rmcl_tpu.sensors.models import SensorModel

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MICPSensorConfig:
    """Per-sensor correspondence settings (reference loadSensor —
    micp_localization.cpp:507-808: ``correspondences.max_dist``,
    ``adaptive_max_dist_min``, per-sensor ``weight``)."""

    max_dist: Array
    adaptive_max_dist_min: Array
    weight: Array
    corr_type: str = dataclasses.field(default="RC", metadata=dict(static=True))

    @staticmethod
    def create(max_dist=0.5, adaptive_max_dist_min=0.15, weight=1.0, corr_type="RC"):
        return MICPSensorConfig(
            max_dist=jnp.float32(max_dist),
            adaptive_max_dist_min=jnp.float32(adaptive_max_dist_min),
            weight=jnp.float32(weight),
            corr_type=corr_type,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MICPSensorData:
    """One sensor's frozen measurement snapshot (the unpacked message —
    reference MICPSphericalSensorCPU::unpackMessage :181-233)."""

    model: SensorModel
    points: Array  # (N, 3) dataset points, sensor frame
    mask: Array  # (N,) valid (range-gated) measurements
    tsb: Transform  # sensor → base (fetchTF — MICPSensor.cpp:94-136)
    config: MICPSensorConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MICPConfig:
    """Node-level correction settings (reference micp_localization.cpp:116-185).

    solver:
      * "umeyama" — reference-parity scheme: project dataset onto model
        planes, point-to-point Umeyama/Kabsch SVD on the cross statistics
        (reference rm::statistics_p2l + umeyama_transform). Converges slowly
        along directions poorly covered by normals (contraction per inner
        iteration ~E[n nᵀ]).
      * "p2l_gn" — true point-to-plane Gauss-Newton: solve the 6x6 normal
        equations about the correspondence centroid. Strictly faster
        convergence; the TPU-native default.
    """

    optimization_iterations: int = dataclasses.field(default=5, metadata=dict(static=True))
    adaptive_max_dist: bool = dataclasses.field(default=True, metadata=dict(static=True))
    disable_correction: bool = dataclasses.field(default=False, metadata=dict(static=True))
    solver: str = dataclasses.field(default="p2l_gn", metadata=dict(static=True))
    gn_damping: float = dataclasses.field(default=1e-6, metadata=dict(static=True))
    # dense binned engine candidate budgets (when the acceleration structure
    # is TriangleBins). Budget saturation silently drops geometry (false
    # sim-misses / farther closest points) — RAISE for large maps; see
    # ops.raycast_binned and TPU_NOTES.md.
    c_super: int = dataclasses.field(default=24, metadata=dict(static=True))
    c_bin: int = dataclasses.field(default=96, metadata=dict(static=True))
    # 3-level cull budget for the binned RAY engine (0 = 2-level); candidate
    # sets verified identical at c_mid=32 on the bench workload (TPU_NOTES)
    c_mid: int = dataclasses.field(default=0, metadata=dict(static=True))
    # 4-level cull budget (bins must carry a hyper level); 0 = off
    c_hyper: int = dataclasses.field(default=0, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MICPStats:
    """Per-correction statistics (reference rmcl_msgs/MICPSensorStats +
    publish at micp_localization.cpp:1009-1015)."""

    total_measurements: Array
    valid_measurements: Array
    valid_matches: Array  # merged n_meas
    covariance_trace: Array
    convergence_progress: Array


def statistics_p2l(
    pre_transform: Transform,
    dataset: Array,
    corr: Correspondences,
    mask: Array,
    max_dist: Array,
) -> CrossStatistics:
    """Masked point-to-plane cross-statistics reduction.

    TPU equivalent of ``rm::statistics_p2l`` (reference
    CorrespondencesCPU.cpp:26-30): pre-transform the dataset by the
    accumulated GN delta, gate on |signed plane distance| <= max_dist,
    accumulate (dataset, plane-projection) pairs."""
    d = pre_transform.apply(dataset)
    n = corr.model_normals
    signed = jnp.sum(n * (d - corr.model_points), axis=-1)
    ok = mask & corr.found & (jnp.abs(signed) <= max_dist)
    proj = d - signed[..., None] * n
    return CrossStatistics.from_masked_points(d, proj, ok)


def p2l_normal_equations(
    pre_transform: Transform,
    dataset: Array,
    model_points: Array,
    normals: Array,
    mask: Array,
    max_dist: Array,
    centroid: Array,
) -> Tuple[Array, Array, Array]:
    """Accumulate the point-to-plane Gauss-Newton system about ``centroid``.

    Residual r_i = n_i · (d_i - m_i); Jacobian row J_i = [n_i, (d_i - c) x n_i]
    for the increment (t, ω) applied about c. Returns (A (6,6), b (6,),
    n_meas) — a commutative monoid under +, psum-able across shards.
    """
    d = pre_transform.apply(dataset)
    r = jnp.sum(normals * (d - model_points), axis=-1)
    ok = (mask & (jnp.abs(r) <= max_dist)).astype(d.dtype)
    j_rot = jnp.cross(d - centroid, normals)
    J = jnp.concatenate([normals, j_rot], axis=-1) * ok[..., None]  # (N, 6)
    A = jnp.einsum("ni,nj->ij", J, J, precision=jax.lax.Precision.HIGHEST)
    b = -jnp.einsum("ni,n->i", J, r * ok, precision=jax.lax.Precision.HIGHEST)
    return A, b, jnp.sum(ok)


def _solve_p2l_delta(A: Array, b: Array, centroid: Array, damping: float) -> Transform:
    """Solve A δ = b, build the SE(3) increment about the centroid."""
    A = A + damping * jnp.eye(6, dtype=A.dtype) * jnp.maximum(jnp.trace(A), 1.0)
    delta = jnp.linalg.solve(A, b)
    t, w = delta[:3], delta[3:]
    q = Quaternion.exp(w)
    # T = Trans(c) ∘ (R, t) ∘ Trans(-c)
    trans = centroid + t - Quaternion.rotate(q, centroid)
    return Transform(rot=q, trans=trans)


def _p2x_raw_moments(
    pre_transform: Transform,
    dataset: Array,
    corr: Correspondences,
    mask: Array,
    max_dist: Array,
    ref: Array,
) -> Tuple[Array, Array, Array, Array]:
    """Masked p2x statistics in RAW-moment form about ``ref``.

    Returns (Sd (3,), Sm (3,), Sdm (3,3), n) with
    ``Sd = Σ_ok (d - ref)``, ``Sm = Σ_ok (proj - ref)``,
    ``Sdm = Σ_ok (proj - ref)(d - ref)ᵀ`` — a PLAIN-SUM monoid, so a
    sharded reduction is ONE packed psum instead of the merge-tree's
    per-field all-reduces (VERDICT r3 #4). Centering about a replicated
    ``ref`` (the base position) keeps the f32 raw moments from
    catastrophically cancelling in large-coordinate maps."""
    d = pre_transform.apply(dataset)
    n = corr.model_normals
    signed = jnp.sum(n * (d - corr.model_points), axis=-1)
    ok = mask & corr.found & (jnp.abs(signed) <= max_dist)
    proj = d - signed[..., None] * n
    w = ok.astype(d.dtype)
    dc = (d - ref) * w[..., None]
    mc = (proj - ref) * w[..., None]
    Sdm = jnp.einsum(
        "ni,nj->ij", mc, d - ref, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.sum(dc, 0), jnp.sum(mc, 0), Sdm, jnp.sum(w)


def _stats_from_raw(Sd, Sm, Sdm, n, ref) -> CrossStatistics:
    """Rebuild the normalized CrossStatistics from psummed raw moments."""
    safe_n = jnp.maximum(n, 1.0)
    db = Sd / safe_n  # dataset mean - ref
    mb = Sm / safe_n
    cov = Sdm / safe_n - jnp.outer(mb, db)
    empty = n <= 0.0
    z3 = jnp.zeros_like(db)
    return CrossStatistics(
        dataset_mean=jnp.where(empty, z3, ref + db),
        model_mean=jnp.where(empty, z3, ref + mb),
        covariance=jnp.where(empty, 0.0, cov),
        n_meas=n,
    )


_TRIU = jnp.triu_indices(6)


def _pack_Ab(A: Array, b: Array, extra=()) -> Array:
    """One flat f32 vector per GN iteration: A's upper triangle (21) +
    b (6) + any extras — the single psum payload."""
    return jnp.concatenate(
        [A[_TRIU], b] + [jnp.atleast_1d(e).reshape(-1) for e in extra]
    )


def _unpack_Ab(v: Array) -> Tuple[Array, Array, Array]:
    A = jnp.zeros((6, 6), v.dtype).at[_TRIU].set(v[:21])
    A = A + A.T - jnp.diag(jnp.diag(A))
    return A, v[21:27], v[27:]


def _shift_Ab(A: Array, b: Array, s: Array) -> Tuple[Array, Array]:
    """Exactly move the GN normal equations from reference point c0 to
    c = c0 - s: J rows transform as [n, j] -> [n, j + s x n], i.e.
    J' = J Mᵀ with M = [[I,0],[skew(s),I]], so A' = M A Mᵀ, b' = M b."""
    S = jnp.array(
        [[0.0, -s[2], s[1]], [s[2], 0.0, -s[0]], [-s[1], s[0], 0.0]],
        A.dtype,
    )
    M = jnp.block([
        [jnp.eye(3, dtype=A.dtype), jnp.zeros((3, 3), A.dtype)],
        [S, jnp.eye(3, dtype=A.dtype)],
    ])
    return M @ A @ M.T, M @ b


def _annealed_max_dist(cfg: MICPSensorConfig, progress: Array, enabled: bool) -> Array:
    """Linear annealing of the gating distance with convergence progress
    (reference CorrespondencesCPU.cpp:21-23)."""
    if not enabled:
        return cfg.max_dist
    return cfg.max_dist * (1.0 - progress) + cfg.adaptive_max_dist_min * progress


def find_correspondences(
    bvh: BVH,
    sensors: Sequence[MICPSensorData],
    tbm: Transform,
    chunk_size: int = 262144,
    c_super: int = 24,
    c_bin: int = 96,
    c_mid: int = 0,
    c_hyper: int = 0,
    psum_axis: str | None = None,
) -> Tuple[Correspondences, ...]:
    """One correspondence search per sensor from the pose estimate
    (reference correctOnce :900-908 → Correspondences_::find(Tom*Tbo)).

    ``bvh`` may also be ``TriangleBins`` — both RC (dense binned ray cast)
    and CP (dense binned distance query) dispatch on the structure type;
    ``c_super``/``c_bin`` are the binned engine's candidate budgets.

    ``psum_axis``: inside a rays-sharded ``shard_map``, each RC sensor's
    replicated model is sliced to the shard's own pixel window (the
    dataset points/mask arrive already sharded), keeping the search purely
    shard-local."""
    if psum_axis is not None:
        from rmcl_tpu.sensors.models import RaySliceModel

        idx = jax.lax.axis_index(psum_axis)
        sliced = []
        for s in sensors:
            n_loc = int(s.points.shape[0])
            sliced.append(dataclasses.replace(
                s,
                model=RaySliceModel(
                    inner=s.model, start=idx * n_loc, size=n_loc
                ),
            ))
        sensors = sliced
    out = []
    for s in sensors:
        tsm = tbm @ s.tsb
        if s.config.corr_type == "CP":
            out.append(
                find_cpc(
                    bvh, s.points, s.mask, tsm, s.config.max_dist,
                    chunk_size=chunk_size, c_super=c_super, c_bin=c_bin,
                )
            )
        else:
            out.append(
                find_rcc(
                    bvh, s.model, tsm,
                    chunk_size=chunk_size, c_super=c_super, c_bin=c_bin,
                    c_mid=c_mid,
                    c_hyper=c_hyper,
                )
            )
    return tuple(out)


def correct_once(
    bvh: BVH,
    sensors: Sequence[MICPSensorData],
    tom: Transform,
    tbo: Transform,
    convergence_progress: Array,
    config: MICPConfig = MICPConfig(),
    chunk_size: int = 262144,
    psum_axis: str | None = None,
) -> Tuple[Transform, MICPStats]:
    """One full correction: raycast → K Gauss-Newton iterations → new Tom.

    Mirrors reference correctOnce (micp_localization.cpp:856-1016); see the
    module docstring for the call-stack mapping. Fully jittable; make sure
    the BVH flows in as an argument (never a closed-over constant).
    """
    tbm = tom @ tbo
    corrs = find_correspondences(
        bvh, sensors, tbm, chunk_size=chunk_size,
        c_super=config.c_super, c_bin=config.c_bin, c_mid=config.c_mid,
        c_hyper=config.c_hyper, psum_axis=psum_axis,
    )
    return correct_from_correspondences(
        sensors, corrs, tom, tbo, convergence_progress, config,
        psum_axis=psum_axis,
    )


def correct_from_correspondences(
    sensors: Sequence[MICPSensorData],
    corrs: Sequence[Correspondences],
    tom: Transform,
    tbo: Transform,
    convergence_progress: Array,
    config: MICPConfig = MICPConfig(),
    psum_axis: str | None = None,
) -> Tuple[Transform, MICPStats]:
    """The optimization half of :func:`correct_once`: K Gauss-Newton
    iterations over given correspondences → new Tom (reference
    micp_localization.cpp:915-1016). Split out so alternate correspondence
    paths (e.g. the tracked factored-engine path with candidate reuse,
    micp.tracking) share the exact solve/annealing/guard semantics.

    ``psum_axis``: when set (inside a ``shard_map`` over that mesh axis
    with rays sharded), the cross-shard reduction is restructured to ONE
    packed ``lax.psum`` per GN iteration plus one for the final stats —
    K+1 collectives per correction (K=5 default ⇒ 6) instead of the ~16
    rendezvous auto-SPMD inserts (VERDICT r3 #4; the reference's merge is
    one monoid — micp_localization.cpp:936-937 — so it should cost one
    collective). The conditioning-centroid reduction is folded into
    iteration 1 by accumulating the normal equations about the replicated
    base position first and exactly re-centering afterwards
    (:func:`_shift_Ab`). Results differ from the unsharded path only by
    f32 rounding of the re-centering / raw-moment forms."""
    # lift per-sensor data into the odom frame once; the GN loop then works
    # in a single common frame (frames fold per reference MICPSensor.hpp:158
    # + :931-937, collapsed algebraically)
    lifted = []
    for s, corr in zip(sensors, corrs):
        t_os = tbo @ s.tsb
        lifted.append(
            (
                t_os.apply(s.points),
                t_os.apply(corr.model_points),
                t_os.rotate(corr.model_normals),
                s.mask & corr.found,
                s.config,
            )
        )

    # the annealed gates don't change across GN iterations — hoist them
    gates = [
        _annealed_max_dist(scfg, convergence_progress, config.adaptive_max_dist)
        for *_, scfg in lifted
    ]

    if psum_axis is None:
        # shared conditioning centroid over all valid correspondences
        c_sum = sum(jnp.sum(d * m[..., None], 0) for d, _, _, m, _ in lifted)
        c_cnt = sum(jnp.sum(m.astype(jnp.float32)) for *_, m, _ in lifted)
        centroid = c_sum / jnp.maximum(c_cnt, 1.0)
    else:
        # replicated provisional reference; the true centroid arrives with
        # iteration 1's packed psum (no standalone collective)
        centroid = None
    c0 = tbo.trans  # base position in the odom frame — replicated

    t_onew_oold = Transform.identity()

    # inner GN loop: statically unrolled (optimization_iterations is small,
    # default 5 — reference :915-964); correspondences stay fixed.
    for it in range(config.optimization_iterations):
        if config.solver == "umeyama":
            if psum_axis is None:
                merged = CrossStatistics.empty()
                for (d_o, m_o, n_o, ok, scfg), max_dist in zip(lifted, gates):
                    corr_o = Correspondences(
                        model_points=m_o, model_normals=n_o, found=ok
                    )
                    stats_o = statistics_p2l(
                        t_onew_oold, d_o, corr_o, ok, max_dist
                    ).scale_weight(scfg.weight)
                    merged = merged + stats_o
            else:
                # raw-moment monoid: local plain sums, ONE packed psum
                Sd = jnp.zeros(3); Sm = jnp.zeros(3)
                Sdm = jnp.zeros((3, 3)); n_w = jnp.zeros(())
                for (d_o, m_o, n_o, ok, scfg), max_dist in zip(lifted, gates):
                    corr_o = Correspondences(
                        model_points=m_o, model_normals=n_o, found=ok
                    )
                    sd, sm, sdm, nn = _p2x_raw_moments(
                        t_onew_oold, d_o, corr_o, ok, max_dist, c0
                    )
                    w = scfg.weight
                    Sd += w * sd; Sm += w * sm
                    Sdm += w * sdm; n_w += w * nn
                packed = jnp.concatenate(
                    [Sd, Sm, Sdm.reshape(9), n_w[None]]
                )
                packed = jax.lax.psum(packed, psum_axis)
                merged = _stats_from_raw(
                    packed[0:3], packed[3:6], packed[6:15].reshape(3, 3),
                    packed[15], c0,
                )
            delta = umeyama_transform(merged)
        else:  # true point-to-plane Gauss-Newton
            A = jnp.zeros((6, 6), jnp.float32)
            b = jnp.zeros((6,), jnp.float32)
            ref = c0 if (psum_axis is not None and it == 0) else centroid
            cext = jnp.zeros(4)
            for (d_o, m_o, n_o, ok, scfg), max_dist in zip(lifted, gates):
                A_s, b_s, _ = p2l_normal_equations(
                    t_onew_oold, d_o, m_o, n_o, ok, max_dist, ref
                )
                A = A + scfg.weight * A_s
                b = b + scfg.weight * b_s
                if psum_axis is not None and it == 0:
                    # centroid numerators ride iteration 1's pack (about
                    # c0 so the f32 sums stay small)
                    mf = ok.astype(jnp.float32)
                    cext += jnp.concatenate([
                        jnp.sum((d_o - c0) * mf[..., None], 0),
                        jnp.sum(mf)[None],
                    ])
            if psum_axis is not None:
                v = jax.lax.psum(_pack_Ab(A, b, (cext,)), psum_axis)
                A, b, cext = _unpack_Ab(v)
                if it == 0:
                    centroid = c0 + cext[:3] / jnp.maximum(cext[3], 1.0)
                    A, b = _shift_Ab(A, b, c0 - centroid)
            delta = _solve_p2l_delta(A, b, centroid, config.gn_damping)
        # stats measured on pre-transformed data ⇒ the increment composes on
        # the LEFT of the accumulated delta
        t_onew_oold = (delta @ t_onew_oold).normalized()

    # final merged cross statistics for reporting (one extra reduction —
    # reference publishes match counts + covariance trace per correction).
    # UNWEIGHTED, like the reference's Cmerged_o (micp_localization.cpp:
    # 912-940 keeps the weighted merge ONLY for the solve): a weight-scaled
    # n_meas would cap match_ratio at the weight and under-report matches.
    if psum_axis is None:
        merged_final = CrossStatistics.empty()
        for (d_o, m_o, n_o, ok, scfg), max_dist in zip(lifted, gates):
            corr_o = Correspondences(model_points=m_o, model_normals=n_o, found=ok)
            merged_final = merged_final + statistics_p2l(
                t_onew_oold, d_o, corr_o, ok, max_dist
            )
    else:
        Sd = jnp.zeros(3); Sm = jnp.zeros(3)
        Sdm = jnp.zeros((3, 3)); n_u = jnp.zeros(())
        v_loc = jnp.zeros(())
        for (d_o, m_o, n_o, ok, scfg), max_dist in zip(lifted, gates):
            corr_o = Correspondences(model_points=m_o, model_normals=n_o, found=ok)
            sd, sm, sdm, nn = _p2x_raw_moments(
                t_onew_oold, d_o, corr_o, ok, max_dist, c0
            )
            Sd += sd; Sm += sm; Sdm += sdm; n_u += nn
        for s in sensors:
            v_loc += jnp.sum(s.mask.astype(jnp.float32))
        packed = jnp.concatenate(
            [Sd, Sm, Sdm.reshape(9), n_u[None], v_loc[None]]
        )
        packed = jax.lax.psum(packed, psum_axis)
        merged_final = _stats_from_raw(
            packed[0:3], packed[3:6], packed[6:15].reshape(3, 3),
            packed[15], c0,
        )
        valid_global = packed[16]

    if config.disable_correction:
        t_onew_oold = Transform.identity()

    tom_new = (tom @ t_onew_oold).normalized()
    # NaN guard — keep the old pose if the update went non-finite
    # (reference check()/checkStats — micp_localization.cpp:62-106)
    ok = tom_new.is_finite()
    tom_new = Transform(
        rot=jnp.where(ok, tom_new.rot, tom.rot),
        trans=jnp.where(ok, tom_new.trans, tom.trans),
    )

    # convergence progress (reference :988-1007):
    # trans_progress = 1/exp(10*|t|); rot_progress = qw^2;
    # match_ratio = n_meas / valid
    total = sum(int(s.points.shape[0]) for s in sensors)
    if psum_axis is None:
        valid = sum(jnp.sum(s.mask.astype(jnp.float32)) for s in sensors)
    else:
        # shapes are the per-shard slice inside shard_map
        total = total * jax.lax.axis_size(psum_axis)
        valid = valid_global  # rode the final stats pack — no extra psum
    trans_progress = jnp.exp(-10.0 * jnp.linalg.norm(t_onew_oold.trans))
    rot_progress = jnp.square(t_onew_oold.rot[0])
    match_ratio = merged_final.n_meas / jnp.maximum(valid, 1.0)
    progress = trans_progress * rot_progress * jnp.minimum(match_ratio, 1.0)

    stats = MICPStats(
        total_measurements=jnp.float32(total),
        valid_measurements=valid,
        valid_matches=merged_final.n_meas,
        covariance_trace=jnp.trace(merged_final.covariance),
        convergence_progress=progress,
    )
    return tom_new, stats


correct_once_jit = jax.jit(
    correct_once, static_argnames=("config", "chunk_size")
)
