"""Pose-estimation linear algebra: Umeyama solve, Markley quaternion mean,
pose covariance, Gaussian pose sampling.

TPU-native equivalents of rmagine's ``umeyama_transform``, ``markley_mean``,
``covariance`` and ``chol`` (SURVEY.md §2.9; usage sites
reference micp_localization.cpp:952-953, rmcl_localization.cpp:188,703,716).
Everything is pure jnp and differentiable. ``kabsch_rotation`` /
``umeyama_transform`` are batched over leading dims; the particle-set
reductions (``markley_mean``, ``weighted_pose_mean``,
``pose_covariance_6x6``) take a single (N, ...) set.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rmcl_tpu.math.gaussian import CrossStatistics
from rmcl_tpu.math.se3 import Quaternion, Transform

Array = jax.Array


def kabsch_rotation(covariance: Array) -> Array:
    """Optimal rotation R maximizing tr(R C^T) for C = E[m_c ⊗ d_c], i.e.
    the rotation mapping dataset deviations onto model deviations.

    Uses full SVD with the determinant sign fix (proper rotation even for
    reflective covariance)."""
    u, _, vt = jnp.linalg.svd(covariance)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones_like(covariance[..., 0])
    d = d.at[..., -1].set(det)
    return u @ (d[..., :, None] * vt)


def umeyama_transform(stats: CrossStatistics) -> Transform:
    """SE(3) increment from cross statistics: find T with
    ``T(dataset) ≈ model`` in the least-squares point sense
    (reference: rmagine umeyama_transform, used at micp_localization.cpp:952).

    Degenerate statistics (n_meas == 0, or a zero covariance) yield the
    identity transform so empty sensors never move the pose."""
    R = kabsch_rotation(stats.covariance)
    t = stats.model_mean - jnp.einsum("...ij,...j->...i", R, stats.dataset_mean)
    valid = stats.n_meas > 0.0
    q = Quaternion.from_matrix(R)
    ident = Quaternion.identity(q.shape[:-1], q.dtype)
    return Transform(
        rot=jnp.where(valid[..., None], q, ident),
        trans=jnp.where(valid[..., None], t, jnp.zeros_like(t)),
    )


def markley_mean(quats: Array, weights: Array) -> Array:
    """Weighted quaternion average (Markley et al. 2007): the principal
    eigenvector of M = Σ w_i q_i q_i^T.

    Replaces rmagine ``markley_mean`` (reference rmcl_localization.cpp:703).
    quats: (N, 4) wxyz; weights: (N,). Returns (4,) unit quaternion.
    All-zero weights fall back to the unweighted mean (a zero matrix would
    otherwise make eigh return e3 = a 180-degree rotation)."""
    w_sum = jnp.sum(weights)
    w = jnp.where(
        w_sum > 0.0,
        weights / jnp.maximum(w_sum, 1e-12),
        1.0 / weights.shape[0],
    )
    M = jnp.einsum("n,ni,nj->ij", w, quats, quats)
    _, vecs = jnp.linalg.eigh(M)  # ascending eigenvalues
    q = vecs[..., -1]
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def weighted_pose_mean(poses: Transform, weights: Array) -> Transform:
    """Weighted mean pose: arithmetic mean translation + Markley mean rotation
    (reference estimateStats, rmcl_localization.cpp:642-731). All-zero
    weights fall back to the unweighted mean (see markley_mean)."""
    w_sum = jnp.sum(weights)
    w = jnp.where(
        w_sum > 0.0,
        weights / jnp.maximum(w_sum, 1e-12),
        1.0 / weights.shape[0],
    )
    t_mean = jnp.einsum("n,ni->i", w, poses.trans)
    q_mean = markley_mean(poses.rot, weights)
    return Transform(rot=q_mean, trans=t_mean)


def pose_covariance_6x6(
    poses: Transform, mean: Transform, weights: Array
) -> Array:
    """Weighted 6x6 covariance of pose deviations [Δt, Δrotvec] about
    ``mean`` (reference rmcl_localization.cpp:716). The rotation deviation is
    the log-map of q_mean⁻¹ ∘ q (right-invariant error)."""
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    dt = poses.trans - mean.trans
    dq = Quaternion.mul(Quaternion.conj(mean.rot), poses.rot)
    drot = Quaternion.log(dq)
    err = jnp.concatenate([dt, drot], axis=-1)  # (N, 6)
    return jnp.einsum("n,ni,nj->ij", w, err, err)


def sample_pose_gaussian(
    key: Array,
    mean: Transform,
    covariance6: Array,
    n: int,
    jitter: float = 1e-9,
) -> Transform:
    """Sample n poses ~ N(mean, covariance6) in the [t, rotvec] tangent space
    via Cholesky deformation of standard normals (reference initSamples,
    rmcl_localization.cpp:186-256: ``L = chol(C)``, ``x ~ N(0,I)``, ``Lx``)."""
    L = jnp.linalg.cholesky(covariance6 + jitter * jnp.eye(6, dtype=covariance6.dtype))
    x = jax.random.normal(key, (n, 6), dtype=covariance6.dtype)
    d = x @ L.T  # (n, 6)
    dq = Quaternion.exp(d[:, 3:])
    return Transform(
        rot=Quaternion.mul(jnp.broadcast_to(mean.rot, (n, 4)), dq),
        trans=mean.trans + d[:, :3],
    )


def sample_pose_uniform(
    key: Array,
    lo: Array,
    hi: Array,
    n: int,
) -> Transform:
    """Uniform box sampling in (x,y,z,roll,pitch,yaw) — global localization
    init (reference initSamplesUniform, rmcl_localization.cpp:277-342)."""
    u = jax.random.uniform(key, (n, 6), minval=jnp.asarray(lo), maxval=jnp.asarray(hi))
    return Transform.from_xyz_euler(u[:, :3], u[:, 3:])


def gaussian_pdf(x: Array, sigma: Array, mean: Optional[Array] = None) -> Array:
    """1-D normal density N(x; mean, sigma²) — the per-beam likelihood eval
    (reference PCDSensorUpdaterEmbree.cpp:224)."""
    if mean is not None:
        x = x - mean
    inv_s = 1.0 / jnp.maximum(sigma, 1e-12)
    z = x * inv_s
    return 0.3989422804014327 * inv_s * jnp.exp(-0.5 * z * z)
