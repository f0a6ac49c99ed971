"""Streaming statistics monoids: Gaussian1D and CrossStatistics.

These are the two accumulators the whole reference stack is built on
(SURVEY.md §2.9):

* ``Gaussian1D`` — per-particle streaming likelihood with Kalman-style merge
  ``likelihood += {mean: eval, sigma: 0, n_meas: 1}``
  (reference rmcl_ros/src/rmcl/PCDSensorUpdaterEmbree.cpp:224-240,
  ParticleAttributes.hpp:18-34). ``n_meas`` acts as confidence and is clamped
  to ``MAX_N_MEAS`` (ParticleAttributes.hpp:24).

* ``CrossStatistics`` — point-set cross-covariance accumulator feeding the
  Umeyama solve, with ``+=`` merge across sensors and a frame transform
  ``T * stats`` (reference micp_localization.cpp:912-937,
  MICPSensor.hpp:179-183).

Both merges are **commutative**; they are associative EXCEPT for
``Gaussian1D``'s ``MAX_N_MEAS`` clamp once totals exceed the cap (matching
the reference's sequential per-sample clamp). For reduction-order-stable
``psum``/tree reductions, merge partials UNclamped (``max_n=jnp.inf``) and
clamp once at the end — the pattern ``mcl.sensor_update`` uses.
``sigma`` follows the rmagine convention of being a *variance*.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from rmcl_tpu.math.se3 import Quaternion, Transform

Array = jax.Array

# Confidence cap — reference rmcl_ros/include/rmcl_ros/rmcl/ParticleAttributes.hpp:24
MAX_N_MEAS = 10_000.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Gaussian1D:
    """Running 1-D Gaussian (mean, variance, effective sample count)."""

    mean: Array
    sigma: Array  # variance
    n_meas: Array  # float — forget factors scale it continuously

    @staticmethod
    def empty(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "Gaussian1D":
        z = jnp.zeros(batch_shape, dtype)
        return Gaussian1D(mean=z, sigma=z, n_meas=z)

    @staticmethod
    def of(mean, sigma=0.0, n_meas=1.0) -> "Gaussian1D":
        mean = jnp.asarray(mean, jnp.float32)
        return Gaussian1D(
            mean=mean,
            sigma=jnp.broadcast_to(jnp.asarray(sigma, mean.dtype), mean.shape),
            n_meas=jnp.broadcast_to(jnp.asarray(n_meas, mean.dtype), mean.shape),
        )

    def merge(self, other: "Gaussian1D", max_n: float = MAX_N_MEAS) -> "Gaussian1D":
        """Weighted parallel merge; clamps total confidence to ``max_n``.

        Matches the fold semantics used in the particle sensor update
        (PCDSensorUpdaterEmbree.cpp:230-240, BeamEvaluateProgram.cu:60-71).
        """
        n = self.n_meas + other.n_meas
        safe_n = jnp.maximum(n, 1e-12)
        mean = (self.n_meas * self.mean + other.n_meas * other.mean) / safe_n
        d1 = self.mean - mean
        d2 = other.mean - mean
        sigma = (
            self.n_meas * (self.sigma + d1 * d1)
            + other.n_meas * (other.sigma + d2 * d2)
        ) / safe_n
        empty = n <= 0.0
        return Gaussian1D(
            mean=jnp.where(empty, 0.0, mean),
            sigma=jnp.where(empty, 0.0, sigma),
            n_meas=jnp.minimum(n, max_n),
        )

    def __add__(self, other: "Gaussian1D") -> "Gaussian1D":
        return self.merge(other)

    def forget(self, factor: Array) -> "Gaussian1D":
        """Scale confidence down by (1 - factor) — the motion-update forget
        (reference TFMotionUpdaterCPU.cpp:176-178)."""
        return Gaussian1D(
            mean=self.mean, sigma=self.sigma, n_meas=self.n_meas * (1.0 - factor)
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CrossStatistics:
    """Cross-covariance statistics between a dataset and a model point set.

    ``covariance[i, j] = E[(model_i - model_mean_i) (dataset_j - dataset_mean_j)]``
    so that for model = R·dataset + t the covariance is R·Cov(dataset) and the
    Umeyama SVD recovers R directly (see :func:`rmcl_tpu.math.stats.umeyama_transform`).
    """

    dataset_mean: Array  # (..., 3)
    model_mean: Array  # (..., 3)
    covariance: Array  # (..., 3, 3)
    n_meas: Array  # (...,) float

    @staticmethod
    def empty(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "CrossStatistics":
        return CrossStatistics(
            dataset_mean=jnp.zeros(batch_shape + (3,), dtype),
            model_mean=jnp.zeros(batch_shape + (3,), dtype),
            covariance=jnp.zeros(batch_shape + (3, 3), dtype),
            n_meas=jnp.zeros(batch_shape, dtype),
        )

    @staticmethod
    def from_masked_points(
        dataset: Array, model: Array, mask: Array
    ) -> "CrossStatistics":
        """Reduce (N, 3) point pairs with an (N,) validity mask into one
        CrossStatistics. This is the core of ``rm::statistics_p2x``
        (reference CorrespondencesCPU.cpp:26-30)."""
        w = mask.astype(dataset.dtype)
        n = jnp.sum(w, axis=-1)
        safe_n = jnp.maximum(n, 1.0)
        d_mean = jnp.sum(dataset * w[..., None], axis=-2) / safe_n[..., None]
        m_mean = jnp.sum(model * w[..., None], axis=-2) / safe_n[..., None]
        dc = (dataset - d_mean[..., None, :]) * w[..., None]
        mc = model - m_mean[..., None, :]
        # covariance = (1/n) Σ m_c ⊗ d_c  — MXU-friendly as a matmul.
        # HIGHEST precision: the 3x3 reduction feeds the Umeyama SVD and the
        # default TPU matmul precision (bf16 passes) visibly degrades poses.
        cov = jnp.einsum(
            "...ni,...nj->...ij", mc, dc, precision=jax.lax.Precision.HIGHEST
        ) / safe_n[..., None, None]
        empty = n <= 0.0
        zero3 = jnp.zeros_like(d_mean)
        return CrossStatistics(
            dataset_mean=jnp.where(empty[..., None], zero3, d_mean),
            model_mean=jnp.where(empty[..., None], zero3, m_mean),
            covariance=jnp.where(empty[..., None, None], 0.0, cov),
            n_meas=n,
        )

    def merge(self, other: "CrossStatistics") -> "CrossStatistics":
        """Parallel merge — the ``Cmerged += Cs`` monoid
        (reference micp_localization.cpp:936-937)."""
        n = self.n_meas + other.n_meas
        safe_n = jnp.maximum(n, 1e-12)
        w1 = (self.n_meas / safe_n)[..., None]
        w2 = (other.n_meas / safe_n)[..., None]
        d_mean = w1 * self.dataset_mean + w2 * other.dataset_mean
        m_mean = w1 * self.model_mean + w2 * other.model_mean
        dd1 = self.dataset_mean - d_mean
        dm1 = self.model_mean - m_mean
        dd2 = other.dataset_mean - d_mean
        dm2 = other.model_mean - m_mean
        cov = w1[..., None] * (
            self.covariance + dm1[..., :, None] * dd1[..., None, :]
        ) + w2[..., None] * (
            other.covariance + dm2[..., :, None] * dd2[..., None, :]
        )
        empty = n <= 0.0
        zero3 = jnp.zeros_like(d_mean)
        return CrossStatistics(
            dataset_mean=jnp.where(empty[..., None], zero3, d_mean),
            model_mean=jnp.where(empty[..., None], zero3, m_mean),
            covariance=jnp.where(empty[..., None, None], 0.0, cov),
            n_meas=n,
        )

    def __add__(self, other: "CrossStatistics") -> "CrossStatistics":
        return self.merge(other)

    def transform(self, T: Transform) -> "CrossStatistics":
        """Frame change ``T * stats`` — lift statistics from sensor to base
        frame (reference MICPSensor.hpp:179-183)."""
        R = Quaternion.to_matrix(T.rot)
        # HIGHEST precision: this covariance feeds the Umeyama SVD, where
        # default TPU matmul precision visibly degrades poses (see
        # from_masked_points)
        cov = jnp.einsum(
            "...ik,...kl,...jl->...ij", R, self.covariance, R,
            precision=jax.lax.Precision.HIGHEST,
        )
        return CrossStatistics(
            dataset_mean=T.apply(self.dataset_mean),
            model_mean=T.apply(self.model_mean),
            covariance=cov,
            n_meas=self.n_meas,
        )

    def scale_weight(self, w: Array) -> "CrossStatistics":
        """Multiply the effective sample count — per-sensor
        ``merge_weight_multiplier`` (reference MICPSensor.cpp:55-58,
        micp_localization.cpp:931-937)."""
        return CrossStatistics(
            dataset_mean=self.dataset_mean,
            model_mean=self.model_mean,
            covariance=self.covariance,
            n_meas=self.n_meas * w,
        )
