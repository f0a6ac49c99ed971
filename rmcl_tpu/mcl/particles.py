"""Particle cloud state for RMCL global Monte-Carlo localization.

TPU-native redesign of the reference's particle buffers
(reference rmcl_ros/include/rmcl_ros/nodes/rmcl_localization.hpp:83-297,
ParticleAttributes.hpp:18-34): pose + attributes as one SoA pytree of device
arrays. The reference's double-buffering (two CPU + two GPU clouds with
explicit migration — rmcl_localization.cpp:113-139, prepareMemory :396-430)
collapses to donated jit arguments on a single device space; the
``data_location`` machinery disappears by design.

The particle count is a *static* array size; the reference's dynamic
``n_particles`` (residual resampler shrinks/grows the cloud —
rmcl_localization.cpp:633-639) maps to an explicit ``alive`` mask +
``n_alive`` count so every kernel stays fixed-shape for XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from rmcl_tpu.math.gaussian import Gaussian1D
from rmcl_tpu.math.se3 import Transform

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleCloud:
    """SoA particle state.

    poses:      Transform with batch (N,) — particle base→map hypotheses
    likelihood: Gaussian1D with batch (N,) — streaming 1-D range likelihood
                (mean = running likelihood, n_meas = confidence; reference
                ParticleAttributes.hpp:18-34)
    state_sigma: (N, 6) per-axis pose uncertainty accumulators
                (reference Matrix6x1 state_sigma)
    alive:      (N,) bool — particle participates (static-shape stand-in for
                the reference's dynamic n_particles)
    """

    poses: Transform
    likelihood: Gaussian1D
    state_sigma: Array
    alive: Array

    @property
    def capacity(self) -> int:
        return int(self.alive.shape[0])

    @property
    def n_alive(self) -> Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    @staticmethod
    def create(n: int, seed_likelihood: float = 1.0) -> "ParticleCloud":
        """Fresh cloud at identity poses. The likelihood mean is seeded to
        1.0 like the reference's init (rmcl_localization.cpp:231-256)."""
        return ParticleCloud(
            poses=Transform.identity((n,)),
            likelihood=Gaussian1D(
                mean=jnp.full((n,), seed_likelihood, jnp.float32),
                sigma=jnp.zeros((n,), jnp.float32),
                n_meas=jnp.zeros((n,), jnp.float32),
            ),
            state_sigma=jnp.zeros((n, 6), jnp.float32),
            alive=jnp.ones((n,), bool),
        )

    def with_poses(self, poses: Transform) -> "ParticleCloud":
        return dataclasses.replace(self, poses=poses)

    def weights(self) -> Array:
        """Normalized resampling weights from likelihood means (dead
        particles get zero weight)."""
        w = jnp.where(self.alive, jnp.maximum(self.likelihood.mean, 0.0), 0.0)
        return w / jnp.maximum(jnp.sum(w), 1e-30)
