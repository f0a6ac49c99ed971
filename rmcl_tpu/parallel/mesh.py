"""Device-mesh utilities: the framework's multi-chip scaling substrate.

The reference is single-process/single-node (SURVEY.md §2.10); its
parallelism axes are rays (P1) and particles (P2) via TBB/CUDA. Here the
same two axes shard over a ``jax.sharding.Mesh``: rays and particles split
across chips, the BVH replicated (spatial partitioning is a later stage),
and the statistics monoids (CrossStatistics / GN normal equations /
likelihood sums) merged with ``psum`` over ICI.

Axis convention: one flat data axis named ``"rays"`` (used for particles
too — they are the same kind of embarrassing parallelism). Model-parallel
axes can be added to the mesh later without touching this module.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None, axis: str = RAY_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_rays(mesh: Mesh):
    """Sharding for (N, ...) ray/particle arrays: leading dim split."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def _place(x, sh: NamedSharding):
    """device_put that also works on a multi-PROCESS mesh.

    Multi-process ``jax.device_put`` cross-checks that every process passed
    a bitwise-equal value — with NaN != NaN semantics, so replicating any
    array containing NaN sentinels (BVH node padding) always trips it.
    ``make_array_from_callback`` assembles the global array from local
    slices with no equality round-trip; each process must hold the same
    full-value array (true for deterministic host-side builds)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    h = np.asarray(x)
    return jax.make_array_from_callback(h.shape, sh, lambda idx: h[idx])


def put_sharded(tree, mesh: Mesh):
    """Place a pytree of (N, ...) arrays with the leading dim sharded."""
    sh = shard_rays(mesh)
    return jax.tree.map(lambda x: _place(x, sh), tree)


def put_replicated(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: _place(x, rep), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
