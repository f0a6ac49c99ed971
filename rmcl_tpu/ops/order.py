"""Device-side coherence orderings for ray workloads.

The dense binned engine (ops.raycast_binned) wants rays in blocks whose
origins are spatially tight and whose directions form a narrow cone — the
conservative block frustum then passes few candidate bins. Scan grids are
coherent by construction; *particle* workloads are not: resampling shuffles
the cloud, and after a global init the particles are scattered across the
scene with arbitrary headings.

This module provides a jit-traceable Morton(+heading) sort key so callers
can cluster particles per update (the host-side numpy orderings in
``bvh.builder`` / ``raycast_binned.TiledSweep`` only work on concrete
arrays). Mirrors the role of ray sorting in GPU ray tracers; the reference
has no equivalent (its per-particle rays are pointer-chased independently —
PCDSensorUpdaterEmbree.cpp:330-341).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _spread3(x: Array) -> Array:
    """Spread the low 8 bits of ``x`` so consecutive bits land 3 apart
    (classic part1by2, int32 — supports up to 8 bits/axis = 24-bit codes)."""
    x = x & 0xFF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_keys_3d(points: Array, lo: Array, hi: Array, bits: int = 8) -> Array:
    """int32 Morton codes of ``points`` (N, 3) within box [lo, hi].

    ``bits`` <= 8 bits per axis (3*bits-bit codes). Degenerate box axes
    quantize to 0."""
    assert bits <= 8
    extent = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(
        ((points - lo) / extent * (1 << bits)).astype(jnp.int32),
        0,
        (1 << bits) - 1,
    )
    shift = 8 - bits  # align to the top of the 8-bit spread window
    return (
        (_spread3(q[:, 0] << shift) << 2)
        | (_spread3(q[:, 1] << shift) << 1)
        | _spread3(q[:, 2] << shift)
    )


def cluster_order(
    positions: Array,
    headings: Array | None = None,
    pos_bits: int = 7,
    heading_bits: int = 5,
) -> tuple[Array, Array]:
    """(order, inverse) sorting rays/particles into coherent blocks.

    Primary key: Morton code of ``positions`` (origin locality — the block
    origin-box term of the frustum cull). Secondary key: quantized heading
    angle of ``headings`` (N, >=2) projected to the XY plane (direction-cone
    term) — particles in one Morton cell but facing opposite ways would
    otherwise blow the block cone to pass-all.

    Returns int32 (order, inv): apply ``x[order]``; undo with ``y[inv]``.
    """
    n = positions.shape[0]
    lo = jnp.min(positions, axis=0)
    hi = jnp.max(positions, axis=0)
    key = morton_keys_3d(positions, lo, hi, bits=pos_bits)
    if headings is not None and heading_bits > 0:
        hb = 1 << heading_bits
        ang = jnp.arctan2(headings[:, 1], headings[:, 0])  # [-pi, pi]
        bucket = jnp.clip(
            ((ang + jnp.pi) * (hb / (2.0 * jnp.pi))).astype(jnp.int32), 0, hb - 1
        )
        key = (key << heading_bits) | bucket
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = (
        jnp.zeros(n, jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    return order, inv
