"""Fully differentiable range queries — gradients w.r.t. MESH VERTICES.

The ray engines re-derive the hit distance from the winning triangle's
plane equation, which makes ranges differentiable w.r.t. ray origins,
directions and (through ``geom.tlas``) instance poses — but the plane
coefficients live in baked acceleration-structure buffers built on the
host, so gradients cannot reach the original vertex array.

:func:`cast_rays_diff` closes that last gap (SURVEY.md §7.3: "gradient of
hit distance w.r.t. ray origin/dir and mesh vertices"): the *discrete*
winner (prim_id) comes from a regular non-differentiable cast against any
engine's structure, then the hit is recomputed from the differentiable
``vertices`` array:

    n  = normalize((v1 - v0) x (v2 - v0))
    t  = (n . v0 - n . o) / (n . d)

identical in value to the engine's own plane rederivation, with exact
gradients flowing to ``vertices``, ``orig`` and ``dirs``. The winner
choice is frozen (like every engine path) — correct wherever the hit
topology is locally stable, i.e. away from silhouette edges.

Use cases: mesh refinement from range residuals (vertex-level scene
optimization — a strict superset of the reference, which has no gradients
at all), sensor-pose calibration, map deformation fitting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rmcl_tpu.ops.raycast import NO_HIT_T, RayHits, cast_rays
from rmcl_tpu.bvh.bins import TriangleBins

Array = jax.Array


@partial(jax.jit, static_argnames=("flip_normals",))
def recompute_hits_from_vertices(
    prim_id: Array,
    hit: Array,
    vertices: Array,  # (V, 3) — DIFFERENTIABLE
    faces: Array,  # (F, 3) int32
    orig: Array,
    dirs: Array,
    flip_normals: bool = True,
) -> RayHits:
    """Re-derive (t, point, normal) for known winners from ``vertices``."""
    batch_shape = prim_id.shape
    o = jnp.broadcast_to(jnp.asarray(orig, jnp.float32), batch_shape + (3,))
    d = jnp.broadcast_to(jnp.asarray(dirs, jnp.float32), batch_shape + (3,))

    safe = jnp.where(hit, prim_id, 0)
    tri = jnp.take(jnp.asarray(faces, jnp.int32), safe, axis=0)  # (..., 3)
    v0 = jnp.take(vertices, tri[..., 0], axis=0)
    v1 = jnp.take(vertices, tri[..., 1], axis=0)
    v2 = jnp.take(vertices, tri[..., 2], axis=0)

    n = jnp.cross(v1 - v0, v2 - v0)
    n = n * jax.lax.rsqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True), 1e-30))
    denom = jnp.sum(n * d, axis=-1)
    safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t = jnp.sum(n * (v0 - o), axis=-1) / safe_denom

    point = jnp.where(hit[..., None], o + t[..., None] * d, 0.0)
    if flip_normals:
        n = n * jnp.where(denom > 0, -1.0, 1.0)[..., None]
    return RayHits(
        t=jnp.where(hit, t, NO_HIT_T),
        hit=hit,
        prim_id=prim_id,
        inst_id=jnp.where(hit, 0, -1).astype(jnp.int32),
        point=point,
        normal=jnp.where(hit[..., None], n, 0.0),
    )


def cast_rays_diff(
    struct,
    vertices: Array,
    faces: Array,
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = NO_HIT_T,
    flip_normals: bool = True,
    **engine_kw,
) -> RayHits:
    """Closest-hit query differentiable w.r.t. ``vertices`` (and rays).

    ``struct`` is any acceleration structure built from (vertices, faces)
    — a ``BVH`` or ``TriangleBins``; it selects the engine exactly like
    :func:`sensors.simulate.simulate`. The structure itself must be
    consistent with the vertex array up to small perturbations (rebuild it
    when vertices move materially — the winner lookup uses the baked
    geometry, the value/gradient use the live one)."""
    if isinstance(struct, TriangleBins):
        from rmcl_tpu.ops.raycast_binned import cast_rays_binned

        base = cast_rays_binned(
            struct, orig, dirs, t_min=t_min, t_max=t_max,
            flip_normals=flip_normals, **engine_kw,
        )
    else:
        base = cast_rays(
            struct, orig, dirs, t_min=t_min, t_max=t_max,
            flip_normals=flip_normals, **engine_kw,
        )
    prim = jax.lax.stop_gradient(base.prim_id)
    hit = jax.lax.stop_gradient(base.hit)
    return recompute_hits_from_vertices(
        prim, hit, vertices, faces, orig, dirs, flip_normals=flip_normals
    )
