"""Sharded differentiable range queries — the backward-path clause of the
north star (BASELINE.json: "pose-gradient all-reduce overlapped with the
backward traversal").

Forward: rays sharded over the mesh's ``rays`` axis (P1 of SURVEY §2.10),
each device casting its local rays through :func:`ops.diff.cast_rays_diff`
(winner from the dense engine, hit re-derived differentiably from the
vertex array). Backward: each device's pose/vertex cotangent contribution
is computed locally by jax autodiff, then merged with ONE packed psum —
loss and gradient ride the same all-reduce (the packed-collective
discipline of ``sharded_correct_once``; count pinned by
tests/test_sharding.py::test_sharded_backward_collective_budget).

The structures (bins, vertices, faces) are replicated; only rays and
their pose assignment are sharded.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rmcl_tpu.bvh.bins import TriangleBins
from rmcl_tpu.ops.diff import cast_rays_diff
from rmcl_tpu.parallel.mesh import RAY_AXIS

Array = jax.Array


def _local_loss(bins, verts, faces, trans, dirs, pose_id, kw):
    """Sum of hit ranges over THIS shard's rays (pre-psum partial)."""
    o = jnp.take(trans, pose_id, axis=0)  # (r, 3)
    h = cast_rays_diff(bins, verts, faces, o, dirs, **kw)
    return jnp.sum(jnp.where(h.hit, h.t, 0.0))


@partial(jax.jit, static_argnames=("mesh", "wrt", "kw_tuple"))
def _svg(bins, verts, faces, trans, dirs, pose_id, mesh, wrt, kw_tuple):
    kw = dict(kw_tuple)

    def local(bins, verts, faces, trans, dirs, pose_id):
        argnum = 3 if wrt == "pose" else 1
        loss_p, grad_p = jax.value_and_grad(
            lambda *a: _local_loss(*a, kw), argnums=argnum
        )(bins, verts, faces, trans, dirs, pose_id)
        # ONE packed all-reduce: [loss, grad...] — the gradient rides the
        # loss's psum instead of adding a second rendezvous
        packed = jnp.concatenate(
            [loss_p[None], grad_p.reshape(-1)], axis=0
        )
        packed = jax.lax.psum(packed, RAY_AXIS)
        return packed[0], packed[1:].reshape(grad_p.shape)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return f(bins, verts, faces, trans, dirs, pose_id)


def sharded_range_value_and_grad(
    bins: TriangleBins,
    verts: Array,  # (V, 3) replicated, differentiable for wrt="verts"
    faces: Array,  # (F, 3) int32 replicated
    trans: Array,  # (Np, 3) pose translations, replicated
    dirs: Array,  # (R, 3) ray dirs, sharded over rays
    pose_id: Array,  # (R,) int32 ray -> pose row, sharded over rays
    mesh: Mesh,
    wrt: str = "pose",
    **cast_kw,
) -> Tuple[Array, Array]:
    """loss = Σ_rays hit-range; returns (loss, grad) with grad w.r.t. the
    replicated pose translations (``wrt="pose"``, (Np, 3)) or the
    replicated vertex array (``wrt="verts"``, (V, 3)).

    ``dirs``/``pose_id`` must be device_put with the rays sharding
    (:func:`rmcl_tpu.parallel.mesh.shard_rays`); R must divide evenly.
    Exactly ONE all-reduce per evaluation (loss packed with the
    gradient)."""
    assert wrt in ("pose", "verts")
    kw_tuple = tuple(sorted(cast_kw.items()))
    return _svg(bins, verts, faces, trans, dirs, pose_id, mesh, wrt,
                kw_tuple)
