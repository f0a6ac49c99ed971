"""Spatially partitioned scene casting over a device mesh (parity vs the
replicated single-map cast; 8 virtual CPU devices from conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_room_scene, make_sphere
from rmcl_tpu.ops.raycast_binned import cast_rays_binned
from rmcl_tpu.parallel.scene_shard import (
    SCENE_AXIS,
    cast_rays_scene_sharded,
    partition_bins,
    put_scene_sharded,
)


def rays_in_room(n=1024, seed=3):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    o[:, 2] = np.abs(o[:, 2]) * 0.4 + 0.2
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("mesh_shape", [(8,), (2, 4)])
def test_scene_sharded_matches_replicated(mesh_shape):
    room = make_room_scene(n_pillars=6)
    bins = build_bins(room, bin_size=16, bins_per_super=8)
    o, d = rays_in_room()

    if len(mesh_shape) == 1:
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), (SCENE_AXIS,))
        n_scene = 8
    else:
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("rays", SCENE_AXIS))
        n_scene = 4

    sbins = put_scene_sharded(partition_bins(bins, n_scene), mesh)
    href = cast_rays_binned(bins, o, d, block_size=64)
    hs = cast_rays_scene_sharded(sbins, o, d, mesh, block_size=64)

    np.testing.assert_array_equal(np.asarray(href.hit), np.asarray(hs.hit))
    m = np.asarray(href.hit)
    np.testing.assert_allclose(
        np.asarray(href.t)[m], np.asarray(hs.t)[m], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(href.prim_id)[m], np.asarray(hs.prim_id)[m]
    )
    np.testing.assert_allclose(
        np.asarray(href.normal)[m], np.asarray(hs.normal)[m], atol=1e-5
    )


def test_partition_bins_covers_everything():
    sphere = make_sphere(40, 40, radius=5.0)
    bins = build_bins(sphere, bin_size=16, bins_per_super=8)
    sb = partition_bins(bins, 4)
    # every real triangle lands in exactly one shard (count by nonzero e1)
    total = int(
        np.sum(np.abs(np.asarray(sb.tri[:, :, 3:6])).max(axis=2) > 0)
    )
    assert total == sphere.n_faces
    # sentinel padding never passes a slab test: min > max
    pad_mask = np.asarray(sb.bin_aabb[..., 0]) > np.asarray(sb.bin_aabb[..., 3])
    real = np.abs(np.asarray(sb.tri[:, :, 3:6])).max(axis=(2, 3)) > 0
    assert not (pad_mask & real).any()


def test_scene_sharded_miss_semantics():
    sphere = make_sphere(40, 40, radius=2.0)
    bins = build_bins(sphere, bin_size=16, bins_per_super=8)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), (SCENE_AXIS,))
    sbins = put_scene_sharded(partition_bins(bins, 8), mesh)
    # rays from outside pointing away: all miss
    o = jnp.full((64, 3), 10.0)
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (64, 3))
    h = cast_rays_scene_sharded(sbins, o, d, mesh, block_size=64)
    assert not bool(np.asarray(h.hit).any())
    assert (np.asarray(h.prim_id) == -1).all()
    assert (np.asarray(h.t) > 1e30).all()


@pytest.mark.parametrize("mesh_shape", [(8,), (2, 4)])
def test_scene_forwarded_matches_replicated(mesh_shape):
    """Ray forwarding by masking (VERDICT r4 #6): assigned-shard round 1 +
    escalated round 2 must agree with the replicated cast exactly."""
    from rmcl_tpu.parallel.scene_shard import (
        cast_rays_scene_forwarded,
        shard_boxes,
    )

    room = make_room_scene(n_pillars=6)
    bins = build_bins(room, bin_size=16, bins_per_super=8)
    o, d = rays_in_room(seed=11)

    if len(mesh_shape) == 1:
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), (SCENE_AXIS,))
        n_scene = 8
    else:
        mesh = Mesh(
            np.array(jax.devices()[:8]).reshape(2, 4), ("rays", SCENE_AXIS)
        )
        n_scene = 4

    sb = partition_bins(bins, n_scene)
    boxes = shard_boxes(sb)
    sbins = put_scene_sharded(sb, mesh)
    href = cast_rays_binned(bins, o, d, block_size=64)
    hs = cast_rays_scene_forwarded(
        sbins, o, d, mesh, boxes, block_size=64
    )

    np.testing.assert_array_equal(np.asarray(href.hit), np.asarray(hs.hit))
    m = np.asarray(href.hit)
    np.testing.assert_allclose(
        np.asarray(href.t)[m], np.asarray(hs.t)[m], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(href.prim_id)[m], np.asarray(hs.prim_id)[m]
    )
    np.testing.assert_allclose(
        np.asarray(href.normal)[m], np.asarray(hs.normal)[m], atol=1e-5
    )


def test_scene_forwarded_miss_and_outside_rays():
    from rmcl_tpu.parallel.scene_shard import (
        cast_rays_scene_forwarded,
        shard_boxes,
    )

    sphere = make_sphere(40, 40, radius=2.0)
    bins = build_bins(sphere, bin_size=16, bins_per_super=8)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), (SCENE_AXIS,))
    sb = partition_bins(bins, 8)
    sbins = put_scene_sharded(sb, mesh)
    boxes = shard_boxes(sb)
    o = jnp.full((64, 3), 10.0)
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (64, 3))
    h = cast_rays_scene_forwarded(sbins, o, d, mesh, boxes, block_size=64)
    assert not bool(np.asarray(h.hit).any())
    # rays from outside AIMED AT the sphere (crossing several shard
    # boxes): forwarding + escalation must still find the first surface
    o2 = jnp.asarray(
        np.stack([np.full(64, -8.0), np.linspace(-1.5, 1.5, 64),
                  np.zeros(64)], -1), jnp.float32)
    d2 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (64, 3))
    href = cast_rays_binned(bins, o2, d2, block_size=64)
    hf = cast_rays_scene_forwarded(sbins, o2, d2, mesh, boxes, block_size=64)
    np.testing.assert_array_equal(np.asarray(href.hit), np.asarray(hf.hit))
    m = np.asarray(href.hit)
    np.testing.assert_allclose(
        np.asarray(href.t)[m], np.asarray(hf.t)[m], rtol=1e-5, atol=1e-5
    )
