"""Two-level instancing (TLAS) tests: parity vs the flattened scene path,
pose overrides, differentiability w.r.t. instance poses, closest points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.geom.mesh import make_box, make_sphere
from rmcl_tpu.geom.scene import SceneGraph
from rmcl_tpu.geom.tlas import build_tlas, cast_rays_tlas, closest_points_tlas
from rmcl_tpu.math.se3 import Quaternion, Transform
from rmcl_tpu.ops.closest_point import closest_points
from rmcl_tpu.ops.raycast_binned import cast_rays_binned


def mixed_scene():
    sg = SceneGraph()
    sg.add_geometry("box", make_box((1.0, 1.0, 1.0)))
    sg.add_geometry("ball", make_sphere(24, 24, radius=1.0))
    sg.add_instance("box", Transform.from_pose_tuple(jnp.asarray([4.0, 0, 0, 0, 0, 0.3])))
    sg.add_instance("box", Transform.from_pose_tuple(jnp.asarray([-4.0, 1.0, 0, 0, 0, 0])), scale=2.0)
    sg.add_instance("ball", Transform.from_pose_tuple(jnp.asarray([0.0, 5.0, 0.5, 0, 0, 0])))
    return sg


def fan_rays(n=256, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_tlas_matches_flattened_scene():
    sg = mixed_scene()
    accel = sg.build(bin_size=16, bins_per_super=8)
    tlas = build_tlas(sg, bin_size=16, bins_per_super=8)
    o, d = fan_rays()

    hf = cast_rays_binned(accel.bins, o, d, block_size=32)
    ht = cast_rays_tlas(tlas, o, d, block_size=32)

    np.testing.assert_array_equal(np.asarray(hf.hit), np.asarray(ht.hit))
    m = np.asarray(hf.hit)
    np.testing.assert_allclose(
        np.asarray(hf.t)[m], np.asarray(ht.t)[m], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(hf.inst_id)[m], np.asarray(ht.inst_id)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(hf.prim_id)[m], np.asarray(ht.prim_id)[m]
    )
    # world-frame normals agree (flattened bakes them; TLAS rotates local)
    np.testing.assert_allclose(
        np.asarray(hf.normal)[m], np.asarray(ht.normal)[m], atol=1e-4
    )


def test_tlas_pose_override_moves_instance():
    sg = mixed_scene()
    tlas = build_tlas(sg, bin_size=16, bins_per_super=8)
    o = jnp.zeros((8, 3))
    d = jnp.asarray([[1.0, 0, 0]] * 8)
    h0 = cast_rays_tlas(tlas, o, d, block_size=32)
    # box center x=4, yaw 0.3: front face plane at t = 4 - 0.5/cos(0.3)
    np.testing.assert_allclose(
        np.asarray(h0.t)[0], 4.0 - 0.5 / np.cos(0.3), atol=1e-4
    )

    # move instance 0 one meter farther along +x via the override (no rebuild)
    poses = Transform(
        rot=tlas.poses.rot,
        trans=tlas.poses.trans.at[0, 0].add(1.0),
    )
    h1 = cast_rays_tlas(tlas, o, d, poses=poses, block_size=32)
    np.testing.assert_allclose(
        np.asarray(h1.t)[0], np.asarray(h0.t)[0] + 1.0, atol=1e-4
    )


@pytest.mark.slow
def test_tlas_differentiable_wrt_instance_pose():
    sg = mixed_scene()
    tlas = build_tlas(sg, bin_size=16, bins_per_super=8)
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[1.0, 0, 0]] * 4)

    def mean_range(tx):
        poses = Transform(
            rot=tlas.poses.rot, trans=tlas.poses.trans.at[0, 0].add(tx)
        )
        h = cast_rays_tlas(tlas, o, d, poses=poses, block_size=32)
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    g = jax.grad(mean_range)(jnp.float32(0.0))
    # moving the box +x increases all 4 ranges 1:1
    np.testing.assert_allclose(float(g), 4.0, atol=1e-3)
    # finite difference cross-check
    eps = 1e-3
    fd = (mean_range(jnp.float32(eps)) - mean_range(jnp.float32(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-2)


def test_tlas_closest_points_matches_flattened():
    sg = mixed_scene()
    accel = sg.build(bin_size=16, bins_per_super=8)
    tlas = build_tlas(sg, bin_size=16, bins_per_super=8)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-6, 6, size=(128, 3)).astype(np.float32))

    cf = closest_points(accel.bvh, q)
    ct, inst = closest_points_tlas(tlas, q)

    np.testing.assert_array_equal(np.asarray(cf.found), np.asarray(ct.found))
    m = np.asarray(cf.found)
    np.testing.assert_allclose(
        np.asarray(cf.dist)[m], np.asarray(ct.dist)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cf.point)[m], np.asarray(ct.point)[m], atol=1e-4
    )
    # scaled-instance distances are world-metric
    q2 = jnp.asarray([[-4.0, 1.0, 3.0]])  # 2m above the scaled box top (z=1)
    c2, i2 = closest_points_tlas(tlas, q2)
    np.testing.assert_allclose(np.asarray(c2.dist)[0], 2.0, atol=1e-5)
    assert int(np.asarray(i2)[0]) == 1


def test_tlas_chained_tmax_semantics():
    """The chained t_max seeding must not lose hits: an instance evaluated
    FIRST that is actually farther must be replaced by a later closer one."""
    sg = SceneGraph()
    sg.add_geometry("box", make_box((1.0, 1.0, 1.0)))
    # instance 0 is FAR, instance 1 is NEAR — order forces replacement
    sg.add_instance("box", Transform.from_pose_tuple(jnp.asarray([8.0, 0, 0, 0, 0, 0])))
    sg.add_instance("box", Transform.from_pose_tuple(jnp.asarray([2.0, 0, 0, 0, 0, 0])))
    tlas = build_tlas(sg, bin_size=8, bins_per_super=4)
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[1.0, 0, 0]] * 4)
    h = cast_rays_tlas(tlas, o, d, block_size=32)
    np.testing.assert_allclose(np.asarray(h.t), 1.5, atol=1e-5)
    assert (np.asarray(h.inst_id) == 1).all()
