"""Scene graph tests: instancing, ids, differentiable pose refinement."""

import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.geom.mesh import make_box, make_sphere
from rmcl_tpu.geom.scene import SceneGraph, refine_instance_pose
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.ops.raycast import cast_rays
from rmcl_tpu.ops.raycast_binned import cast_rays_binned


def two_box_scene():
    sg = SceneGraph()
    sg.add_geometry("box", make_box((1.0, 1.0, 1.0)))
    sg.add_instance("box", Transform.from_pose_tuple(jnp.asarray([3.0, 0, 0, 0, 0, 0])), name="a")
    sg.add_instance("box", Transform.from_pose_tuple(jnp.asarray([-3.0, 0, 0, 0, 0, 0.4])), name="b")
    return sg


def test_scene_flatten_and_ids():
    sg = two_box_scene()
    accel = sg.build(bin_size=8, bins_per_super=4)
    assert accel.world_mesh.n_faces == 24
    o = jnp.asarray([[0.0, 0, 0], [0.0, 0, 0]])
    d = jnp.asarray([[1.0, 0, 0], [-1.0, 0, 0]])
    h = cast_rays(accel.bvh, o, d)
    assert list(np.asarray(h.inst_id)) == [0, 1]
    np.testing.assert_allclose(np.asarray(h.t)[0], 2.5, atol=1e-5)
    # prim ids refer to the GEOMETRY's faces (< 12)
    assert (np.asarray(h.prim_id) < 12).all()
    # binned engine agrees
    hb = cast_rays_binned(accel.bins, o, d, block_size=32)
    assert list(np.asarray(hb.inst_id)) == [0, 1]


def test_scene_instance_scale():
    sg = SceneGraph()
    sg.add_geometry("s", make_sphere(24, 24, radius=1.0))
    sg.add_instance("s", Transform.identity(), scale=2.0)
    accel = sg.build(bin_size=16, bins_per_super=8)
    h = cast_rays(accel.bvh, jnp.zeros((4, 3)), jnp.asarray([[1.0, 0, 0]] * 4))
    np.testing.assert_allclose(np.asarray(h.t), 2.0, atol=0.02)


@pytest.mark.slow
def test_refine_instance_pose():
    """Shift one instance; gradient refinement should recover the offset.

    Sphere geometry: ranges constrain all translation axes (a flat box face
    would leave tangential offsets unobservable)."""
    sg = SceneGraph()
    sg.add_geometry("ball", make_sphere(32, 32, radius=1.0))
    true_pose = Transform.from_pose_tuple(jnp.asarray([4.0, 0.15, -0.1, 0, 0, 0]))
    est_pose = Transform.from_pose_tuple(jnp.asarray([4.0, 0.0, 0.0, 0, 0, 0]))

    # measurements from the TRUE scene
    sg_true = SceneGraph()
    sg_true.add_geometry("ball", sg.geometries["ball"])
    sg_true.add_instance("ball", true_pose)
    accel_true = sg_true.build(bin_size=16, bins_per_super=8)

    n = 256
    rng = np.random.default_rng(0)
    d = np.stack(
        [
            np.ones(n),
            rng.uniform(-0.2, 0.2, n),
            rng.uniform(-0.2, 0.2, n),
        ],
        -1,
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    meas = cast_rays(accel_true.bvh, jnp.asarray(o), jnp.asarray(d))

    sg.add_instance("ball", est_pose)
    accel_est = sg.build(bin_size=16, bins_per_super=8)
    delta, losses = refine_instance_pose(
        accel_est, 0, jnp.asarray(o), jnp.asarray(d), meas.t, steps=10
    )
    assert float(losses[-1]) < float(losses[0]) * 0.1
    # for a sphere the observable is its refined center (rotation is gauge)
    refined = delta @ est_pose
    np.testing.assert_allclose(
        np.asarray(refined.trans), [4.0, 0.15, -0.1], atol=0.02
    )
