"""Property tests for the SE(3) core against numpy/scipy-free oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.math.se3 import EulerAngles, Quaternion, Transform


def random_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def test_quat_mul_matches_matrix(rng):
    a, b = random_quat(rng, (32,)), random_quat(rng, (32,))
    m = Quaternion.to_matrix(Quaternion.mul(a, b))
    m_ref = Quaternion.to_matrix(a) @ Quaternion.to_matrix(b)
    np.testing.assert_allclose(m, m_ref, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, (16,))
    v = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    np.testing.assert_allclose(
        Quaternion.rotate(q, v),
        jnp.einsum("nij,nj->ni", Quaternion.to_matrix(q), v),
        atol=1e-5,
    )


def test_quat_matrix_roundtrip(rng):
    q = random_quat(rng, (64,))
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q2 = Quaternion.from_matrix(Quaternion.to_matrix(q))
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_euler_roundtrip(rng):
    rpy = rng.uniform([-3, -1.4, -3], [3, 1.4, 3], size=(64, 3)).astype(np.float32)
    q = Quaternion.from_euler(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    r, p, y = Quaternion.to_euler(q)
    np.testing.assert_allclose(np.stack([r, p, y], -1), rpy, atol=1e-4)


def test_euler_composition_order():
    # yaw of 90deg maps +x to +y
    q = Quaternion.from_euler(jnp.float32(0), jnp.float32(0), jnp.float32(np.pi / 2))
    v = Quaternion.rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)
    # roll of 90deg maps +y to +z
    q = Quaternion.from_euler(jnp.float32(np.pi / 2), jnp.float32(0), jnp.float32(0))
    v = Quaternion.rotate(q, jnp.asarray([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 0.0, 1.0], atol=1e-6)


def test_log_exp_roundtrip(rng):
    v = rng.normal(size=(32, 3)).astype(np.float32) * 0.8
    v2 = Quaternion.log(Quaternion.exp(jnp.asarray(v)))
    np.testing.assert_allclose(v, v2, atol=1e-5)


def test_transform_compose_inverse(rng):
    a = Transform(rot=random_quat(rng, (8,)), trans=jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)))
    b = Transform(rot=random_quat(rng, (8,)), trans=jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)))
    p = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    # (a @ b)(p) == a(b(p))
    np.testing.assert_allclose((a @ b).apply(p), a.apply(b.apply(p)), atol=1e-5)
    # a⁻¹(a(p)) == p
    np.testing.assert_allclose((~a).apply(a.apply(p)), p, atol=1e-5)
    # matrix path agrees
    m = (a @ b).to_matrix()
    ph = jnp.concatenate([p, jnp.ones((8, 1))], -1)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", m, ph)[:, :3], (a @ b).apply(p), atol=1e-5
    )


def test_transform_pose_tuple():
    t6 = Transform.from_pose_tuple(jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(t6.trans, [1, 2, 3], atol=1e-6)
    v = t6.rotate(jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)
    t7 = Transform.from_pose_tuple(jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0]))
    np.testing.assert_allclose(t7.rot, [1, 0, 0, 0], atol=1e-6)


def test_transform_jit_pytree():
    t = Transform.identity((4,))
    out = jax.jit(lambda tr: (tr @ tr).apply(jnp.zeros((4, 3))))(t)
    assert out.shape == (4, 3)


def test_is_finite():
    t = Transform.identity((2,))
    t = Transform(rot=t.rot.at[0, 0].set(jnp.nan), trans=t.trans)
    assert list(np.asarray(t.is_finite())) == [False, True]
