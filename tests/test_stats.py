"""Tests for the statistics monoids and pose-estimation solvers."""

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.math.gaussian import CrossStatistics, Gaussian1D, MAX_N_MEAS
from rmcl_tpu.math.se3 import Quaternion, Transform
from rmcl_tpu.math.stats import (
    gaussian_pdf,
    markley_mean,
    pose_covariance_6x6,
    sample_pose_gaussian,
    sample_pose_uniform,
    umeyama_transform,
    weighted_pose_mean,
)


def rand_transform(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return Transform(rot=jnp.asarray(q), trans=jnp.asarray(rng.normal(size=shape + (3,)).astype(np.float32)))


# --- Gaussian1D -------------------------------------------------------------


def test_gaussian1d_merge_matches_batch(rng):
    xs = rng.normal(size=100).astype(np.float32)
    g = Gaussian1D.empty()
    for x in xs:
        g = g + Gaussian1D.of(x)
    np.testing.assert_allclose(g.mean, xs.mean(), rtol=1e-4)
    np.testing.assert_allclose(g.sigma, xs.var(), rtol=1e-3, atol=1e-5)
    assert float(g.n_meas) == 100


def test_gaussian1d_merge_commutative_associative(rng):
    a = Gaussian1D.of(1.0, 0.5, 10.0)
    b = Gaussian1D.of(-2.0, 2.0, 3.0)
    c = Gaussian1D.of(0.3, 0.1, 7.0)
    ab = a + b
    ba = b + a
    np.testing.assert_allclose(ab.mean, ba.mean, rtol=1e-6)
    np.testing.assert_allclose(ab.sigma, ba.sigma, rtol=1e-6)
    abc1 = (a + b) + c
    abc2 = a + (b + c)
    np.testing.assert_allclose(abc1.mean, abc2.mean, rtol=1e-5)
    np.testing.assert_allclose(abc1.sigma, abc2.sigma, rtol=1e-5)


def test_gaussian1d_nmeas_clamp():
    a = Gaussian1D.of(1.0, 0.0, MAX_N_MEAS)
    b = Gaussian1D.of(1.0, 0.0, 5.0)
    assert float((a + b).n_meas) == MAX_N_MEAS


def test_gaussian1d_empty_merge():
    g = Gaussian1D.empty() + Gaussian1D.of(2.0)
    assert float(g.mean) == 2.0
    assert float(g.n_meas) == 1.0


def test_gaussian1d_forget():
    g = Gaussian1D.of(1.0, 0.2, 100.0).forget(jnp.float32(0.25))
    assert float(g.n_meas) == 75.0
    assert float(g.mean) == 1.0


# --- CrossStatistics --------------------------------------------------------


def test_cross_stats_from_masked_matches_numpy(rng):
    d = rng.normal(size=(200, 3)).astype(np.float32)
    m = rng.normal(size=(200, 3)).astype(np.float32)
    mask = rng.random(200) > 0.4
    st = CrossStatistics.from_masked_points(jnp.asarray(d), jnp.asarray(m), jnp.asarray(mask))
    dv, mv = d[mask], m[mask]
    np.testing.assert_allclose(st.dataset_mean, dv.mean(0), atol=1e-5)
    np.testing.assert_allclose(st.model_mean, mv.mean(0), atol=1e-5)
    cov_ref = (mv - mv.mean(0)).T @ (dv - dv.mean(0)) / mask.sum()
    np.testing.assert_allclose(st.covariance, cov_ref, atol=1e-5)
    assert float(st.n_meas) == mask.sum()


def test_cross_stats_merge_matches_full(rng):
    d = rng.normal(size=(100, 3)).astype(np.float32)
    m = rng.normal(size=(100, 3)).astype(np.float32)
    ones = jnp.ones(50, bool)
    s1 = CrossStatistics.from_masked_points(jnp.asarray(d[:50]), jnp.asarray(m[:50]), ones)
    s2 = CrossStatistics.from_masked_points(jnp.asarray(d[50:]), jnp.asarray(m[50:]), ones)
    sm = s1 + s2
    sf = CrossStatistics.from_masked_points(jnp.asarray(d), jnp.asarray(m), jnp.ones(100, bool))
    np.testing.assert_allclose(sm.dataset_mean, sf.dataset_mean, atol=1e-5)
    np.testing.assert_allclose(sm.model_mean, sf.model_mean, atol=1e-5)
    np.testing.assert_allclose(sm.covariance, sf.covariance, atol=1e-5)
    np.testing.assert_allclose(sm.n_meas, sf.n_meas)


def test_cross_stats_merge_with_empty(rng):
    d = rng.normal(size=(10, 3)).astype(np.float32)
    m = rng.normal(size=(10, 3)).astype(np.float32)
    s = CrossStatistics.from_masked_points(jnp.asarray(d), jnp.asarray(m), jnp.ones(10, bool))
    z = CrossStatistics.empty()
    sm = s + z
    np.testing.assert_allclose(sm.covariance, s.covariance, atol=1e-6)
    np.testing.assert_allclose(sm.dataset_mean, s.dataset_mean, atol=1e-6)


def test_cross_stats_transform(rng):
    d = rng.normal(size=(50, 3)).astype(np.float32)
    m = rng.normal(size=(50, 3)).astype(np.float32)
    T = rand_transform(rng)
    s = CrossStatistics.from_masked_points(jnp.asarray(d), jnp.asarray(m), jnp.ones(50, bool))
    st = s.transform(T)
    s_ref = CrossStatistics.from_masked_points(
        T.apply(jnp.asarray(d)), T.apply(jnp.asarray(m)), jnp.ones(50, bool)
    )
    np.testing.assert_allclose(st.dataset_mean, s_ref.dataset_mean, atol=1e-5)
    np.testing.assert_allclose(st.model_mean, s_ref.model_mean, atol=1e-5)
    np.testing.assert_allclose(st.covariance, s_ref.covariance, atol=1e-5)


# --- Umeyama ----------------------------------------------------------------


def test_umeyama_recovers_rigid_transform(rng):
    d = rng.normal(size=(300, 3)).astype(np.float32)
    T = rand_transform(rng)
    m = T.apply(jnp.asarray(d))
    s = CrossStatistics.from_masked_points(jnp.asarray(d), m, jnp.ones(300, bool))
    est = umeyama_transform(s)
    np.testing.assert_allclose(est.trans, T.trans, atol=1e-4)
    # quaternion up to sign
    q1, q2 = np.asarray(est.rot), np.asarray(T.rot)
    assert min(np.abs(q1 - q2).max(), np.abs(q1 + q2).max()) < 1e-4


def test_umeyama_empty_stats_identity():
    est = umeyama_transform(CrossStatistics.empty())
    np.testing.assert_allclose(est.rot, [1, 0, 0, 0])
    np.testing.assert_allclose(est.trans, [0, 0, 0])


def test_umeyama_degenerate_planar(rng):
    # points on a plane still give a valid rotation (det +1)
    d = rng.normal(size=(100, 3)).astype(np.float32)
    d[:, 2] = 0.0
    T = rand_transform(rng)
    m = T.apply(jnp.asarray(d))
    s = CrossStatistics.from_masked_points(jnp.asarray(d), m, jnp.ones(100, bool))
    est = umeyama_transform(s)
    R = Quaternion.to_matrix(est.rot)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    np.testing.assert_allclose(est.apply(jnp.asarray(d)), m, atol=1e-3)


def test_umeyama_batched(rng):
    d = rng.normal(size=(4, 100, 3)).astype(np.float32)
    T = rand_transform(rng, (4,))
    m = jax.vmap(lambda t, p: t.apply(p))(T, jnp.asarray(d))
    s = CrossStatistics.from_masked_points(jnp.asarray(d), m, jnp.ones((4, 100), bool))
    est = umeyama_transform(s)
    np.testing.assert_allclose(est.trans, T.trans, atol=1e-4)


# --- Markley mean / covariance / sampling ----------------------------------


def test_markley_mean_cluster(rng):
    base = Quaternion.from_euler(jnp.float32(0.1), jnp.float32(0.2), jnp.float32(0.3))
    perturb = Quaternion.exp(jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32) * 0.05))
    quats = Quaternion.mul(jnp.broadcast_to(base, (500, 4)), perturb)
    q_mean = markley_mean(quats, jnp.ones(500))
    err = Quaternion.log(Quaternion.mul(Quaternion.conj(base), q_mean))
    assert np.linalg.norm(err) < 0.02


def test_markley_mean_sign_invariance(rng):
    quats = np.asarray(
        Quaternion.mul(
            jnp.broadcast_to(Quaternion.identity(), (100, 4)),
            Quaternion.exp(jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32) * 0.1)),
        )
    )
    flipped = quats.copy()
    flipped[::2] *= -1  # q and -q are the same rotation
    m1 = markley_mean(jnp.asarray(quats), jnp.ones(100))
    m2 = markley_mean(jnp.asarray(flipped), jnp.ones(100))
    np.testing.assert_allclose(np.abs(m1), np.abs(m2), atol=1e-5)


def test_pose_sampling_statistics(key, rng):
    mean = rand_transform(rng)
    A = rng.normal(size=(6, 6)).astype(np.float32) * 0.05
    cov = jnp.asarray(A @ A.T + 0.001 * np.eye(6, dtype=np.float32))
    samples = sample_pose_gaussian(key, mean, cov, 20000)
    emp_mean = weighted_pose_mean(samples, jnp.ones(20000))
    emp_cov = pose_covariance_6x6(samples, mean, jnp.ones(20000))
    np.testing.assert_allclose(emp_mean.trans, mean.trans, atol=0.02)
    np.testing.assert_allclose(emp_cov, cov, atol=0.02)


def test_pose_sampling_uniform(key):
    lo = [-1.0, -2.0, 0.0, 0.0, 0.0, -3.0]
    hi = [1.0, 2.0, 0.5, 0.0, 0.0, 3.0]
    s = sample_pose_uniform(key, lo, hi, 1000)
    t = np.asarray(s.trans)
    assert t[:, 0].min() >= -1 and t[:, 0].max() <= 1
    assert t[:, 1].min() >= -2 and t[:, 1].max() <= 2


def test_gaussian_pdf():
    v = gaussian_pdf(jnp.float32(0.0), jnp.float32(2.0))
    np.testing.assert_allclose(v, 1.0 / (2.0 * np.sqrt(2 * np.pi)), rtol=1e-5)
