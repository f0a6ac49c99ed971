"""TrackedCorrector: MICP-L tracking with candidate reuse.

Pins (a) convergence of the tracked correction loop to ground truth,
(b) that candidate reuse leaves the pose track BITWISE identical to
re-culling every step (the engine-level bitwise guarantee composed
through the whole correction), and (c) that reuse actually skips culls.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.math.se3 import Quaternion, Transform
from rmcl_tpu.micp.pipeline import MICPConfig, MICPSensorConfig, MICPSensorData
from rmcl_tpu.micp.tracking import TrackedCorrector
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.sensors.simulate import simulate


@pytest.fixture(scope="module")
def world():
    mesh = make_sphere(80, 80, radius=10.0)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16,
                      supers_per_hyper=16)
    model = SphericalModel.vlp16(width=180)
    return bins, model


def _sensor_data(bins, model, tsm_true):
    hits = simulate(bins, model, tsm_true, c_super=24, c_bin=256)
    ranges = jnp.where(hits.hit, hits.t, 0.0)
    points = model.polar_to_cartesian(ranges)
    return MICPSensorData(
        model=model, points=points, mask=hits.hit,
        tsb=Transform.identity(),
        config=MICPSensorConfig.create(max_dist=0.6),
    )


def _run_track(tc, bins, model, n_steps, start_offset, rng):
    """Tracked corrections against a drifting ground truth."""
    truth = Transform.identity()
    tbo = Transform.identity()
    tom = Transform(rot=jnp.asarray([1.0, 0, 0, 0]),
                    trans=jnp.asarray(start_offset, jnp.float32))
    data = _sensor_data(bins, model, truth)
    state = tc.init(bins, tom, tbo, data.tsb)
    errs, toms = [], []
    for i in range(n_steps):
        state, stats = tc.step(bins, data, state, tbo)
        errs.append(float(jnp.linalg.norm(state.tom.trans - truth.trans)))
        toms.append(np.asarray(state.tom.trans))
    return state, errs, np.stack(toms)


def test_tracked_convergence(world):
    bins, model = world
    tc = TrackedCorrector(bins, model, MICPConfig(c_bin=256),
                          origin_margin=0.05, dir_margin=0.01)
    rng = np.random.default_rng(0)
    state, errs, _ = _run_track(tc, bins, model, 8, [0.15, -0.1, 0.08], rng)
    assert errs[-1] < 1e-3, errs
    assert errs[-1] < errs[0]
    # init cull + one re-cull after the first correction jumps the pose by
    # 0.15 m (> margin); every converged step after that reuses
    assert int(state.n_reculls) == 2


@pytest.mark.slow
def test_reuse_track_bitwise_equals_recull_track(world):
    """Forcing a fresh cull every step must produce the SAME pose track —
    the bitwise-lossless reuse guarantee composed through GN + annealing."""
    bins, model = world
    rng = np.random.default_rng(1)
    tc_reuse = TrackedCorrector(bins, model, MICPConfig(c_bin=256),
                                origin_margin=0.05, dir_margin=0.01)
    # margins ~0 force the drift predicate on every step (cull each time)
    tc_fresh = TrackedCorrector(bins, model, MICPConfig(c_bin=256),
                                origin_margin=1e-9, dir_margin=1e-9)
    s_r, _, track_r = _run_track(tc_reuse, bins, model, 6,
                                 [0.12, 0.05, -0.07], rng)
    s_f, _, track_f = _run_track(tc_fresh, bins, model, 6,
                                 [0.12, 0.05, -0.07], rng)
    assert int(s_f.n_reculls) == 7  # init + every step
    assert int(s_r.n_reculls) == 2  # init + post-first-correction jump
    assert np.array_equal(track_r, track_f)


def test_recull_triggers_past_margin(world):
    """A pose jump beyond the margin must trigger a fresh cull (and the
    correction still converges afterwards)."""
    bins, model = world
    tc = TrackedCorrector(bins, model, MICPConfig(c_bin=256),
                          origin_margin=0.05, dir_margin=0.01)
    truth = Transform.identity()
    tbo = Transform.identity()
    data = _sensor_data(bins, model, truth)
    tom = Transform(rot=jnp.asarray([1.0, 0, 0, 0]),
                    trans=jnp.asarray([0.02, 0.0, 0.0], jnp.float32))
    state = tc.init(bins, tom, tbo, data.tsb)
    state, _ = tc.step(bins, data, state, tbo)
    assert int(state.n_reculls) == 1
    # kidnap past the margin: odometry says the base jumped
    tbo2 = Transform(rot=jnp.asarray([1.0, 0, 0, 0]),
                     trans=jnp.asarray([0.2, 0.0, 0.0], jnp.float32))
    state, _ = tc.step(bins, data, state, tbo2)
    assert int(state.n_reculls) == 2
    for _ in range(6):
        state, _ = tc.step(bins, data, state, tbo2)
    # converged back: Tom * Tbo ≈ truth
    tbm = state.tom @ tbo2
    assert float(jnp.linalg.norm(tbm.trans - truth.trans)) < 1e-3


def test_tracked_multisensor_ondn_matches_generic(world):
    """2-sensor rig (spherical + OnDn): the tracked path (per-sensor
    candidate reuse, paired factored cast for OnDn) must reproduce the
    generic correct_once pipeline's pose and stats (VERDICT r3 #6 —
    reference multi-sensor merge, micp_localization.cpp:865-871)."""
    import jax

    from rmcl_tpu.micp.pipeline import correct_once
    from rmcl_tpu.sensors.models import OnDnModel

    bins, model = world
    rng = np.random.default_rng(5)
    # OnDn rig: per-ray origins spread over a 0.4 m rig frame
    n_ondn = 256
    origs = rng.uniform(-0.2, 0.2, (n_ondn, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_ondn, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ondn = OnDnModel.create(
        origs=jnp.asarray(origs), dirs=jnp.asarray(dirs), range_max=50.0
    )
    tsb2 = Transform.from_pose_tuple(jnp.asarray([0.1, 0.0, 0.05, 0, 0, 0.2]))

    truth = Transform.identity()
    d1 = _sensor_data(bins, model, truth)
    hits2 = simulate(bins, ondn, truth @ tsb2, c_super=24, c_bin=256)
    p2 = ondn.polar_to_cartesian(jnp.where(hits2.hit, hits2.t, 0.0))
    d2 = MICPSensorData(
        model=ondn, points=p2, mask=hits2.hit, tsb=tsb2,
        config=MICPSensorConfig.create(max_dist=0.6, weight=0.7),
    )

    cfg = MICPConfig(c_bin=256)
    tom = Transform(rot=jnp.asarray([1.0, 0, 0, 0]),
                    trans=jnp.asarray([0.06, -0.04, 0.03], jnp.float32))
    tbo = Transform.identity()

    tc = TrackedCorrector(bins, [model, ondn], cfg, group=64)
    state = tc.init(bins, tom, tbo, [d1.tsb, d2.tsb])

    tom_t = tom
    prog_g = jnp.float32(0.0)
    for i in range(4):
        state, stats_t = tc.step(bins, [d1, d2], state, tbo)
        tom_g, stats_g = correct_once(
            bins, [d1, d2], tom_t, tbo, prog_g, config=cfg
        )
        tom_t, prog_g = tom_g, stats_g.convergence_progress
        np.testing.assert_allclose(
            np.asarray(state.tom.trans), np.asarray(tom_g.trans), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(state.tom.rot), np.asarray(tom_g.rot), atol=5e-5
        )
        np.testing.assert_allclose(
            float(stats_t.valid_matches), float(stats_g.valid_matches),
            rtol=5e-3,
        )
    # converged onto truth through the tracked path
    assert float(jnp.linalg.norm(state.tom.trans)) < 5e-3
