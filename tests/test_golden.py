"""Golden-file trajectory regression (SURVEY.md §4: the reference has no
tests; golden trajectories from deterministic scenarios are our superset).

The golden encodes the full MICP correction dynamics under drifting
odometry — any numerical change in the cast / P2L reduce / solver chain
shows up here. Regenerate intentionally with
``python tests/golden/gen_micp_track.py``.
"""

import os

import numpy as np


import pytest

pytestmark = pytest.mark.slow

def test_micp_trajectory_matches_golden():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
    from gen_micp_track import run_track

    track, toms, true_xyz = run_track()
    gold = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "micp_track.npz")
    )
    # pose track: estimated base->map pose per step (trans + quat)
    np.testing.assert_allclose(track, gold["track"], atol=2e-3)
    # tom track: the drift compensation actually computed
    np.testing.assert_allclose(toms, gold["toms"], atol=2e-3)
    # and the physics: the drift is fully corrected
    err = np.linalg.norm(track[:, :3] - true_xyz, axis=1)
    assert err.max() < 5e-3, err


def test_mcl_trajectory_matches_golden():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
    from gen_mcl_track import run_track

    rows, true_t = run_track()
    gold = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "mcl_track.npz")
    )
    np.testing.assert_allclose(rows, gold["rows"], rtol=1e-4, atol=1e-5)
    # physics: the filter converged near the true pose
    assert np.linalg.norm(rows[-1, :3] - true_t) < 0.2
