"""Golden-file trajectory regression (SURVEY.md §4: the reference has no
tests; golden trajectories from deterministic scenarios are our superset).

The golden encodes the full MICP correction dynamics under drifting
odometry — any numerical change in the cast / P2L reduce / solver chain
shows up here. Regenerate intentionally with
``python tests/golden/gen_micp_track.py``.
"""

import os

import numpy as np


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
