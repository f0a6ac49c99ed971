"""Candidate reuse across corrections (find-once / intersect-K).

The reference exploits the same structure by finding correspondences once
and re-linearizing 5x per correction (micp_localization.cpp:915-964); the
TPU engine applies it one level down: the conservative cull runs once with
origin boxes inflated by a margin, and every subsequent cast whose block
origins moved less than the margin reuses the candidate lists. These tests
pin the contract: reused-candidate casts are BITWISE identical to
fresh-cull casts for any origin shift under the margin.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops.raycast_binned import (
    TiledSweep,
    cast_rays_binned_factored,
    factored_candidates,
)
from rmcl_tpu.sensors.models import SphericalModel

CAST_KW = dict(
    c_bin=64, block_chunk=512, sort_blocks=True, c_hyper=20, c_super=24,
    sub_blocks=4,
)
CULL_KW = dict(
    c_bin=64, block_chunk=512, c_hyper=20, c_super=24, sub_blocks=4,
)
MARGIN = 0.05


@pytest.fixture(scope="module")
def setup():
    mesh = make_sphere(80, 80, radius=10.0)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16,
                      supers_per_hyper=16)
    model = SphericalModel.vlp16(width=60)
    _, dirs = model.rays()
    rng = np.random.default_rng(7)
    trans = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
    sweep = TiledSweep(trans, model.width, model.height,
                       poses_per_tile=16, az_tile=8, el_tile=1)
    return bins, sweep, jnp.asarray(trans), jnp.asarray(dirs), rng


@pytest.mark.parametrize("payload", ["plane", "index", "none"])
def test_reuse_bitwise_under_margin(setup, payload):
    bins, sweep, trans, dirs, rng = setup
    o0, d0 = sweep.factored_rays(trans, dirs)
    cands = factored_candidates(bins, o0, d0, origin_margin=MARGIN,
                                **CULL_KW)
    for _ in range(3):
        jit = rng.uniform(-0.03, 0.03, size=trans.shape).astype(np.float32)
        oj, dj = sweep.factored_rays(trans + jit, dirs)
        fresh = cast_rays_binned_factored(bins, oj, dj, payload=payload,
                                          **CAST_KW)
        reuse = cast_rays_binned_factored(bins, oj, dj, payload=payload,
                                          candidates=cands, **CAST_KW)
        assert np.array_equal(np.asarray(fresh.t), np.asarray(reuse.t))
        assert np.array_equal(np.asarray(fresh.hit), np.asarray(reuse.hit))
        if payload != "none":
            assert np.array_equal(
                np.asarray(fresh.normal), np.asarray(reuse.normal)
            )
        if payload == "index":
            assert np.array_equal(
                np.asarray(fresh.prim_id), np.asarray(reuse.prim_id)
            )


def test_zero_margin_cull_unchanged(setup):
    """origin_margin=0 must be a no-op: the standalone cull's candidates
    reproduce the in-cast cull bitwise."""
    bins, sweep, trans, dirs, _ = setup
    o0, d0 = sweep.factored_rays(trans, dirs)
    base = cast_rays_binned_factored(bins, o0, d0, **CAST_KW)
    cands = factored_candidates(bins, o0, d0, origin_margin=0.0, **CULL_KW)
    reuse = cast_rays_binned_factored(bins, o0, d0, candidates=cands,
                                      **CAST_KW)
    assert np.array_equal(np.asarray(base.t), np.asarray(reuse.t))
    assert np.array_equal(np.asarray(base.hit), np.asarray(reuse.hit))


def test_margin_inflates_counts_monotonically(setup):
    """Inflated origin boxes can only ADD candidates (superset property:
    the reuse guarantee rests on it)."""
    bins, sweep, trans, dirs, _ = setup
    o0, d0 = sweep.factored_rays(trans, dirs)
    _, n0, _ = factored_candidates(bins, o0, d0, origin_margin=0.0,
                                   **CULL_KW)
    _, nm, _ = factored_candidates(bins, o0, d0, origin_margin=MARGIN,
                                   **CULL_KW)
    assert np.all(np.asarray(nm) >= np.asarray(n0))


def test_margin_tnear_is_lower_bound(setup):
    """The inflated cull's tnear must lower-bound the exact cull's tnear
    for the SAME bin (the early-exit correctness condition)."""
    bins, sweep, trans, dirs, _ = setup
    o0, d0 = sweep.factored_rays(trans, dirs)
    c0, n0, t0 = (np.asarray(x) for x in factored_candidates(
        bins, o0, d0, origin_margin=0.0, **CULL_KW))
    cm, nm, tm = (np.asarray(x) for x in factored_candidates(
        bins, o0, d0, origin_margin=MARGIN, **CULL_KW))
    for b in range(0, c0.shape[0], 37):
        exact = {int(c): float(t) for c, t in zip(c0[b], t0[b]) if c >= 0}
        infl = {int(c): float(t) for c, t in zip(cm[b], tm[b]) if c >= 0}
        # superset of bins
        assert set(exact).issubset(set(infl))
        for cid, tn in exact.items():
            assert infl[cid] <= tn + 1e-6
