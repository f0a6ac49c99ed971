"""Factored (Baldwin–Weber pose x dir) engine vs the exact traversal and
the classic binned engine — full parity on pose-sweep workloads."""

import numpy as np
import jax.numpy as jnp
import pytest

from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_room_scene, make_sphere
from rmcl_tpu.ops.raycast import cast_rays
from rmcl_tpu.ops.raycast_binned import (
    TiledSweep,
    cast_rays_binned,
    cast_rays_binned_factored,
)
from rmcl_tpu.sensors.models import SphericalModel


def _sweep_setup(mesh, n_poses, width, height, rng, span=2.0):
    model = SphericalModel.create(
        width=width, height=height,
        phi_min=-0.4, phi_max=0.4,
        theta_min=-np.pi, theta_max=np.pi,
        range_min=0.0, range_max=100.0,
    )
    _, dirs = model.rays()
    trans = rng.uniform(-span, span, size=(n_poses, 3)).astype(np.float32)
    trans[:, 2] = np.abs(trans[:, 2]) * 0.3 + 1.0
    sweep = TiledSweep(trans, width, height,
                       poses_per_tile=8, az_tile=4, el_tile=1)
    return model, jnp.asarray(dirs), jnp.asarray(trans), sweep


@pytest.mark.parametrize("payload", ["plane", "full", "index"])
def test_factored_matches_exact(rng, payload):
    mesh = make_room_scene((10.0, 8.0, 3.0), n_pillars=3, seed=3)
    bvh = build_bvh(mesh)
    bins = build_bins(mesh, bin_size=16, bins_per_super=16)
    model, dirs, trans, sweep = _sweep_setup(mesh, 20, 24, 4, rng)

    o_blk, d_blk = sweep.factored_rays(trans, dirs)
    hits_f = cast_rays_binned_factored(
        bins, o_blk, d_blk, c_super=16, c_bin=64, block_chunk=64,
        payload=payload,
    )
    n_rays = sweep.n_rays
    flat = lambda x: x.reshape((n_rays,) + x.shape[2:])
    t_f = sweep.unpermute(flat(hits_f.t)[:, None])[..., 0]
    hit_f = sweep.unpermute(flat(hits_f.hit)[:, None].astype(jnp.float32))[..., 0] > 0.5
    nrm_f = sweep.unpermute(flat(hits_f.normal))
    pt_f = sweep.unpermute(flat(hits_f.point))

    # exact oracle over the same (pose, dir) grid
    o_all = jnp.broadcast_to(trans[:, None, :], (20, dirs.shape[0], 3))
    d_all = jnp.broadcast_to(dirs[None], (20, dirs.shape[0], 3))
    hits_e = cast_rays(bvh, o_all.reshape(-1, 3), d_all.reshape(-1, 3))
    t_e = np.asarray(hits_e.t).reshape(20, -1)
    hit_e = np.asarray(hits_e.hit).reshape(20, -1)
    nrm_e = np.asarray(hits_e.normal).reshape(20, -1, 3)

    hit_f = np.asarray(hit_f)
    assert (hit_f == hit_e).mean() > 0.999  # watertight edge ties excepted
    both = hit_f & hit_e
    assert both.sum() > 0.5 * both.size
    np.testing.assert_allclose(
        np.asarray(t_f)[both], t_e[both], rtol=2e-4, atol=2e-4
    )
    # normals agree up to sign-flip convention (both flip toward the ray)
    dots = np.abs(np.sum(np.asarray(nrm_f)[both] * nrm_e[both], axis=-1))
    assert dots.min() > 0.999
    # points lie on the ray at distance t
    pt = np.asarray(pt_f)[both]
    o_np = np.asarray(o_all).reshape(20, -1, 3)[both]
    d_np = np.asarray(d_all).reshape(20, -1, 3)[both]
    np.testing.assert_allclose(
        pt, o_np + t_e[both][:, None] * d_np, atol=5e-3
    )
    if payload in ("full", "index"):
        prim_f = sweep.unpermute(
            flat(hits_f.prim_id)[:, None].astype(jnp.float32))[..., 0]
        prim_e = np.asarray(hits_e.prim_id).reshape(20, -1)
        agree = (np.asarray(prim_f)[both].astype(np.int32) == prim_e[both])
        assert agree.mean() > 0.999  # coplanar-tie exceptions only


def test_factored_matches_classic_binned(rng):
    """Bit-level agreement on hit/t with the classic binned engine on the
    benchmark-shaped sphere sweep."""
    mesh = make_sphere(48, 48, radius=20.0)
    bins = build_bins(mesh, bin_size=16, bins_per_super=16)
    model, dirs, trans, sweep = _sweep_setup(mesh, 16, 30, 4, rng, span=3.0)

    o, d = sweep.rays(trans, dirs)
    hits_c = cast_rays_binned(
        bins, o, d, block_size=sweep.block_size, dir_groups=sweep.dir_groups,
        c_super=16, c_bin=48, block_chunk=64, sort_blocks=True,
    )
    o_blk, d_blk = sweep.factored_rays(trans, dirs)
    hits_f = cast_rays_binned_factored(
        bins, o_blk, d_blk, c_super=16, c_bin=48, block_chunk=64,
    )
    t_f = hits_f.t.reshape(-1)
    hit_f = hits_f.hit.reshape(-1)
    assert (np.asarray(hit_f) == np.asarray(hits_c.hit)).all()
    both = np.asarray(hit_f) & np.asarray(hits_c.hit)
    np.testing.assert_allclose(
        np.asarray(t_f)[both], np.asarray(hits_c.t)[both], rtol=1e-4, atol=1e-4
    )


def test_factored_occlusion_payload_none(rng):
    mesh = make_room_scene((6.0, 6.0, 3.0), n_pillars=2, seed=7)
    bins = build_bins(mesh, bin_size=16, bins_per_super=16)
    model, dirs, trans, sweep = _sweep_setup(mesh, 8, 16, 2, rng, span=1.5)
    o_blk, d_blk = sweep.factored_rays(trans, dirs)
    h1 = cast_rays_binned_factored(bins, o_blk, d_blk, payload="none",
                                   c_super=16, c_bin=48, block_chunk=32)
    h2 = cast_rays_binned_factored(bins, o_blk, d_blk, payload="plane",
                                   c_super=16, c_bin=48, block_chunk=32)
    assert (np.asarray(h1.hit) == np.asarray(h2.hit)).all()
    both = np.asarray(h1.hit)
    # loop-t carries the packed-key lane bits: ~1e-5 relative perturbation
    np.testing.assert_allclose(
        np.asarray(h1.t)[both], np.asarray(h2.t)[both], rtol=1e-4
    )


def test_factored_dead_blocks(rng):
    """alive=False blocks produce no hits and do not disturb live blocks."""
    mesh = make_sphere(32, 32, radius=10.0)
    bins = build_bins(mesh, bin_size=16, bins_per_super=16)
    model, dirs, trans, sweep = _sweep_setup(mesh, 8, 16, 2, rng)
    o_blk, d_blk = sweep.factored_rays(trans, dirs)
    n_blk = o_blk.shape[0]
    alive = jnp.arange(n_blk) % 2 == 0
    h = cast_rays_binned_factored(bins, o_blk, d_blk, alive=alive,
                                  c_super=16, c_bin=48, block_chunk=32)
    h_all = cast_rays_binned_factored(bins, o_blk, d_blk,
                                      c_super=16, c_bin=48, block_chunk=32)
    hit = np.asarray(h.hit)
    assert not hit[1::2].any()
    assert (hit[0::2] == np.asarray(h_all.hit)[0::2]).all()


def test_factored_hyper_cull_matches(rng):
    """4-level cull (hypers -> supers -> bins) vs the 2-level cull: same
    casts when the hyper budget covers the passing hypers."""
    mesh = make_sphere(60, 60, radius=20.0)
    bins = build_bins(mesh, bin_size=16, bins_per_super=8, supers_per_hyper=4)
    assert bins.hyper_aabb is not None
    model, dirs, trans, sweep = _sweep_setup(mesh, 20, 24, 4, rng)
    o_blk, d_blk = sweep.factored_rays(trans, dirs)
    # the hyper path sizes the coarse levels with ONE fat block cone, so
    # c_super must cover the fat-cone passing-super count (audited: the
    # sub-cone OR passes fewer); with covering budgets the casts match
    h0 = cast_rays_binned_factored(
        bins, o_blk, d_blk, c_super=32, c_bin=64, block_chunk=64)
    h1 = cast_rays_binned_factored(
        bins, o_blk, d_blk, c_super=32, c_bin=64, block_chunk=64, c_hyper=16)
    np.testing.assert_array_equal(np.asarray(h0.hit), np.asarray(h1.hit))
    both = np.asarray(h0.hit)
    np.testing.assert_allclose(
        np.asarray(h0.t)[both], np.asarray(h1.t)[both], rtol=1e-6
    )
    # classic engine path too
    o, d = sweep.rays(trans, dirs)
    from rmcl_tpu.ops.raycast_binned import cast_rays_binned

    g0 = cast_rays_binned(bins, o, d, block_size=sweep.block_size,
                          c_super=40, c_bin=64, block_chunk=64)
    g1 = cast_rays_binned(bins, o, d, block_size=sweep.block_size,
                          c_super=40, c_bin=64, block_chunk=64, c_hyper=16)
    np.testing.assert_array_equal(np.asarray(g0.hit), np.asarray(g1.hit))
