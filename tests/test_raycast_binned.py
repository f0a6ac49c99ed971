"""Dense binned caster: parity against the exact BVH traversal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_box, make_room_scene, make_sphere
from rmcl_tpu.ops.raycast import NO_HIT_T, cast_rays
from rmcl_tpu.ops.raycast_binned import cast_rays_binned, direction_major_order


def assert_hits_match(binned, exact, rtol=1e-4, atol=1e-4, allow_miss_frac=0.0):
    hb = np.asarray(binned.hit)
    he = np.asarray(exact.hit)
    mismatched = (hb != he).mean()
    assert mismatched <= allow_miss_frac, f"hit mismatch {mismatched:.4f}"
    both = hb & he
    np.testing.assert_allclose(
        np.asarray(binned.t)[both], np.asarray(exact.t)[both], rtol=rtol, atol=atol
    )
    pid_match = (np.asarray(binned.prim_id)[both] == np.asarray(exact.prim_id)[both]).mean()
    assert pid_match > 0.94, pid_match  # shared-edge ties may resolve to either face


def test_binned_sphere_from_center(rng):
    mesh = make_sphere(64, 64, radius=3.0)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16)
    bvh = build_bvh(mesh)
    # scan-grid-like coherent rays
    az = np.linspace(-np.pi, np.pi, 256, endpoint=False)
    el = np.linspace(-0.3, 0.3, 8)
    A, E = np.meshgrid(az, el, indexing="ij")
    d = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1).reshape(-1, 3).astype(np.float32)
    o = np.zeros_like(d)
    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    binned = cast_rays_binned(bins, jnp.asarray(o), jnp.asarray(d))
    assert_hits_match(binned, exact)


def test_binned_room_scene(rng):
    mesh = make_room_scene(n_pillars=4, seed=3)
    bins = build_bins(mesh, bin_size=32, bins_per_super=8)
    bvh = build_bvh(mesh)
    az = np.linspace(-np.pi, np.pi, 360, endpoint=False)
    el = np.linspace(-0.4, 0.3, 8)
    A, E = np.meshgrid(az, el, indexing="ij")
    d = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1).reshape(-1, 3).astype(np.float32)
    o = np.broadcast_to(np.asarray([0.5, -0.3, 1.0], np.float32), d.shape).copy()
    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    binned = cast_rays_binned(bins, jnp.asarray(o), jnp.asarray(d))
    assert_hits_match(binned, exact)
    # count-sorted block scheduling is a pure reordering: identical hits
    sorted_ = cast_rays_binned(
        bins, jnp.asarray(o), jnp.asarray(d), block_chunk=8, sort_blocks=True
    )
    assert_hits_match(sorted_, exact)


def test_binned_random_rays_box(rng):
    mesh = make_box((4.0, 3.0, 2.0))
    bins = build_bins(mesh, bin_size=8, bins_per_super=4)
    bvh = build_bvh(mesh)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = rng.uniform(-4, 4, size=(512, 3)).astype(np.float32)
    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    binned = cast_rays_binned(bins, jnp.asarray(o), jnp.asarray(d), block_size=32)
    assert_hits_match(binned, exact)


def test_binned_t_gates():
    mesh = make_sphere(32, 32, radius=2.0)
    bins = build_bins(mesh, bin_size=32, bins_per_super=8)
    o = jnp.zeros((64, 3))
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (64, 3))
    h1 = cast_rays_binned(bins, o, d)
    np.testing.assert_allclose(np.asarray(h1.t), 2.0, atol=0.01)
    h2 = cast_rays_binned(bins, o, d, t_max=1.0)
    assert not bool(np.asarray(h2.hit).any())
    h3 = cast_rays_binned(bins, o, d, t_min=3.0, t_max=10.0)
    assert not bool(np.asarray(h3.hit).any())


def test_binned_normals_flip():
    mesh = make_sphere(32, 32, radius=2.0)
    bins = build_bins(mesh, bin_size=32, bins_per_super=8)
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (8, 3))
    h = cast_rays_binned(bins, jnp.zeros((8, 3)), d)
    cos = np.einsum("nj,nj->n", np.asarray(h.normal), np.asarray(d))
    assert (cos < -0.9).all()


def test_binned_gradients(rng):
    mesh = make_sphere(48, 48, radius=2.0)
    bins = build_bins(mesh, bin_size=32, bins_per_super=8)
    d = jnp.broadcast_to(jnp.asarray([0.70710678, 0.70710678, 0.0]), (4, 3))

    def f(o):
        return cast_rays_binned(bins, o, d).t.sum()

    o0 = jnp.asarray(np.tile([[0.1, -0.2, 0.05]], (4, 1)).astype(np.float32))
    g = jax.grad(f)(o0)
    eps = 1e-3
    for axis in range(3):
        delta = np.zeros((4, 3), np.float32)
        delta[:, axis] = eps
        fd = (float(f(o0 + delta)) - float(f(o0 - delta))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[:, axis].sum(), fd, atol=5e-2)


def test_direction_major_order():
    perm, inv = direction_major_order(3, 4)
    x = jnp.arange(12)
    xp = x[perm]
    np.testing.assert_array_equal(np.asarray(xp[inv]), np.asarray(x))
    # direction-major: first 3 entries are ray 0 of each pose: 0, 4, 8
    np.testing.assert_array_equal(np.asarray(xp[:3]), [0, 4, 8])


def test_binned_matches_traversal_pose_sweep(rng):
    """The benchmark pattern: many poses x one scan grid, direction-major."""
    mesh = make_sphere(64, 64, radius=20.0)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16)
    bvh = build_bvh(mesh)
    n_poses, n_dirs = 8, 512
    az = np.linspace(-np.pi, np.pi, n_dirs, endpoint=False)
    d1 = np.stack([np.cos(az), np.sin(az), np.zeros_like(az)], -1).astype(np.float32)
    origins = rng.uniform(-2, 2, size=(n_poses, 1, 3)).astype(np.float32)
    o = np.broadcast_to(origins, (n_poses, n_dirs, 3)).reshape(-1, 3)
    d = np.broadcast_to(d1[None], (n_poses, n_dirs, 3)).reshape(-1, 3)
    perm, inv = direction_major_order(n_poses, n_dirs)
    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    binned_p = cast_rays_binned(
        bins, jnp.asarray(o)[perm], jnp.asarray(d)[perm], block_size=64
    )
    t_binned = np.asarray(binned_p.t[inv])
    np.testing.assert_allclose(
        t_binned[np.asarray(exact.hit)], np.asarray(exact.t)[np.asarray(exact.hit)],
        rtol=1e-4, atol=1e-4,
    )


def test_pallas_kernel_matches_xla(rng):
    """Fused Pallas intersection (interpret mode on CPU) == XLA path."""
    mesh = make_room_scene(n_pillars=3, seed=5)
    bins = build_bins(mesh, bin_size=32, bins_per_super=8)
    az = np.linspace(-np.pi, np.pi, 128, endpoint=False)
    el = np.linspace(-0.3, 0.2, 4)
    A, E = np.meshgrid(az, el, indexing="ij")
    d = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1).reshape(-1, 3).astype(np.float32)
    o = np.broadcast_to(np.asarray([0.4, -0.2, 1.1], np.float32), d.shape).copy()
    ref = cast_rays_binned(bins, jnp.asarray(o), jnp.asarray(d), block_size=64)
    pal = cast_rays_binned(
        bins, jnp.asarray(o), jnp.asarray(d), block_size=64,
        use_pallas=True, pallas_interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(pal.hit), np.asarray(ref.hit))
    both = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(pal.t)[both], np.asarray(ref.t)[both], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(pal.prim_id)[both], np.asarray(ref.prim_id)[both])


def test_tiled_sweep_order(rng):
    """Tiled pose-sweep ordering: valid permutation, cast parity."""
    from rmcl_tpu.ops.raycast_binned import tiled_sweep_order

    mesh = make_sphere(48, 48, radius=20.0)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16)
    bvh = build_bvh(mesh)

    W, H = 64, 4
    n_poses = 8
    az = np.linspace(-np.pi, np.pi, W, endpoint=False)
    el = np.linspace(-0.2, 0.2, H)
    E, A = np.meshgrid(el, az, indexing="ij")  # row-major: dir = el*W + az
    d1 = np.stack(
        [np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1
    ).reshape(-1, 3).astype(np.float32)
    origins = rng.uniform(-2, 2, size=(n_poses, 3)).astype(np.float32)
    o = np.broadcast_to(origins[:, None], (n_poses, W * H, 3)).reshape(-1, 3)
    d = np.broadcast_to(d1[None], (n_poses, W * H, 3)).reshape(-1, 3)

    perm, inv = tiled_sweep_order(origins, W, H, poses_per_tile=4, az_tile=8, el_tile=2)
    # every original ray id appears at least once, inv round-trips
    assert set(np.asarray(perm).tolist()) == set(range(n_poses * W * H))
    x = jnp.asarray(o[:, 0]).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(x[perm][inv]), np.asarray(x))

    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    tiled = cast_rays_binned(bins, jnp.asarray(o)[perm], jnp.asarray(d)[perm], block_size=64)
    t_tiled = np.asarray(tiled.t[inv])
    hitm = np.asarray(exact.hit)
    np.testing.assert_allclose(t_tiled[hitm], np.asarray(exact.t)[hitm], rtol=1e-4, atol=1e-4)


def test_dir_groups_fast_path(rng):
    """dir_groups=G + dir_major tiled order == exact traversal (bench config)."""
    from rmcl_tpu.ops.raycast_binned import tiled_sweep_order

    mesh = make_sphere(48, 48, radius=20.0)
    bins = build_bins(mesh, bin_size=32, bins_per_super=16)
    bvh = build_bvh(mesh)
    W, H = 64, 4
    n_poses = 32
    az = np.linspace(-np.pi, np.pi, W, endpoint=False)
    el = np.linspace(-0.2, 0.2, H)
    E, A = np.meshgrid(el, az, indexing="ij")  # row-major: dir = el*W + az
    d1 = np.stack(
        [np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1
    ).reshape(-1, 3).astype(np.float32)
    origins = rng.uniform(-2, 2, size=(n_poses, 3)).astype(np.float32)
    o = np.broadcast_to(origins[:, None], (n_poses, W * H, 3)).reshape(-1, 3)
    d = np.broadcast_to(d1[None], (n_poses, W * H, 3)).reshape(-1, 3)

    perm, inv = tiled_sweep_order(
        origins, W, H, poses_per_tile=16, az_tile=8, el_tile=1, dir_major=True
    )
    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    fast = cast_rays_binned(
        bins, jnp.asarray(o)[perm], jnp.asarray(d)[perm],
        block_size=128, dir_groups=8,
    )
    t_fast = np.asarray(fast.t[inv])
    hitm = np.asarray(exact.hit)
    np.testing.assert_allclose(
        t_fast[hitm], np.asarray(exact.t)[hitm], rtol=1e-4, atol=1e-4
    )


def test_tiled_sweep_factored(rng):
    """TiledSweep (factored, gather-free) == tiled_sweep_order index arrays."""
    from rmcl_tpu.ops.raycast_binned import TiledSweep, tiled_sweep_order

    W, H, n_poses = 30, 4, 21  # deliberately non-divisible by the tiles
    trans = rng.uniform(-3, 3, size=(n_poses, 3)).astype(np.float32)
    dirs = rng.normal(size=(W * H, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    sweep = TiledSweep(trans, W, H, poses_per_tile=8, az_tile=4, el_tile=2)
    perm, _ = tiled_sweep_order(
        trans, W, H, poses_per_tile=8, az_tile=4, el_tile=2, dir_major=True
    )
    o_ref = np.broadcast_to(trans[:, None], (n_poses, W * H, 3)).reshape(-1, 3)
    d_ref = np.broadcast_to(dirs[None], (n_poses, W * H, 3)).reshape(-1, 3)
    o, d = sweep.rays(jnp.asarray(trans), jnp.asarray(dirs))
    assert o.shape[0] == sweep.n_rays
    np.testing.assert_array_equal(np.asarray(o), o_ref[np.asarray(perm)])
    np.testing.assert_array_equal(np.asarray(d), d_ref[np.asarray(perm)])

    # unpermute round-trips: permuted ray payload -> (n_poses, n_dirs)
    y = jnp.arange(sweep.n_rays, dtype=jnp.float32)
    # payload value = original ray id, so unpermuted[p, d] == p*n_dirs+d
    y_orig = jnp.asarray(perm, jnp.float32)
    out = sweep.unpermute(y_orig[:, None])[..., 0]
    expect = np.arange(n_poses * W * H).reshape(n_poses, W * H)
    np.testing.assert_array_equal(np.asarray(out), expect)
    del y


def test_shared_dir_fast_path(rng):
    """shared_dir=True == generic path on direction-major blocks."""
    mesh = make_sphere(64, 64, radius=20.0)
    bins = build_bins(mesh, bin_size=64, bins_per_super=16)
    n_poses, n_dirs = 64, 256
    az = np.linspace(-np.pi, np.pi, n_dirs, endpoint=False)
    el = np.sin(az * 3) * 0.2
    d1 = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], -1
    ).astype(np.float32)
    origins = rng.uniform(-2, 2, size=(n_poses, 1, 3)).astype(np.float32)
    o = np.broadcast_to(origins, (n_poses, n_dirs, 3)).reshape(-1, 3)
    d = np.broadcast_to(d1[None], (n_poses, n_dirs, 3)).reshape(-1, 3)
    perm, _ = direction_major_order(n_poses, n_dirs)
    o = jnp.asarray(o)[perm]
    d = jnp.asarray(d)[perm]
    ref = cast_rays_binned(bins, o, d, block_size=64)
    fast = cast_rays_binned(bins, o, d, block_size=64, shared_dir=True)
    np.testing.assert_array_equal(np.asarray(fast.hit), np.asarray(ref.hit))
    both = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(fast.t)[both], np.asarray(ref.t)[both], rtol=1e-4, atol=1e-4
    )
    agree = (np.asarray(fast.prim_id)[both] == np.asarray(ref.prim_id)[both]).mean()
    assert agree > 0.999, agree


def test_omnidirectional_block_ball_bound(rng):
    """Wide-spread (omnidirectional) ray blocks: parity with the exact
    engine, and the ball bound (origin_box + ball(t_max)) must exclude
    geometry beyond reach — the candidate count for a range-gated
    omnidirectional block stays far below the scene's bin count."""
    from rmcl_tpu.geom.mesh import TriangleMesh
    from rmcl_tpu.ops.raycast_binned import candidate_stats

    # two boxes 60 m apart; rays live inside box A with t_max=10
    a = make_box((6.0, 6.0, 3.0), center=(0.0, 0.0, 0.0), inward=True)
    b = make_box((6.0, 6.0, 3.0), center=(60.0, 0.0, 0.0), inward=True)
    mesh = TriangleMesh(
        vertices=np.concatenate([np.asarray(a.vertices), np.asarray(b.vertices)]),
        faces=np.concatenate(
            [np.asarray(a.faces), np.asarray(b.faces) + a.vertices.shape[0]]
        ),
    )
    bins = build_bins(mesh, bin_size=8, bins_per_super=4)
    bvh = build_bvh(mesh)

    # omnidirectional beams from a tight cluster of origins (particle style)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = rng.uniform(-0.5, 0.5, size=(512, 3)).astype(np.float32)
    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d), t_max=10.0)
    binned = cast_rays_binned(
        bins, jnp.asarray(o), jnp.asarray(d), t_max=10.0, block_size=128
    )
    assert_hits_match(binned, exact)

    # every bin of box B lies beyond reach: candidates must exclude them all
    counts = np.asarray(
        candidate_stats(
            bins,
            jnp.asarray(o),
            jnp.asarray(d),
            t_max=10.0,
            block_size=128,
            c_super=64,
            c_bin=512,
        )
    )
    n_bins_a = (np.asarray(bins.bin_aabb)[:, 0] < 30.0).sum()
    assert counts.max() <= n_bins_a, (counts.max(), n_bins_a)


def test_three_level_cull_matches_exact(rng):
    """c_mid (3-level cull) is result-identical to the 2-level path on a
    coherent pose sweep and on incoherent random rays."""
    mesh = make_room_scene(n_pillars=4, seed=3)
    bins = build_bins(mesh, bin_size=16, bins_per_super=32, bins_per_mid=8)
    bvh = build_bvh(mesh)

    # coherent scan-style rays from inside the room
    az = np.linspace(-np.pi, np.pi, 360, endpoint=False)
    el = np.linspace(-0.4, 0.3, 8)
    A, E = np.meshgrid(az, el, indexing="ij")
    d = np.stack(
        [np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1
    ).reshape(-1, 3).astype(np.float32)
    o = np.broadcast_to(np.float32([0.5, -0.3, 1.2]), d.shape).copy()
    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    h3 = cast_rays_binned(bins, jnp.asarray(o), jnp.asarray(d), c_mid=48)
    assert_hits_match(h3, exact)

    # incoherent rays (exercise wide-spread sub-blocks through the mid level)
    d2 = rng.normal(size=(1024, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    o2 = rng.uniform([-4, -3, 0.3], [4, 3, 2.5], (1024, 3)).astype(np.float32)
    exact2 = cast_rays(bvh, jnp.asarray(o2), jnp.asarray(d2))
    h3b = cast_rays_binned(
        bins, jnp.asarray(o2), jnp.asarray(d2), block_size=64, c_mid=64
    )
    assert_hits_match(h3b, exact2)


def test_three_level_cull_sorted_chunks(rng):
    """c_mid composes with sort_blocks (the production bench path)."""
    mesh = make_sphere(128, 128, radius=20.0)
    bins = build_bins(mesh, bin_size=32, bins_per_super=64, bins_per_mid=8)
    bvh = build_bvh(mesh)
    az = np.linspace(-np.pi, np.pi, 512, endpoint=False)
    el = np.linspace(-0.25, 0.25, 4)
    A, E = np.meshgrid(az, el, indexing="ij")
    d = np.stack(
        [np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1
    ).reshape(-1, 3).astype(np.float32)
    o = rng.uniform(-2, 2, (1, 3)).astype(np.float32)
    o = np.broadcast_to(o, d.shape).copy()
    exact = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    h = cast_rays_binned(
        bins, jnp.asarray(o), jnp.asarray(d),
        c_mid=32, sort_blocks=True, block_chunk=8,
    )
    assert_hits_match(h, exact)


def test_with_lossless_certifies_exactness():
    """with_lossless=True: wherever the flag is True, the budget-bound cast
    must agree with an effectively-unbudgeted cast (budgets are the only
    loss source); under deliberately starved budgets some rays must be
    flagged uncertified (the flag is not trivially True)."""
    import numpy as np

    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.geom.mesh import make_building_scene
    from rmcl_tpu.ops.raycast_binned import cast_rays_binned

    mesh = make_building_scene(rooms_x=2, rooms_y=2, subdiv=8, seed=1)
    bins = build_bins(mesh, bin_size=16)
    rng = np.random.default_rng(3)
    lo, hi = mesh.vertices.min(0), mesh.vertices.max(0)
    center = 0.5 * (lo + hi)
    # first half: one coherent bundle (tight origins, narrow direction fan)
    # -> its blocks stay under budget and must be certified; second half:
    # scattered origins + random dirs -> deliberate saturation
    o1 = (center + rng.normal(0, 0.1, (1024, 3))).astype(np.float32)
    d1 = np.tile(np.float32([[1.0, 0.2, 0.0]]), (1024, 1))
    d1 += rng.normal(0, 0.02, (1024, 3)).astype(np.float32)
    o2 = rng.uniform(lo + 0.3, hi - 0.3, (1024, 3)).astype(np.float32)
    d2 = rng.normal(size=(1024, 3)).astype(np.float32)
    o = np.concatenate([o1, o2])
    d = np.concatenate([d1, d2])
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    # budgets sized between the bundle's ~28 passing bins/block and the
    # scattered half's pass-all 270 -> saturation on the scattered half only
    tight, flag = cast_rays_binned(
        bins, o, d, c_super=6, c_bin=48, with_lossless=True
    )
    full = cast_rays_binned(
        bins, o, d, c_super=1024, c_bin=4096
    )
    flag = np.asarray(flag)
    assert flag.any(), "some blocks should be certified"
    assert not flag.all(), "starved budgets must leave uncertified blocks"
    ok = flag
    np.testing.assert_array_equal(
        np.asarray(tight.hit)[ok], np.asarray(full.hit)[ok]
    )
    np.testing.assert_allclose(
        np.asarray(tight.t)[ok], np.asarray(full.t)[ok], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(tight.prim_id)[ok], np.asarray(full.prim_id)[ok]
    )
    # generous budgets on the same rays: flag should certify (nearly) all
    _, flag_full = cast_rays_binned(
        bins, o, d, c_super=1024, c_bin=4096, with_lossless=True
    )
    assert np.asarray(flag_full).all()
