"""Closest-point-on-mesh query tests vs brute-force oracles."""

import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.builder import build_bvh
from rmcl_tpu.geom.mesh import make_box, make_sphere
from rmcl_tpu.ops.closest_point import closest_point_on_triangle, closest_points


def brute_force_cp(mesh, queries):
    tri = mesh.triangles()
    v0 = jnp.asarray(tri[:, 0])
    e1 = jnp.asarray(tri[:, 1] - tri[:, 0])
    e2 = jnp.asarray(tri[:, 2] - tri[:, 0])
    best_d = np.full(len(queries), np.inf)
    best_p = np.zeros((len(queries), 3))
    for i, q in enumerate(queries):
        p = np.asarray(closest_point_on_triangle(jnp.asarray(q)[None], v0, e1, e2))
        d = np.linalg.norm(p - q, axis=1)
        j = d.argmin()
        best_d[i] = d[j]
        best_p[i] = p[j]
    return best_d, best_p


def test_closest_point_on_triangle_regions(rng):
    # triangle in the z=0 plane
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    e1 = jnp.asarray([1.0, 0.0, 0.0])
    e2 = jnp.asarray([0.0, 1.0, 0.0])
    cases = {
        (0.25, 0.25, 1.0): (0.25, 0.25, 0.0),  # face
        (-1.0, -1.0, 0.0): (0.0, 0.0, 0.0),  # vertex A
        (2.0, -0.5, 0.0): (1.0, 0.0, 0.0),  # vertex B
        (-0.5, 2.0, 0.0): (0.0, 1.0, 0.0),  # vertex C
        (0.5, -1.0, 0.0): (0.5, 0.0, 0.0),  # edge AB
        (-1.0, 0.5, 0.0): (0.0, 0.5, 0.0),  # edge AC
        (1.0, 1.0, 0.0): (0.5, 0.5, 0.0),  # edge BC
    }
    for q, expect in cases.items():
        p = closest_point_on_triangle(jnp.asarray(q), v0, e1, e2)
        np.testing.assert_allclose(np.asarray(p), expect, atol=1e-6, err_msg=str(q))


def test_closest_point_random_triangles(rng):
    q = rng.normal(size=(64, 3)).astype(np.float32)
    v0 = rng.normal(size=(64, 3)).astype(np.float32)
    e1 = rng.normal(size=(64, 3)).astype(np.float32)
    e2 = rng.normal(size=(64, 3)).astype(np.float32)
    p = np.asarray(closest_point_on_triangle(jnp.asarray(q), jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)))
    d = np.linalg.norm(p - q, axis=1)
    # oracle: dense barycentric sampling
    u = np.linspace(0, 1, 60)
    for i in range(64):
        uu, vv = np.meshgrid(u, u)
        m = uu + vv <= 1.0
        pts = v0[i] + uu[m, None] * e1[i] + vv[m, None] * e2[i]
        d_ref = np.linalg.norm(pts - q[i], axis=1).min()
        assert d[i] <= d_ref + 1e-3


def test_closest_points_sphere():
    mesh = make_sphere(48, 48, radius=2.0)
    bvh = build_bvh(mesh)
    q = np.asarray([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0], [0.0, 3.0, 0.0]], np.float32)
    cp = closest_points(bvh, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(cp.dist), [2.0, 3.0, 1.0], atol=0.01)
    assert bool(np.asarray(cp.found).all())


def test_closest_points_matches_bruteforce(rng):
    mesh = make_box((2.0, 3.0, 1.0))
    bvh = build_bvh(mesh)
    q = rng.normal(size=(100, 3)).astype(np.float32) * 2
    cp = closest_points(bvh, jnp.asarray(q))
    d_ref, p_ref = brute_force_cp(mesh, q)
    np.testing.assert_allclose(np.asarray(cp.dist), d_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp.point), p_ref, atol=1e-4)


def test_closest_points_max_dist_gate():
    mesh = make_sphere(32, 32, radius=1.0)
    bvh = build_bvh(mesh)
    q = jnp.asarray([[3.0, 0.0, 0.0]])
    cp = closest_points(bvh, q, max_dist=1.0)
    assert not bool(np.asarray(cp.found)[0])
    cp2 = closest_points(bvh, q, max_dist=2.5)
    assert bool(np.asarray(cp2.found)[0])


# --- dense binned engine -----------------------------------------------------


def test_closest_points_binned_matches_exact():
    """Binned closest-point engine agrees with the exact BVH distance query
    (point, distance, prim, found) on arbitrary query orders."""
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.bvh.builder import build_bvh
    from rmcl_tpu.geom.mesh import make_room_scene
    from rmcl_tpu.ops.closest_point import closest_points, closest_points_binned

    mesh = make_room_scene(n_pillars=3, seed=2)
    bvh = build_bvh(mesh)
    bins = build_bins(mesh, bin_size=32, bins_per_super=8)

    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.uniform([-5, -4, -0.5], [5, 4, 2.5], (2048, 3)).astype(np.float32)
    )
    a = closest_points(bvh, q)
    b = closest_points_binned(bins, q, c_super=48, c_bin=256)

    np.testing.assert_array_equal(np.asarray(a.found), np.asarray(b.found))
    np.testing.assert_allclose(
        np.asarray(a.dist), np.asarray(b.dist), rtol=1e-5, atol=1e-5
    )
    # closest points may differ on exact ties; distances must agree
    d_ab = np.linalg.norm(np.asarray(a.point) - np.asarray(b.point), axis=1)
    assert (d_ab < 1e-3).mean() > 0.99


def test_closest_points_binned_max_dist_and_batch():
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.geom.mesh import make_sphere
    from rmcl_tpu.ops.closest_point import closest_points_binned

    mesh = make_sphere(32, 32, radius=2.0)
    bins = build_bins(mesh, bin_size=16, bins_per_super=8)
    q = jnp.asarray([[[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]]])  # (1, 2, 3) batch
    out = closest_points_binned(bins, q, max_dist=3.0)
    assert out.found.shape == (1, 2)
    assert bool(out.found[0, 0]) and not bool(out.found[0, 1])
    np.testing.assert_allclose(float(out.dist[0, 0]), 2.0, atol=0.02)


def test_closest_points_binned_cluster_exactness():
    """Morton clustering must not change any result."""
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.geom.mesh import make_room_scene
    from rmcl_tpu.ops.closest_point import closest_points_binned

    mesh = make_room_scene(n_pillars=2, seed=4)
    bins = build_bins(mesh, bin_size=32, bins_per_super=8)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-4, 4, (777, 3)).astype(np.float32))
    a = closest_points_binned(bins, q, cluster=True, c_super=48, c_bin=256)
    b = closest_points_binned(bins, q, cluster=False, c_super=48, c_bin=256)
    np.testing.assert_allclose(np.asarray(a.dist), np.asarray(b.dist), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.prim_id), np.asarray(b.prim_id))


def test_closest_points_seeded_matches_exact():
    """Seeded exact CP (binned bound prime + bound-sorted chunks) must be
    bitwise-identical in found/prim_id and allclose in dist to the plain
    exact traversal — the seed only tightens the initial bound."""
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.ops.closest_point import closest_points_seeded

    mesh = make_sphere(60, 60, radius=10.0)
    bvh = build_bvh(mesh)
    bins = build_bins(mesh, bin_size=16)
    rng = np.random.default_rng(7)
    d = rng.normal(size=(2048, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    q = (d * rng.uniform(8.5, 11.5, 2048)[:, None]).astype(np.float32)

    a = closest_points(bvh, q, max_dist=1.0)
    # chunk smaller than n so the bound-sort + lax.map path is exercised
    b = closest_points_seeded(bvh, bins, q, max_dist=1.0, chunk_size=256)
    np.testing.assert_array_equal(np.asarray(b.found), np.asarray(a.found))
    np.testing.assert_array_equal(np.asarray(b.prim_id), np.asarray(a.prim_id))
    f = np.asarray(a.found)
    np.testing.assert_allclose(
        np.asarray(b.dist)[f], np.asarray(a.dist)[f], rtol=1e-6, atol=1e-6
    )
    # some queries must be gated out by max_dist for the test to mean much
    assert 0 < f.sum() < len(q)


def test_closest_points_seeded_large_coordinates():
    """Exactness safety net (advisor r3): in large-coordinate maps the
    binned seed's d2 and the exact leaf's d2 differ by ~eps*coord^2, which
    can exceed the fixed bound inflation — the exact pass may then fail to
    beat the seeded bound. The per-query fallback to the (real surface)
    seed hit must keep `found` a superset of the plain exact traversal's."""
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.ops.closest_point import closest_points_seeded

    mesh = make_sphere(40, 40, radius=10.0)
    # push the whole map ~1e4 m from the origin: f32 ULP there is ~1e-3 m
    off = np.asarray([1.0e4, -7.5e3, 3.0e3], np.float32)
    mesh = type(mesh)(mesh.vertices + off, mesh.faces)
    bvh = build_bvh(mesh)
    bins = build_bins(mesh, bin_size=16)
    rng = np.random.default_rng(11)
    d = rng.normal(size=(1024, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # queries hugging the surface — exactly the regime the advisor flagged
    q = (off + d * rng.uniform(9.999, 10.001, 1024)[:, None]).astype(np.float32)

    a = closest_points(bvh, q, max_dist=0.5)
    b = closest_points_seeded(bvh, bins, q, max_dist=0.5, chunk_size=256)
    af = np.asarray(a.found)
    bf = np.asarray(b.found)
    assert af.sum() > 0
    # never worse than plain exact: no found -> not-found flips
    assert not np.any(af & ~bf)
    # and where both found, distances agree to surface-hit tolerance
    both = af & bf
    np.testing.assert_allclose(
        np.asarray(b.dist)[both], np.asarray(a.dist)[both], atol=5e-3
    )


def test_closest_points_seeded_batch_shape():
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.ops.closest_point import closest_points_seeded

    mesh = make_box(size=(2.0, 2.0, 2.0), center=(0.0, 0.0, 0.0))
    bvh = build_bvh(mesh)
    bins = build_bins(mesh, bin_size=4)
    q = np.zeros((4, 5, 3), np.float32)
    out = closest_points_seeded(bvh, bins, q, max_dist=10.0)
    assert out.dist.shape == (4, 5) and out.point.shape == (4, 5, 3)
    np.testing.assert_allclose(np.asarray(out.dist), 1.0, atol=1e-5)
