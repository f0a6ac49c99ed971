"""BVH build + ray-cast correctness vs brute-force and analytic oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.bvh.builder import build_bvh, validate_bvh
from rmcl_tpu.geom.mesh import TriangleMesh, make_box, make_plane, make_room_scene, make_sphere
from rmcl_tpu.ops.raycast import NO_HIT_T, cast_rays, occluded


def brute_force_raycast(mesh, orig, dirs, t_min=0.0):
    """Numpy closest-hit oracle: Möller–Trumbore over all triangles."""
    tri = mesh.triangles()  # (T,3,3)
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    R = orig.shape[0]
    ts = np.full(R, np.inf)
    ids = np.full(R, -1, np.int64)
    for r in range(R):
        o, d = orig[r], dirs[r]
        pvec = np.cross(d[None], e2)
        det = np.einsum("tj,tj->t", e1, pvec)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = o[None] - v0
            u = np.einsum("tj,tj->t", tvec, pvec) * inv
            qvec = np.cross(tvec, e1)
            v = np.einsum("j,tj->t", d, qvec) * inv
            t = np.einsum("tj,tj->t", e2, qvec) * inv
        eps = 1e-7
        ok = (
            (np.abs(det) > 1e-12)
            & (u >= -eps)
            & (v >= -eps)
            & (u + v <= 1 + eps)
            & (t > t_min)
        )
        if ok.any():
            cand = np.where(ok, t, np.inf)
            best = np.argmin(cand)
            ts[r] = cand[best]
            ids[r] = best
    return ts, ids


def random_rays(rng, n, scale=3.0):
    o = rng.normal(size=(n, 3)).astype(np.float32) * scale
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def random_mesh(rng, n_tris):
    base = rng.normal(size=(n_tris, 1, 3)).astype(np.float32) * 2.0
    offs = rng.normal(size=(n_tris, 3, 3)).astype(np.float32) * 0.5
    tri = base + offs
    verts = tri.reshape(-1, 3)
    faces = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
    return TriangleMesh(verts, faces)


@pytest.mark.parametrize("n_tris", [1, 2, 7, 64, 501])
def test_raycast_matches_bruteforce(rng, n_tris):
    mesh = random_mesh(rng, n_tris)
    bvh = build_bvh(mesh)
    o, d = random_rays(rng, 256)
    hits = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    t_ref, id_ref = brute_force_raycast(mesh, o, d)
    hit_ref = np.isfinite(t_ref)
    np.testing.assert_array_equal(np.asarray(hits.hit), hit_ref)
    np.testing.assert_allclose(
        np.asarray(hits.t)[hit_ref], t_ref[hit_ref], rtol=1e-4, atol=1e-5
    )
    # prim ids must agree except for exact-tie distances
    close_tie = np.zeros_like(hit_ref)
    ids = np.asarray(hits.prim_id)
    mismatch = hit_ref & (ids != id_ref) & ~close_tie
    assert mismatch.sum() <= max(1, n_tris // 100)


def test_raycast_sphere_analytic(rng):
    mesh = make_sphere(64, 64, radius=2.0)
    bvh = build_bvh(mesh)
    # rays from center must hit at ~radius
    _, d = random_rays(rng, 512)
    o = np.zeros_like(d)
    hits = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    assert bool(np.asarray(hits.hit).all())
    np.testing.assert_allclose(np.asarray(hits.t), 2.0, atol=0.01)
    # normals point back toward the center (flipped toward ray)
    cos = np.einsum("nj,nj->n", np.asarray(hits.normal), d)
    assert (cos < -0.97).all()


def test_raycast_from_outside_sphere(rng):
    mesh = make_sphere(48, 48, radius=1.0)
    bvh = build_bvh(mesh)
    o = np.tile(np.asarray([[5.0, 0.0, 0.0]], np.float32), (64, 1))
    d = np.asarray([[-1.0, 0.0, 0.0]], np.float32).repeat(64, 0)
    hits = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(hits.t), 4.0, atol=0.01)
    # miss rays
    d_miss = np.asarray([[0.0, 0.0, 1.0]], np.float32).repeat(64, 0)
    hits2 = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d_miss))
    assert not bool(np.asarray(hits2.hit).any())
    assert (np.asarray(hits2.t) == NO_HIT_T).all()


def test_raycast_box_room(rng):
    mesh = make_box((4.0, 6.0, 2.0), inward=True)
    bvh = build_bvh(mesh)
    o = np.zeros((6, 3), np.float32)
    d = np.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    )
    hits = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(hits.t), [2, 2, 3, 3, 1, 1], atol=1e-5)


def test_raycast_room_scene_vs_bruteforce(rng):
    mesh = make_room_scene(n_pillars=3, seed=1)
    bvh = build_bvh(mesh)
    o = rng.uniform(-2, 2, size=(128, 3)).astype(np.float32)
    o[:, 2] = np.abs(o[:, 2]) * 0.5 + 0.5
    _, d = random_rays(rng, 128)
    hits = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    t_ref, _ = brute_force_raycast(mesh, o, d)
    hit_ref = np.isfinite(t_ref)
    np.testing.assert_array_equal(np.asarray(hits.hit), hit_ref)
    np.testing.assert_allclose(np.asarray(hits.t)[hit_ref], t_ref[hit_ref], rtol=1e-4, atol=1e-5)


def test_raycast_t_gates(rng):
    mesh = make_plane((10, 10), subdiv=4)
    bvh = build_bvh(mesh)
    o = np.asarray([[0.0, 0.0, 5.0]], np.float32)
    d = np.asarray([[0.0, 0.0, -1.0]], np.float32)
    h = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(h.t), 5.0, atol=1e-5)
    h2 = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d), t_max=4.0)
    assert not bool(np.asarray(h2.hit)[0])
    h3 = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d), t_min=6.0)
    assert not bool(np.asarray(h3.hit)[0])


def test_occluded():
    mesh = make_box((2, 2, 2), inward=False)
    bvh = build_bvh(mesh)
    o = jnp.asarray([[-5.0, 0.0, 0.0], [-5.0, 0.0, 5.0]])
    tgt = jnp.asarray([[5.0, 0.0, 0.0], [5.0, 0.0, 5.0]])
    occ = occluded(bvh, o, tgt)
    assert list(np.asarray(occ)) == [True, False]


def test_gradients_range_finite_difference(rng):
    mesh = make_sphere(48, 48, radius=2.0)
    bvh = build_bvh(mesh)
    d = np.asarray([[0.70710678, 0.70710678, 0.0]], np.float32)

    def range_fn(o):
        return cast_rays(bvh, o, jnp.asarray(d)).t.sum()

    o0 = jnp.asarray([[0.1, -0.2, 0.05]])
    g = jax.grad(range_fn)(o0)
    eps = 1e-3
    for axis in range(3):
        delta = np.zeros((1, 3), np.float32)
        delta[0, axis] = eps
        fp = float(range_fn(o0 + delta))
        fm = float(range_fn(o0 - delta))
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[0, axis], fd, atol=2e-2)


def test_gradients_wrt_direction(rng):
    mesh = make_plane((20, 20))
    bvh = build_bvh(mesh)
    o = jnp.asarray([[0.0, 0.0, 3.0]])

    def range_fn(dvec):
        d = dvec / jnp.linalg.norm(dvec, axis=-1, keepdims=True)
        return cast_rays(bvh, o, d).t.sum()

    d0 = jnp.asarray([[0.3, 0.1, -1.0]])
    g = jax.grad(range_fn)(d0)
    eps = 1e-3
    for axis in range(3):
        delta = np.zeros((1, 3), np.float32)
        delta[0, axis] = eps
        fd = (float(range_fn(d0 + delta)) - float(range_fn(d0 - delta))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[0, axis], fd, atol=5e-3)


def test_bvh_structure_sphere():
    mesh = make_sphere(32, 32)
    bvh = build_bvh(mesh)
    assert bvh.nodes.shape == (2 * mesh.n_faces - 1, 16)
    stats = validate_bvh(bvh)
    assert stats["n_leaves"] == mesh.n_faces
    assert stats["max_depth"] < 40  # sane tree depth for ~2k tris


def test_bvh_structure_random(rng):
    mesh = random_mesh(rng, 333)
    stats = validate_bvh(build_bvh(mesh))
    assert stats["n_leaves"] == 333


def test_batched_shapes():
    mesh = make_box()
    bvh = build_bvh(mesh)
    o = jnp.zeros((4, 5, 3))
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (4, 5, 3))
    hits = cast_rays(bvh, o, d)
    assert hits.t.shape == (4, 5)
    assert hits.point.shape == (4, 5, 3)


def test_native_sah_builder_matches_lbvh(rng):
    from rmcl_tpu.bvh import native
    from rmcl_tpu.bvh.builder import build_bvh_auto, build_bvh_sah

    if not native.available():
        import pytest

        pytest.skip("native builder not built")
    mesh = make_room_scene(n_pillars=3, seed=7)
    bvh_sah = build_bvh_sah(mesh)
    stats = validate_bvh(bvh_sah)
    assert stats["n_leaves"] == mesh.n_faces
    o, d = random_rays(rng, 256)
    o[:, 2] = np.abs(o[:, 2]) * 0.3 + 1.0
    exact = cast_rays(build_bvh(mesh), jnp.asarray(o), jnp.asarray(d))
    sah = cast_rays(bvh_sah, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(sah.hit), np.asarray(exact.hit))
    hit = np.asarray(exact.hit)
    np.testing.assert_allclose(
        np.asarray(sah.t)[hit], np.asarray(exact.t)[hit], rtol=1e-5
    )


def test_gradients_wrt_vertices_finite_difference(rng):
    """cast_rays_diff: d(range)/d(vertices) matches finite differences and
    agrees in value with the engine's own t (both engines)."""
    import jax

    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.geom.mesh import make_sphere
    from rmcl_tpu.ops.diff import cast_rays_diff

    mesh = make_sphere(24, 24, radius=2.0)
    bvh = build_bvh(mesh)
    bins = build_bins(mesh, bin_size=16, bins_per_super=8)
    V = jnp.asarray(mesh.vertices)
    F = jnp.asarray(mesh.faces)

    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.zeros((32, 3))
    dj = jnp.asarray(d)

    # value parity with both engines
    base = cast_rays(bvh, o, dj)
    for struct in (bvh, bins):
        h = cast_rays_diff(struct, V, F, o, dj)
        np.testing.assert_allclose(
            np.asarray(h.t), np.asarray(base.t), rtol=1e-5, atol=1e-5
        )

    def mean_range(verts):
        h = cast_rays_diff(bvh, verts, F, o, dj)
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    g = jax.grad(mean_range)(V)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).any()

    # finite-difference check on the 5 largest-gradient vertex coordinates
    flat = np.abs(g).ravel()
    idx = np.argsort(flat)[-5:]
    f0 = float(mean_range(V))
    eps = 1e-3
    for i in idx:
        e = np.zeros(V.shape, np.float32).ravel()
        e[i] = eps
        e = e.reshape(V.shape)
        f1 = float(mean_range(V + jnp.asarray(e)))
        fd = (f1 - f0) / eps
        np.testing.assert_allclose(fd, g.ravel()[i], rtol=0.05, atol=1e-3)


def test_cast_rays_seeded_matches_exact(rng):
    """Seeded exact ray cast (dense-engine bound prime + bound-sorted
    chunks) must agree with the plain exact traversal: the seed only
    tightens the per-ray initial t_best with a TRUE upper bound."""
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.ops.raycast import cast_rays_seeded

    mesh = make_room_scene(n_pillars=3, seed=2)
    bvh = build_bvh(mesh)
    bins = build_bins(mesh, bin_size=16)
    # scattered origins + random dirs — the global-MCL regime the seeded
    # engine exists for
    o = rng.uniform(-4, 4, (3000, 3)).astype(np.float32)
    o[:, 2] = rng.uniform(0.3, 2.2, 3000)
    d = rng.normal(size=(3000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    a = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d))
    # small chunk to exercise the sorted lax.map path
    b = cast_rays_seeded(
        bvh, bins, jnp.asarray(o), jnp.asarray(d), chunk_size=512
    )
    ah, bh = np.asarray(a.hit), np.asarray(b.hit)
    # never lose a hit the plain traversal finds
    assert not np.any(ah & ~bh)
    both = ah & bh
    assert both.sum() > 2000
    np.testing.assert_allclose(
        np.asarray(b.t)[both], np.asarray(a.t)[both], rtol=1e-5, atol=1e-5
    )
    # per-beam capped t_max flows through (the MCL use)
    t_cap = np.full(3000, 3.0, np.float32)
    a2 = cast_rays(bvh, jnp.asarray(o), jnp.asarray(d), t_max=jnp.asarray(t_cap))
    b2 = cast_rays_seeded(
        bvh, bins, jnp.asarray(o), jnp.asarray(d), t_max=jnp.asarray(t_cap),
        chunk_size=512,
    )
    assert not np.any(np.asarray(a2.hit) & ~np.asarray(b2.hit))
    both2 = np.asarray(a2.hit) & np.asarray(b2.hit)
    np.testing.assert_allclose(
        np.asarray(b2.t)[both2], np.asarray(a2.t)[both2], rtol=1e-5, atol=1e-5
    )


def test_cast_rays_seeded_batch_shape_and_normals(rng):
    from rmcl_tpu.bvh.bins import build_bins
    from rmcl_tpu.ops.raycast import cast_rays_seeded

    mesh = make_sphere(24, 24, radius=5.0)
    bvh = build_bvh(mesh)
    bins = build_bins(mesh, bin_size=16)
    d = rng.normal(size=(4, 7, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((4, 7, 3), np.float32)
    out = cast_rays_seeded(bvh, bins, jnp.asarray(o), jnp.asarray(d))
    assert out.t.shape == (4, 7) and out.normal.shape == (4, 7, 3)
    np.testing.assert_allclose(np.asarray(out.t), 5.0, atol=6e-2)
    # flip_normals: normals face the sensor (dot(n, d) < 0)
    dots = np.sum(np.asarray(out.normal) * d, axis=-1)
    assert (dots < 0).all()
