"""Independent geometry oracle for RCC/CPC parity (VERDICT r3 #5/#7).

PROVENANCE: this module is written FROM THE PUBLISHED ALGORITHM SPECS, not
from any code in this repository or in /root/reference, so it is an
independent check on both of this repo's ray/distance engines:

  * ray-triangle: Möller & Trumbore, "Fast, Minimum Storage Ray/Triangle
    Intersection", Journal of Graphics Tools 2(1), 1997 — the exact
    formulas of the paper's listing (pvec/qvec/tvec, det-gated), evaluated
    here in FLOAT64 numpy over ALL triangles (no acceleration structure,
    no candidate culling, no traversal — nothing shared with the engines
    under test).
  * point-triangle: Ericson, "Real-Time Collision Detection", §5.1.5
    ClosestPtPointTriangle — the Voronoi-region case analysis, float64,
    over all triangles.

The engines under test (ops.raycast exact traversal, ops.raycast_binned
dense caster, ops.closest_point exact + binned) share NONE of this code
path: they are float32, BVH/bin-accelerated, and jit-compiled. Agreement
between a float64 brute force and both float32 engines bounds the
engines' absolute error by the comparison tolerance.

The reference implementation being matched delegates these queries to
Embree/OptiX (rtcIntersect1 — PCDSensorUpdaterEmbree.cpp:44; closest
point — EmbreeMap closestPoint); Embree implements the same watertight
Möller–Trumbore contract, so oracle agreement is reference agreement up
to the tolerance.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12
_BIG = 1.0e300


def oracle_cast(vertices, faces, orig, dirs, t_min=0.0, t_max=_BIG,
                chunk=4096):
    """Brute-force float64 closest-hit over all triangles.

    vertices (V,3), faces (F,3) int, orig/dirs (R,3). Returns dict with
    t (R,), hit (R,), prim (R,) int64 (lowest-index winner among exact
    ties), normal (R,3) geometric unit normal (unoriented).
    """
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    o = np.asarray(orig, np.float64)
    d = np.asarray(dirs, np.float64)
    R = o.shape[0]
    t_min = np.broadcast_to(np.asarray(t_min, np.float64), (R,))
    t_max = np.broadcast_to(np.asarray(t_max, np.float64), (R,))

    v0 = v[f[:, 0]]                      # (F, 3)
    e1 = v[f[:, 1]] - v0
    e2 = v[f[:, 2]] - v0
    n_geo = np.cross(e1, e2)
    n_len = np.linalg.norm(n_geo, axis=1)
    n_unit = n_geo / np.maximum(n_len, _EPS)[:, None]

    best_t = np.full(R, _BIG)
    best_p = np.full(R, -1, np.int64)
    for s in range(0, R, chunk):
        oc = o[s:s + chunk]              # (C, 3)
        dc = d[s:s + chunk]
        C = oc.shape[0]
        # Möller–Trumbore, paper listing, broadcast (C, F)
        pvec = np.cross(dc[:, None, :], e2[None, :, :])        # (C, F, 3)
        det = np.einsum("fk,cfk->cf", e1, pvec)
        inv_det = np.divide(
            1.0, det, out=np.zeros_like(det), where=np.abs(det) > _EPS
        )
        tvec = oc[:, None, :] - v0[None, :, :]
        u = np.einsum("cfk,cfk->cf", tvec, pvec) * inv_det
        qvec = np.cross(tvec, e1[None, :, :])
        vv = np.einsum("ck,cfk->cf", dc, qvec) * inv_det
        t = np.einsum("fk,cfk->cf", e2, qvec) * inv_det
        ok = (
            (np.abs(det) > _EPS)
            & (u >= 0.0) & (vv >= 0.0) & (u + vv <= 1.0)
            & (t > t_min[s:s + chunk, None])
            & (t <= t_max[s:s + chunk, None])
        )
        t = np.where(ok, t, _BIG)
        p = np.argmin(t, axis=1)         # lowest index wins ties
        tm = t[np.arange(C), p]
        upd = tm < best_t[s:s + chunk]
        best_t[s:s + chunk] = np.where(upd, tm, best_t[s:s + chunk])
        best_p[s:s + chunk] = np.where(upd, p, best_p[s:s + chunk])

    hit = best_t < _BIG
    normal = np.where(hit[:, None], n_unit[np.where(hit, best_p, 0)], 0.0)
    return dict(
        t=np.where(hit, best_t, np.inf), hit=hit, prim=best_p, normal=normal
    )


def _closest_on_tri(p, a, b, c):
    """Ericson RTCD §5.1.5 ClosestPtPointTriangle, vectorized over
    (Q, F) point-triangle pairs. p (Q,1,3); a/b/c (1,F,3). Returns (Q,F,3)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = np.einsum("qfk,qfk->qf", np.broadcast_to(ab, ap.shape), ap)
    d2 = np.einsum("qfk,qfk->qf", np.broadcast_to(ac, ap.shape), ap)
    bp = p - b
    d3 = np.einsum("qfk,qfk->qf", np.broadcast_to(ab, bp.shape), bp)
    d4 = np.einsum("qfk,qfk->qf", np.broadcast_to(ac, bp.shape), bp)
    cp = p - c
    d5 = np.einsum("qfk,qfk->qf", np.broadcast_to(ab, cp.shape), cp)
    d6 = np.einsum("qfk,qfk->qf", np.broadcast_to(ac, cp.shape), cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = va + vb + vc

    # Ericson's listing tests regions with early returns in the order
    # vertex A, vertex B, edge AB, vertex C, edge AC, edge BC, face.
    # Vectorized here as LAST-WRITE-WINS, writing in reverse precedence:
    # face first, then edges BC < AC < AB, then vertices C < B < A.
    v = np.divide(vb, denom, out=np.zeros_like(vb), where=np.abs(denom) > _EPS)
    w = np.divide(vc, denom, out=np.zeros_like(vc), where=np.abs(denom) > _EPS)
    den_bc = (d4 - d3) + (d5 - d6)
    out = a + v[..., None] * ab + w[..., None] * ac          # face
    # edge BC
    m_bc = (va <= 0.0) & ((d4 - d3) >= 0.0) & ((d5 - d6) >= 0.0)
    t_bc = np.divide(d4 - d3, den_bc, out=np.zeros_like(d4),
                     where=np.abs(den_bc) > _EPS)
    out = np.where(m_bc[..., None], b + np.clip(t_bc, 0, 1)[..., None] * (c - b), out)
    # edge AC
    m_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    t_ac = np.divide(d2, d2 - d6, out=np.zeros_like(d2),
                     where=np.abs(d2 - d6) > _EPS)
    out = np.where(m_ac[..., None], a + np.clip(t_ac, 0, 1)[..., None] * ac, out)
    # edge AB
    m_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    t_ab = np.divide(d1, d1 - d3, out=np.zeros_like(d1),
                     where=np.abs(d1 - d3) > _EPS)
    out = np.where(m_ab[..., None], a + np.clip(t_ab, 0, 1)[..., None] * ab, out)
    # vertex regions
    out = np.where(((d6 >= 0.0) & (d5 <= d6))[..., None], np.broadcast_to(c, out.shape), out)
    out = np.where(((d3 >= 0.0) & (d4 <= d3))[..., None], np.broadcast_to(b, out.shape), out)
    out = np.where(((d1 <= 0.0) & (d2 <= 0.0))[..., None], np.broadcast_to(a, out.shape), out)
    return out


def oracle_closest_point(vertices, faces, points, chunk=512):
    """Brute-force float64 closest surface point over all triangles.

    Returns dict with dist (Q,), point (Q,3), prim (Q,) (lowest index
    among ties)."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    p = np.asarray(points, np.float64)
    a = v[f[:, 0]][None]                 # (1, F, 3)
    b = v[f[:, 1]][None]
    c = v[f[:, 2]][None]
    Q = p.shape[0]
    dist = np.empty(Q)
    prim = np.empty(Q, np.int64)
    pt = np.empty((Q, 3))
    for s in range(0, Q, chunk):
        pc = p[s:s + chunk][:, None, :]  # (C, 1, 3)
        cp = _closest_on_tri(pc, a, b, c)          # (C, F, 3)
        d2 = np.sum((cp - pc) ** 2, axis=-1)       # (C, F)
        j = np.argmin(d2, axis=1)
        ii = np.arange(pc.shape[0])
        dist[s:s + chunk] = np.sqrt(d2[ii, j])
        prim[s:s + chunk] = j
        pt[s:s + chunk] = cp[ii, j]
    return dict(dist=dist, point=pt, prim=prim)
