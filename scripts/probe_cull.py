"""Cull-phase dissection at bench shapes (factored engine expansion).

Times, each as its own jitted program with readback-closed regions and
jittered inputs (TPU_NOTES methodology):
  A. bounds+level-0 tests (no top_k)   — _chunk_level0 minus top_k
  B. + level-0 top_k (cs supers)       — full _chunk_level0
  C. + level-1 gather + bin tests      — _chunk_cull_tests
  D. + level-1 top_k + select          — _chunk_candidates (full cull)

Usage: BPS=32 python scripts/probe_cull.py [faces] [poses]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.bins import build_bins
from rmcl_tpu.geom.mesh import make_sphere
from rmcl_tpu.ops import raycast_binned as rb
from rmcl_tpu.ops.raycast_binned import TiledSweep
from rmcl_tpu.sensors.models import SphericalModel
from rmcl_tpu.utils.timing import sync

FACES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
POSES = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
CB = int(os.environ.get("CBIN", 64))
CS = int(os.environ.get("CSUPER", 24))
CHUNK = int(os.environ.get("CHUNK", 512))
BPS = int(os.environ.get("BPS", 32))
SUB = int(os.environ.get("SUB", 4))


def main():
    n = int(np.sqrt(FACES / 2))
    mesh = make_sphere(n, n, radius=50.0)
    bins = build_bins(mesh, bin_size=int(os.environ.get("BIN_SIZE", 64)),
                      bins_per_super=BPS)
    print(f"bins: {bins.n_bins} x B={bins.bin_size}, {bins.n_super} supers "
          f"x S={bins.bins_per_super}", flush=True)
    model = SphericalModel.vlp16(width=900)
    _, dirs_s = model.rays()
    rng = np.random.default_rng(0)
    trans = rng.uniform(-5, 5, size=(POSES, 3)).astype(np.float32)
    sweep = TiledSweep(trans, model.width, model.height, 16, 8, 1)
    dirs_j = jnp.asarray(np.asarray(dirs_s))
    P, G = sweep.pt, sweep.dir_groups
    Rb = P * G
    cs = min(CS, bins.n_super)
    cb = min(CB, bins.n_bins, cs * bins.bins_per_super)

    def chunked(fn):
        @jax.jit
        def run(o_blk, d_blk):
            n_blk = o_blk.shape[0]
            chunk = min(CHUNK, n_blk)
            pad = (-n_blk) % chunk
            if pad:
                o_blk = jnp.concatenate([o_blk, jnp.zeros((pad, P, 3))], 0)
                d_blk = jnp.concatenate([d_blk, jnp.ones((pad, G, 3))], 0)
            nc = (n_blk + pad) // chunk

            def f(args):
                o_c, d_c = args
                Cb = o_c.shape[0]
                ob = jnp.broadcast_to(
                    o_c[:, None], (Cb, G, P, 3)).reshape(Cb, Rb, 3)
                db = jnp.broadcast_to(
                    d_c[:, :, None], (Cb, G, P, 3)).reshape(Cb, Rb, 3)
                tmin = jnp.zeros((Cb, Rb))
                tmax = jnp.full((Cb, Rb), 3.0e38)
                return fn(ob, db, tmin, tmax)

            return jax.lax.map(
                f, (o_blk.reshape(nc, chunk, P, 3),
                    d_blk.reshape(nc, chunk, G, 3)))
        return run

    def a0_bounds(ob, db, tmin, tmax):
        # sub-block bounds + scene cap alone (no box tests): isolates the
        # (Cb, R, Rs, 3) reduction cost from the super test sweep
        oc, oh, axis, tan_th, t_hi, n_hi, dead = rb._subblock_bounds(
            ob, db, tmin, tmax, SUB)
        scene_c = 0.5 * (bins.aabb_min + bins.aabb_max)
        scene_h = 0.5 * (bins.aabb_max - bins.aabb_min)
        t_cap = (jnp.linalg.norm(oc - scene_c[None, None], axis=-1)
                 + jnp.linalg.norm(scene_h) + jnp.linalg.norm(oh, axis=-1))
        _, _, scene_far = rb._cone_box_test(
            oc[:, :, None], oh[:, :, None], axis[:, :, None],
            tan_th[:, :, None], t_cap[:, :, None],
            jnp.broadcast_to(bins.aabb_min, (1, 1, 1, 3)),
            jnp.broadcast_to(bins.aabb_max, (1, 1, 1, 3)))
        t_hi = jnp.minimum(t_hi, scene_far[:, :, 0])
        return jnp.sum(oc, (1, 2)), jnp.sum(t_hi, 1), jnp.sum(tan_th, 1)

    def a_tests(ob, db, tmin, tmax):
        # bounds + level-0 cone tests, reduced without any top_k
        oc, oh, axis, tan_th, t_hi, n_hi, dead = rb._subblock_bounds(
            ob, db, tmin, tmax, SUB)
        pass_sup, tn_sup, _ = rb._cone_box_test(
            oc[:, :, None], oh[:, :, None], axis[:, :, None],
            tan_th[:, :, None], t_hi[:, :, None],
            bins.super_aabb[None, None, :, 0:3],
            bins.super_aabb[None, None, :, 3:6])
        return (jnp.sum(jnp.any(pass_sup, 1), 1),
                jnp.sum(jnp.where(pass_sup, tn_sup, 0.0), (1, 2)))

    def b_level0(ob, db, tmin, tmax):
        bounds, sup_ids, sup_valid, n_hi_b, _sat = rb._chunk_level0(
            bins, ob, db, tmin, tmax, cs, SUB)
        return jnp.sum(sup_ids, 1), jnp.sum(sup_valid, 1)

    def c_tests(ob, db, tmin, tmax):
        vb, gb, tn, nh, _sat = rb._chunk_cull_tests(
            bins, ob, db, tmin, tmax, cs, SUB)
        return jnp.sum(vb, 1), jnp.sum(tn, 1)

    def d_full(ob, db, tmin, tmax):
        return rb._chunk_candidates(bins, ob, db, tmin, tmax, cs, cb, SUB, 0)

    o0, d0 = sweep.factored_rays(jnp.asarray(trans), dirs_j)
    sync((o0, d0))

    def timed(tag, fn):
        run = chunked(fn)
        out = run(o0, d0)
        sync(out)
        ts = []
        for i in range(2):
            oj = o0 + jnp.asarray(
                rng.uniform(-0.02, 0.02, o0.shape), jnp.float32)
            sync(oj)
            t0 = time.perf_counter()
            out = run(oj, d0)
            sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"{tag:34s} {min(ts)*1e3:8.1f} ms  (all: "
              f"{[int(t*1e3) for t in ts]})", flush=True)
        return min(ts)

    ta0 = timed("A0 bounds only", a0_bounds)
    ta = timed("A bounds+L0 tests", a_tests)
    tb = timed("B + L0 top_k", b_level0)
    tc = timed("C + L1 gather+tests", c_tests)
    td = timed("D + L1 top_k+select (full cull)", d_full)
    print(f"\nL0 top_k      ~{(tb-ta)*1e3:7.1f} ms")
    print(f"L1 gather+test~{(tc-tb)*1e3:7.1f} ms")
    print(f"L1 top_k      ~{(td-tc)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
