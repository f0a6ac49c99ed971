"""Realistic pair-phase prototype: VPU bilinears vs MXU K=4 dot, inside a
scan over candidate trips (mimics the binned caster's hot loop shapes).

Shapes: chunk Bc blocks of Rb rays (G dir groups x P rays), B tris/bin,
C candidate trips. Both variants produce the packed-key min per trip and
carry t_best. Diagnosis tool only.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(__builtins__.print, flush=True)

Bc, Rb, B, G, C = 256, 128, 64, 8, 19
P = Rb // G
N_CHUNK = 56  # scaled-down chunk count (bench is 445; scale results x8)


def timeit(fn, *a, iters=4):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    jmask = jnp.int32(B - 1)
    # per-chunk data: triangle planes pre-gathered per trip (C, Bc, 12, B)
    # (the real loop gathers per trip; here we index a big array per trip to
    # keep the gather cost in)
    tri = jnp.asarray(rng.normal(size=(C * 64, 14, B)), jnp.float32)
    cand = jnp.asarray(
        rng.integers(0, C * 64, size=(N_CHUNK, Bc, C)), jnp.int32
    )
    ob = jnp.asarray(rng.normal(size=(N_CHUNK, Bc, Rb, 3)), jnp.float32)
    db_g = jnp.asarray(rng.normal(size=(N_CHUNK, Bc, G, 3)), jnp.float32)

    j_iota4 = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1, 1), 1)

    def vpu_chunk(args):
        ob_c, dg, cand_c = args
        ox = ob_c[..., 0].reshape(Bc, 1, G, P)
        oy = ob_c[..., 1].reshape(Bc, 1, G, P)
        oz = ob_c[..., 2].reshape(Bc, 1, G, P)
        sdx = dg[:, None, :, 0, None]
        sdy = dg[:, None, :, 1, None]
        sdz = dg[:, None, :, 2, None]

        def body(c, t_best):
            bid = jax.lax.dynamic_slice_in_dim(cand_c, c, 1, axis=1)[:, 0]
            tw = jnp.take(tri, bid, axis=0)
            v0x, v0y, v0z = tw[:, 0, :, None, None], tw[:, 1, :, None, None], tw[:, 2, :, None, None]
            e1x, e1y, e1z = tw[:, 3, :, None, None], tw[:, 4, :, None, None], tw[:, 5, :, None, None]
            e2x, e2y, e2z = tw[:, 6, :, None, None], tw[:, 7, :, None, None], tw[:, 8, :, None, None]
            pvx = sdy * e2z - sdz * e2y
            pvy = sdz * e2x - sdx * e2z
            pvz = sdx * e2y - sdy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            qdx = sdy * e1z - sdz * e1y
            qdy = sdz * e1x - sdx * e1z
            qdz = sdx * e1y - sdy * e1x
            ngx = e1y * e2z - e1z * e2y
            ngy = e1z * e2x - e1x * e2z
            ngz = e1x * e2y - e1y * e2x
            pux, puy, puz = pvx * inv, pvy * inv, pvz * inv
            qvx, qvy, qvz = qdx * inv, qdy * inv, qdz * inv
            ntx, nty, ntz = ngx * inv, ngy * inv, ngz * inv
            cu = v0x * pux + v0y * puy + v0z * puz
            cv = v0x * qvx + v0y * qvy + v0z * qvz
            ct = v0x * ntx + v0y * nty + v0z * ntz
            u = (ox * pux + oy * puy + oz * puz) - cu
            v = cv - (ox * qvx + oy * qvy + oz * qvz)
            t = (ox * ntx + oy * nty + oz * ntz) - ct
            ok = (jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v)) >= 0.0) & (
                t > 0.0
            )
            t_cand = jnp.where(ok, t, 3e38)
            ti = jax.lax.bitcast_convert_type(t_cand, jnp.int32)
            key = (ti & ~jmask) | j_iota4
            key_min = jnp.min(key, axis=1).reshape(Bc, Rb)
            t_new = jax.lax.bitcast_convert_type(key_min | jmask, jnp.float32)
            return jnp.minimum(t_best, t_new)

        return jax.lax.fori_loop(
            0, C, body, jnp.full((Bc, Rb), 3e38, jnp.float32)
        )

    def mxu_chunk(args):
        ob_c, dg, cand_c = args
        # homogeneous origins, arranged (Bc*G, P, 4) once per chunk
        o4 = jnp.concatenate(
            [ob_c, jnp.ones((Bc, Rb, 1), jnp.float32)], axis=-1
        ).reshape(Bc, G, P, 4).reshape(Bc * G, P, 4)
        sdx = dg[:, None, :, 0]
        sdy = dg[:, None, :, 1]
        sdz = dg[:, None, :, 2]

        def body(c, t_best):
            bid = jax.lax.dynamic_slice_in_dim(cand_c, c, 1, axis=1)[:, 0]
            tw = jnp.take(tri, bid, axis=0)
            v0x, v0y, v0z = tw[:, 0, :, None], tw[:, 1, :, None], tw[:, 2, :, None]
            e1x, e1y, e1z = tw[:, 3, :, None], tw[:, 4, :, None], tw[:, 5, :, None]
            e2x, e2y, e2z = tw[:, 6, :, None], tw[:, 7, :, None], tw[:, 8, :, None]
            # (Bc, B, G) precompute, same as VPU path
            pvx = sdy * e2z - sdz * e2y
            pvy = sdz * e2x - sdx * e2z
            pvz = sdx * e2y - sdy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            qdx = sdy * e1z - sdz * e1y
            qdy = sdz * e1x - sdx * e1z
            qdz = sdx * e1y - sdy * e1x
            ngx = e1y * e2z - e1z * e2y
            ngy = e1z * e2x - e1x * e2z
            ngz = e1x * e2y - e1y * e2x
            pux, puy, puz = pvx * inv, pvy * inv, pvz * inv
            qvx, qvy, qvz = qdx * inv, qdy * inv, qdz * inv
            ntx, nty, ntz = ngx * inv, ngy * inv, ngz * inv
            cu = v0x * pux + v0y * puy + v0z * puz
            cv = v0x * qvx + v0y * qvy + v0z * qvz
            ct = v0x * ntx + v0y * nty + v0z * ntz
            # weight tensor (Bc, G, 4, 3B): rows [pu; -qv; nt], consts in row 4
            wu = jnp.stack([pux, puy, puz, -cu], axis=-1)  # (Bc, B, G, 4)
            wv = jnp.stack([-qvx, -qvy, -qvz, cv], axis=-1)
            wt = jnp.stack([ntx, nty, ntz, -ct], axis=-1)
            w = jnp.concatenate([wu, wv, wt], axis=1)  # (Bc, 3B, G, 4)
            w = w.transpose(0, 2, 3, 1).reshape(Bc * G, 4, 3 * B)
            uvt = jax.lax.dot_general(
                o4, w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (Bc*G, P, 3B)
            uvt = uvt.reshape(Bc, G, P, 3, B)
            u = uvt[:, :, :, 0]
            v = uvt[:, :, :, 1]
            t = uvt[:, :, :, 2]  # (Bc, G, P, B)
            ok = (jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v)) >= 0.0) & (
                t > 0.0
            )
            t_cand = jnp.where(ok, t, 3e38)
            ti = jax.lax.bitcast_convert_type(t_cand, jnp.int32)
            key = (ti & ~jmask) | jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, B), 3
            )
            key_min = jnp.min(key, axis=3).reshape(Bc, Rb)
            t_new = jax.lax.bitcast_convert_type(key_min | jmask, jnp.float32)
            return jnp.minimum(t_best, t_new)

        return jax.lax.fori_loop(
            0, C, body, jnp.full((Bc, Rb), 3e38, jnp.float32)
        )

    for name, fn in (("vpu", vpu_chunk), ("mxu", mxu_chunk)):
        f = jax.jit(lambda o, d, c, fn=fn: jax.lax.map(fn, (o, d, c)))
        t = timeit(f, ob, db_g, cand)
        pairs = N_CHUNK * Bc * Rb * B * C
        print(f"{name}: {t*1e3:8.2f} ms for {pairs/1e9:.1f}G pairs "
              f"-> {t*1e3*445/N_CHUNK:7.1f} ms at bench scale")


if __name__ == "__main__":
    main()
