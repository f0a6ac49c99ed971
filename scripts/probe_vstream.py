"""Chip: indexed-vertex candidate stream decode vs raw row gather.

Simulates the factored intersect loop's stream phase for T trips:
  raw:     gather (Cb, 9, B) f32 rows  (2304 B/row @ B=64)
  indexed: gather (Cb, 3, KV) verts + (Cb, B) packed idx (1024 B/row),
           decode v0/e1/e2 per lane via one-hot matmuls (MXU)
Identical arithmetic afterwards (a checksum reduce).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from rmcl_tpu.utils.timing import sync

NB, B, KV, Cb, TRIPS = 156_000, 64, 64, 512, 880

rng = np.random.default_rng(0)
tri_raw = jnp.asarray(rng.normal(size=(NB, 9, B)).astype(np.float32))
vtab = jnp.asarray(rng.normal(size=(NB, 3, KV)).astype(np.float32))
idx = rng.integers(0, KV, (NB, B, 3)).astype(np.int32)
idx_packed = jnp.asarray(idx[..., 0] | (idx[..., 1] << 6) | (idx[..., 2] << 12))
cand = jnp.asarray(rng.integers(0, NB, (Cb, TRIPS)).astype(np.int32))
# NOTE round 1 of this probe used TRIPS=55: both variants measured
# ~54 ms = the relay dispatch floor, i.e. nothing. 880 trips puts
# device work 10x above the floor.

@jax.jit
def loop_raw(tri, cand):
    def body(c, acc):
        bid = jax.lax.dynamic_slice_in_dim(cand, c, 1, axis=1)[:, 0]
        tw = jnp.take(tri, bid, axis=0)  # (Cb, 9, B)
        return acc + jnp.sum(tw[:, 0] * tw[:, 3] + tw[:, 6], axis=1)
    return jax.lax.fori_loop(0, TRIPS, body, jnp.zeros((Cb,)))

@jax.jit
def loop_idx(vtab, idxp, cand):
    kio = jnp.arange(KV, dtype=jnp.int32)[None, None, :]
    def body(c, acc):
        bid = jax.lax.dynamic_slice_in_dim(cand, c, 1, axis=1)[:, 0]
        vt = jnp.take(vtab, bid, axis=0)      # (Cb, 3, KV)
        ip = jnp.take(idxp, bid, axis=0)      # (Cb, B)
        i0 = ip & 63; i1 = (ip >> 6) & 63; i2 = (ip >> 12) & 63
        oh0 = (i0[..., None] == kio).astype(jnp.float32)  # (Cb, B, KV)
        oh1 = (i1[..., None] == kio).astype(jnp.float32)
        oh2 = (i2[..., None] == kio).astype(jnp.float32)
        # 9 batched matvecs: components x {v0,v1,v2}
        g = lambda oh, k: jnp.einsum(
            "cbk,ck->cb", oh, vt[:, k], precision=jax.lax.Precision.HIGHEST)
        v0x = g(oh0, 0); v1x = g(oh1, 0); v2x = g(oh2, 0)
        v0y = g(oh0, 1)
        e1x = v1x - v0x; e2x = v2x - v0x
        return acc + jnp.sum(v0x * e1x + e2x + v0y, axis=1)
    return jax.lax.fori_loop(0, TRIPS, body, jnp.zeros((Cb,)))

def bench(tag, f, *a, iters=5):
    out = f(*a); sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); out = f(*a); sync(out)
        ts.append(time.perf_counter() - t0)
    per = min(ts) / TRIPS * 1e6
    print(f"{tag}: {min(ts)*1000:.1f} ms for {TRIPS} trips = {per:.0f} us/trip")

bench("raw 9xB rows (2304 B)   ", loop_raw, tri_raw, cand)
bench("indexed verts (1024 B)  ", loop_idx, vtab, idx_packed, cand)
# and with only 4 of 9 matvecs materialized (x component set) to bound

@partial(jax.jit, static_argnames=("u",))
def loop_raw_unroll(tri, cand, u):
    def body(c, acc):
        s = jnp.zeros((Cb,))
        for k in range(u):
            bid = jax.lax.dynamic_slice_in_dim(cand, c * u + k, 1, axis=1)[:, 0]
            tw = jnp.take(tri, bid, axis=0)
            s = s + jnp.sum(tw[:, 0] * tw[:, 3] + tw[:, 6], axis=1)
        return acc + s
    return jax.lax.fori_loop(0, TRIPS // u, body, jnp.zeros((Cb,)))

for u in (2, 4, 8):
    bench(f"raw unroll={u}          ", loop_raw_unroll, tri_raw, cand, u)

# candidate-sorted gather locality: adjacent trips fetch adjacent bins
cand_sorted = jnp.sort(cand, axis=1)
bench("raw, per-block sorted ids", loop_raw, tri_raw, cand_sorted)
