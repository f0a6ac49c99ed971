"""Chip: does a row gather's cost scale with row WIDTH or row COUNT?

Decides the wide-BVH question: a BVH4 visit gathers ~2x the bytes of a
binary visit but halves the visit count. Times a while_loop doing one
(R, W) int32 row gather per iteration + light compute, for several W.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from rmcl_tpu.utils.timing import sync

N_SLOTS = 433475
R = 262144
ITERS = 128

@partial(jax.jit, static_argnames=("W",))
def loop(table, idx0, W):
    def body(state):
        c, idx, acc = state
        rows = jnp.take(table, idx, axis=0)          # (R, W)
        s = rows[:, 0]
        for k in range(1, min(W, 14)):
            s = s ^ rows[:, k]
        idx = (idx + (s & 1023) + 1) % N_SLOTS
        return c + 1, idx, acc + s
    def cond(state):
        return state[0] < ITERS
    _, idx, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), idx0, jnp.zeros((R,), jnp.int32)))
    return acc

rng = np.random.default_rng(0)
idx0 = jnp.asarray(rng.integers(0, N_SLOTS, R), jnp.int32)
for W in (4, 7, 14, 28, 56):
    table = jnp.asarray(rng.integers(-2**31, 2**31, (N_SLOTS, W)), jnp.int32)
    out = loop(table, idx0, W); sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = loop(table, idx0, W); sync(out)
        ts.append(time.perf_counter() - t0)
    per = min(ts) / ITERS * 1000
    print(f"W={W:3d} ({W*4:4d} B/row): {per:.3f} ms/iter  "
          f"({R*W*4/per*1e3/1e9:.1f} GB/s effective)")
