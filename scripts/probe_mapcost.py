"""Fixed-cost probe: what does a lax.map over N chunks cost when the body
is trivial? If per-iteration dispatch/loop overhead is significant on this
backend, the engine's chunked passes have a floor independent of the math,
and bigger chunks win regardless of VMEM pressure.

Usage: python scripts/probe_mapcost.py [n_chunks] [chunk]
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

from rmcl_tpu.utils.timing import sync


def main():
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 220
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_chunks, chunk, 16, 3)), jnp.float32)

    @jax.jit
    def mapped(x):
        return jax.lax.map(lambda a: jnp.sum(a, axis=(1, 2)), x)

    @jax.jit
    def flat(x):
        return jnp.sum(x, axis=(2, 3))

    @jax.jit
    def mapped_while(x):
        # map + a 20-trip while loop per chunk (the engine's inner shape)
        def f(a):
            def body(cs):
                c, s = cs
                return c + 1, s + jnp.sum(a, axis=(1, 2)) * (1.0 + c)
            _, s = jax.lax.while_loop(
                lambda cs: cs[0] < 20, body,
                (jnp.int32(0), jnp.zeros(a.shape[0]))
            )
            return s
        return jax.lax.map(f, x)

    for name, fn in (("flat sum", flat), ("lax.map sum", mapped),
                     ("lax.map + 20-trip while", mapped_while)):
        out = fn(x)
        sync(out)
        ts = []
        for i in range(3):
            xj = x + jnp.float32(i * 1e-6)
            sync(xj)
            t0 = time.perf_counter()
            out = fn(xj)
            sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} {min(ts)*1e3:8.1f} ms  "
              f"({[int(t*1e3) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
