"""Probe relay memoization: distinct inputs, per-call time + output scalar."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax, jax.numpy as jnp

@jax.jit
def f(x):
    # ~200ms-class real work: big matmul chain dependent on x
    a = jnp.full((4096, 4096), 1e-3, jnp.float32) + x
    for _ in range(8):
        a = a @ a * 1e-4
    return jnp.sum(a)

xs = [jnp.float32(1e-5 * i) for i in range(6)]
jax.block_until_ready(xs)
for i, x in enumerate(xs):
    t0 = time.time()
    out = jax.block_until_ready(f(x))
    print(f"call {i}: {time.time()-t0:.4f}s out={float(out):.6e}", flush=True)
# repeat call 0 -> should be memoized-fast if memoization on (program,input)
t0 = time.time()
out = jax.block_until_ready(f(xs[0]))
print(f"repeat0: {time.time()-t0:.4f}s out={float(out):.6e}", flush=True)
