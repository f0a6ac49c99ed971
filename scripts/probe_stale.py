import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np

@jax.jit
def g(x):
    y = x
    for _ in range(6):
        y = y @ y / jnp.float32(900.0)
    return jnp.sum(y)

val = float(sys.argv[1])
x = jnp.full((1024, 1024), val, jnp.float32)
jax.block_until_ready(x)
t0 = time.time()
out = jax.block_until_ready(g(x))
print(f"val={val} out={float(out):.6e} t={time.time()-t0:.4f}s", flush=True)
t0 = time.time()
out2 = jax.block_until_ready(g(x * jnp.float32(1.1)))
print(f"val={val}*1.1 out={float(out2):.6e} t={time.time()-t0:.4f}s", flush=True)
