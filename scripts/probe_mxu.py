"""MXU / VPU microbenchmarks for the ray-triangle pair phase design.

Question: is a K=4 batched matmul (homogeneous ray origins x premultiplied
triangle planes) on the MXU faster than the equivalent VPU bilinears?
Measures f32 and bf16 batched dots at the shapes the binned caster would
use, plus a calibrated VPU elementwise chain. Diagnosis tool only.
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


def timeit(fn, *a, iters=5):
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

    # --- batched dot shapes: (G_batch, M rays, K) @ (G_batch, K, N=tris*3)
    for dt in (jnp.float32, jnp.bfloat16):
        for (Bt, M, K, N) in [
            (4096, 128, 4, 192),
            (4096, 128, 8, 192),
            (1024, 128, 4, 768),
            (512, 256, 8, 768),
            (64, 2048, 8, 768),
            (8, 16384, 8, 3072),
        ]:
            a = jnp.asarray(rng.normal(size=(Bt, M, K)), dt)
            b = jnp.asarray(rng.normal(size=(Bt, K, N)), dt)

            @jax.jit
            def dot(a, b):
                return jax.lax.dot_general(
                    a, b, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )

            t = timeit(dot, a, b)
            macs = Bt * M * K * N
            print(f"{dt.__name__:9s} B={Bt:5d} M={M:5d} K={K} N={N:5d}: "
                  f"{t*1e3:7.2f} ms  {macs/t/1e12:6.2f} TMAC/s")

    # --- VPU chain calibration: n_ops elementwise ops over a big array
    x = jnp.asarray(rng.normal(size=(8192, 8, 128)), jnp.float32)

    def chain(x, n):
        for i in range(n):
            x = x * 1.000001 + 0.5
        return x

    for n_ops in (16, 64):
        f = jax.jit(functools.partial(chain, n=n_ops))
        t = timeit(f, x)
        ops = x.size * n_ops * 2
        print(f"VPU chain n={n_ops:3d}: {t*1e3:7.2f} ms  {ops/t/1e12:6.2f} Tops/s")

    # --- fused mul-add reduce (like the pair bilinear + min) on VPU
    a = jnp.asarray(rng.normal(size=(2048, 64, 128)), jnp.float32)

    @jax.jit
    def bilinear_min(a):
        u = a * 1.1 + 0.3
        v = a * 0.9 - 0.2
        t = a * 1.05 + 0.1
        ok = (jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v)) >= 0.0) & (t > 0)
        return jnp.min(jnp.where(ok, t, 3e38), axis=1)

    t = timeit(bilinear_min, a)
    print(f"select+min reduce over 64: {t*1e3:7.2f} ms  "
          f"({a.size*12/t/1e12:.2f} eff Tops/s at 12 ops/elem)")


if __name__ == "__main__":
    main()
