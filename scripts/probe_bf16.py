"""Probe: VPU elementwise throughput in f32 vs bf16 (+ int ops).

If bf16 elementwise runs ~2x f32 on this chip, the pair loop could run a
bf16 prefilter / bf16 bilinears with f32 winner re-verification. If it
matches f32 (like the MXU did on this relay), the idea is dead — record
either way in TPU_NOTES.md.

Methodology per TPU_NOTES: cold executions only (fresh random input per
timing), readback-closed timing regions.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rmcl_tpu.utils.timing import sync  # noqa: E402

SHAPE = (1024, 8192)
CHAIN = 200


def make_fn(dtype):
    @jax.jit
    def f(x, y):
        a, b = x, y
        for _ in range(CHAIN):
            a = a * b + x  # fused muladd chain
        return a

    return f


def run(dtype, label):
    f = make_fn(dtype)
    rng = np.random.default_rng(0)
    times = []
    for i in range(3):
        x = jnp.asarray(rng.uniform(0.9, 1.1, SHAPE), dtype)
        y = jnp.asarray(rng.uniform(0.9, 1.1, SHAPE), dtype)
        sync((x, y))
        t0 = time.time()
        out = f(x, y)
        sync(out)
        times.append(time.time() - t0)
    flops = SHAPE[0] * SHAPE[1] * CHAIN * 2
    cold = times[0]
    best_warm = min(times[1:])
    print(
        f"{label}: cold {cold*1e3:.1f} ms ({flops/cold/1e12:.3f} Tflops), "
        f"warm-best {best_warm*1e3:.1f} ms ({flops/best_warm/1e12:.3f} Tflops)"
    )


if __name__ == "__main__":
    print("devices:", jax.devices())
    run(jnp.float32, "f32 muladd chain")
    run(jnp.bfloat16, "bf16 muladd chain")
    run(jnp.float16, "f16 muladd chain")
    run(jnp.int32, "i32 muladd chain")
