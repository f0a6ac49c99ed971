"""Microbenchmarks: what does the raycast loop cost on this TPU?

1. raw batched gather throughput (the per-step node fetch)
2. while_loop with register-only state + gather per iteration
3. same plus a per-ray stack (scatter) to quantify the stack penalty
"""

import time

import jax
from rmcl_tpu.utils.timing import sync
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=5):
    out = f(*args)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = f(*args)
        sync(out)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    print(jax.devices())
    N_NODES = 200_000
    M = 1 << 20  # 1M rays
    nodes = jnp.asarray(np.random.randn(N_NODES, 16).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, N_NODES, size=M).astype(np.int32))

    # 1. raw gather
    f1 = jax.jit(lambda n, i: jnp.take(n, i, axis=0).sum(axis=-1))
    t = timeit(f1, nodes, idx)
    print(f"gather (1M x 64B): {t*1e3:.2f} ms -> {M*64/t/1e9:.1f} GB/s")

    # 2. while_loop, register state, K gathers
    K = 32

    def loop_fn(nodes, idx0):
        def body(state):
            i, cur, acc = state
            slot = nodes[cur]
            acc = acc + slot.sum(axis=-1)
            nxt = (cur * jnp.int32(1103515245) + jnp.int32(12345)) % N_NODES
            nxt = jnp.where(nxt < 0, nxt + N_NODES, nxt)
            return i + 1, nxt, acc

        def cond(state):
            return state[0] < K

        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), idx0, jnp.zeros_like(idx0, jnp.float32))
        )
        return acc

    f2 = jax.jit(loop_fn)
    t0 = time.time()
    out = f2(nodes, idx)
    sync(out)
    print(f"while+gather compile: {time.time()-t0:.1f}s")
    t = timeit(f2, nodes, idx)
    print(
        f"while_loop {K} gathers x 1M lanes: {t*1e3:.2f} ms -> "
        f"{M*K*64/t/1e9:.1f} GB/s, {M*K/t/1e6:.1f} M gathers/s"
    )

    # 3. add a stack scatter per iteration
    STACK = 32

    def loop_stack(nodes, idx0):
        stack = jnp.zeros((M, STACK), jnp.int32)

        def body(state):
            i, cur, acc, stack, sp = state
            slot = nodes[cur]
            acc = acc + slot.sum(axis=-1)
            nxt = (cur * jnp.int32(1103515245) + jnp.int32(12345)) % N_NODES
            nxt = jnp.where(nxt < 0, nxt + N_NODES, nxt)
            stack = jnp.take_along_axis(
                stack, sp[:, None], axis=1
            )  # dummy read
            return i + 1, nxt, acc, state[3].at[jnp.arange(M), sp].set(cur), (sp + 1) % STACK

        def cond(state):
            return state[0] < K

        _, _, acc, _, _ = jax.lax.while_loop(
            cond,
            body,
            (
                jnp.int32(0),
                idx0,
                jnp.zeros_like(idx0, jnp.float32),
                stack,
                jnp.zeros_like(idx0, jnp.int32),
            ),
        )
        return acc

    f3 = jax.jit(loop_stack)
    t0 = time.time()
    out = f3(nodes, idx)
    sync(out)
    print(f"while+stack compile: {time.time()-t0:.1f}s")
    t = timeit(f3, nodes, idx)
    print(f"while_loop {K} iters with stack scatter: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
