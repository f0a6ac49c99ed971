"""Timing & profiling utilities.

Replaces the reference's rmagine ``StopWatch`` wall-clock segments and the
per-stage runtime topics (SURVEY.md §5 "Tracing/profiling": MEASURE_TIMES
rolling averages — reference micp_localization.cpp:1120-1161; updaters'
``runtime`` Float64 topics — PCDSensorUpdaterEmbree.cpp:345-349). Adds what
the reference lacks: device-accurate timing (block_until_ready) and xprof
trace capture hooks.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


def sync(tree):
    """Force REAL completion of device work and return ``tree``.

    On this environment's relay TPU backend, ``jax.block_until_ready``
    returns before execution actually finishes — only a device→host
    readback blocks until the result exists (measured 2026-08-19: a 0.61 s
    correction "completed" in 0.3 ms under block_until_ready; the readback
    showed the true time). Every timing region must end with ``sync``.
    Reads back 4 bytes per leaf, so the transfer itself is negligible.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and hasattr(l, "addressable_shards")]
    jax.block_until_ready(leaves)
    for l in leaves:
        if not l.size:
            continue
        if getattr(l, "is_fully_addressable", True):
            np.asarray(jnp.ravel(l)[:1])
        else:
            # multi-process sharded array: jnp.ravel would require global
            # addressability — read back one element of a local shard instead
            shards = l.addressable_shards
            if shards:
                np.asarray(jnp.ravel(shards[0].data)[:1])
    return tree


class StopWatch:
    """rmagine-style stopwatch: ``sw(); ...; elapsed = sw()``."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()

    def __call__(self) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        return dt


class StageTimer:
    """Named-stage accumulator with EMA + rolling stats (the MEASURE_TIMES
    equivalent). Use ``block=True`` to time device work accurately."""

    def __init__(self, ema_alpha: float = 0.1):
        self.alpha = ema_alpha
        self.ema: Dict[str, float] = {}
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                sync(block_on)
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1
            self.ema[name] = (
                dt
                if name not in self.ema
                else (1 - self.alpha) * self.ema[name] + self.alpha * dt
            )

    def mean(self, name: str) -> float:
        c = self.count.get(name, 0)
        return self.total[name] / c if c else 0.0

    def report(self) -> str:
        lines = []
        for name in sorted(self.total):
            lines.append(
                f"{name:30s} mean {self.mean(name)*1e3:8.2f} ms  "
                f"ema {self.ema.get(name, 0)*1e3:8.2f} ms  n={self.count[name]}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an xprof/TensorBoard trace around a code block
    (the TPU-native successor to the reference's wall-clock prints)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def timeit_device(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Best-of-N device timing with compile warmup; returns seconds.

    Uses :func:`sync` (readback), not bare ``block_until_ready`` — on the
    relay backend only a device→host readback waits for real completion.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best
