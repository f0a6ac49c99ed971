"""Persistent XLA compilation cache for the product paths.

The reference's correction loop has no warmup cliff (its Embree kernels are
AOT C++ — micp_localization.cpp:1086-1171); our XLA programs pay a first
compile that on the relay backend measured up to ~89 s for the 131k-particle
exact sensor update (KIDNAP_r04 phase A step 0). bench.py has always set
``JAX_COMPILATION_CACHE_DIR`` so repeat invocations load instead of compile;
the NODE and TOOLS paths did not (VERDICT r4 #4). This module gives them the
same behavior: any MCLNode / MICPLocalization / CLI tool warms and reuses
``~/.cache/rmcl_tpu/xla`` (override with ``RMCL_TPU_CACHE_DIR``; disable
with ``RMCL_TPU_CACHE_DIR=""``).

jax supports enabling the cache at runtime via ``jax.config.update``, so
this works regardless of import order (no need to set the env var before
importing jax).
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently enable jax's persistent compilation cache.

    Returns the cache directory in use (None when disabled via an empty
    ``RMCL_TPU_CACHE_DIR``). Safe to call from multiple nodes/tools; the
    first caller wins (jax's cache dir is process-global).
    """
    global _enabled
    explicit = path is not None or "JAX_COMPILATION_CACHE_DIR" in os.environ \
        or "RMCL_TPU_CACHE_DIR" in os.environ
    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.environ.get(
                "RMCL_TPU_CACHE_DIR",
                os.path.join(
                    os.path.expanduser("~"), ".cache", "rmcl_tpu", "xla"
                ),
            ),
        )
    if not path:
        return None
    if _enabled:
        return path
    import jax

    if not explicit and jax.default_backend() == "cpu":
        # CPU runs are tests/dev: compiles are fast, and XLA:CPU AOT cache
        # loads warn loudly about machine-feature tuning flags. Opt in
        # explicitly via RMCL_TPU_CACHE_DIR if you want it anyway.
        return None

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program: the relay backend's remote compile is slow even
    # for small programs, and disk is cheap next to a 60 s compile
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _enabled = True
    return path
