"""Budget auto-tuning for the dense binned engine.

The engine's only approximation is candidate-budget truncation: each ray
block keeps the nearest ``c_super`` supers / ``c_bin`` bins (and, in
3-level mode, ``c_mid`` mid boxes). Budgets too small for the map/ray
shape SILENTLY drop geometry (false misses); budgets too large waste
compile-time shapes and cull work. This module measures the actual
candidate distribution of a representative ray sample and recommends safe
budgets — the production answer to "which budgets do I need for my map?".

    from rmcl_tpu.utils.tune import suggest_budgets
    rec = suggest_budgets(map_.bins, orig, dirs)
    cfg = SensorUpdateConfig.create(engine="binned", **rec.as_config_kwargs())
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.bvh.bins import TriangleBins

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BudgetRecommendation:
    c_super: int
    c_bin: int
    c_mid: int  # 0 when the mid level would not help / does not exist
    # diagnostics
    max_bins: int  # worst block's candidate-bin count (unbudgeted)
    p99_bins: float
    mean_bins: float
    saturated: bool  # True if even the probe budget clipped (re-run bigger)

    def as_config_kwargs(self) -> dict:
        return {"c_super": self.c_super, "c_bin": self.c_bin, "c_mid": self.c_mid}


def _round_up(x: int, k: int = 8) -> int:
    return int(-(-x // k) * k)


def suggest_budgets(
    bins: TriangleBins,
    orig: Array,
    dirs: Array,
    t_min: float | Array = 0.0,
    t_max: float | Array = 3.0e38,
    block_size: int = 128,
    margin: float = 1.25,
    max_sample_blocks: int = 4096,
    use_mid: bool = True,
) -> BudgetRecommendation:
    """Measure candidate-bin counts on (a sample of) the given rays and
    recommend budgets with ``margin`` headroom over the worst block.

    The rays should be representative of production blocks — same
    ordering/clustering as the real casts (e.g. pass the clustered
    particle-beam rays for an MCL budget, or one pose sweep's rays for the
    MICP budget). Never false-safe: the recommendation covers the WORST
    sampled block times ``margin``; distribution diagnostics come along
    for judgment calls."""
    from rmcl_tpu.ops.raycast_binned import candidate_stats

    orig = jnp.asarray(orig, jnp.float32).reshape(-1, 3)
    dirs = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), orig.shape[:1])
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), orig.shape[:1])
    n_blocks = max(1, orig.shape[0] // block_size)
    if n_blocks > max_sample_blocks:
        # deterministic stride subsample at BLOCK granularity (keeps the
        # production block composition intact)
        stride = n_blocks // max_sample_blocks
        keep = (np.arange(n_blocks, step=stride) * block_size)[:, None] + np.arange(
            block_size
        )
        keep = keep.reshape(-1)
        orig = jnp.take(orig, jnp.asarray(keep), axis=0)
        dirs = jnp.take(dirs, jnp.asarray(keep), axis=0)
        t_min = jnp.take(t_min, jnp.asarray(keep), axis=0)
        t_max = jnp.take(t_max, jnp.asarray(keep), axis=0)

    # generous probe budgets: every super, up to the full bin count (capped
    # to keep the probe's top_k tractable on huge maps)
    cs_probe = min(bins.n_super, 256)
    cb_probe = min(bins.n_bins, cs_probe * bins.bins_per_super, 4096)
    counts = np.asarray(
        candidate_stats(
            bins, orig, dirs, t_min=t_min, t_max=t_max,
            block_size=block_size, c_super=cs_probe, c_bin=cb_probe,
        )
    )
    cmax = int(counts.max())
    # "saturated" only means the ARTIFICIAL probe caps clipped the count —
    # a block that holds every bin of a small map is exact, not clipped
    probe_capped = cb_probe < min(bins.n_bins, cs_probe * bins.bins_per_super)
    saturated = bool(cmax >= cb_probe and (probe_capped or cs_probe < bins.n_super))

    c_bin = min(_round_up(int(np.ceil(cmax * margin))), bins.n_bins)
    # supers: the candidates of one block span at most c_bin distinct
    # supers; budget the same margin over ceil(c_bin / S) with a floor
    S = bins.bins_per_super
    c_super = min(
        max(_round_up(int(np.ceil(c_bin / S * margin)) + 2, 4), 8),
        bins.n_super,
    )
    c_mid = 0
    M = bins.bins_per_mid
    if use_mid and bins.mid_aabb is not None and S // max(M, 1) > 1:
        # cover c_bin bins with mid boxes at the same margin
        c_mid = min(
            _round_up(int(np.ceil(c_bin / M * margin))),
            bins.n_mid,
        )
        # 3-level only pays when it shrinks the level-1 key count
        if c_mid * M >= c_super * S:
            c_mid = 0

    # VERIFY through the engine's real fused cull: the c_super derived
    # from bin counts bounds the supers holding candidates, but the super
    # budget truncates PASSING supers (cone-box hits), which can be more —
    # found round 5: c_super=24 silently dropped winners while the bin
    # audit read clean. Escalate c_super until no block saturates.
    from rmcl_tpu.ops.raycast_binned import block_cull_stats

    for _ in range(6):
        _, sat = block_cull_stats(
            bins, orig, dirs, t_min=t_min, t_max=t_max,
            block_size=block_size, c_super=c_super, c_bin=c_bin,
            c_mid=c_mid,
        )
        if not bool(np.asarray(sat).any()):
            break
        if c_super >= bins.n_super and c_bin >= min(
            bins.n_bins, c_super * S
        ):
            saturated = True
            break
        c_super = min(c_super * 2, bins.n_super)
        c_bin = min(max(c_bin, -(-c_super * S // 8)), bins.n_bins, c_super * S)
    return BudgetRecommendation(
        c_super=c_super,
        c_bin=c_bin,
        c_mid=c_mid,
        max_bins=cmax,
        p99_bins=float(np.percentile(counts, 99)),
        mean_bins=float(counts.mean()),
        saturated=saturated,
    )
