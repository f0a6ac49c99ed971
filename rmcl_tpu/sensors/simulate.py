"""Sensor simulation: pose x sensor model x mesh BVH → simulated hits.

Replaces rmagine's per-backend simulators
(``{Sphere,Pinhole,O1Dn,OnDn}Simulator{Embree,Optix,Vulkan}`` with
``setTsb``/``setModel``/``simulate(Tbm, Bundle<...>)`` — SURVEY.md §2.9,
usage at reference RCCEmbree.hpp:18-83, scan_map_segmentation_embree.cpp:82-88)
with one pure function over the shared ray-cast kernel.

Results are returned in the **sensor frame** (like rmagine's simulators), so
downstream correspondence math matches the reference layer by layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.bins import TriangleBins
from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.ops.raycast import NO_HIT_T, RayHits, cast_rays
from rmcl_tpu.ops.raycast_binned import cast_rays_binned
from rmcl_tpu.sensors.models import SensorModel

Array = jax.Array


def simulate(
    bvh: "BVH | TriangleBins",
    model: SensorModel,
    tsm: Transform,
    chunk_size: int = 262144,
    **binned_kw,
) -> RayHits:
    """Simulate the sensor at pose(s) ``tsm`` (sensor→map).

    tsm may be batched: batch shape B gives hits with shape (B..., n_rays).
    Points and normals are expressed in the sensor frame (rmagine
    convention: the caller folds Tsb/Tbm itself — reference
    MICPSensor.hpp:146-151 computes Tbm = Tom * Tbo then simulates).

    The acceleration structure selects the engine: a ``BVH`` uses the
    exact traversal (``ops.raycast``); ``TriangleBins`` uses the dense
    binned engine (``ops.raycast_binned`` — the TPU hot path; scan grids
    are coherent by construction). ``binned_kw`` forwards tuning knobs
    (``c_super``/``c_bin``/``block_size``/...) to the binned engine.
    """
    o_s, d_s = model.rays()  # (N, 3) sensor frame
    batch_shape = tsm.batch_shape
    # map-frame rays: origins/dirs for every pose in the batch
    tsm_b = tsm.expand_dims(-1) if batch_shape else tsm
    o_m = tsm_b.apply(o_s)
    d_m = tsm_b.rotate(d_s)

    t_max = jnp.minimum(jnp.float32(model.range.max), NO_HIT_T)
    if isinstance(bvh, TriangleBins):
        hits = cast_rays_binned(
            bvh, o_m, d_m, t_min=model.range.min, t_max=t_max, **binned_kw
        )
    else:
        hits = cast_rays(
            bvh,
            o_m,
            d_m,
            t_min=model.range.min,
            t_max=t_max,
            chunk_size=chunk_size,
        )
    # fold back into the sensor frame
    inv = tsm_b.inverse()
    point_s = jnp.where(
        hits.hit[..., None], inv.apply(hits.point), 0.0
    )
    normal_s = jnp.where(hits.hit[..., None], inv.rotate(hits.normal), 0.0)
    return RayHits(
        t=hits.t,
        hit=hits.hit,
        prim_id=hits.prim_id,
        inst_id=hits.inst_id,
        point=point_s,
        normal=normal_s,
    )


def simulate_ranges(
    bvh: BVH,
    model: SensorModel,
    tsm: Transform,
    miss_value: float = 0.0,
    chunk_size: int = 262144,
) -> Array:
    """Range image only; misses mapped to ``miss_value`` (differentiable)."""
    hits = simulate(bvh, model, tsm, chunk_size=chunk_size)
    return jnp.where(hits.hit, hits.t, miss_value)
