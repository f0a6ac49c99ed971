"""Map segmentation: classify scan points as dynamic-obstacle vs stale-map.

TPU-native equivalent of the reference's map-segmentation filter nodes
(reference rmcl_ros/src/nodes/filter/scan_map_segmentation_embree.cpp:100-195,
o1dn_map_segmentation_embree.cpp, map_segmentation.cpp — SURVEY.md §2.6):
simulate the sensor from the localized pose, compare the real scan per beam
against the simulated range using the point-to-plane distance, and classify

  * scan outliers — real return in front of the map surface by more than
    ``min_dist_outlier_scan``  → dynamic obstacle not in the map;
  * map outliers  — real return behind the simulated surface (or sim hit
    with no real return) by more than ``min_dist_outlier_map``
    → stale/wrong map geometry.

One jitted batch op instead of per-beam loops; returns dense masks (no
dynamic-size outputs) plus the relevant points, so callers can compact or
stream them as needed.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.sensors.models import SensorModel
from rmcl_tpu.sensors.simulate import simulate

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SegmentationResult:
    """Dense per-beam classification (sensor frame)."""

    scan_outlier: Array  # (N,) bool — dynamic obstacle candidates
    map_outlier: Array  # (N,) bool — stale map geometry candidates
    scan_points: Array  # (N, 3) real points (valid where scan_outlier)
    map_points: Array  # (N, 3) simulated points (valid where map_outlier)
    plane_dist: Array  # (N,) point-to-plane distance (0 where undefined)


def segment_scan(
    bvh: BVH,
    model: SensorModel,
    tsm: Transform,
    ranges_real: Array,
    min_dist_outlier_scan: float = 0.15,
    min_dist_outlier_map: float = 0.15,
    chunk_size: int = 262144,
    mask_real: Array | None = None,
) -> SegmentationResult:
    """Classify one scan against the map from pose ``tsm`` (sensor→map).

    Decision table (mirrors the reference exactly):
      real valid, sim valid, real < sim, plane_dist > thresh → scan outlier
      real valid, sim valid, real >= sim, plane_dist > thresh → map outlier
      real valid, sim invalid → scan outlier
      real invalid, sim valid → map outlier

    ``mask_real`` optionally ANDs the RangeData.mask channel into the
    real-validity gate (dropped beams are neither scan nor map outliers).
    """
    ranges_real = jnp.asarray(ranges_real, jnp.float32)
    sim = simulate(bvh, model, tsm, chunk_size=chunk_size)
    o_s, d_s = model.rays()

    real_valid = model.range.contains(ranges_real)
    if mask_real is not None:
        # dropped beams encoded as in-range sentinels (e.g. range 0 with
        # range_min 0, the pointcloud_to_o1dn convention) must not classify
        # as dynamic obstacles — AND in the RangeData.mask channel
        real_valid = real_valid & jnp.asarray(mask_real, bool)
    sim_valid = sim.hit & model.range.contains(sim.t)

    p_real = o_s + d_s * ranges_real[..., None]
    p_sim = sim.point  # sensor frame
    n_sim = sim.normal

    signed = jnp.sum((p_real - p_sim) * n_sim, axis=-1)
    plane_dist = jnp.where(sim_valid, jnp.abs(signed), 0.0)

    in_front = ranges_real < sim.t
    scan_outlier = real_valid & (
        (sim_valid & in_front & (plane_dist > min_dist_outlier_scan))
        | ~sim_valid
    )
    map_outlier = (
        real_valid & sim_valid & ~in_front & (plane_dist > min_dist_outlier_map)
    ) | (~real_valid & sim_valid)

    return SegmentationResult(
        scan_outlier=scan_outlier,
        map_outlier=map_outlier,
        scan_points=jnp.where(real_valid[..., None], p_real, 0.0),
        map_points=jnp.where(sim_valid[..., None], p_sim, 0.0),
        plane_dist=plane_dist,
    )
