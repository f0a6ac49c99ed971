"""Correspondence search strategies for MICP-L.

TPU-native re-design of the reference's ``Correspondences_<MemT>`` hierarchy
(reference rmcl/include/rmcl/registration/Correspondences.hpp:16-88 and the
RCC{Embree,Optix,Vulkan}x{Spherical,Pinhole,O1Dn,OnDn} / CPCEmbree classes —
SURVEY.md §2.1). The backend x sensor x metric combinatorics collapse to two
pure functions over the shared BVH:

* :func:`find_rcc` — Ray-Cast Correspondences: simulate the sensor from the
  pose estimate; simulated hits are the model cloud
  (reference RCCEmbree.cpp:26-36 ``find()`` = ``simulate(Tbm_est, model)``).
* :func:`find_cpc` — Closest-Point Correspondences: classic ICP
  nearest-surface-point queries (reference CPCEmbree.cpp:18-44).

Both return a :class:`Correspondences` pytree in the sensor frame; the P2L
statistics reduction (:mod:`rmcl_tpu.micp.pipeline`) is shared.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rmcl_tpu.bvh.types import BVH
from rmcl_tpu.math.se3 import Transform
from rmcl_tpu.bvh.bins import TriangleBins
from rmcl_tpu.ops.closest_point import closest_points, closest_points_binned
from rmcl_tpu.sensors.models import SensorModel
from rmcl_tpu.sensors.simulate import simulate

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Correspondences:
    """Dataset↔model correspondence buffers in the sensor frame.

    Mirrors the reference's model ``Bundle<Points, Normals, Hits>``
    (Correspondences.hpp:81-85) next to the (externally held) dataset.
    """

    model_points: Array  # (N, 3)
    model_normals: Array  # (N, 3) unit, oriented toward the sensor
    found: Array  # (N,) bool — sim hit (RCC) / within max radius (CPC)


def find_rcc(
    bvh: BVH,
    model: SensorModel,
    tsm: Transform,
    chunk_size: int = 262144,
    c_super: int = 24,
    c_bin: int = 96,
    c_mid: int = 0,
    c_hyper: int = 0,
) -> Correspondences:
    """Ray-cast correspondences: one simulated hit per sensor pixel from the
    current pose estimate ``tsm`` (sensor→map = Tbm_est * Tsb).
    ``c_super``/``c_bin``/``c_mid`` tune the dense engine when ``bvh`` is
    bins (``c_mid > 0`` = 3-level cull)."""
    if isinstance(bvh, TriangleBins):
        hits = simulate(bvh, model, tsm, c_super=c_super, c_bin=c_bin,
                        c_mid=c_mid, c_hyper=c_hyper)
    else:
        hits = simulate(bvh, model, tsm, chunk_size=chunk_size)
    return Correspondences(
        model_points=hits.point, model_normals=hits.normal, found=hits.hit
    )


def find_cpc(
    bvh: BVH,
    dataset_points: Array,
    dataset_mask: Array,
    tsm: Transform,
    max_dist: float | Array,
    chunk_size: int = 65536,
    c_super: int = 24,
    c_bin: int = 96,
) -> Correspondences:
    """Closest-point correspondences: for every dataset point (sensor frame),
    the nearest mesh surface point within ``max_dist``
    (reference CPCEmbree::find — CPCEmbree.cpp:18-44: transform into map
    frame, ``map->closestPoint``, write back in sensor frame,
    hit = ``cp.d <= max_dist``). ``bvh`` may be ``TriangleBins`` — the
    dense binned distance engine then serves the query."""
    p_map = tsm.apply(dataset_points)
    if isinstance(bvh, TriangleBins):
        cp = closest_points_binned(
            bvh, p_map, max_dist=max_dist, c_super=c_super, c_bin=c_bin
        )
    else:
        cp = closest_points(bvh, p_map, max_dist=max_dist, chunk_size=chunk_size)
    inv = tsm.inverse()
    found = dataset_mask & cp.found
    normal = cp.normal
    # orient normals toward the query point (consistent signed distance)
    to_q = p_map - cp.point
    sign = jnp.where(jnp.sum(normal * to_q, axis=-1) < 0, -1.0, 1.0)
    normal = normal * sign[..., None]
    return Correspondences(
        model_points=jnp.where(found[..., None], inv.apply(cp.point), 0.0),
        model_normals=jnp.where(found[..., None], inv.rotate(normal), 0.0),
        found=found,
    )
