"""Per-ray time motion compensation (scan de-skew).

A spinning LiDAR captures its rays over the scan period; when the base
moves meanwhile, the raw sensor-frame points are expressed in *different*
sensor poses. The reference carries per-point stamps in its wire format
(``rmcl_msgs/RangeData.stamps`` — msg/RangeData.msg:1-10) and resolves TF
per *message* (``fetchTF(msg.stamp)`` — MICPSphericalSensorCPU.cpp:132-135,
``tf_time_source`` — micp_localization.cpp:116-185) but never uses the
per-point stamps; this module closes that gap (a strict superset of the
reference's behavior).

Model: the base pose in the odom frame is sampled at two times
(``tbo_a`` @ ``stamp_a``, ``tbo_b`` @ ``stamp_b`` — consecutive odometry
messages). Each point captured at absolute time ``t_i`` rides
``Tbo(t_i)`` = slerp/lerp between the samples; the de-skewed cloud
re-expresses every point in the sensor frame at the reference stamp:

    p'_i = (Tbo(ref) * Tsb)^-1 * Tbo(t_i) * Tsb * p_i

Alphas outside [0, 1] extrapolate along the same velocity (points arriving
slightly after the latest odom sample).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rmcl_tpu.math.se3 import Transform

Array = jax.Array


@jax.jit
def deskew_points(
    points_s: Array,  # (N, 3) sensor-frame points (captured at stamps)
    rel_stamps: Array,  # (N,) per-point time offsets from ``stamp_ref``
    stamp_ref: Array,  # scalar: message/header stamp (absolute)
    tsb: Transform,  # sensor -> base (static over the scan)
    tbo_a: Transform,  # base -> odom @ stamp_a
    stamp_a: Array,
    tbo_b: Transform,  # base -> odom @ stamp_b
    stamp_b: Array,
) -> Array:
    """De-skewed points, sensor frame at ``stamp_ref``. Differentiable.

    Degenerate odom pairs (|stamp_b - stamp_a| below 1 ms — duplicate or
    re-published samples) carry no velocity information: alphas collapse
    to 1 so the compensation becomes the identity instead of extrapolating
    the (noise) pose delta by ~1e8."""
    dt_raw = stamp_b - stamp_a
    degenerate = jnp.abs(dt_raw) < 1e-3
    dt = jnp.where(degenerate, 1.0, dt_raw)
    t_abs = stamp_ref + rel_stamps  # (N,)
    alpha_i = jnp.where(degenerate, 1.0, (t_abs - stamp_a) / dt)
    alpha_r = jnp.where(degenerate, 1.0, (stamp_ref - stamp_a) / dt)

    tbo_i = Transform.interp(tbo_a, tbo_b, alpha_i)  # (N,) batch
    tbo_r = Transform.interp(tbo_a, tbo_b, alpha_r)

    p_odom = tbo_i.apply(tsb.apply(points_s))
    sens_ref_inv = (tbo_r @ tsb).inverse()
    return sens_ref_inv.apply(p_odom)
