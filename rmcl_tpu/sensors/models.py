"""Sensor models as pure ray-generator functions.

TPU-native replacement for rmagine's sensor-model structs
(``SphericalModel``, ``PinholeModel``, ``O1DnModel``, ``OnDnModel`` —
SURVEY.md §2.9; semantics of getDirection/getOrigin at reference
MICPSphericalSensorCPU.cpp:212-229, pc2_to_scan.cpp:157-205).

Each model is a frozen dataclass pytree that produces the full (origins,
directions) ray bundle **in the sensor frame** via ``rays()``; poses are
applied by the caller (``Transform.apply`` / ``rotate``), so one jitted ray
caster serves every sensor. Row-major pixel order matches the reference's
``getBufferId = vid * width + hid`` (spherical/pinhole) so unpacked data
aligns 1:1.

All four models also expose the grid metadata the conversion utilities need
(phi/theta binning for pointcloud→scan projection etc.).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RangeInterval:
    """Min/max valid range (reference rmagine ``Interval`` on every model)."""

    min: Array
    max: Array

    @staticmethod
    def of(lo: float, hi: float) -> "RangeInterval":
        return RangeInterval(jnp.float32(lo), jnp.float32(hi))

    def contains(self, r: Array) -> Array:
        return (r >= self.min) & (r <= self.max)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SphericalModel:
    """Rotating LiDAR grid: ``width`` azimuth steps x ``height`` elevation
    steps (reference rmcl_msgs/msg/ScanInfo.msg:1-14: phi_min/phi_inc theta_
    min/theta_inc + range limits)."""

    theta_min: Array  # horizontal / azimuth start (rad) — width axis
    theta_inc: Array  # azimuth increment
    phi_min: Array  # vertical / elevation start — height axis
    phi_inc: Array  # elevation increment
    range: RangeInterval
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(
        width: int,
        height: int,
        theta_min: float = -3.14159265,
        theta_max: float = 3.14159265,
        phi_min: float = -0.2617994,  # -15 deg (VLP-16)
        phi_max: float = 0.2617994,
        range_min: float = 0.1,
        range_max: float = 130.0,
        theta_endpoint: bool = False,
        phi_endpoint: bool = True,
    ) -> "SphericalModel":
        """Angle naming follows rmagine / rmcl_msgs ScanInfo.msg: theta is
        the horizontal azimuth (width axis), phi the vertical elevation
        (height axis)."""
        theta_inc = (theta_max - theta_min) / (
            width - 1 if theta_endpoint and width > 1 else width
        )
        phi_inc = (
            (phi_max - phi_min) / (height - 1 if phi_endpoint and height > 1 else height)
            if height > 1
            else 0.0
        )
        return SphericalModel(
            theta_min=jnp.float32(theta_min),
            theta_inc=jnp.float32(theta_inc),
            phi_min=jnp.float32(phi_min),
            phi_inc=jnp.float32(phi_inc),
            range=RangeInterval.of(range_min, range_max),
            width=width,
            height=height,
        )

    @staticmethod
    def vlp16(width: int = 900) -> "SphericalModel":
        """The reference benchmark's Velodyne VLP-16 model (900x16 —
        lidar_corrector_embree_benchmark.cpp workload, BASELINE.md)."""
        return SphericalModel.create(width=width, height=16)

    @property
    def n_rays(self) -> int:
        return self.width * self.height

    def angles(self) -> Tuple[Array, Array]:
        """(theta[width] azimuth, phi[height] elevation) grids."""
        w = jnp.arange(self.width, dtype=jnp.float32)
        h = jnp.arange(self.height, dtype=jnp.float32)
        return self.theta_min + w * self.theta_inc, self.phi_min + h * self.phi_inc

    def rays(self) -> Tuple[Array, Array]:
        """Sensor-frame ray bundle: origins (N,3) zeros, dirs (N,3).

        Pixel order: row-major (height, width) → id = v*width + u, matching
        the reference's getBufferId."""
        theta, phi = self.angles()
        az = theta[None, :]  # (1, W) azimuth
        el = phi[:, None]  # (H, 1) elevation
        ce = jnp.cos(el)
        dirs = jnp.stack(
            [
                jnp.broadcast_to(ce * jnp.cos(az), (self.height, self.width)),
                jnp.broadcast_to(ce * jnp.sin(az), (self.height, self.width)),
                jnp.broadcast_to(jnp.sin(el) * jnp.ones_like(az), (self.height, self.width)),
            ],
            axis=-1,
        ).reshape(-1, 3)
        return jnp.zeros_like(dirs), dirs

    def polar_to_cartesian(self, ranges: Array) -> Array:
        """(H*W,) ranges → (H*W, 3) sensor-frame points (unpackMessage —
        reference MICPSphericalSensorCPU.cpp:181-233)."""
        _, dirs = self.rays()
        return dirs * ranges[..., None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PinholeModel:
    """Depth camera intrinsics (reference rmcl_msgs DepthInfo; rmagine
    PinholeModel). Camera convention: z forward, x right, y down."""

    fx: Array
    fy: Array
    cx: Array
    cy: Array
    range: RangeInterval
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(
        width: int,
        height: int,
        fx: float,
        fy: float,
        cx: float,
        cy: float,
        range_min: float = 0.3,
        range_max: float = 8.0,
    ) -> "PinholeModel":
        return PinholeModel(
            fx=jnp.float32(fx),
            fy=jnp.float32(fy),
            cx=jnp.float32(cx),
            cy=jnp.float32(cy),
            range=RangeInterval.of(range_min, range_max),
            width=width,
            height=height,
        )

    @property
    def n_rays(self) -> int:
        return self.width * self.height

    def rays(self) -> Tuple[Array, Array]:
        u = jnp.arange(self.width, dtype=jnp.float32)[None, :]
        v = jnp.arange(self.height, dtype=jnp.float32)[:, None]
        x = (u - self.cx) / self.fx
        y = (v - self.cy) / self.fy
        dirs = jnp.stack(
            [
                jnp.broadcast_to(x, (self.height, self.width)),
                jnp.broadcast_to(y, (self.height, self.width)),
                jnp.ones((self.height, self.width), jnp.float32),
            ],
            axis=-1,
        )
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        return jnp.zeros((self.n_rays, 3), jnp.float32), dirs.reshape(-1, 3)

    def depth_to_cartesian(self, depth: Array) -> Array:
        """z-depth image (H*W,) → (H*W, 3) points. Depth is along +z (not
        along the ray), matching depth-image conventions."""
        u = jnp.arange(self.width, dtype=jnp.float32)[None, :]
        v = jnp.arange(self.height, dtype=jnp.float32)[:, None]
        z = depth.reshape(self.height, self.width)
        x = (u - self.cx) / self.fx * z
        y = (v - self.cy) / self.fy * z
        return jnp.stack([x, y, z], -1).reshape(-1, 3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class O1DnModel:
    """One origin, N arbitrary directions — generic LiDAR
    (reference rmcl_msgs O1DnInfo)."""

    orig: Array  # (3,)
    dirs: Array  # (N, 3)
    range: RangeInterval

    @staticmethod
    def create(dirs: Array, orig=None, range_min: float = 0.0, range_max: float = 1e3) -> "O1DnModel":
        dirs = jnp.asarray(dirs, jnp.float32)
        if orig is None:
            orig = jnp.zeros(3, jnp.float32)
        return O1DnModel(
            orig=jnp.asarray(orig, jnp.float32),
            dirs=dirs,
            range=RangeInterval.of(range_min, range_max),
        )

    @property
    def n_rays(self) -> int:
        return self.dirs.shape[0]

    def rays(self) -> Tuple[Array, Array]:
        return jnp.broadcast_to(self.orig, self.dirs.shape), self.dirs

    def polar_to_cartesian(self, ranges: Array) -> Array:
        return self.orig + self.dirs * ranges[..., None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OnDnModel:
    """N origins, N directions — fully generic (reference rmcl_msgs OnDnInfo)."""

    origs: Array  # (N, 3)
    dirs: Array  # (N, 3)
    range: RangeInterval

    @staticmethod
    def create(origs: Array, dirs: Array, range_min: float = 0.0, range_max: float = 1e3) -> "OnDnModel":
        return OnDnModel(
            origs=jnp.asarray(origs, jnp.float32),
            dirs=jnp.asarray(dirs, jnp.float32),
            range=RangeInterval.of(range_min, range_max),
        )

    @property
    def n_rays(self) -> int:
        return self.dirs.shape[0]

    def rays(self) -> Tuple[Array, Array]:
        return self.origs, self.dirs

    def polar_to_cartesian(self, ranges: Array) -> Array:
        return self.origs + self.dirs * ranges[..., None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RaySliceModel:
    """A contiguous window of another model's ray grid.

    Used by the sharded MICP correction (``shard_map`` over rays): each
    shard simulates only its own slice of the sensor's pixels —
    ``start = axis_index * size`` — so the RC ray cast is purely
    shard-local while the model stays replicated. A contiguous slice of a
    scan grid stays spatially coherent, which the dense binned engine's
    block cull depends on."""

    inner: "SensorModel"
    start: Array  # () int32 — may be traced (axis_index inside shard_map)
    size: int = dataclasses.field(metadata=dict(static=True))

    @property
    def range(self) -> RangeInterval:
        return self.inner.range

    @property
    def n_rays(self) -> int:
        return self.size

    def rays(self) -> Tuple[Array, Array]:
        o, d = self.inner.rays()
        o = jnp.broadcast_to(o, d.shape)
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, self.start, self.size, 0)
        return sl(o), sl(d)


SensorModel = SphericalModel | PinholeModel | O1DnModel | OnDnModel | RaySliceModel
