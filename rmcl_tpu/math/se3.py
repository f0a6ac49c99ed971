"""SE(3) rigid transforms as JAX pytrees.

TPU-native replacement for the rmagine math types the reference is written
against (``Transform`` quat+vec with ``~T`` inverse and composition,
``Quaternion``, ``EulerAngles`` — SURVEY.md §2.9, usage e.g.
reference rmcl_ros/src/nodes/micp_localization.cpp:489-496).

Design: a ``Transform`` is a frozen dataclass pytree of two arrays —
``rot`` (..., 4) unit quaternion stored **[w, x, y, z]** and ``trans``
(..., 3).  All operations broadcast over leading batch dimensions, so a
particle cloud of one million poses is a single ``Transform`` with
``rot.shape == (1_000_000, 4)`` — SoA layout, vmap/pjit friendly.

Conventions:
  * ``a @ b`` (or ``a.compose(b)``) means "apply ``b`` first, then ``a``"
    (column-vector convention, same as the reference's ``Tom * Tbo``).
  * ``T.apply(p)`` maps points from the source frame into the target frame.
  * Euler angles are intrinsic roll(x)-pitch(y)-yaw(z), composed as
    ``Rz(yaw) @ Ry(pitch) @ Rx(roll)`` (ROS / rmagine convention).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Quaternion helpers (functional, array-in array-out, wxyz layout)
# ---------------------------------------------------------------------------


class Quaternion:
    """Namespace of unit-quaternion ops on (..., 4) arrays in [w,x,y,z]."""

    @staticmethod
    def identity(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> Array:
        q = jnp.zeros(batch_shape + (4,), dtype)
        return q.at[..., 0].set(1.0)

    @staticmethod
    def mul(a: Array, b: Array) -> Array:
        aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        return jnp.stack(
            [
                aw * bw - ax * bx - ay * by - az * bz,
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
            ],
            axis=-1,
        )

    @staticmethod
    def conj(q: Array) -> Array:
        return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)

    @staticmethod
    def normalize(q: Array, eps: float = 1e-12) -> Array:
        n = jnp.linalg.norm(q, axis=-1, keepdims=True)
        return q / jnp.maximum(n, eps)

    @staticmethod
    def rotate(q: Array, v: Array) -> Array:
        """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
        qw = q[..., :1]
        qv = q[..., 1:]
        # v' = v + 2 qv x (qv x v + qw v)
        t = 2.0 * jnp.cross(qv, v)
        return v + qw * t + jnp.cross(qv, t)

    @staticmethod
    def from_axis_angle(axis: Array, angle: Array) -> Array:
        axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
        half = 0.5 * angle
        w = jnp.cos(half)[..., None]
        xyz = axis * jnp.sin(half)[..., None]
        return jnp.concatenate([w, xyz], axis=-1)

    @staticmethod
    def from_euler(roll: Array, pitch: Array, yaw: Array) -> Array:
        """Rz(yaw) Ry(pitch) Rx(roll), matching rmagine EulerAngles."""
        cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
        cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
        cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
        return jnp.stack(
            [
                cy * cp * cr + sy * sp * sr,
                cy * cp * sr - sy * sp * cr,
                cy * sp * cr + sy * cp * sr,
                sy * cp * cr - cy * sp * sr,
            ],
            axis=-1,
        )

    @staticmethod
    def to_euler(q: Array) -> Tuple[Array, Array, Array]:
        w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
        sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
        pitch = jnp.arcsin(sinp)
        yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
        return roll, pitch, yaw

    @staticmethod
    def to_matrix(q: Array) -> Array:
        w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        r00 = 1 - 2 * (y * y + z * z)
        r01 = 2 * (x * y - w * z)
        r02 = 2 * (x * z + w * y)
        r10 = 2 * (x * y + w * z)
        r11 = 1 - 2 * (x * x + z * z)
        r12 = 2 * (y * z - w * x)
        r20 = 2 * (x * z - w * y)
        r21 = 2 * (y * z + w * x)
        r22 = 1 - 2 * (x * x + y * y)
        rows = [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ]
        return jnp.stack(rows, axis=-2)

    @staticmethod
    def from_matrix(m: Array) -> Array:
        """Robust (Shepperd) rotation-matrix → quaternion, branch-free."""
        m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
        m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
        m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
        tr = m00 + m11 + m22
        # four candidate quaternions, pick the numerically best per element
        qw = jnp.stack(
            [1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1
        )
        qx = jnp.stack(
            [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1
        )
        qy = jnp.stack(
            [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1
        )
        qz = jnp.stack(
            [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1
        )
        cases = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
        scores = jnp.stack(
            [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
        )
        best = jnp.argmax(scores, axis=-1)
        q = jnp.take_along_axis(cases, best[..., None, None].repeat(4, -1), axis=-2)
        q = q[..., 0, :]
        q = Quaternion.normalize(q)
        # canonical sign: w >= 0
        return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)

    @staticmethod
    def slerp(a: Array, b: Array, t: Array) -> Array:
        dot = jnp.sum(a * b, axis=-1, keepdims=True)
        b = jnp.where(dot < 0, -b, b)
        dot = jnp.abs(dot)
        theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        sin_theta = jnp.sin(theta)
        small = sin_theta < 1e-6
        w_a = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
        w_b = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
        return Quaternion.normalize(w_a * a + w_b * b)

    @staticmethod
    def log(q: Array) -> Array:
        """Rotation-vector (axis*angle) log map, (...,4) → (...,3)."""
        q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # shortest arc
        w = jnp.clip(q[..., 0], -1.0, 1.0)
        v = q[..., 1:]
        vn = jnp.linalg.norm(v, axis=-1)
        angle = 2.0 * jnp.arctan2(vn, w)
        scale = jnp.where(vn < 1e-9, 2.0, angle / jnp.where(vn < 1e-9, 1.0, vn))
        return v * scale[..., None]

    @staticmethod
    def exp(v: Array) -> Array:
        """Rotation-vector exp map, (...,3) → (...,4).

        Gradient-safe at v = 0 (plain jnp.linalg.norm has a NaN gradient
        there; the clamped sqrt keeps the Taylor branch's gradient clean)."""
        sum_sq = jnp.sum(v * v, axis=-1, keepdims=True)
        angle = jnp.sqrt(jnp.maximum(sum_sq, 1e-24))
        half = 0.5 * angle
        small = sum_sq < 1e-18
        k = jnp.where(small, 0.5 - sum_sq / 48.0, jnp.sin(half) / angle)
        return jnp.concatenate([jnp.cos(half), v * k], axis=-1)


# ---------------------------------------------------------------------------
# EulerAngles — thin record for parity with rmagine's type
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EulerAngles:
    roll: Array
    pitch: Array
    yaw: Array

    def to_quaternion(self) -> Array:
        return Quaternion.from_euler(self.roll, self.pitch, self.yaw)


# ---------------------------------------------------------------------------
# Transform
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Transform:
    """Rigid transform: rotation quaternion [w,x,y,z] + translation."""

    rot: Array  # (..., 4)
    trans: Array  # (..., 3)

    # -- constructors -------------------------------------------------------

    @staticmethod
    def identity(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "Transform":
        return Transform(
            rot=Quaternion.identity(batch_shape, dtype),
            trans=jnp.zeros(batch_shape + (3,), dtype),
        )

    @staticmethod
    def from_xyz_euler(xyz: Array, euler: Array) -> "Transform":
        """From 6-vector blocks: xyz (...,3) translation, euler (...,3) rpy."""
        return Transform(
            rot=Quaternion.from_euler(euler[..., 0], euler[..., 1], euler[..., 2]),
            trans=jnp.asarray(xyz),
        )

    @staticmethod
    def from_pose_tuple(pose: Array) -> "Transform":
        """From the reference's 6-tuple (x,y,z,roll,pitch,yaw) or 7-tuple
        (x,y,z,qx,qy,qz,qw) ``initial_pose_guess`` format
        (reference micp_localization.cpp:166-185)."""
        pose = jnp.asarray(pose, jnp.float32)
        if pose.shape[-1] == 6:
            return Transform.from_xyz_euler(pose[..., :3], pose[..., 3:])
        if pose.shape[-1] == 7:
            q_xyzw = pose[..., 3:]
            q = jnp.concatenate([q_xyzw[..., 3:4], q_xyzw[..., 0:3]], axis=-1)
            return Transform(rot=Quaternion.normalize(q), trans=pose[..., :3])
        raise ValueError(f"pose tuple must have 6 or 7 entries, got {pose.shape}")

    @staticmethod
    def from_matrix(m: Array) -> "Transform":
        return Transform(rot=Quaternion.from_matrix(m[..., :3, :3]), trans=m[..., :3, 3])

    # -- core algebra -------------------------------------------------------

    def compose(self, other: "Transform") -> "Transform":
        """self ∘ other — apply ``other`` first."""
        return Transform(
            rot=Quaternion.mul(self.rot, other.rot),
            trans=Quaternion.rotate(self.rot, other.trans) + self.trans,
        )

    def __matmul__(self, other: "Transform") -> "Transform":
        return self.compose(other)

    def inverse(self) -> "Transform":
        rinv = Quaternion.conj(self.rot)
        return Transform(rot=rinv, trans=-Quaternion.rotate(rinv, self.trans))

    def __invert__(self) -> "Transform":
        return self.inverse()

    def apply(self, points: Array) -> Array:
        """Transform points (..., 3). Broadcasts batch dims."""
        return Quaternion.rotate(self.rot, points) + self.trans

    def rotate(self, vectors: Array) -> Array:
        """Rotate direction vectors (no translation)."""
        return Quaternion.rotate(self.rot, vectors)

    def normalized(self) -> "Transform":
        """Re-normalize the quaternion (reference renormalizes every update,
        micp_localization.cpp:983)."""
        return Transform(rot=Quaternion.normalize(self.rot), trans=self.trans)

    @staticmethod
    def interp(a: "Transform", b: "Transform", alpha: Array) -> "Transform":
        """Pose interpolation: quaternion slerp + translation lerp.

        ``alpha`` broadcasts against the batch shapes ((N,) alpha with
        scalar a/b gives a (N,) batch — the per-ray de-skew case). Values
        slightly outside [0, 1] extrapolate along the same screw path (the
        slerp weights are geodesic, not clamped)."""
        al = jnp.asarray(alpha, jnp.float32)[..., None]
        return Transform(
            rot=Quaternion.slerp(a.rot, b.rot, al),
            trans=a.trans + al * (b.trans - a.trans),
        )

    # -- conversions --------------------------------------------------------

    def to_matrix(self) -> Array:
        rot = Quaternion.to_matrix(self.rot)
        top = jnp.concatenate([rot, self.trans[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
            top.shape[:-2] + (1, 4),
        )
        return jnp.concatenate([top, bottom], axis=-2)

    def log6(self) -> Array:
        """6-vector [t, rotvec] — used for pose covariance / convergence."""
        return jnp.concatenate([self.trans, Quaternion.log(self.rot)], axis=-1)

    # -- misc ---------------------------------------------------------------

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.trans.shape[:-1]

    def is_finite(self) -> Array:
        """NaN guard — mirrors ``check(Transform)``
        (reference micp_localization.cpp:62-106)."""
        return jnp.isfinite(self.rot).all(axis=-1) & jnp.isfinite(self.trans).all(axis=-1)

    def __getitem__(self, idx) -> "Transform":
        return Transform(rot=self.rot[idx], trans=self.trans[idx])

    def expand_dims(self, axis: int = -1) -> "Transform":
        """Insert a new batch axis (axis counts within the batch dims)."""
        a = axis if axis >= 0 else axis - 1
        return Transform(
            rot=jnp.expand_dims(self.rot, a), trans=jnp.expand_dims(self.trans, a)
        )

    def reshape(self, batch_shape: Tuple[int, ...]) -> "Transform":
        return Transform(
            rot=self.rot.reshape(batch_shape + (4,)),
            trans=self.trans.reshape(batch_shape + (3,)),
        )


def transform_stack(transforms) -> Transform:
    """Stack a python list of Transforms along a new leading axis."""
    return Transform(
        rot=jnp.stack([t.rot for t in transforms]),
        trans=jnp.stack([t.trans for t in transforms]),
    )
