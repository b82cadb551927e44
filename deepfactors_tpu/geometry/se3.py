"""SE(3) / SO(3) utilities on the decoupled R^3 x SO(3) manifold.

TPU-native reimplementation of the reference semantics:
  - decoupled retract  t += dt;  R = exp(dw) @ R
    (reference: sources/core/gtsam/gtsam_traits.h:48-58)
  - local coordinates  [t_b - t_a, log(R_b R_a^-1)]
    (reference: sources/core/gtsam/gtsam_traits.h:66-72)
  - pose distance with translation/rotation weights, roll ignored
    (reference: sources/common/algorithm/warping.h:139-147)

Poses are stored as a pytree ``SE3`` of a unit quaternion ``q`` (wxyz, shape
[..., 4]) and translation ``t`` (shape [..., 3]) so they batch, vmap and shard
naturally. All functions are pure and jit/vmap-compatible; no Sophus port —
formulas are standard quaternion algebra.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-8


class SE3(NamedTuple):
    """Rigid transform: x -> R(q) @ x + t. Batched over leading dims."""

    q: Array  # [..., 4] unit quaternion, wxyz
    t: Array  # [..., 3]

    @property
    def batch_shape(self):
        return self.t.shape[:-1]

    def matrix(self) -> Array:
        """[..., 3, 3] rotation matrix."""
        return quat_to_matrix(self.q)

    def matrix4(self) -> Array:
        """[..., 4, 4] homogeneous matrix."""
        R = self.matrix()
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype),
            top.shape[:-2] + (1, 4),
        )
        return jnp.concatenate([top, bottom], axis=-2)


def identity(batch_shape=(), dtype=jnp.float32) -> SE3:
    q = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype), batch_shape + (4,)
    )
    t = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return SE3(q, t)


def from_matrix(T: Array) -> SE3:
    """Build SE3 from a [..., 4, 4] or [..., 3, 4] homogeneous matrix."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return SE3(matrix_to_quat(R), t)


# ----------------------------------------------------------------------------
# Quaternion algebra (wxyz)
# ----------------------------------------------------------------------------

def quat_mul(a: Array, b: Array) -> Array:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: Array) -> Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) v [..., 3] by quaternion(s) q [..., 4]."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * jnp.cross(u, uv + w * v)


def quat_normalize(q: Array) -> Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q: Array) -> Array:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return R


def matrix_to_quat(R: Array) -> Array:
    """Shepperd's method, branch-free via jnp.where (vmap/jit safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # four candidate quaternions (unnormalized)
    qw0 = safe_sqrt(1.0 + tr)
    c0 = jnp.stack([qw0, (m21 - m12) / qw0, (m02 - m20) / qw0, (m10 - m01) / qw0], -1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22)
    c1 = jnp.stack([(m21 - m12) / qx1, qx1, (m01 + m10) / qx1, (m02 + m20) / qx1], -1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22)
    c2 = jnp.stack([(m02 - m20) / qy2, (m01 + m10) / qy2, qy2, (m12 + m21) / qy2], -1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22)
    c3 = jnp.stack([(m10 - m01) / qz3, (m02 + m20) / qz3, (m12 + m21) / qz3, qz3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, c0, jnp.where(cond1, c1, jnp.where(cond2, c2, c3)))
    q = 0.5 * q
    return quat_normalize(q)


# ----------------------------------------------------------------------------
# SO(3) exp / log
# ----------------------------------------------------------------------------

def so3_exp_quat(w: Array) -> Array:
    """Axis-angle [..., 3] -> unit quaternion, Taylor-safe near zero."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    half = 0.5 * theta
    small = theta_sq < _EPS
    # sin(t/2)/t with series fallback
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / jnp.where(small, 1.0, theta))
    cw = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([cw, k * w], axis=-1)


def so3_log(q: Array) -> Array:
    """Unit quaternion -> axis-angle [..., 3], Taylor-safe near identity."""
    w = q[..., :1]
    v = q[..., 1:]
    # force positive hemisphere for shortest rotation
    sign = jnp.where(w < 0, -1.0, 1.0)
    w = w * sign
    v = v * sign
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    small = vn < _EPS
    theta = 2.0 * jnp.arctan2(vn, w)
    k = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), theta / jnp.where(small, 1.0, vn))
    return k * v


def hat(w: Array) -> Array:
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew matrix."""
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


# ----------------------------------------------------------------------------
# SE(3) group ops
# ----------------------------------------------------------------------------

def mul(a: SE3, b: SE3) -> SE3:
    """Compose: (a*b)(x) = a(b(x))."""
    return SE3(quat_normalize(quat_mul(a.q, b.q)), quat_rotate(a.q, b.t) + a.t)


def inverse(a: SE3) -> SE3:
    qi = quat_conj(a.q)
    return SE3(qi, -quat_rotate(qi, a.t))


def act(a: SE3, x: Array) -> Array:
    """Apply transform to points x [..., 3]."""
    return quat_rotate(a.q, x) + a.t


def retract(pose: SE3, delta: Array) -> SE3:
    """Decoupled retract (reference gtsam_traits.h:48-58):
    t_new = t + delta[:3];  R_new = exp(delta[3:]) @ R.
    """
    dt = delta[..., :3]
    dq = so3_exp_quat(delta[..., 3:6])
    return SE3(quat_normalize(quat_mul(dq, pose.q)), pose.t + dt)


def local(a: SE3, b: SE3) -> Array:
    """Inverse of retract: coordinates of b in tangent of a
    (reference gtsam_traits.h:66-72)."""
    dt = b.t - a.t
    dw = so3_log(quat_mul(b.q, quat_conj(a.q)))
    return jnp.concatenate([dt, dw], axis=-1)


def relative_pose(pose_a: SE3, pose_b: SE3) -> SE3:
    """pose_ab = pose_a^-1 * pose_b (reference warping.h:98-103)."""
    return mul(inverse(pose_a), pose_b)


def relative_pose_jacobians(pose_a: SE3, pose_b: SE3):
    """Relative pose + 6x6 Jacobians of its decoupled-tangent coordinates
    w.r.t. perturbations of pose_a and pose_b (reference warping.h:105-137).

    Returns (pose_ab, jac_a [..., 6, 6], jac_b [..., 6, 6]).
    """
    pose_ab = relative_pose(pose_a, pose_b)
    rot_a_T = jnp.swapaxes(quat_to_matrix(pose_a.q), -1, -2)
    d = pose_a.t - pose_b.t
    z = jnp.zeros_like(rot_a_T)

    ja_tt = -rot_a_T
    ja_tw = -hat(jnp.einsum("...ij,...j->...i", rot_a_T, d)) @ rot_a_T
    ja_wt = z
    ja_ww = -rot_a_T
    jac_a = jnp.concatenate(
        [
            jnp.concatenate([ja_tt, ja_tw], axis=-1),
            jnp.concatenate([ja_wt, ja_ww], axis=-1),
        ],
        axis=-2,
    )

    jb_tt = rot_a_T
    jac_b = jnp.concatenate(
        [
            jnp.concatenate([jb_tt, z], axis=-1),
            jnp.concatenate([z, rot_a_T], axis=-1),
        ],
        axis=-2,
    )
    return pose_ab, jac_a, jac_b


def pose_distance(pose_a: SE3, pose_b: SE3, trs_wgt=8.0, rot_wgt=3.0) -> Array:
    """Weighted translation+rotation distance, roll ignored
    (reference warping.h:139-147)."""
    rel = relative_pose(pose_a, pose_b)
    w = so3_log(rel.q)
    drot = jnp.linalg.norm(w[..., :2], axis=-1)
    dtrs = jnp.linalg.norm(rel.t, axis=-1)
    return dtrs * trs_wgt + drot * rot_wgt


def transform_jacobian_pose(pt: Array, pose: SE3) -> Array:
    """d(R x + t)/d(t, w) = [I | -(Rx)^], shape [..., 3, 6]
    (reference warping.h:156-164)."""
    Rx = quat_rotate(pose.q, pt)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pt.dtype), Rx.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -hat(Rx)], axis=-1)


def transform_jacobian_point(pose: SE3) -> Array:
    """d(R x + t)/dx = R (reference warping.h:172-177)."""
    return quat_to_matrix(pose.q)


def stack(poses) -> SE3:
    """Stack a list of SE3 into a batched SE3."""
    return SE3(
        jnp.stack([p.q for p in poses], axis=0),
        jnp.stack([p.t for p in poses], axis=0),
    )


def index(pose: SE3, i) -> SE3:
    return SE3(pose.q[i], pose.t[i])
