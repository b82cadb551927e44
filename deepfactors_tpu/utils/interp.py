"""Pose interpolation + critically-damped springs (common/interp.h:24-78).

Used by the headless visualizer's smooth camera follow (the reference GUI
eases its view toward the live camera with these)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3


def lerp(a, b, t: float):
    return a + (b - a) * t


def slerp(q0, q1, t: float):
    """Quaternion slerp (wxyz), shortest arc."""
    q0 = jnp.asarray(q0)
    q1 = jnp.asarray(q1)
    d = jnp.sum(q0 * q1)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    # fall back to nlerp near parallel
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    s = jnp.sin(theta)
    w0 = jnp.where(s > 1e-6, jnp.sin((1 - t) * theta) / s, 1 - t)
    w1 = jnp.where(s > 1e-6, jnp.sin(t * theta) / s, t)
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q)


def interpolate_pose(p0: SE3, p1: SE3, t: float) -> SE3:
    """SE3 interpolation: slerp rotation + lerp translation
    (interp.h Interpolate)."""
    return SE3(slerp(p0.q, p1.q, t), lerp(p0.t, p1.t, t))


class DampedSpring:
    """Critically-damped spring toward a moving target pose
    (interp.h:24-78). step(target, dt) eases the state toward target."""

    def __init__(self, pose: SE3, smoothness: float = 0.5):
        self.pose = pose
        self.smoothness = smoothness

    def step(self, target: SE3, dt: float) -> SE3:
        alpha = 1.0 - float(np.exp(-dt / max(self.smoothness, 1e-6)))
        self.pose = interpolate_pose(self.pose, target, alpha)
        return self.pose
