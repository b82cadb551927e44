"""Pinhole camera model with analytic Jacobians.

Reimplements the reference semantics (sources/common/algorithm/pinhole_camera.h
and pinhole_camera_impl.h) as vectorized JAX functions. A camera is a small
pytree of scalars so it can be traced / vmapped; width/height participate only
in validity masks, never in shapes (shapes come from image arrays).

Pixel convention matches the reference: pix = (x, y), x in [0, W), image array
storage is [H, W] (row y, column x). ``Reproject`` treats integer pixel
coordinates directly (no half-pixel offset), exactly like the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


def _host_camera(cam) -> bool:
    """True when every intrinsic is host-resident (numpy / python scalar).

    Cameras are HOST scalars by design: they are closed over by nearly every
    jitted program, and a captured *device* constant — even a 0-d scalar —
    permanently flips the axon tunnel into a degraded transfer mode
    (~7 GB/s -> ~55 MB/s + ~5 ms per host upload; measured round 5). Host
    scalars lower as HLO literals instead and are safe. Traced (vmapped)
    cameras keep working through the jnp branches below."""
    return not any(isinstance(x, jax.Array) for x in cam)


class PinholeCamera(NamedTuple):
    fx: Array
    fy: Array
    u0: Array
    v0: Array
    width: Array
    height: Array

    @classmethod
    def create(cls, fx, fy, u0, v0, width, height, dtype=jnp.float32):
        # host numpy scalars, NOT jnp: see _host_camera
        npdt = np.dtype(dtype)
        mk = lambda v: (v if isinstance(v, jax.Array)
                        else np.asarray(v, dtype=npdt))
        return cls(mk(fx), mk(fy), mk(u0), mk(v0), mk(width), mk(height))

    def matrix(self) -> Array:
        K = jnp.eye(3, dtype=jnp.asarray(self.fx).dtype)
        K = K.at[0, 0].set(self.fx).at[1, 1].set(self.fy)
        K = K.at[0, 2].set(self.u0).at[1, 2].set(self.v0)
        return K

    def level(self, lvl: int) -> "PinholeCamera":
        """Camera for pyramid level ``lvl`` (level 0 = finest).

        Matches reference CameraPyramid halving (camera_pyramid.h:35-48):
        integer-halve the viewport each level and rescale intrinsics by the
        actual ratio via ResizeViewport semantics.
        """
        xp = np if _host_camera(self) else jnp
        cam = self
        for _ in range(lvl):
            new_w = xp.floor(cam.width / 2)
            new_h = xp.floor(cam.height / 2)
            xr = new_w / cam.width
            yr = new_h / cam.height
            cam = PinholeCamera(
                cam.fx * xr, cam.fy * yr, cam.u0 * xr, cam.v0 * yr, new_w, new_h
            )
        return cam


def project(cam: PinholeCamera, point: Array) -> Array:
    """Point [..., 3] -> pixel [..., 2] (pinhole_camera_impl.h:41-45)."""
    z = point[..., 2]
    return jnp.stack(
        [
            cam.fx * point[..., 0] / z + cam.u0,
            cam.fy * point[..., 1] / z + cam.v0,
        ],
        axis=-1,
    )


def reproject(cam: PinholeCamera, pixel: Array, depth: Array) -> Array:
    """Pixel [..., 2], depth [...] -> point [..., 3]
    (pinhole_camera_impl.h:52-56)."""
    x = (pixel[..., 0] - cam.u0) / cam.fx
    y = (pixel[..., 1] - cam.v0) / cam.fy
    ones = jnp.ones_like(x)
    return jnp.stack([x, y, ones], axis=-1) * depth[..., None]


def project_point_jacobian(cam: PinholeCamera, point: Array) -> Array:
    """d project / d point: [..., 2, 3] (pinhole_camera_impl.h:91-97)."""
    x, y, z = point[..., 0], point[..., 1], point[..., 2]
    zero = jnp.zeros_like(z)
    row0 = jnp.stack([cam.fx / z, zero, -(cam.fx * x) / (z * z)], axis=-1)
    row1 = jnp.stack([zero, cam.fy / z, -(cam.fy * y) / (z * z)], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def reproject_depth_jacobian(cam: PinholeCamera, pixel: Array, depth: Array) -> Array:
    """d reproject / d depth: [..., 3] (pinhole_camera_impl.h:77-84)."""
    x = (pixel[..., 0] - cam.u0) / cam.fx
    y = (pixel[..., 1] - cam.v0) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def reproject_pixel_jacobian(cam: PinholeCamera, pixel: Array, depth: Array) -> Array:
    """d reproject / d pixel: [..., 3, 2] (pinhole_camera_impl.h:63-70)."""
    z = jnp.zeros_like(depth)
    col0 = jnp.stack([depth / cam.fx, z, z], axis=-1)
    col1 = jnp.stack([z, depth / cam.fy, z], axis=-1)
    return jnp.stack([col0, col1], axis=-1)


def pixel_valid(cam: PinholeCamera, pixel: Array, border=0) -> Array:
    """Boolean mask [...], (pinhole_camera_impl.h:105-108)."""
    x, y = pixel[..., 0], pixel[..., 1]
    b = jnp.asarray(border, dtype=x.dtype)
    return (x >= b) & (x < cam.width - b) & (y >= b) & (y < cam.height - b)


def resize(cam: PinholeCamera, new_width, new_height) -> PinholeCamera:
    """ResizeViewport semantics (pinhole_camera_impl.h:126-136)."""
    xp = np if _host_camera(cam) else jnp
    xr = new_width / cam.width
    yr = new_height / cam.height
    return PinholeCamera(
        cam.fx * xr,
        cam.fy * yr,
        cam.u0 * xr,
        cam.v0 * yr,
        xp.asarray(new_width, jnp.result_type(cam.width)),
        xp.asarray(new_height, jnp.result_type(cam.height)),
    )


def camera_pyramid(cam: PinholeCamera, levels: int):
    """List of per-level cameras, finest first (camera_pyramid.h:35-48)."""
    return [cam.level(i) for i in range(levels)]
