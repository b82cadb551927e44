"""Dense warping math: proximity<->depth, correspondence and its Jacobians.

Vectorized JAX reimplementation of sources/common/algorithm/warping.h. All
functions operate on arbitrary leading batch dims (pixels, factors, ...);
validity is a boolean mask instead of the reference's early-exit branches so
everything stays jit/vmap/Pallas friendly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3 as se3m
from . import camera as cm
from .se3 import SE3
from .camera import PinholeCamera

Array = jax.Array


# ----------------------------------------------------------------------------
# Proximity (inverse-depth-like) parametrization (warping.h:30-69)
# ----------------------------------------------------------------------------

def prox_to_depth(prx: Array, avg_dpt) -> Array:
    return avg_dpt / prx - avg_dpt


def depth_to_prox(dpt: Array, avg_dpt) -> Array:
    return avg_dpt / (avg_dpt + dpt)


def depth_jacobian_prx(dpt: Array, avg_dpt) -> Array:
    """d depth / d prx evaluated at depth (warping.h:44-50)."""
    prx = avg_dpt / (avg_dpt + dpt)
    return -avg_dpt / (prx * prx)


def prox_from_code(code: Array, prx_J_cde: Array, prx_0code: Array) -> Array:
    """prx = prx0 + J·c, linear-in-code decode (warping.h:52-59).

    code: [..., CS] or [CS]; prx_J_cde: [..., CS]; prx_0code: [...].
    """
    return prx_0code + jnp.sum(prx_J_cde * code, axis=-1)


def depth_from_code(code: Array, prx_J_cde: Array, prx_0code: Array, avg_dpt) -> Array:
    return prox_to_depth(prox_from_code(code, prx_J_cde, prx_0code), avg_dpt)


# ----------------------------------------------------------------------------
# Correspondence (warping.h:188-241)
# ----------------------------------------------------------------------------

class Correspondence(NamedTuple):
    pix0: Array   # [..., 2] source pixel
    pt: Array     # [..., 3] reprojected point in cam0
    tpt: Array    # [..., 3] point transformed to cam1
    pix1: Array   # [..., 2] projected pixel in cam1
    valid: Array  # [...] bool


def find_correspondence(
    pix0: Array,
    dpt: Array,
    cam: PinholeCamera,
    pose_10: SE3,
    border: float = 1.0,
    min_dpt: float = 0.0,
    check_bounds: bool = True,
) -> Correspondence:
    """Warp pixels pix0 [..., 2] at depth dpt [...] through pose_10
    (warping.h:204-241). pose_10 maps cam0 points into cam1."""
    pt = cm.reproject(cam, pix0, dpt)
    tpt = se3m.act(pose_10, pt)
    pix1 = cm.project(cam, tpt)
    depth_ok = tpt[..., 2] > min_dpt
    if check_bounds:
        valid = depth_ok & cm.pixel_valid(cam, pix1, border)
    else:
        valid = depth_ok
    return Correspondence(pix0=pix0, pt=pt, tpt=tpt, pix1=pix1, valid=valid)


def correspondence_jacobian_pose(
    corresp: Correspondence, dpt: Array, cam: PinholeCamera, pose_10: SE3
) -> Array:
    """d pix1 / d pose10 (decoupled tangent): [..., 2, 6] (warping.h:247-257)."""
    dXdT = se3m.transform_jacobian_pose(corresp.pt, pose_10)  # [..., 3, 6]
    dCam = cm.project_point_jacobian(cam, corresp.tpt)  # [..., 2, 3]
    return dCam @ dXdT


def correspondence_jacobian_depth(
    corresp: Correspondence, dpt: Array, cam: PinholeCamera, pose_10: SE3
) -> Array:
    """d pix1 / d dpt: [..., 2] (warping.h:259-272)."""
    pix1_J_tpt = cm.project_point_jacobian(cam, corresp.tpt)  # [..., 2, 3]
    R = se3m.quat_to_matrix(pose_10.q)  # [..., 3, 3] (broadcasts)
    pt_J_dpt = cm.reproject_depth_jacobian(cam, corresp.pix0, dpt)  # [..., 3]
    chain = jnp.einsum("...ij,...jk,...k->...i", pix1_J_tpt, R, pt_J_dpt)
    return chain


def correspondence_jacobian_prx(
    corresp: Correspondence,
    dpt: Array,
    cam: PinholeCamera,
    pose_10: SE3,
    avg_dpt,
) -> Array:
    """d pix1 / d prx: [..., 2] (warping.h:275-291)."""
    pix1_J_dpt = correspondence_jacobian_depth(corresp, dpt, cam, pose_10)
    dpt_J_prx = depth_jacobian_prx(dpt, avg_dpt)
    return pix1_J_dpt * dpt_J_prx[..., None]


def correspondence_jacobian_code(
    corresp: Correspondence,
    dpt: Array,
    cam: PinholeCamera,
    pose_10: SE3,
    prx_J_cde: Array,
    avg_dpt,
) -> Array:
    """d pix1 / d code: [..., 2, CS] (warping.h:294-313)."""
    pix1_J_prx = correspondence_jacobian_prx(corresp, dpt, cam, pose_10, avg_dpt)
    return pix1_J_prx[..., :, None] * prx_J_cde[..., None, :]
