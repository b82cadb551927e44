"""Dense alignment operators: photometric SfM (pose0, pose1, code0), SE(3)
Lucas-Kanade tracking, and code-only depth alignment.

TPU-native redesign of the reference CUDA aligners:
  - SfmAligner step/eval kernels (sources/cuda/cu_sfmaligner.cpp:40-97,
    per-pixel math sources/common/algorithm/dense_sfm.h:72-201)
  - SE3Aligner step/warp kernels (sources/cuda/cu_se3aligner.cpp:37-113,
    per-pixel math sources/common/algorithm/lucas_kanade_se3.h:35-95)
  - DepthAligner step kernel (sources/cuda/cu_depthaligner.cpp:30-71)

Design: instead of the reference's per-pixel 44x44 outer-product + warp-shuffle
tree reduction, we build the weighted per-pixel Jacobian row matrix J [N, D]
and form JtJ with a single J^T J matmul — this maps the reduction onto the MXU
systolic array where it runs at roofline, and lets XLA fuse the warp /
residual / weighting elementwise chain into the gather. Batched variants
(vmap over factors) turn many small reductions into one large batched matmul.

Pose convention (cu_sfmaligner.cpp:131-133, 164-167): pose0/pose1 are
camera-to-world keyframe poses; pose_10 = pose1^-1 * pose0 maps cam0 points
into cam1; Jacobians chain through RelativePose(pose1, pose0, J_pose1, J_pose0).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry import camera as cm
from ..geometry import warping as wp
from ..geometry.m_estimators import huber_weight
from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera
from .image import (
    bilinear_sample,
    bilinear_sample_quad,
    pack_bilinear_quad,
)

Array = jax.Array


class SfmParams(NamedTuple):
    """Mirror of DenseSfmParams (dense_sfm.h:36-43)."""

    huber_delta: float = 0.1
    avg_dpt: float = 2.0
    min_dpt: float = 0.0
    valid_border: int = 2


class SystemResult(NamedTuple):
    """Gauss-Newton system accumulated over pixels — the JTJJrReductionItem
    equivalent (sources/cuda/reduction_items.h:80-143), stored dense."""

    JtJ: Array       # [D, D]
    Jtr: Array       # [D]
    residual: Array  # [] sum of squared weighted residuals
    inliers: Array   # [] number of valid pixels


class ErrorResult(NamedTuple):
    residual: Array
    inliers: Array


def _pixel_grid(H: int, W: int, dtype=jnp.float32) -> Array:
    """[H, W, 2] grid of (x, y) pixel coordinates."""
    xs = jax.lax.broadcasted_iota(dtype, (H, W), 1)
    ys = jax.lax.broadcasted_iota(dtype, (H, W), 0)
    return jnp.stack([xs, ys], axis=-1)


def _masked_system(J: Array, r: Array, w: Array, valid: Array) -> SystemResult:
    """Weighted masked GN system from rows J [N, D], residuals r [N].

    Applies weight w to both J and r (reference dense_sfm.h:189-199), then
    reduces via a single MXU matmul.
    """
    wv = jnp.where(valid, w, 0.0)
    Jw = J * wv[:, None]
    rw = r * wv
    JtJ = jnp.einsum("nd,ne->de", Jw, Jw, preferred_element_type=jnp.float32)
    Jtr = jnp.einsum("nd,n->d", Jw, rw, preferred_element_type=jnp.float32)
    residual = jnp.sum(rw * rw)
    inliers = jnp.sum(valid.astype(jnp.float32))
    return SystemResult(JtJ, Jtr, residual, inliers)


# ----------------------------------------------------------------------------
# Photometric SfM aligner (44-dim system over pose0, pose1, code0)
# ----------------------------------------------------------------------------

def sfm_step(
    pose0: SE3,
    pose1: SE3,
    code0: Array,
    cam: PinholeCamera,
    img0: Array,      # [H, W] keyframe image
    img1: Array,      # [H, W] target image
    dpt0: Array,      # [H, W] keyframe depth (already materialized from code)
    std0: Array,      # [H, W] keyframe log-b uncertainty
    prx_jac0: Array,  # [H, W, CS] d prox / d code
    grad1: Array,     # [H, W, 2] target image gradients
    params: SfmParams,
):
    """One SfM linearization: returns (SystemResult [12+CS], valid0 [H,W]).

    Per-pixel math mirrors DenseSfm (dense_sfm.h:124-201); the J-row layout is
    [dErr/dpose0 (6) | dErr/dpose1 (6) | dErr/dcode0 (CS)].
    """
    H, W = img0.shape
    CS = prx_jac0.shape[-1]
    pose_10, j_pose1, j_pose0 = se3m.relative_pose_jacobians(pose1, pose0)

    pix0 = _pixel_grid(H, W).reshape(-1, 2)
    dpt = dpt0.reshape(-1)
    corresp = wp.find_correspondence(
        pix0, dpt, cam, pose_10, border=params.valid_border, min_dpt=params.min_dpt
    )
    # image terms at warped coords: ONE gather for (img, gx, gy) x 4 corners
    packed = jnp.concatenate([img1[..., None], grad1], axis=-1)  # [H, W, 3]
    sampled = bilinear_sample_quad(pack_bilinear_quad(packed), corresp.pix1)
    i1 = sampled[..., 0]
    grad = sampled[..., 1:3]  # [N, 2]

    # pose jacobians: J_pose = -grad @ corresp_J_pose10 @ pose10_J_pose{0,1}
    cJp = wp.correspondence_jacobian_pose(corresp, dpt, cam, pose_10)  # [N, 2, 6]
    g_cJp = jnp.einsum("nc,nck->nk", grad, cJp)  # [N, 6] = grad @ corresp_J_pose10
    Jp0 = -g_cJp @ j_pose0  # [N, 6]
    Jp1 = -g_cJp @ j_pose1  # [N, 6]

    # code jacobian: err_J_prx * prx_J_cde
    pix1_J_prx = wp.correspondence_jacobian_prx(
        corresp, dpt, cam, pose_10, params.avg_dpt
    )  # [N, 2]
    err_J_prx = -jnp.sum(grad * pix1_J_prx, axis=-1)  # [N]
    Jc = err_J_prx[:, None] * prx_jac0.reshape(-1, CS)  # [N, CS]

    J = jnp.concatenate([Jp0, Jp1, Jc], axis=-1)  # [N, 12+CS]
    r = img0.reshape(-1) - i1
    w = huber_weight(r, params.huber_delta)

    sys = _masked_system(J, r, w, corresp.valid)
    valid0 = corresp.valid.reshape(H, W).astype(img0.dtype)
    return sys, valid0


def sfm_evaluate_error(
    pose0: SE3,
    pose1: SE3,
    cam: PinholeCamera,
    img0: Array,
    img1: Array,
    dpt0: Array,
    std0: Array,
    grad1: Array,
    params: SfmParams,
) -> ErrorResult:
    """Residual+inlier evaluation only (dense_sfm.h:72-119). Uses the eval
    kernel's default border=1/min_dpt=0 (FindCorrespondence defaults)."""
    H, W = img0.shape
    pose_10 = se3m.relative_pose(pose1, pose0)
    pix0 = _pixel_grid(H, W).reshape(-1, 2)
    dpt = dpt0.reshape(-1)
    corresp = wp.find_correspondence(pix0, dpt, cam, pose_10, border=1, min_dpt=0.0)
    i1 = bilinear_sample(img1, corresp.pix1)
    r = img0.reshape(-1) - i1
    w = huber_weight(r, params.huber_delta)
    rw = jnp.where(corresp.valid, r * w, 0.0)
    return ErrorResult(
        residual=jnp.sum(rw * rw),
        inliers=jnp.sum(corresp.valid.astype(jnp.float32)),
    )


def normalized_residual(residual: Array, inliers: Array, H: int, W: int) -> Array:
    """residual / inliers * W * H with inf on zero inliers
    (photometric_factor.cpp:203-216)."""
    return jnp.where(
        inliers > 0, residual / jnp.maximum(inliers, 1.0) * (W * H), jnp.inf
    )


# ----------------------------------------------------------------------------
# SE(3)-only aligner for tracking (6-dim system)
# ----------------------------------------------------------------------------

def se3_step(
    pose_10: SE3,
    cam: PinholeCamera,
    img0: Array,
    img1: Array,
    dpt0: Array,
    grad1: Array,
    huber_delta: float,
) -> SystemResult:
    """One tracking GN linearization (lucas_kanade_se3.h:35-77). pose_10 maps
    keyframe (cam0) points into the live frame (cam1)."""
    H, W = img0.shape
    pix0 = _pixel_grid(H, W).reshape(-1, 2)
    dpt = dpt0.reshape(-1)
    corresp = wp.find_correspondence(pix0, dpt, cam, pose_10, border=1, min_dpt=0.0)
    packed = jnp.concatenate([img1[..., None], grad1], axis=-1)
    sampled = bilinear_sample_quad(pack_bilinear_quad(packed), corresp.pix1)
    i1 = sampled[..., 0]
    grad = sampled[..., 1:3]
    cJp = wp.correspondence_jacobian_pose(corresp, dpt, cam, pose_10)
    J = -jnp.einsum("nc,nck->nk", grad, cJp)  # [N, 6]
    r = img0.reshape(-1) - i1
    w = huber_weight(r, huber_delta)
    return _masked_system(J, r, w, corresp.valid)


def se3_solve_and_update(JtJ: Array, Jtr: Array, pose: SE3, damping=0.0) -> SE3:
    """Solve the 6x6 normal equations and retract with the decoupled update
    (lucas_kanade_se3.h:84-95)."""
    A = JtJ + damping * jnp.eye(6, dtype=JtJ.dtype)
    update = -jax.scipy.linalg.solve(A, Jtr, assume_a="pos")
    return se3m.retract(pose, update)


def se3_warp(
    pose_10: SE3,
    cam: PinholeCamera,
    img0: Array,
    img1: Array,
    dpt0: Array,
):
    """Render img1 warped into cam0's frame + residual/inlier stats
    (cu_se3aligner.cpp kernel_warp_calculate :37-75)."""
    H, W = img0.shape
    pix0 = _pixel_grid(H, W).reshape(-1, 2)
    dpt = dpt0.reshape(-1)
    corresp = wp.find_correspondence(pix0, dpt, cam, pose_10, border=1, min_dpt=0.0)
    i1 = bilinear_sample(img1, corresp.pix1)
    warped = jnp.where(corresp.valid, i1, 0.0).reshape(H, W)
    r = jnp.where(corresp.valid, img0.reshape(-1) - i1, 0.0)
    return warped, ErrorResult(
        residual=jnp.sum(r * r), inliers=jnp.sum(corresp.valid.astype(jnp.float32))
    )


# ----------------------------------------------------------------------------
# Code-only depth aligner (CS-dim system) — DepthPriorFactor backend
# ----------------------------------------------------------------------------

def depth_align_step(
    code: Array,       # [CS]
    target_dpt: Array,  # [H, W]
    prx_orig: Array,    # [H, W]
    prx_jac: Array,     # [H, W, CS]
    avg_dpt: float = 2.0,
) -> SystemResult:
    """GN system of depth-vs-target over code only, reproducing the
    reference's exact (idiosyncratic) Jacobian weighting
    (cu_depthaligner.cpp:46-68): J = -2|diff| * dDpt/dPrx * prx_J_cde."""
    CS = prx_jac.shape[-1]
    prx = prx_orig + jnp.einsum("hwc,c->hw", prx_jac, code)
    dpt = wp.prox_to_depth(prx, avg_dpt)
    diff = (target_dpt - dpt).reshape(-1)
    dJp = wp.depth_jacobian_prx(dpt, avg_dpt).reshape(-1)
    J = (-2.0 * jnp.abs(diff) * dJp)[:, None] * prx_jac.reshape(-1, CS)
    ones = jnp.ones_like(diff)
    valid = jnp.ones_like(diff, dtype=bool)
    return _masked_system(J, diff, ones, valid)
