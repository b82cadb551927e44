"""Sparse factor operators: keypoint reprojection and geometric
depth-consistency.

TPU-native reimplementation of the reference factors:
  - ReprojectionFactor (sources/core/gtsam/reprojection_factor.cpp:159-269):
    2 rows per match over (pose0, pose1, code0); residual pix1_obs - warp,
    Cauchy-weighted, scaled by 1/sigma.
  - SparseGeometricFactor (sources/core/gtsam/sparse_geometric_factor.cpp:
    146-268): 1 row per sampled point over (pose0, pose1, code0, code1);
    residual dpt1_decoded - dpt1_projected with nearest-neighbour lookup,
    Huber-weighted.

Both build masked weighted Jacobian row matrices and reduce the GN system via
a single matmul, like the dense ops (ops/dense_sfm.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry import camera as cm
from ..geometry import warping as wp
from ..geometry.m_estimators import cauchy_weight, huber_weight
from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera
from .dense_sfm import SystemResult, _masked_system
from .image import bilinear_sample

Array = jax.Array


def _sample_code_data(prx0: Array, jac: Array, pix: Array):
    """Nearest-pixel prox/jacobian lookup at float coords pix [..., 2]
    (the reference indexes with int cast, reprojection_factor.cpp:195-198).

    ``jac`` is feature-major [CS, H, W] (map_state.LevelData.jac layout);
    returns (prx [M], jac [M, CS])."""
    H, W = prx0.shape
    xi = jnp.clip(pix[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(pix[..., 1].astype(jnp.int32), 0, H - 1)
    return prx0[yi, xi], jnp.moveaxis(jac[:, yi, xi], 0, -1)


def reprojection_system(
    pose0: SE3,
    pose1: SE3,
    code0: Array,        # [CS]
    cam: PinholeCamera,
    kp0: Array,          # [M, 2] keyframe keypoints (matched)
    kp1: Array,          # [M, 2] target keypoints (matched)
    match_valid: Array,  # [M]
    prx0_img: Array,     # [H, W] zero-code prox (level 0)
    jac_img: Array,      # [CS, H, W] feature-major
    huber_delta: float = 0.1,
    sigma: float = 1.0,
    avg_dpt: float = 2.0,
) -> SystemResult:
    """GN system [12+CS] from keypoint reprojection. J rows stacked per
    residual component (2 per match)."""
    CS = jac_img.shape[0]
    pose_10, j_pose1, j_pose0 = se3m.relative_pose_jacobians(pose1, pose0)

    prx0_kp, jac_kp = _sample_code_data(prx0_img, jac_img, kp0)  # [M], [M, CS]
    dpt0 = wp.depth_from_code(code0, jac_kp, prx0_kp, avg_dpt)

    corr = wp.find_correspondence(kp0, dpt0, cam, pose_10, border=1,
                                  min_dpt=0.0, check_bounds=False)
    valid = match_valid & (corr.tpt[..., 2] > 0)

    cJp = wp.correspondence_jacobian_pose(corr, dpt0, cam, pose_10)  # [M,2,6]
    cJc = wp.correspondence_jacobian_code(corr, dpt0, cam, pose_10, jac_kp,
                                          avg_dpt)  # [M,2,CS]
    # residual r = kp1 - corr.pix1; dr/dtheta = -dcorr/dtheta
    Jp0 = -(cJp @ j_pose0)
    Jp1 = -(cJp @ j_pose1)
    Jc = -cJc
    J = jnp.concatenate([Jp0, Jp1, Jc], axis=-1)  # [M, 2, 12+CS]

    diff = kp1 - corr.pix1  # [M, 2]
    err_norm = jnp.linalg.norm(diff, axis=-1)
    w = cauchy_weight(err_norm, huber_delta) / sigma  # [M]

    J2 = J.reshape(-1, 12 + CS)
    r2 = diff.reshape(-1)
    w2 = jnp.repeat(w, 2)
    v2 = jnp.repeat(valid, 2)
    return _masked_system(J2, r2, w2, v2)


def reprojection_error(
    pose0: SE3, pose1: SE3, code0: Array, cam: PinholeCamera,
    kp0: Array, kp1: Array, match_valid: Array,
    prx0_img: Array, jac_img: Array,
    huber_delta: float = 0.1, sigma: float = 1.0, avg_dpt: float = 2.0,
):
    """0.5 * sum_i (w_i |r_i|)^2 / sigma^2 (reprojection_factor.cpp:100-149)."""
    prx0_kp, jac_kp = _sample_code_data(prx0_img, jac_img, kp0)
    dpt0 = wp.depth_from_code(code0, jac_kp, prx0_kp, avg_dpt)
    pose_10 = se3m.relative_pose(pose1, pose0)
    corr = wp.find_correspondence(kp0, dpt0, cam, pose_10, check_bounds=False)
    diff = kp1 - corr.pix1
    err = jnp.linalg.norm(diff, axis=-1)
    werr = err * cauchy_weight(err, huber_delta)
    sq = jnp.where(match_valid, werr * werr, 0.0)
    return 0.5 * jnp.sum(sq) / (sigma * sigma)


def geometric_system(
    pose0: SE3,
    pose1: SE3,
    code0: Array,
    code1: Array,
    cam: PinholeCamera,
    points: Array,       # [N, 2] sampled pixels in keyframe 0
    prx0_img0: Array,    # [H, W] kf0 zero-code prox
    jac_img0: Array,     # [CS, H, W] feature-major
    prx0_img1: Array,    # [H, W] kf1
    jac_img1: Array,     # [CS, H, W] feature-major
    dpt1_grad: Array,    # [H, W, 2] gradient of kf1 depth (dpt_grad)
    huber_delta: float = 0.1,
    avg_dpt: float = 2.0,
) -> SystemResult:
    """GN system [12+2CS] of depth consistency at sampled points."""
    CS = jac_img0.shape[0]
    pose_10, j_pose1, j_pose0 = se3m.relative_pose_jacobians(pose1, pose0)

    prx0_p, jac0_p = _sample_code_data(prx0_img0, jac_img0, points)
    dpt0 = wp.depth_from_code(code0, jac0_p, prx0_p, avg_dpt)
    corr = wp.find_correspondence(points, dpt0, cam, pose_10, border=1,
                                  min_dpt=0.0)
    valid = corr.valid & cm.pixel_valid(cam, corr.pix1)

    dpt1_p = corr.tpt[..., 2]  # projected depth in frame 1
    # nearest-neighbour decode of kf1 depth at pix1
    prx1_nn, jac1_nn = _sample_code_data(prx0_img1, jac_img1, corr.pix1)
    dpt1 = wp.depth_from_code(code1, jac1_nn, prx1_nn, avg_dpt)
    grad = bilinear_sample(dpt1_grad[..., 0], corr.pix1), bilinear_sample(
        dpt1_grad[..., 1], corr.pix1)
    dpt_grad = jnp.stack(grad, axis=-1)  # [N, 2]

    err = dpt1 - dpt1_p

    cJp = wp.correspondence_jacobian_pose(corr, dpt0, cam, pose_10)  # [N,2,6]
    tJp = se3m.transform_jacobian_pose(corr.pt, pose_10)  # [N, 3, 6]
    g_cJp = jnp.einsum("nc,nck->nk", dpt_grad, cJp)  # [N, 6]

    # d err/d pose = d dpt1/d pose - d dpt1_p/d pose
    #             = dpt_grad @ corr_J @ j_pose - (transform jac)[z-row]
    # (the reference stores the negation because GTSAM's JacobianFactor
    # solves |A dx - b| with b = +err; our GN uses the true derivative)
    tJ0 = tJp @ j_pose0  # [N, 3, 6]
    tJ1 = tJp @ j_pose1
    Jp0 = -tJ0[:, 2, :] + g_cJp @ j_pose0
    Jp1 = -tJ1[:, 2, :] + g_cJp @ j_pose1

    # code0: through dpt0 -> both the projection depth and the lookup point
    cJc0 = wp.correspondence_jacobian_code(corr, dpt0, cam, pose_10, jac0_p,
                                           avg_dpt)  # [N, 2, CS]
    R = se3m.quat_to_matrix(pose_10.q)
    pt_J_dpt = cm.reproject_depth_jacobian(cam, corr.pix0, dpt0)  # [N, 3]
    dJp = wp.depth_jacobian_prx(dpt0, avg_dpt)  # [N]
    trans_J_cde = jnp.einsum(
        "ij,nj,n,nc->nic", R, pt_J_dpt, dJp, jac0_p
    )  # [N, 3, CS]
    g_cJc0 = jnp.einsum("nc,nck->nk", dpt_grad, cJc0)  # [N, CS]
    Jc0 = -trans_J_cde[:, 2, :] + g_cJc0

    # code1: direct decode derivative d dpt1/d c1 = (d dpt/d prx) * jac1
    dJp1 = wp.depth_jacobian_prx(dpt1, avg_dpt)
    Jc1 = dJp1[:, None] * jac1_nn  # [N, CS]

    J = jnp.concatenate([Jp0, Jp1, Jc0, Jc1], axis=-1)  # [N, 12+2CS]
    w = huber_weight(err, huber_delta)
    return _masked_system(J, err, w, valid)


def geometric_error(
    pose0: SE3, pose1: SE3, code0: Array, code1: Array, cam: PinholeCamera,
    points: Array, prx0_img0: Array, jac_img0: Array,
    prx0_img1: Array, jac_img1: Array,
    huber_delta: float = 0.1, avg_dpt: float = 2.0,
):
    """0.5 * sum w^2 err^2 (sparse_geometric_factor.cpp:85-142)."""
    prx0_p, jac0_p = _sample_code_data(prx0_img0, jac_img0, points)
    dpt0 = wp.depth_from_code(code0, jac0_p, prx0_p, avg_dpt)
    pose_10 = se3m.relative_pose(pose1, pose0)
    corr = wp.find_correspondence(points, dpt0, cam, pose_10)
    dpt1_p = corr.tpt[..., 2]
    prx1_nn, jac1_nn = _sample_code_data(prx0_img1, jac_img1, corr.pix1)
    dpt1 = wp.depth_from_code(code1, jac1_nn, prx1_nn, avg_dpt)
    err = (dpt1_p - dpt1) * huber_weight(dpt1_p - dpt1, huber_delta)
    sq = jnp.where(corr.valid, err * err, 0.0)
    return 0.5 * jnp.sum(sq)
