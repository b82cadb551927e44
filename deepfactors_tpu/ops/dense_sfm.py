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
from ..geometry.m_estimators import huber_weight, tukey_sqrt_weight


def robust_weight(r, delta, loss: str = "huber"):
    """Square-root IRLS weight by loss name. 'tukey' is REDESCENDING
    (zero weight beyond delta): occlusion and image-formation outliers stop
    biasing the photometric equilibrium entirely — use at the finest
    pyramid level only (MapperConfig.fine_loss), the coarse descent keeps
    Huber's convergence basin."""
    if loss == "tukey":
        return tukey_sqrt_weight(r, delta)
    return huber_weight(r, delta)
from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera
from .image import (
    bilinear_sample,
    bilinear_sample_quad,
    pack_bilinear_quad,
)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


_USE_PALLAS_WARP = None


def use_pallas_warp(enable: bool = None) -> bool:
    """Returns (optionally sets) whether dense ops use the Pallas band-warp
    kernel (ops/pallas/warp_kernel.py) for image sampling. Defaults to on
    when running on TPU hardware, off on CPU (where the XLA gather path is
    exact and the interpreter would be slow)."""
    global _USE_PALLAS_WARP
    if enable is not None:
        _USE_PALLAS_WARP = enable
    if _USE_PALLAS_WARP is None:
        _USE_PALLAS_WARP = _on_tpu()
    return _USE_PALLAS_WARP


def _sample_img_grad_xy(img1, grad1, x1, y1, H, W, grad_mode="sampled"):
    """Sample (img, gx, gy) at warped coords x1/y1 [N] ->
    (i1 [N], gx [N], gy [N], coverage [N]). Pallas band-warp on TPU,
    quad-packed XLA gather otherwise. grad_mode='interp' returns the exact
    gradient of the bilinear interpolant instead of sampling Sobel planes
    (one gather for all three outputs; grad1 is ignored)."""
    if grad_mode == "interp":
        from .image import bilinear_sample_grad

        pix1 = jnp.stack([x1, y1], axis=-1)
        i1, gx, gy = bilinear_sample_grad(img1, pix1)
        return i1, gx, gy, jnp.ones(x1.shape, bool)
    if use_pallas_warp() and H % 8 == 0 and W % 64 == 0:
        from .pallas.warp_kernel import bilinear_warp_planes

        planes = jnp.stack([img1, grad1[..., 0], grad1[..., 1]])
        sampled, coverage = bilinear_warp_planes(
            planes, x1.reshape(H, W), y1.reshape(H, W)
        )
        return (sampled[0].reshape(-1), sampled[1].reshape(-1),
                sampled[2].reshape(-1), coverage.reshape(-1) > 0.5)
    packed = jnp.concatenate([img1[..., None], grad1], axis=-1)
    pix1 = jnp.stack([x1, y1], axis=-1)
    sampled = bilinear_sample_quad(pack_bilinear_quad(packed), pix1)
    ones = jnp.ones(x1.shape, bool)
    return sampled[..., 0], sampled[..., 1], sampled[..., 2], ones

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


def _masked_system_T(JT: Array, r: Array, w: Array, valid: Array) -> SystemResult:
    """Same as _masked_system but with FEATURE-MAJOR Jacobians JT [D, N].

    On TPU, [N, D] arrays pad the last dim to 128 lanes — for D=44 that
    triples HBM traffic (and 21x for the 6-wide pose blocks). Feature-major
    [D, N] pads only D -> next sublane multiple (~9%), which is the dominant
    dense-pipeline optimization after the gather (SURVEY.md §7.3).
    """
    wv = jnp.where(valid, w, 0.0)
    Jw = JT * wv[None, :]
    rw = r * wv
    JtJ = jnp.einsum("dn,en->de", Jw, Jw, preferred_element_type=jnp.float32)
    Jtr = jnp.einsum("dn,n->d", Jw, rw, preferred_element_type=jnp.float32)
    residual = jnp.sum(rw * rw)
    inliers = jnp.sum(valid.astype(jnp.float32))
    return SystemResult(JtJ, Jtr, residual, inliers)


# ----------------------------------------------------------------------------
# Photometric SfM aligner (44-dim system over pose0, pose1, code0)
# ----------------------------------------------------------------------------

class DenseWarp(NamedTuple):
    """Feature-major correspondence fields — each entry is a flat [N] vector
    (the generic warping.Correspondence holds [N, 2/3] arrays whose last dim
    pads to 128 lanes on TPU; unrolling removes that traffic)."""

    u: Array      # normalized ray x = (px - u0)/fx
    v: Array      # normalized ray y
    tptx: Array
    tpty: Array
    tptz: Array
    pix1x: Array
    pix1y: Array
    valid: Array


def _dense_warp_fields(H, W, dpt, cam, pose_10, border, min_dpt) -> DenseWarp:
    """FindCorrespondence over the full image (warping.h:204-241), unrolled."""
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    u = (xs - cam.u0) / cam.fx
    v = (ys - cam.v0) / cam.fy
    ptx = u * dpt
    pty = v * dpt
    ptz = dpt
    R = se3m.quat_to_matrix(pose_10.q)
    t = pose_10.t
    tptx = R[0, 0] * ptx + R[0, 1] * pty + R[0, 2] * ptz + t[0]
    tpty = R[1, 0] * ptx + R[1, 1] * pty + R[1, 2] * ptz + t[1]
    tptz = R[2, 0] * ptx + R[2, 1] * pty + R[2, 2] * ptz + t[2]
    pix1x = cam.fx * tptx / tptz + cam.u0
    pix1y = cam.fy * tpty / tptz + cam.v0
    b = jnp.asarray(border, jnp.float32)
    valid = (
        (tptz > min_dpt)
        & (pix1x >= b) & (pix1x < cam.width - b)
        & (pix1y >= b) & (pix1y < cam.height - b)
    )
    return DenseWarp(u, v, tptx, tpty, tptz, pix1x, pix1y, valid)


def _unrolled_warp_jacobians(warp: DenseWarp, dpt, cam, pose_10, gx, gy,
                             avg_dpt):
    """Gradient-contracted warp Jacobians with all small dims unrolled.

    Computes A [6, N] = grad @ d pix1/d pose10 (decoupled tangent) and
    err_J_prx [N] = -(grad @ d pix1/d prx) as feature-major stacks of [N]
    vectors — NO [N, smalldim] intermediates (those pad to 128 lanes on TPU
    and dominate HBM traffic). Mirrors the per-pixel math of
    dense_sfm.h:124-201 exactly, vectorized over N.
    """
    x, y, z = warp.tptx, warp.tpty, warp.tptz
    iz = 1.0 / z
    # projection jacobian rows (pinhole_camera_impl.h:91-97)
    d00 = cam.fx * iz
    d02 = -cam.fx * x * iz * iz
    d11 = cam.fy * iz
    d12 = -cam.fy * y * iz * iz
    # grad-contracted projection: gd_j = sum_r grad_r * dCam[r, j]
    gd0 = gx * d00
    gd1 = gy * d11
    gd2 = gx * d02 + gy * d12

    # dXdT = [I | -hat(Rx)] with Rx = R @ pt = tpt - t (warping.h:156-164);
    # A_k = gd . dXdT[:, k]
    t10 = pose_10.t
    vx = x - t10[..., 0]
    vy = y - t10[..., 1]
    vz = z - t10[..., 2]
    # -hat(v) columns: c3 = (0, -vz, vy), c4 = (vz, 0, -vx), c5 = (-vy, vx, 0)
    A = jnp.stack(
        [
            gd0,
            gd1,
            gd2,
            -gd1 * vz + gd2 * vy,
            gd0 * vz - gd2 * vx,
            -gd0 * vy + gd1 * vx,
        ]
    )  # [6, N]

    # depth chain (warping.h:259-291): pix1_J_dpt = dCam @ R @ pt_J_dpt
    R = se3m.quat_to_matrix(pose_10.q)
    u, v = warp.u, warp.v
    m0 = R[0, 0] * u + R[0, 1] * v + R[0, 2]
    m1 = R[1, 0] * u + R[1, 1] * v + R[1, 2]
    m2 = R[2, 0] * u + R[2, 1] * v + R[2, 2]
    pjd0 = d00 * m0 + d02 * m2
    pjd1 = d11 * m1 + d12 * m2
    dpt_J_prx = wp.depth_jacobian_prx(dpt, avg_dpt)
    err_J_prx = -(gx * pjd0 + gy * pjd1) * dpt_J_prx
    return A, err_J_prx


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
    grad_mode: str = "sampled",
    loss: str = "huber",
):
    """One SfM linearization: returns (SystemResult [12+CS], valid0 [H,W]).

    Per-pixel math mirrors DenseSfm (dense_sfm.h:124-201); the J-row layout is
    [dErr/dpose0 (6) | dErr/dpose1 (6) | dErr/dcode0 (CS)], built
    feature-major ([D, N]) for TPU lane efficiency.
    """
    H, W = img0.shape
    CS = prx_jac0.shape[-1]
    pose_10, j_pose1, j_pose0 = se3m.relative_pose_jacobians(pose1, pose0)

    dpt = dpt0.reshape(-1)
    warp = _dense_warp_fields(
        H, W, dpt, cam, pose_10, params.valid_border, params.min_dpt
    )
    # image terms at warped coords (fused Pallas band-warp on TPU)
    i1, gx, gy, coverage = _sample_img_grad_xy(
        img1, grad1, warp.pix1x, warp.pix1y, H, W, grad_mode
    )
    valid = warp.valid & coverage

    A, err_J_prx = _unrolled_warp_jacobians(
        warp, dpt, cam, pose_10, gx, gy, params.avg_dpt
    )
    # J_poseT = -(j_pose^T @ A): [6, N]
    Jp0T = -jnp.einsum("ki,kn->in", j_pose0, A)
    Jp1T = -jnp.einsum("ki,kn->in", j_pose1, A)
    # code jacobian: err_J_prx * prx_J_cde, feature-major
    jacT = prx_jac0.reshape(-1, CS).T  # [CS, N]
    JcT = err_J_prx[None, :] * jacT

    JT = jnp.concatenate([Jp0T, Jp1T, JcT], axis=0)  # [12+CS, N]
    r = img0.reshape(-1) - i1
    w = robust_weight(r, params.huber_delta, loss)

    sys = _masked_system_T(JT, r, w, valid)
    valid0 = valid.reshape(H, W).astype(img0.dtype)
    return sys, valid0


def sfm_step_batch(
    poses0: SE3,      # [P]
    poses1: SE3,      # [P]
    codes0: Array,    # [P, CS]
    cam: PinholeCamera,
    img0s: Array,     # [P, H, W]
    img1s: Array,     # [P, H, W]
    dpt0s: Array,     # [P, H, W]
    std0s: Array,     # [P, H, W]
    jacs0: Array,     # [P, H, W, CS]
    grad1s: Array,    # [P, H, W, 2]
    params: SfmParams,
    grad_mode: str = "sampled",
    loss: str = "huber",
) -> SystemResult:
    """Batched SfM linearization over P factors.

    On TPU the correspondence + bilinear sampling runs in ONE fused Pallas
    kernel with the factor axis in the kernel grid (dense_warp_batch) — a
    vmapped pallas_call pays per-element dispatch overhead instead. The
    Jacobian build + JtJ reduction stays feature-major XLA (batched MXU
    matmul)."""
    P, H, W = img0s.shape
    CS = jacs0.shape[-1]
    pose_10, j_pose1, j_pose0 = jax.vmap(se3m.relative_pose_jacobians)(
        poses1, poses0
    )

    if grad_mode != "interp" and use_pallas_warp() and H % 8 == 0 and W % 64 == 0:
        from .pallas.warp_kernel import dense_warp_batch, make_warp_params

        wp_params = make_warp_params(pose_10, cam, params.valid_border,
                                     params.min_dpt)
        i1, gx, gy, tptx, tpty, tptz, validf = dense_warp_batch(
            wp_params, dpt0s, img1s,
            grad1s[..., 0], grad1s[..., 1],
        )
        valid = validf > 0.5

        xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        u = ((xs - cam.u0) / cam.fx)[None]
        v = ((ys - cam.v0) / cam.fy)[None]
        warp = DenseWarp(
            u=jnp.broadcast_to(u, (P, H, W)).reshape(P, -1),
            v=jnp.broadcast_to(v, (P, H, W)).reshape(P, -1),
            tptx=tptx.reshape(P, -1), tpty=tpty.reshape(P, -1),
            tptz=tptz.reshape(P, -1),
            pix1x=None, pix1y=None, valid=valid.reshape(P, -1),
        )

        def one(warp_p, dpt, gx_p, gy_p, i1_p, img0, jac, p10q, p10t, jp0,
                jp1, c0):
            A, err_J_prx = _unrolled_warp_jacobians(
                warp_p, dpt.reshape(-1), cam, SE3(p10q, p10t), gx_p, gy_p,
                params.avg_dpt,
            )
            Jp0T = -jnp.einsum("ki,kn->in", jp0, A)
            Jp1T = -jnp.einsum("ki,kn->in", jp1, A)
            jacT = jac.reshape(-1, CS).T
            JcT = err_J_prx[None, :] * jacT
            JT = jnp.concatenate([Jp0T, Jp1T, JcT], axis=0)
            r = img0.reshape(-1) - i1_p
            w = robust_weight(r, params.huber_delta, loss)
            return _masked_system_T(JT, r, w, warp_p.valid)

        return jax.vmap(one)(
            warp, dpt0s, gx.reshape(P, -1), gy.reshape(P, -1),
            i1.reshape(P, -1), img0s, jacs0, pose_10.q, pose_10.t,
            j_pose0, j_pose1, codes0,
        )

    def one(q0, t0, q1, t1, c0, img0, img1, dpt0, std0, jac0, grad1):
        sys, _ = sfm_step(SE3(q0, t0), SE3(q1, t1), c0, cam, img0, img1,
                          dpt0, std0, jac0, grad1, params, grad_mode, loss)
        return sys

    return jax.vmap(one)(
        poses0.q, poses0.t, poses1.q, poses1.t, codes0,
        img0s, img1s, dpt0s, std0s, jacs0, grad1s,
    )


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
    grad_mode: str = "sampled",
) -> SystemResult:
    """One tracking GN linearization (lucas_kanade_se3.h:35-77). pose_10 maps
    keyframe (cam0) points into the live frame (cam1)."""
    H, W = img0.shape
    if use_pallas_warp() and H % 8 == 0 and W % min(128, W) == 0:
        from .pallas import sfm_kernel as sk
        kp = sk.make_sfm_params(
            SE3(pose_10.q[None], pose_10.t[None]), cam, 1, 0.0,
            huber_delta, 2.0)
        z = jnp.zeros((1,), jnp.int32)
        G = sk.se3_gram_batch(
            kp, z, z, img0[None], dpt0[None], img1[None],
            grad1[..., 0][None], grad1[..., 1][None],
            grad_mode=grad_mode)[0]
        JtJ = 0.5 * (G[:6, :6] + G[:6, :6].T)
        return SystemResult(JtJ=JtJ, Jtr=G[:6, 6],
                            residual=G[6, 6], inliers=G[7, 7])
    dpt = dpt0.reshape(-1)
    warp = _dense_warp_fields(H, W, dpt, cam, pose_10, 1, 0.0)
    i1, gx, gy, coverage = _sample_img_grad_xy(
        img1, grad1, warp.pix1x, warp.pix1y, H, W, grad_mode
    )
    valid = warp.valid & coverage
    A, _ = _unrolled_warp_jacobians(warp, dpt, cam, pose_10, gx, gy, 2.0)
    JT = -A  # [6, N]
    r = img0.reshape(-1) - i1
    w = huber_weight(r, huber_delta)
    return _masked_system_T(JT, r, w, valid)


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
    if use_pallas_warp() and H % 8 == 0 and W % min(128, W) == 0:
        from .pallas import sfm_kernel as sk
        kp = sk.make_sfm_params(
            SE3(pose_10.q[None], pose_10.t[None]), cam, 1, 0.0, 0.1, 2.0)
        z = jnp.zeros((1,), jnp.int32)
        warped, res, inl = sk.se3_warp_batch(
            kp, z, z, img0[None], dpt0[None], img1[None])
        return warped[0], ErrorResult(residual=res[0], inliers=inl[0])
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


def depth_align_step_T(
    code: Array,        # [CS]
    target_dpt: Array,  # [H, W]
    prx_orig: Array,    # [H, W]
    prx_jacT: Array,    # [CS, H, W] feature-major (map_state.LevelData.jac)
    avg_dpt: float = 2.0,
) -> SystemResult:
    """depth_align_step on the feature-major jacobian layout: builds the
    [CS, N] row stack directly (no [N, CS] intermediate, which pads CS to
    128 lanes on TPU).

    Deliberate deviation from cu_depthaligner.cpp:46-68: the reference's
    J = -2|diff|·dDpt/dPrx·prx_J yields GN steps of CONSTANT magnitude
    ±1/(2·dDpt·prx_J) independent of |diff| — it bang-bangs around the
    target depth without converging. Here J is the true residual Jacobian
    d(tgt − dpt)/d code = -dDpt/dPrx·prx_J, which shares the fixed point
    (diff = 0) and converges quadratically. The reference-exact variant is
    kept as depth_align_step for parity tests."""
    CS = prx_jacT.shape[0]
    prx = prx_orig + jnp.einsum("chw,c->hw", prx_jacT, code,
                                preferred_element_type=jnp.float32)
    dpt = wp.prox_to_depth(prx, avg_dpt)
    diff = (target_dpt - dpt).reshape(-1)
    dJp = wp.depth_jacobian_prx(dpt, avg_dpt).reshape(-1)
    JT = (-dJp)[None, :] * prx_jacT.reshape(CS, -1)
    ones = jnp.ones_like(diff)
    valid = jnp.ones_like(diff, dtype=bool)
    return _masked_system_T(JT, diff, ones, valid)
