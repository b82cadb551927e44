"""Dense aligner tests.

Mirrors the reference's ut_sfmaligner.cpp strategy:
  - FullJacobianFiniteDiff (:329-487): every Jtr entry vs central finite
    differences of the residual through the decoupled retract / code.
  - ImageAlignmentTest (ut_se3aligner.cpp:173): GN converges on a synthetic
    warp and recovers the pose.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m, warping as wp
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.ops import dense_sfm as ds
from deepfactors_tpu.ops import image as ip

H, W, CS = 48, 64, 8


@pytest.fixture
def scene():
    rng = np.random.RandomState(3)
    # smooth synthetic image: sum of sinusoids (differentiable texture)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img0 = (
        0.5
        + 0.25 * np.sin(xs / 7.0)
        + 0.25 * np.cos(ys / 5.0)
        + 0.1 * np.sin((xs + ys) / 11.0)
    ).astype(np.float32)
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2, width=W, height=H)
    # smooth prox map around 0.5 (depth ~2.0 at avg_dpt=2)
    prx0 = (0.5 + 0.05 * np.sin(xs / 9.0) * np.cos(ys / 9.0)).astype(np.float32)
    # spatially smooth code jacobian (decoder jacobians are smooth; white
    # noise here would amplify the Sobel-vs-bilinear gradient mismatch)
    phase = rng.uniform(0, 2 * np.pi, (CS, 2)).astype(np.float32)
    freq = rng.uniform(0.05, 0.15, (CS, 2)).astype(np.float32)
    prx_jac = np.stack(
        [
            0.02 * np.sin(xs * freq[k, 0] + phase[k, 0]) *
            np.cos(ys * freq[k, 1] + phase[k, 1])
            for k in range(CS)
        ],
        axis=-1,
    ).astype(np.float32)
    code = np.zeros(CS, dtype=np.float32)
    std0 = np.zeros((H, W), dtype=np.float32)

    avg = 2.0
    params = ds.SfmParams(huber_delta=0.3, avg_dpt=avg, min_dpt=0.0, valid_border=2)

    pose0 = se3m.identity()
    d = np.zeros(6, dtype=np.float32)
    d[:3] = [0.02, -0.01, 0.015]
    d[3:] = [0.01, -0.005, 0.008]
    pose1 = se3m.retract(se3m.identity(), jnp.asarray(d))

    dpt0 = wp.prox_to_depth(
        jnp.asarray(prx0) + jnp.einsum("hwc,c->hw", jnp.asarray(prx_jac), jnp.asarray(code)),
        avg,
    )
    # render img1 by warping img0 through the true geometry:
    # for each pixel of img1 we'd need inverse warp; instead use img1 = warp of
    # img0 formula evaluated densely via sampling img0 at pix0 of each pix1.
    # For Jacobian tests exactness of img1 doesn't matter — use another smooth
    # function so residuals are nonzero but smooth.
    img1 = (
        0.5
        + 0.25 * np.sin((xs + 1.5) / 7.0)
        + 0.25 * np.cos((ys - 2.0) / 5.0)
        + 0.1 * np.sin((xs + ys) / 11.0)
    ).astype(np.float32)
    grad1 = ip.sobel_gradients(jnp.asarray(img1))

    return dict(
        img0=jnp.asarray(img0),
        img1=jnp.asarray(img1),
        grad1=grad1,
        prx0=jnp.asarray(prx0),
        prx_jac=jnp.asarray(prx_jac),
        code=jnp.asarray(code),
        std0=jnp.asarray(std0),
        dpt0=dpt0,
        cam=cam,
        params=params,
        pose0=pose0,
        pose1=pose1,
        avg=avg,
    )


def _residual_vector(s, pose0, pose1, code):
    """Weighted residual vector for finite differencing, with the valid mask
    FROZEN at the linearization point (Jtr findiff only makes sense for the
    smooth part; mirrors the reference's tolerance-laden findiff test)."""
    params = s["params"]
    dpt0 = wp.prox_to_depth(
        s["prx0"] + jnp.einsum("hwc,c->hw", s["prx_jac"], code), s["avg"]
    )
    pose_10 = se3m.relative_pose(pose1, pose0)
    pix0 = ds._pixel_grid(H, W).reshape(-1, 2)
    corresp = wp.find_correspondence(
        pix0, dpt0.reshape(-1), s["cam"], pose_10,
        border=params.valid_border, min_dpt=params.min_dpt,
    )
    i1 = ip.bilinear_sample(s["img1"], corresp.pix1)
    r = s["img0"].reshape(-1) - i1
    return r, corresp.valid


def test_full_jacobian_finite_diff(scene):
    """Jtr vs numerical dr/dtheta^T r for all 6+6+CS dims."""
    s = scene
    sys, valid0 = ds.sfm_step(
        s["pose0"], s["pose1"], s["code"], s["cam"], s["img0"], s["img1"],
        s["dpt0"], s["std0"], s["prx_jac"], s["grad1"], s["params"],
    )
    r0, valid = _residual_vector(s, s["pose0"], s["pose1"], s["code"])
    w = jnp.where(valid, 1.0, 0.0)  # huber_delta=0.3 >> residuals -> weight 1

    eps = 1e-4
    D = 12 + CS
    num_Jtr = np.zeros(D)
    for i in range(D):
        if i < 6:
            d = np.zeros(6, dtype=np.float32); d[i] = eps
            rp, _ = _residual_vector(s, se3m.retract(s["pose0"], jnp.asarray(d)), s["pose1"], s["code"])
            rm, _ = _residual_vector(s, se3m.retract(s["pose0"], jnp.asarray(-d)), s["pose1"], s["code"])
        elif i < 12:
            d = np.zeros(6, dtype=np.float32); d[i - 6] = eps
            rp, _ = _residual_vector(s, s["pose0"], se3m.retract(s["pose1"], jnp.asarray(d)), s["code"])
            rm, _ = _residual_vector(s, s["pose0"], se3m.retract(s["pose1"], jnp.asarray(-d)), s["code"])
        else:
            d = np.zeros(CS, dtype=np.float32); d[i - 12] = eps
            rp, _ = _residual_vector(s, s["pose0"], s["pose1"], s["code"] + jnp.asarray(d))
            rm, _ = _residual_vector(s, s["pose0"], s["pose1"], s["code"] - jnp.asarray(d))
        drdi = (rp - rm) / (2 * eps)
        num_Jtr[i] = float(jnp.sum(w * drdi * r0))

    ana = np.asarray(sys.Jtr)
    # image-gradient linearization error dominates; compare correlation-style
    # like the reference's loose tolerances (tol_pose=2e1, tol_code=1.5e-2)
    scale = np.abs(num_Jtr) + 1e-3
    np.testing.assert_allclose(ana / scale, num_Jtr / scale, atol=0.45)


def test_system_psd_and_shapes(scene):
    s = scene
    sys, valid0 = ds.sfm_step(
        s["pose0"], s["pose1"], s["code"], s["cam"], s["img0"], s["img1"],
        s["dpt0"], s["std0"], s["prx_jac"], s["grad1"], s["params"],
    )
    D = 12 + CS
    assert sys.JtJ.shape == (D, D)
    assert sys.Jtr.shape == (D,)
    np.testing.assert_allclose(sys.JtJ, sys.JtJ.T, atol=1e-4)
    eigs = np.linalg.eigvalsh(np.asarray(sys.JtJ, dtype=np.float64))
    # PSD up to f32 Gram-accumulation rounding (relative to spectral radius)
    assert eigs.min() > -1e-6 * eigs.max()
    assert float(sys.inliers) > 0.5 * H * W


def test_se3_alignment_converges():
    """SE3 GN tracking recovers a synthetic pose perturbation
    (ut_se3aligner.cpp ImageAlignmentTest :173)."""
    rng = np.random.RandomState(11)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img0 = (
        0.5 + 0.3 * np.sin(xs / 5.0) + 0.2 * np.cos(ys / 4.0)
        + 0.1 * np.sin((2 * xs - ys) / 9.0)
    ).astype(np.float32)
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2, width=W, height=H)
    dpt0 = jnp.full((H, W), 2.0, dtype=jnp.float32)

    # ground-truth relative pose cam0->cam1 (small)
    d = np.array([0.01, -0.01, 0.02, 0.004, -0.003, 0.005], dtype=np.float32)
    pose_10_true = se3m.retract(se3m.identity(), jnp.asarray(d))

    # render img1: for each pixel of cam0, its warp target in cam1 — instead
    # render by inverse warping: img1(pix) = img0 at correspondence of
    # pose_01 = inverse(pose_10)
    pose_01 = se3m.inverse(pose_10_true)
    pix1 = ds._pixel_grid(H, W).reshape(-1, 2)
    corresp = wp.find_correspondence(pix1, jnp.full(H * W, 2.0), cam, pose_01,
                                     check_bounds=False)
    img1 = ip.bilinear_sample(jnp.asarray(img0), corresp.pix1).reshape(H, W)
    grad1 = ip.sobel_gradients(img1)

    pose = se3m.identity()
    for _ in range(15):
        sys = ds.se3_step(pose, cam, jnp.asarray(img0), img1, dpt0, grad1, 0.3)
        pose = ds.se3_solve_and_update(sys.JtJ, sys.Jtr, pose, damping=1e-6)

    err = np.asarray(se3m.local(pose_10_true, pose))
    assert np.linalg.norm(err) < 5e-3, f"pose error {err}"


def test_depth_aligner_reduces_error():
    rng = np.random.RandomState(5)
    prx0 = jnp.full((H, W), 0.5, dtype=jnp.float32)
    prx_jac = jnp.asarray(rng.uniform(-0.05, 0.05, (H, W, CS)).astype(np.float32))
    code_true = jnp.asarray(rng.uniform(-0.5, 0.5, CS).astype(np.float32))
    target = wp.prox_to_depth(
        prx0 + jnp.einsum("hwc,c->hw", prx_jac, code_true), 2.0
    )
    code = jnp.zeros(CS)
    r_first = None
    for _ in range(20):
        sys = ds.depth_align_step(code, target, prx0, prx_jac, 2.0)
        if r_first is None:
            r_first = float(sys.residual)
        upd = jnp.linalg.solve(sys.JtJ + 1e-4 * jnp.eye(CS), sys.Jtr)
        code = code - 0.5 * upd  # damped; reference runs inside GTSAM GN
    sys = ds.depth_align_step(code, target, prx0, prx_jac, 2.0)
    assert float(sys.residual) < 0.1 * r_first


def test_warp_renders(scene):
    s = scene
    pose_10 = se3m.relative_pose(s["pose1"], s["pose0"])
    warped, err = ds.se3_warp(pose_10, s["cam"], s["img0"], s["img1"], s["dpt0"])
    assert warped.shape == (H, W)
    assert float(err.inliers) > 0
