"""Warping + camera Jacobian tests vs central finite differences.

Mirrors the reference's ut_warping.cpp / ut_pinhole_camera.cpp strategy:
every analytic Jacobian is validated against findiff with random poses,
pixels and depths.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m, camera as cm, warping as wp
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera


@pytest.fixture
def rng():
    return np.random.RandomState(7)


@pytest.fixture
def cam():
    # SceneNet-like camera (reference tests/testing_utils.h GetSceneNetCam)
    return PinholeCamera.create(fx=277.12, fy=289.7, u0=160.0, v0=120.0,
                                width=320, height=240)


def random_pose(rng, tscale=0.1, rscale=0.1):
    w = rng.uniform(-rscale, rscale, 3).astype(np.float32)
    t = rng.uniform(-tscale, tscale, 3).astype(np.float32)
    return SE3(se3m.so3_exp_quat(jnp.asarray(w)), jnp.asarray(t))


def test_prox_depth_roundtrip():
    avg = 2.0
    dpt = jnp.linspace(0.1, 10.0, 50)
    prx = wp.depth_to_prox(dpt, avg)
    back = wp.prox_to_depth(prx, avg)
    np.testing.assert_allclose(back, dpt, rtol=1e-5)


def test_depth_jacobian_prx_finite_diff():
    avg = 2.0
    dpt = jnp.asarray([0.5, 1.0, 3.0, 7.0])
    prx = wp.depth_to_prox(dpt, avg)
    eps = 1e-4
    num = (wp.prox_to_depth(prx + eps, avg) - wp.prox_to_depth(prx - eps, avg)) / (
        2 * eps
    )
    ana = wp.depth_jacobian_prx(dpt, avg)
    np.testing.assert_allclose(ana, num, rtol=1e-2)


def test_project_reproject_roundtrip(cam, rng):
    pix = jnp.asarray(rng.uniform(10, 200, (20, 2)).astype(np.float32))
    dpt = jnp.asarray(rng.uniform(0.5, 5.0, 20).astype(np.float32))
    pt = cm.reproject(cam, pix, dpt)
    pix2 = cm.project(cam, pt)
    np.testing.assert_allclose(pix2, pix, atol=1e-3)


def test_project_point_jacobian_finite_diff(cam, rng):
    pt = jnp.asarray(rng.uniform(0.2, 2.0, (10, 3)).astype(np.float32))
    jac = cm.project_point_jacobian(cam, pt)
    eps = 1e-4
    for k in range(3):
        d = np.zeros(3, dtype=np.float32)
        d[k] = eps
        num = (cm.project(cam, pt + d) - cm.project(cam, pt - d)) / (2 * eps)
        np.testing.assert_allclose(jac[..., :, k], num, atol=2e-1, rtol=1e-2)


def test_reproject_depth_jacobian_finite_diff(cam, rng):
    pix = jnp.asarray(rng.uniform(10, 200, (10, 2)).astype(np.float32))
    dpt = jnp.asarray(rng.uniform(0.5, 5.0, 10).astype(np.float32))
    jac = cm.reproject_depth_jacobian(cam, pix, dpt)
    eps = 1e-3
    num = (cm.reproject(cam, pix, dpt + eps) - cm.reproject(cam, pix, dpt - eps)) / (
        2 * eps
    )
    np.testing.assert_allclose(jac, num, atol=1e-2, rtol=1e-2)


def _tangent_delta(i, eps):
    d = np.zeros(6, dtype=np.float32)
    d[i] = eps
    return jnp.asarray(d)


def test_correspondence_jacobian_pose_finite_diff(cam, rng):
    """Mirrors ut_warping.cpp FindCorrespondenceJacobianPose (:214)."""
    pose = random_pose(rng, tscale=0.05, rscale=0.05)
    pix0 = jnp.asarray(rng.uniform(40, 180, (30, 2)).astype(np.float32))
    dpt = jnp.asarray(rng.uniform(1.0, 4.0, 30).astype(np.float32))
    corresp = wp.find_correspondence(pix0, dpt, cam, pose, check_bounds=False)
    jac = wp.correspondence_jacobian_pose(corresp, dpt, cam, pose)

    eps = 1e-4
    for i in range(6):
        pp = se3m.retract(pose, _tangent_delta(i, eps))
        pm = se3m.retract(pose, _tangent_delta(i, -eps))
        cp = wp.find_correspondence(pix0, dpt, cam, pp, check_bounds=False)
        cmn = wp.find_correspondence(pix0, dpt, cam, pm, check_bounds=False)
        num = (cp.pix1 - cmn.pix1) / (2 * eps)
        np.testing.assert_allclose(jac[..., :, i], num, atol=0.5, rtol=2e-2)


def test_correspondence_jacobian_depth_finite_diff(cam, rng):
    pose = random_pose(rng)
    pix0 = jnp.asarray(rng.uniform(40, 180, (30, 2)).astype(np.float32))
    dpt = jnp.asarray(rng.uniform(1.0, 4.0, 30).astype(np.float32))
    corresp = wp.find_correspondence(pix0, dpt, cam, pose, check_bounds=False)
    jac = wp.correspondence_jacobian_depth(corresp, dpt, cam, pose)
    eps = 1e-3
    cp = wp.find_correspondence(pix0, dpt + eps, cam, pose, check_bounds=False)
    cmn = wp.find_correspondence(pix0, dpt - eps, cam, pose, check_bounds=False)
    num = (cp.pix1 - cmn.pix1) / (2 * eps)
    np.testing.assert_allclose(jac, num, atol=0.5, rtol=2e-2)


def test_correspondence_jacobian_code_finite_diff(cam, rng):
    """Chain through prox-from-code: mirrors ut_sfmaligner.cpp
    CorrespondenceJacobianCode (:137-216) with a synthetic linear decoder."""
    CS = 8
    pose = random_pose(rng)
    N = 20
    pix0 = jnp.asarray(rng.uniform(40, 180, (N, 2)).astype(np.float32))
    prx0 = jnp.asarray(rng.uniform(0.3, 0.7, N).astype(np.float32))
    prx_jac = jnp.asarray(rng.uniform(-0.05, 0.05, (N, CS)).astype(np.float32))
    code = jnp.asarray(rng.uniform(-1, 1, CS).astype(np.float32))
    avg = 2.0

    def pix1_of_code(c):
        dpt = wp.depth_from_code(c, prx_jac, prx0, avg)
        return wp.find_correspondence(pix0, dpt, cam, pose, check_bounds=False).pix1

    dpt = wp.depth_from_code(code, prx_jac, prx0, avg)
    corresp = wp.find_correspondence(pix0, dpt, cam, pose, check_bounds=False)
    jac = wp.correspondence_jacobian_code(corresp, dpt, cam, pose, prx_jac, avg)

    eps = 1e-3
    for k in range(CS):
        d = np.zeros(CS, dtype=np.float32)
        d[k] = eps
        num = (pix1_of_code(code + d) - pix1_of_code(code - d)) / (2 * eps)
        np.testing.assert_allclose(jac[..., :, k], num, atol=0.3, rtol=5e-2)


def test_camera_pyramid_halving(cam):
    pyr = cm.camera_pyramid(cam, 4)
    assert float(pyr[1].width) == 160
    assert float(pyr[2].width) == 80
    np.testing.assert_allclose(float(pyr[1].fx), float(cam.fx) * 0.5, rtol=1e-5)
