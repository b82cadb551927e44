"""Fused SfM system kernel (ops/pallas/sfm_kernel.py) vs the XLA reference
path — kernel-vs-reference-loop equivalence, tier (2) of the reference test
strategy (mirrors ut_sfmaligner.cpp:235-327 FullJacobianCompareWithCpu)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.ops import dense_sfm as ds
from deepfactors_tpu.ops.pallas import sfm_kernel as sk


def make_problem(H, W, CS, K, P, seed=0):
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    imgs = np.stack([
        0.5 + 0.3 * np.sin(xs / 7 + k) * np.cos(ys / 5 + 0.3 * k)
        for k in range(K)]).astype(np.float32)
    grads = np.stack([np.stack(np.gradient(im)[::-1], axis=-1)
                      for im in imgs])
    prx0 = 0.45 + 0.1 * rng.rand(K, H, W).astype(np.float32)
    jac = (0.02 * rng.standard_normal((K, H, W, CS))).astype(np.float32)
    codes = (0.1 * rng.standard_normal((K, CS))).astype(np.float32)
    prx = prx0 + np.einsum("khwc,kc->khw", jac, codes)
    dpt = 2.0 / prx - 2.0
    qs, ts = [], []
    for k in range(K):
        w = 0.02 * rng.standard_normal(3)
        q = np.array([1.0, w[0] / 2, w[1] / 2, w[2] / 2])
        q /= np.linalg.norm(q)
        qs.append(q)
        ts.append(0.05 * rng.standard_normal(3))
    poses = SE3(jnp.asarray(np.stack(qs), jnp.float32),
                jnp.asarray(np.stack(ts), jnp.float32))
    src = jnp.asarray(rng.randint(0, K, P), jnp.int32)
    dst = jnp.asarray((np.asarray(src) + 1 + rng.randint(0, K - 1, P)) % K,
                      jnp.int32)
    return cam, imgs, grads, jac, codes, dpt, poses, src, dst


@pytest.mark.parametrize("H,W", [(48, 128), (48, 64)])
def test_fused_gram_matches_reference(H, W):
    CS, K, P = 8, 4, 6
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem(
        H, W, CS, K, P)
    params = ds.SfmParams(huber_delta=0.1, avg_dpt=2.0, min_dpt=0.01,
                          valid_border=2)
    poses0 = SE3(poses.q[src], poses.t[src])
    poses1 = SE3(poses.q[dst], poses.t[dst])

    prev = ds.use_pallas_warp()
    ds.use_pallas_warp(False)
    try:
        ref = ds.sfm_step_batch(
            poses0, poses1, jnp.asarray(codes)[src], cam,
            jnp.asarray(imgs)[src], jnp.asarray(imgs)[dst],
            jnp.asarray(dpt)[src], jnp.zeros((P, H, W)),
            jnp.asarray(jac)[src], jnp.asarray(grads)[dst], params)
    finally:
        ds.use_pallas_warp(prev)

    pose_10, j_pose1, j_pose0 = jax.vmap(se3m.relative_pose_jacobians)(
        poses1, poses0)
    kp = sk.make_sfm_params(pose_10, cam, params.valid_border,
                            params.min_dpt, params.huber_delta,
                            params.avg_dpt)
    jacT = jnp.asarray(np.transpose(jac, (0, 3, 1, 2)))
    on_cpu = jax.devices()[0].platform == "cpu"
    G = sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt), jacT,
        jnp.asarray(imgs), jnp.asarray(grads[..., 0]),
        jnp.asarray(grads[..., 1]), interpret=on_cpu)
    JtJ, Jtr, res, inl = sk.system_from_gram(G, j_pose0, j_pose1, CS)

    # interpret mode is bit-level f32; hardware MXU quantizes to bf16
    tol = 1e-4 if on_cpu else 1e-2
    np.testing.assert_allclose(np.asarray(inl), np.asarray(ref.inliers))
    err = np.max(np.abs(np.asarray(JtJ) - np.asarray(ref.JtJ)))
    scale = np.max(np.abs(np.asarray(ref.JtJ)))
    assert err / scale < tol, f"JtJ rel err {err / scale}"
    err = np.max(np.abs(np.asarray(Jtr) - np.asarray(ref.Jtr)))
    scale = np.max(np.abs(np.asarray(ref.Jtr)))
    assert err / scale < tol, f"Jtr rel err {err / scale}"
    np.testing.assert_allclose(np.asarray(res), np.asarray(ref.residual),
                               rtol=1e-3)
    # the Gram construction must keep the per-factor systems exactly
    # symmetric (indefiniteness from asymmetric rounding NaNs the Cholesky)
    np.testing.assert_allclose(np.asarray(JtJ),
                               np.swapaxes(np.asarray(JtJ), -1, -2))


@pytest.mark.parametrize("H,W", [(48, 128), (48, 64)])
def test_se3_gram_matches_reference(H, W):
    """Fused SE(3) tracking kernel vs ops.dense_sfm.se3_step
    (mirrors ut_se3aligner.cpp:133 FullJacobianTest)."""
    CS, K, P = 4, 3, 4
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem(
        H, W, CS, K, P, seed=7)
    huber = 0.3

    prev = ds.use_pallas_warp()
    ds.use_pallas_warp(False)
    try:
        refs = []
        for p in range(P):
            pose_10 = se3m.relative_pose(
                SE3(poses.q[dst[p]], poses.t[dst[p]]),
                SE3(poses.q[src[p]], poses.t[src[p]]))
            refs.append(ds.se3_step(
                pose_10, cam, jnp.asarray(imgs[src[p]]),
                jnp.asarray(imgs[dst[p]]), jnp.asarray(dpt[src[p]]),
                jnp.asarray(grads[dst[p]]), huber))
    finally:
        ds.use_pallas_warp(prev)

    pose_10 = jax.vmap(se3m.relative_pose)(
        SE3(poses.q[dst], poses.t[dst]), SE3(poses.q[src], poses.t[src]))
    kp = sk.make_sfm_params(pose_10, cam, 1, 0.0, huber, 2.0)
    on_cpu = jax.devices()[0].platform == "cpu"
    G = np.asarray(sk.se3_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt),
        jnp.asarray(imgs), jnp.asarray(grads[..., 0]),
        jnp.asarray(grads[..., 1]), interpret=on_cpu))

    tol = 1e-4 if on_cpu else 1e-2
    for p, ref in enumerate(refs):
        np.testing.assert_allclose(G[p, 7, 7], np.asarray(ref.inliers))
        scale = max(np.max(np.abs(np.asarray(ref.JtJ))), 1e-6)
        assert np.max(np.abs(G[p, :6, :6] - np.asarray(ref.JtJ))) / scale < tol
        scale = max(np.max(np.abs(np.asarray(ref.Jtr))), 1e-6)
        assert np.max(np.abs(G[p, :6, 6] - np.asarray(ref.Jtr))) / scale < tol
        np.testing.assert_allclose(G[p, 6, 6], np.asarray(ref.residual),
                                   rtol=1e-3)


def test_gram_layout():
    """G rows: [A(6) | code(CS) | w·r | valid] — inliers in the corner."""
    CS = 8
    H, W, K, P = 48, 64, 3, 2
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem(
        H, W, CS, K, P, seed=3)
    pose_10, _, _ = jax.vmap(se3m.relative_pose_jacobians)(
        SE3(poses.q[dst], poses.t[dst]), SE3(poses.q[src], poses.t[src]))
    kp = sk.make_sfm_params(pose_10, cam, 2, 0.01, 0.1, 2.0)
    jacT = jnp.asarray(np.transpose(jac, (0, 3, 1, 2)))
    on_cpu = jax.devices()[0].platform == "cpu"
    G = sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt), jacT,
        jnp.asarray(imgs), jnp.asarray(grads[..., 0]),
        jnp.asarray(grads[..., 1]), interpret=on_cpu)
    G = np.asarray(G)
    R = 6 + CS + 2
    assert G.shape == (P, R, R)
    inl = G[:, R - 1, R - 1]
    assert np.all(inl > 0) and np.all(inl <= H * W)
    assert np.all(inl == np.round(inl))


def test_active_mask_zeroes_inactive():
    """Inactive pool slots must produce exactly-zero Gram blocks (the kernel
    skips their compute entirely — pools run at capacity with masked slots)."""
    CS, K, P = 8, 3, 4
    H, W = 48, 64
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem(
        H, W, CS, K, P, seed=5)
    pose_10, _, _ = jax.vmap(se3m.relative_pose_jacobians)(
        SE3(poses.q[dst], poses.t[dst]), SE3(poses.q[src], poses.t[src]))
    kp = sk.make_sfm_params(pose_10, cam, 2, 0.01, 0.1, 2.0)
    jacT = jnp.asarray(np.transpose(jac, (0, 3, 1, 2)))
    act = jnp.asarray([1, 0, 1, 0], jnp.int32)
    on_cpu = jax.devices()[0].platform == "cpu"
    G = np.asarray(sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt), jacT,
        jnp.asarray(imgs), jnp.asarray(grads[..., 0]),
        jnp.asarray(grads[..., 1]), active=act, interpret=on_cpu))
    Gfull = np.asarray(sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt), jacT,
        jnp.asarray(imgs), jnp.asarray(grads[..., 0]),
        jnp.asarray(grads[..., 1]), interpret=on_cpu))
    assert np.all(G[1] == 0) and np.all(G[3] == 0)
    np.testing.assert_array_equal(G[0], Gfull[0])
    np.testing.assert_array_equal(G[2], Gfull[2])

    Gse3 = np.asarray(sk.se3_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt),
        jnp.asarray(imgs), jnp.asarray(grads[..., 0]),
        jnp.asarray(grads[..., 1]), active=act, interpret=on_cpu))
    assert np.all(Gse3[1] == 0) and np.all(Gse3[3] == 0)
    assert np.any(Gse3[0] != 0)


def test_se3_warp_matches_reference():
    """Fused warp render vs ops.dense_sfm.se3_warp
    (cu_se3aligner.cpp kernel_warp_calculate :37-75)."""
    CS, K, P = 4, 3, 3
    H, W = 48, 64
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem(
        H, W, CS, K, P, seed=11)
    pose_10 = jax.vmap(se3m.relative_pose)(
        SE3(poses.q[dst], poses.t[dst]), SE3(poses.q[src], poses.t[src]))
    kp = sk.make_sfm_params(pose_10, cam, 1, 0.0, 0.1, 2.0)
    on_cpu = jax.devices()[0].platform == "cpu"
    warped, res, inl = sk.se3_warp_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt),
        jnp.asarray(imgs), interpret=on_cpu)

    prev = ds.use_pallas_warp()
    ds.use_pallas_warp(False)
    try:
        for p in range(P):
            p10 = SE3(pose_10.q[p], pose_10.t[p])
            w_ref, stats = ds.se3_warp(
                p10, cam, jnp.asarray(imgs[src[p]]),
                jnp.asarray(imgs[dst[p]]), jnp.asarray(dpt[src[p]]))
            np.testing.assert_allclose(np.asarray(inl[p]),
                                       np.asarray(stats.inliers))
            atol = 1e-5 if on_cpu else 1e-3
            np.testing.assert_allclose(np.asarray(warped[p]),
                                       np.asarray(w_ref), atol=atol)
            np.testing.assert_allclose(np.asarray(res[p]),
                                       np.asarray(stats.residual),
                                       rtol=1e-3, atol=1e-5)
    finally:
        ds.use_pallas_warp(prev)


def test_sfm_error_matches_reference():
    """Fused eval kernel vs ops.dense_sfm.sfm_evaluate_error
    (SfmAligner::EvaluateError, cu_sfmaligner.cpp:72-97)."""
    CS, K, P = 4, 3, 4
    H, W = 48, 64
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem(
        H, W, CS, K, P, seed=13)
    params = ds.SfmParams(huber_delta=0.1, avg_dpt=2.0, min_dpt=0.01,
                          valid_border=2)
    pose_10 = jax.vmap(se3m.relative_pose)(
        SE3(poses.q[dst], poses.t[dst]), SE3(poses.q[src], poses.t[src]))
    kp = sk.make_sfm_params(pose_10, cam, 1, 0.0, params.huber_delta,
                            params.avg_dpt)
    on_cpu = jax.devices()[0].platform == "cpu"
    res, inl = sk.sfm_error_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt),
        jnp.asarray(imgs), interpret=on_cpu)

    for p in range(P):
        ref = ds.sfm_evaluate_error(
            SE3(poses.q[src[p]], poses.t[src[p]]),
            SE3(poses.q[dst[p]], poses.t[dst[p]]), cam,
            jnp.asarray(imgs[src[p]]), jnp.asarray(imgs[dst[p]]),
            jnp.asarray(dpt[src[p]]), jnp.zeros((H, W)),
            jnp.asarray(grads[dst[p]]), params)
        np.testing.assert_allclose(np.asarray(inl[p]),
                                   np.asarray(ref.inliers))
        np.testing.assert_allclose(np.asarray(res[p]),
                                   np.asarray(ref.residual),
                                   rtol=1e-3, atol=1e-5)


def test_fused_gram_depth_from_code():
    """In-kernel depth materialization (codes= path) must match running the
    kernel on pre-materialized depth (map_state.update_depth_all semantics:
    dpt = avg/clip(prx0 + jacᵀ·c, 1e-4) − avg; cu_image_proc.cpp:248-278)."""
    H, W, CS, K, P = 48, 128, 8, 4, 6
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem(
        H, W, CS, K, P)
    rng = np.random.RandomState(3)
    prx0 = 0.45 + 0.1 * rng.rand(K, H, W).astype(np.float32)
    prx = np.clip(prx0 + np.einsum("khwc,kc->khw", jac, codes), 1e-4, None)
    dpt2 = (2.0 / prx - 2.0).astype(np.float32)

    params = ds.SfmParams(huber_delta=0.1, avg_dpt=2.0, min_dpt=0.01,
                          valid_border=2)
    poses0 = SE3(poses.q[src], poses.t[src])
    poses1 = SE3(poses.q[dst], poses.t[dst])
    pose_10, j_pose1, j_pose0 = jax.vmap(se3m.relative_pose_jacobians)(
        poses1, poses0)
    kp = sk.make_sfm_params(pose_10, cam, params.valid_border,
                            params.min_dpt, params.huber_delta,
                            params.avg_dpt)
    jacT = jnp.asarray(np.transpose(jac, (0, 3, 1, 2)))
    on_cpu = jax.devices()[0].platform == "cpu"
    G_ref = sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt2), jacT,
        jnp.asarray(imgs), grad_mode="interp", interpret=on_cpu)
    G_new = sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(prx0), jacT,
        jnp.asarray(imgs), codes=jnp.asarray(codes)[src],
        grad_mode="interp", interpret=on_cpu)
    scale = np.abs(np.asarray(G_ref)).max()
    err = np.abs(np.asarray(G_new) - np.asarray(G_ref)).max()
    assert err / scale < (1e-5 if on_cpu else 1e-3), f"rel err {err/scale}"
