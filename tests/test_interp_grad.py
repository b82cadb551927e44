"""grad_mode='interp': the image gradient is the EXACT derivative of the
bilinear interpolant, computed from the same gathered corners as the sample
(ops/pallas/sfm_kernel._band_sample_interp / ops.image.bilinear_sample_grad).

Tier (2) kernel-vs-reference equivalence for the interp mode plus a
finite-difference exactness test that the sampled-Sobel mode of the reference
cannot pass (the Sobel-sampled J only approximates the residual derivative,
dense_sfm.h:167/180)."""
import numpy as np
import jax
import jax.numpy as jnp

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.ops import dense_sfm as ds
from deepfactors_tpu.ops import image as ip
from deepfactors_tpu.ops.pallas import sfm_kernel as sk

from test_sfm_fused import make_problem


def make_problem_smooth(H, W, CS, K, P, seed=0):
    """make_problem with a SMOOTH depth map (decoder-like). The fast interp
    sampler serves a bounded per-tile row-offset spread; per-pixel random
    depth (make_problem) is adversarial beyond any band and only partially
    covered — realistic decoder depth is smooth and fully covered."""
    import numpy as np
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem(
        H, W, CS, K, P, seed)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    prx = np.stack([
        0.45 + 0.08 * np.sin(xs / 9 + k) * np.cos(ys / 7 + 0.2 * k)
        for k in range(K)]).astype(np.float32)
    dpt = 2.0 / prx - 2.0
    return cam, imgs, grads, jac, codes, dpt, poses, src, dst


def test_bilinear_sample_grad_matches_value_and_findiff():
    rng = np.random.RandomState(0)
    H, W = 32, 48
    img = jnp.asarray(rng.rand(H, W).astype(np.float32))
    pix = jnp.asarray(
        np.stack([2 + (W - 4) * rng.rand(200), 2 + (H - 4) * rng.rand(200)],
                 axis=-1).astype(np.float32))
    val, gx, gy = ip.bilinear_sample_grad(img, pix)
    np.testing.assert_allclose(np.asarray(val),
                               np.asarray(ip.bilinear_sample(img, pix)),
                               rtol=1e-6, atol=1e-6)
    # exact derivative of the interpolant: findiff with steps that stay
    # inside the same bilinear cell
    eps = 1e-3
    frac = np.asarray(pix) % 1.0
    inside = np.all((frac > 2 * eps) & (frac < 1 - 2 * eps), axis=-1)
    vx1 = ip.bilinear_sample(img, pix + jnp.asarray([eps, 0.0]))
    vx0 = ip.bilinear_sample(img, pix - jnp.asarray([eps, 0.0]))
    vy1 = ip.bilinear_sample(img, pix + jnp.asarray([0.0, eps]))
    vy0 = ip.bilinear_sample(img, pix - jnp.asarray([0.0, eps]))
    np.testing.assert_allclose(np.asarray(gx)[inside],
                               (np.asarray(vx1 - vx0) / (2 * eps))[inside],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy)[inside],
                               (np.asarray(vy1 - vy0) / (2 * eps))[inside],
                               rtol=1e-3, atol=1e-3)


def test_fused_gram_interp_matches_reference():
    """Pallas interp kernel == XLA interp reference (JtJ/Jtr/residual)."""
    H, W, CS, K, P = 48, 128, 8, 4, 6
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem_smooth(
        H, W, CS, K, P)
    params = ds.SfmParams(huber_delta=0.1, avg_dpt=2.0, min_dpt=0.01,
                          valid_border=2)
    poses0 = SE3(poses.q[src], poses.t[src])
    poses1 = SE3(poses.q[dst], poses.t[dst])

    ref = ds.sfm_step_batch(
        poses0, poses1, jnp.asarray(codes)[src], cam,
        jnp.asarray(imgs)[src], jnp.asarray(imgs)[dst],
        jnp.asarray(dpt)[src], jnp.zeros((P, H, W)),
        jnp.asarray(jac)[src], jnp.asarray(grads)[dst], params,
        grad_mode="interp")

    pose_10, j_pose1, j_pose0 = jax.vmap(se3m.relative_pose_jacobians)(
        poses1, poses0)
    kp = sk.make_sfm_params(pose_10, cam, params.valid_border,
                            params.min_dpt, params.huber_delta,
                            params.avg_dpt)
    jacT = jnp.asarray(np.transpose(jac, (0, 3, 1, 2)))
    on_cpu = jax.devices()[0].platform == "cpu"
    G = sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt), jacT,
        jnp.asarray(imgs), grad_mode="interp", interpret=on_cpu)
    JtJ, Jtr, res, inl = sk.system_from_gram(G, j_pose0, j_pose1, CS)

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


def test_se3_gram_interp_matches_reference():
    CS, K, P = 4, 3, 4
    H, W = 48, 64
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem_smooth(
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
                jnp.asarray(grads[dst[p]]), huber, grad_mode="interp"))
    finally:
        ds.use_pallas_warp(prev)

    pose_10 = jax.vmap(se3m.relative_pose)(
        SE3(poses.q[dst], poses.t[dst]), SE3(poses.q[src], poses.t[src]))
    kp = sk.make_sfm_params(pose_10, cam, 1, 0.0, huber, 2.0)
    on_cpu = jax.devices()[0].platform == "cpu"
    G = np.asarray(sk.se3_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt),
        jnp.asarray(imgs), grad_mode="interp", interpret=on_cpu))

    tol = 1e-4 if on_cpu else 1e-2
    for p, ref in enumerate(refs):
        np.testing.assert_allclose(G[p, 7, 7], np.asarray(ref.inliers))
        scale = max(np.max(np.abs(np.asarray(ref.JtJ))), 1e-6)
        assert np.max(np.abs(G[p, :6, :6] - np.asarray(ref.JtJ))) / scale < tol
        scale = max(np.max(np.abs(np.asarray(ref.Jtr))), 1e-6)
        assert np.max(np.abs(G[p, :6, 6] - np.asarray(ref.Jtr))) / scale < tol


def test_interp_jtr_is_exact_gradient_of_residual():
    """With unit weights, Jtr == ½·dE/dθ for E = Σ r² — the interp-mode
    Jacobian is the true derivative of the discrete residual. Verified by
    central finite differences through the actual sampling chain (the
    sampled-Sobel mode only approximates this)."""
    H, W, CS, K, P = 48, 64, 4, 3, 1
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem_smooth(
        H, W, CS, K, P, seed=21)
    params = ds.SfmParams(huber_delta=1e9, avg_dpt=2.0, min_dpt=0.01,
                          valid_border=3)
    s, d = int(src[0]), int(dst[0])
    code0 = jnp.asarray(codes[s])
    jac_s = jnp.asarray(jac[s])
    prx0 = 2.0 / (jnp.asarray(dpt[s]) + 2.0) - jnp.einsum(
        "hwc,c->hw", jac_s, code0)

    def residual_energy(q0, t0, c0):
        prx = prx0 + jnp.einsum("hwc,c->hw", jac_s, c0)
        dpt0 = 2.0 / prx - 2.0
        sys, _ = ds.sfm_step(
            SE3(q0, t0), SE3(poses.q[d], poses.t[d]), c0, cam,
            jnp.asarray(imgs[s]), jnp.asarray(imgs[d]), dpt0,
            jnp.zeros((H, W)), jac_s, jnp.asarray(grads[d]), params,
            grad_mode="interp")
        return sys

    sys = residual_energy(poses.q[s], poses.t[s], code0)
    Jtr = np.asarray(sys.Jtr)

    # code-direction findiff (the depth chain exercises warp + interp grad)
    eps = 1e-4
    rng = np.random.RandomState(3)
    for _ in range(4):
        v = rng.standard_normal(CS).astype(np.float32)
        v /= np.linalg.norm(v)
        ep = residual_energy(poses.q[s], poses.t[s],
                             code0 + eps * jnp.asarray(v)).residual
        em = residual_energy(poses.q[s], poses.t[s],
                             code0 - eps * jnp.asarray(v)).residual
        findiff = float((ep - em) / (4 * eps))  # ½ dE/dv
        analytic = float(Jtr[12:] @ v)
        assert abs(findiff - analytic) < 5e-2 * max(abs(findiff), 1.0), (
            findiff, analytic)


def test_interp_cover_contained_on_adversarial_depth():
    """Per-pixel random depth exceeds any band: the fast sampler must
    DEGRADE GRACEFULLY — inliers a subset (>=80% here), finite system."""
    H, W, CS, K, P = 48, 128, 8, 4, 6
    cam, imgs, grads, jac, codes, dpt, poses, src, dst = make_problem(
        H, W, CS, K, P)
    poses0 = SE3(poses.q[src], poses.t[src])
    poses1 = SE3(poses.q[dst], poses.t[dst])
    pose_10, j_pose1, j_pose0 = jax.vmap(se3m.relative_pose_jacobians)(
        poses1, poses0)
    kp = sk.make_sfm_params(pose_10, cam, 2, 0.01, 0.1, 2.0)
    jacT = jnp.asarray(np.transpose(jac, (0, 3, 1, 2)))
    on_cpu = jax.devices()[0].platform == "cpu"
    G = sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt), jacT,
        jnp.asarray(imgs), grad_mode="interp", interpret=on_cpu)
    Gs = sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt), jacT,
        jnp.asarray(imgs), jnp.asarray(grads[..., 0]),
        jnp.asarray(grads[..., 1]), interpret=on_cpu)
    JtJ, Jtr, res, inl = sk.system_from_gram(G, j_pose0, j_pose1, CS)
    _, _, _, inl_s = sk.system_from_gram(Gs, j_pose0, j_pose1, CS)
    assert np.all(np.isfinite(np.asarray(JtJ)))
    assert np.all(np.asarray(inl) <= np.asarray(inl_s))
    assert np.all(np.asarray(inl) >= 0.8 * np.asarray(inl_s))
