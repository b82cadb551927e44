"""Sparse factor tests: reprojection Jacobians vs finite differences (the
warp chain is smooth — tight tolerances), geometric factor consistency, and
reprojection-only GN convergence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.ops import sparse_factors as sf
from deepfactors_tpu.ops import image as ip

H, W, CS = 64, 96, 6


@pytest.fixture
def setup():
    rng = np.random.RandomState(4)
    cam = PinholeCamera.create(fx=80.0, fy=80.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    prx0 = (0.5 + 0.04 * np.sin(xs / 11) * np.cos(ys / 9)).astype(np.float32)
    # feature-major [CS, H, W] (map_state.LevelData.jac layout)
    jac = np.stack(
        [0.02 * np.sin(xs / (7 + k) + k) * np.cos(ys / (6 + k)) for k in range(CS)],
        axis=0,
    ).astype(np.float32)
    M = 24
    kp0 = rng.uniform(10, 80, (M, 2)).astype(np.float32)
    kp1 = kp0 + rng.uniform(-3, 3, (M, 2)).astype(np.float32)
    d = np.asarray([0.03, -0.02, 0.04, 0.01, -0.008, 0.012], np.float32)
    pose1 = se3m.retract(se3m.identity(), jnp.asarray(d))
    code = jnp.asarray(rng.uniform(-0.5, 0.5, CS).astype(np.float32))
    return dict(cam=cam, prx0=jnp.asarray(prx0), jac=jnp.asarray(jac),
                kp0=jnp.asarray(kp0), kp1=jnp.asarray(kp1),
                valid=jnp.ones(M, bool), pose0=se3m.identity(), pose1=pose1,
                code=code, rng=rng)


def _rep_residuals(s, pose0, pose1, code):
    from deepfactors_tpu.geometry import warping as wp
    prx0_kp, jac_kp = sf._sample_code_data(s["prx0"], s["jac"], s["kp0"])
    dpt0 = wp.depth_from_code(code, jac_kp, prx0_kp, 2.0)
    pose_10 = se3m.relative_pose(pose1, pose0)
    corr = wp.find_correspondence(s["kp0"], dpt0, s["cam"], pose_10,
                                  check_bounds=False)
    return (s["kp1"] - corr.pix1).reshape(-1)


def test_reprojection_jtr_finite_diff(setup):
    s = setup
    sys = sf.reprojection_system(
        s["pose0"], s["pose1"], s["code"], s["cam"], s["kp0"], s["kp1"],
        s["valid"], s["prx0"], s["jac"], huber_delta=1e6, sigma=1.0,
    )  # huge delta: CauchyWeight -> 1/sqrt(2) exactly; account below
    r0 = _rep_residuals(s, s["pose0"], s["pose1"], s["code"])
    w2 = 0.5  # cauchy_weight(x, 1e6)^2 for small x
    D = 12 + CS
    eps = 1e-4
    num = np.zeros(D)
    for i in range(D):
        if i < 6:
            dd = np.zeros(6, np.float32); dd[i] = eps
            rp = _rep_residuals(s, se3m.retract(s["pose0"], jnp.asarray(dd)), s["pose1"], s["code"])
            rm = _rep_residuals(s, se3m.retract(s["pose0"], jnp.asarray(-dd)), s["pose1"], s["code"])
        elif i < 12:
            dd = np.zeros(6, np.float32); dd[i - 6] = eps
            rp = _rep_residuals(s, s["pose0"], se3m.retract(s["pose1"], jnp.asarray(dd)), s["code"])
            rm = _rep_residuals(s, s["pose0"], se3m.retract(s["pose1"], jnp.asarray(-dd)), s["code"])
        else:
            dd = np.zeros(CS, np.float32); dd[i - 12] = eps
            rp = _rep_residuals(s, s["pose0"], s["pose1"], s["code"] + jnp.asarray(dd))
            rm = _rep_residuals(s, s["pose0"], s["pose1"], s["code"] - jnp.asarray(dd))
        drdi = (np.asarray(rp) - np.asarray(rm)) / (2 * eps)
        num[i] = w2 * float(np.sum(drdi * np.asarray(r0)))
    ana = np.asarray(sys.Jtr)
    np.testing.assert_allclose(ana, num, rtol=5e-2, atol=5e-2)


def test_reprojection_gn_converges(setup):
    """Reprojection-only GN over pose1 recovers a consistent geometry: build
    kp1 from the true warp, perturb pose1, optimize it back."""
    from deepfactors_tpu.geometry import warping as wp
    s = setup
    prx0_kp, jac_kp = sf._sample_code_data(s["prx0"], s["jac"], s["kp0"])
    dpt0 = wp.depth_from_code(s["code"], jac_kp, prx0_kp, 2.0)
    pose_10 = se3m.relative_pose(s["pose1"], s["pose0"])
    corr = wp.find_correspondence(s["kp0"], dpt0, s["cam"], pose_10,
                                  check_bounds=False)
    kp1_true = corr.pix1

    pose1 = se3m.retract(
        s["pose1"],
        jnp.asarray([0.02, -0.02, 0.01, 0.01, -0.01, 0.005], jnp.float32),
    )
    for _ in range(10):
        sys = sf.reprojection_system(
            s["pose0"], pose1, s["code"], s["cam"], s["kp0"], kp1_true,
            s["valid"], s["prx0"], s["jac"], huber_delta=5.0, sigma=1.0,
        )
        # optimize pose1 block only
        Hb = sys.JtJ[6:12, 6:12] + 1e-6 * jnp.eye(6)
        g = sys.Jtr[6:12]
        delta = -jnp.linalg.solve(Hb, g)
        pose1 = se3m.retract(pose1, delta)
    err = np.linalg.norm(np.asarray(se3m.local(s["pose1"], pose1)))
    assert err < 1e-3, f"pose error {err}"


def test_geometric_consistency(setup):
    """Geometric factor: zero residual when both keyframes decode to one
    consistent surface; nonzero when code1 changes."""
    s = setup
    rng = s["rng"]
    N = 32
    pts = jnp.asarray(rng.uniform(8, 80, (N, 2)).astype(np.float32))
    # flat scene at depth 2: prox 0.5 with zero jacobian -> consistent for
    # identical poses
    prx_flat = jnp.full((H, W), 0.5)
    jac_flat = jnp.zeros((CS, H, W))
    dpt_grad = jnp.zeros((H, W, 2))
    sys0 = sf.geometric_system(
        s["pose0"], s["pose0"], jnp.zeros(CS), jnp.zeros(CS), s["cam"], pts,
        prx_flat, jac_flat, prx_flat, jac_flat, dpt_grad,
    )
    assert float(sys0.residual) < 1e-8
    # shifting code1 with nonzero jac creates residual + code1 gradient
    jac1 = jnp.full((CS, H, W), 0.02)
    sys1 = sf.geometric_system(
        s["pose0"], s["pose0"], jnp.zeros(CS), 0.5 * jnp.ones(CS), s["cam"],
        pts, prx_flat, jac_flat, prx_flat, jac1, dpt_grad,
    )
    assert float(sys1.residual) > 1e-4
    assert np.abs(np.asarray(sys1.Jtr[12 + CS:])).max() > 1e-4


def test_geometric_jtr_code1_finite_diff(setup):
    s = setup
    rng = s["rng"]
    N = 16
    pts = jnp.asarray(rng.uniform(8, 80, (N, 2)).astype(np.float32))
    code1 = jnp.asarray(rng.uniform(-0.3, 0.3, CS).astype(np.float32))
    dpt_grad = jnp.zeros((H, W, 2))

    def resid(c1):
        from deepfactors_tpu.geometry import warping as wp
        prx0_p, jac0_p = sf._sample_code_data(s["prx0"], s["jac"], pts)
        dpt0 = wp.depth_from_code(s["code"], jac0_p, prx0_p, 2.0)
        pose_10 = se3m.relative_pose(s["pose1"], s["pose0"])
        corr = wp.find_correspondence(pts, dpt0, s["cam"], pose_10)
        prx1_nn, jac1_nn = sf._sample_code_data(s["prx0"], s["jac"], corr.pix1)
        dpt1 = wp.depth_from_code(c1, jac1_nn, prx1_nn, 2.0)
        return np.asarray(jnp.where(corr.valid, dpt1 - corr.tpt[..., 2], 0.0))

    sys = sf.geometric_system(
        s["pose0"], s["pose1"], s["code"], code1, s["cam"], pts,
        s["prx0"], s["jac"], s["prx0"], s["jac"], dpt_grad,
        huber_delta=1e6,
    )
    r0 = resid(code1)
    eps = 1e-4
    num = np.zeros(CS)
    for k in range(CS):
        dd = np.zeros(CS, np.float32); dd[k] = eps
        num[k] = float(np.sum((resid(code1 + jnp.asarray(dd))
                               - resid(code1 - jnp.asarray(dd))) / (2 * eps) * r0))
    ana = np.asarray(sys.Jtr[12 + CS:])
    np.testing.assert_allclose(ana, num, rtol=5e-2, atol=2e-3)
