"""SE(3) unit tests: group laws, retract/local inverse pair, Jacobians of
relative_pose vs central finite differences (mirrors tests/ut_warping.cpp
RelativePose test at :150)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.se3 import SE3


def random_pose(rng: np.random.RandomState) -> SE3:
    w = rng.uniform(-0.5, 0.5, size=3).astype(np.float32)
    t = rng.uniform(-1, 1, size=3).astype(np.float32)
    return SE3(se3m.so3_exp_quat(jnp.asarray(w)), jnp.asarray(t))


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def test_identity_compose(rng):
    p = random_pose(rng)
    e = se3m.identity()
    q = se3m.mul(e, p)
    np.testing.assert_allclose(q.t, p.t, atol=1e-6)
    np.testing.assert_allclose(np.abs(np.dot(q.q, p.q)), 1.0, atol=1e-6)


def test_inverse(rng):
    p = random_pose(rng)
    pi = se3m.inverse(p)
    e = se3m.mul(p, pi)
    np.testing.assert_allclose(e.t, np.zeros(3), atol=1e-5)
    np.testing.assert_allclose(np.abs(e.q[0]), 1.0, atol=1e-6)


def test_act_matches_matrix(rng):
    p = random_pose(rng)
    x = jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32))
    y1 = se3m.act(p, x)
    y2 = p.matrix() @ x + p.t
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_retract_local_roundtrip(rng):
    p = random_pose(rng)
    delta = jnp.asarray(rng.uniform(-0.2, 0.2, 6).astype(np.float32))
    q = se3m.retract(p, delta)
    back = se3m.local(p, q)
    np.testing.assert_allclose(back, delta, atol=1e-5)


def test_retract_is_decoupled(rng):
    """Translation update must be additive in world frame (reference
    gtsam_traits.h:48-58), NOT the SE3 exponential."""
    p = random_pose(rng)
    dt = jnp.array([0.1, -0.2, 0.3], dtype=jnp.float32)
    delta = jnp.concatenate([dt, jnp.zeros(3)])
    q = se3m.retract(p, delta)
    np.testing.assert_allclose(q.t, p.t + dt, atol=1e-6)
    np.testing.assert_allclose(np.abs(np.dot(q.q, p.q)), 1.0, atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-6, 1e-3, 0.5, 2.0]:
        w = jnp.asarray((rng.uniform(-1, 1, 3) * scale).astype(np.float32))
        q = se3m.so3_exp_quat(w)
        w2 = se3m.so3_log(q)
        np.testing.assert_allclose(w2, w, atol=1e-5, err_msg=f"scale={scale}")


def test_matrix_quat_roundtrip(rng):
    for _ in range(10):
        p = random_pose(rng)
        R = se3m.quat_to_matrix(p.q)
        q2 = se3m.matrix_to_quat(R)
        # sign ambiguity
        assert (
            np.allclose(q2, p.q, atol=1e-5) or np.allclose(-q2, p.q, atol=1e-5)
        )


def test_relative_pose_jacobians_finite_diff(rng):
    """Central finite differences through the decoupled retract."""
    pa = random_pose(rng)
    pb = random_pose(rng)
    rel, jac_a, jac_b = se3m.relative_pose_jacobians(pa, pb)

    eps = 1e-4

    def rel_coords(pa_, pb_):
        r = se3m.relative_pose(pa_, pb_)
        return np.concatenate([np.asarray(r.t), np.asarray(se3m.so3_log(r.q))])

    base_rel = se3m.relative_pose(pa, pb)

    def tangent_diff(r_plus, r_minus):
        # local coords of perturbed relpose in decoupled tangent
        dt = np.asarray(r_plus.t) - np.asarray(r_minus.t)
        dq = se3m.quat_mul(r_plus.q, se3m.quat_conj(r_minus.q))
        dw = np.asarray(se3m.so3_log(dq))
        return np.concatenate([dt, dw]) / (2 * eps)

    for which, jac, pose in [("a", jac_a, pa), ("b", jac_b, pb)]:
        num = np.zeros((6, 6), dtype=np.float64)
        for i in range(6):
            d = np.zeros(6, dtype=np.float32)
            d[i] = eps
            pp = se3m.retract(pose, jnp.asarray(d))
            pm = se3m.retract(pose, jnp.asarray(-d))
            if which == "a":
                rp = se3m.relative_pose(pp, pb)
                rm = se3m.relative_pose(pm, pb)
            else:
                rp = se3m.relative_pose(pa, pp)
                rm = se3m.relative_pose(pa, pm)
            num[:, i] = tangent_diff(rp, rm)
        np.testing.assert_allclose(np.asarray(jac), num, atol=2e-3,
                                   err_msg=f"jac_{which}")


def test_pose_distance_zero(rng):
    p = random_pose(rng)
    assert float(se3m.pose_distance(p, p)) < 1e-6


def test_batched_ops(rng):
    poses = se3m.stack([random_pose(rng) for _ in range(5)])
    assert poses.q.shape == (5, 4)
    inv = se3m.inverse(poses)
    e = se3m.mul(poses, inv)
    np.testing.assert_allclose(e.t, np.zeros((5, 3)), atol=1e-5)
    x = jnp.asarray(rng.uniform(-1, 1, (5, 3)).astype(np.float32))
    y = se3m.act(poses, x)
    assert y.shape == (5, 3)
