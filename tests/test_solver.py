"""Solver backend tests: assembly, priors, Schur-complement vs dense solve,
and determinism of the mapping pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.solver import system as sysm


def random_system(K=4, CS=6, P=6, seed=0):
    rng = np.random.RandomState(seed)
    D = 6 * K + CS * K
    Df = 12 + CS
    src = rng.randint(0, K, P).astype(np.int32)
    dst = (src + 1 + rng.randint(0, K - 1, P)).astype(np.int32) % K
    Hs, bs = [], []
    for _ in range(P):
        J = rng.randn(40, Df).astype(np.float32)
        Hs.append(J.T @ J)
        bs.append(J.T @ rng.randn(40).astype(np.float32))
    idx = sysm.factor_slot_indices(jnp.asarray(src), jnp.asarray(dst), K, CS)
    gsys = sysm.assemble(
        D, jnp.asarray(np.stack(Hs)), jnp.asarray(np.stack(bs)), idx,
        jnp.ones(P, bool),
    )
    # priors to make it well-posed
    gsys = sysm.add_diagonal_prior(
        gsys, jnp.arange(D, dtype=jnp.int32), jnp.full(D, 1.0),
        jnp.zeros(D),
    )
    return gsys, K, CS


def test_assemble_symmetric():
    gsys, K, CS = random_system()
    np.testing.assert_allclose(np.asarray(gsys.H), np.asarray(gsys.H).T,
                               atol=1e-4)


def test_schur_matches_dense():
    gsys, K, CS = random_system()
    lam = jnp.asarray(1e-4)
    dx_dense = sysm.solve_damped(gsys, lam)
    dx_schur = sysm.solve_schur_codes(gsys, K, CS, lam)
    np.testing.assert_allclose(np.asarray(dx_schur), np.asarray(dx_dense),
                               rtol=1e-3, atol=1e-4)


def test_mask_inactive_pins_variables():
    gsys, K, CS = random_system()
    D = gsys.H.shape[0]
    mask = jnp.ones(D, bool).at[3].set(False).at[10].set(False)
    g2 = sysm.mask_inactive(gsys, mask)
    dx = sysm.solve_damped(g2, jnp.asarray(1e-4))
    assert abs(float(dx[3])) < 1e-6
    assert abs(float(dx[10])) < 1e-6


def test_mapping_determinism():
    """Identical inputs -> bit-identical mapping results (reference has no
    determinism guarantees; SURVEY.md §4 calls for adding this)."""
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig

    H, W = 48, 64
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img0 = (0.5 + 0.3 * np.sin(xs / 5) * np.cos(ys / 4)).astype(np.float32)
    img1 = np.roll(img0, 2, axis=1)
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = MapperConfig(max_keyframes=4, max_frames=1, max_factors=8,
                       code_size=4, height=H, width=W, pyramid_levels=2,
                       pho_iters=(4, 6), use_schur=False)

    def run():
        m = Mapper(cfg, cam, decoder=None)
        m.init_two_frames(img0, img1)
        return np.asarray(jax.device_get(m.state.pose.t)), \
            np.asarray(jax.device_get(m.state.code))

    t1, c1 = run()
    t2, c2 = run()
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(c1, c2)
