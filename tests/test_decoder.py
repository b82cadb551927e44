"""Decoder network tests (mirrors tests/ut_decoder.cpp):
  - linearity in the code: prx(c0 + eps*ei) == prx(c0) + J*eps*ei
    (ut_decoder.cpp:161-200, tolerance 1e-5 per pixel)
  - jacfwd consistency with the emitted basis
  - pyramid shapes / predicted-code path
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.models.decoder import Decoder, NetworkConfig

H, W, CS, L = 48, 64, 8, 3


@pytest.fixture(scope="module")
def dec():
    cfg = NetworkConfig(code_size=CS, pyramid_levels=L, input_width=W,
                        input_height=H, avg_dpt=2.0)
    return Decoder(cfg, rng=jax.random.PRNGKey(1))


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(0)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    return jnp.asarray(
        0.5 + 0.3 * np.sin(xs / 6) * np.cos(ys / 5), dtype=jnp.float32
    )


def test_pyramid_shapes(dec, img):
    res = dec.decode(img, jnp.zeros(CS))
    assert len(res.prx) == L
    for l in range(L):
        assert res.prx[l].shape == (H >> l, W >> l)
        assert res.jac[l].shape == (H >> l, W >> l, CS)
        assert res.stdev[l].shape == (H >> l, W >> l)


def test_zero_code_prox_bounded(dec, img):
    res = dec.decode(img, jnp.zeros(CS))
    for p in res.prx0:
        p = np.asarray(p)
        assert p.min() > 0.0 and p.max() < 1.0


def test_linearity_in_code(dec, img):
    """prx(c0 + e_i) - prx(c0) must equal the emitted Jacobian column."""
    rng = np.random.RandomState(2)
    c0 = jnp.asarray(rng.uniform(-1, 1, CS).astype(np.float32))
    base = dec.decode(img, c0)
    eps = 0.5
    for i in [0, CS // 2, CS - 1]:
        ci = c0.at[i].add(eps)
        pert = dec.decode(img, ci)
        for l in range(L):
            pred = np.asarray(base.prx[l]) + eps * np.asarray(base.jac[l][..., i])
            np.testing.assert_allclose(
                np.asarray(pert.prx[l]), pred, atol=1e-5,
                err_msg=f"level {l} code dim {i}",
            )


def test_jacfwd_matches_basis(dec, img):
    jac = dec.code_jacobian_jacfwd(img, level=0)
    out = dec.raw_outputs(img)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(out["jac"][0]),
                               atol=1e-6)


def test_predict_and_decode(dec, img):
    res = dec.predict_and_decode(img)
    assert res.code.shape == (CS,)
    assert np.all(np.isfinite(np.asarray(res.code)))
    # decode with the predicted code reproduces the same prox
    res2 = dec.decode(img, res.code)
    np.testing.assert_allclose(np.asarray(res.prx[0]), np.asarray(res2.prx[0]),
                               atol=1e-6)


def test_determinism(dec, img):
    a = dec.decode(img, jnp.zeros(CS))
    b = dec.decode(img, jnp.zeros(CS))
    np.testing.assert_array_equal(np.asarray(a.prx[0]), np.asarray(b.prx[0]))
