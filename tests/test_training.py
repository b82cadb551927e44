"""Decoder training smoke test: loss decreases on synthetic data and the
extracted decoder params drive Decoder.decode with preserved linearity.
Also checkpoint/resume roundtrip and NearestPSD."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.models.decoder import Decoder, NetworkConfig
from deepfactors_tpu.models import train_decoder as td

CFG = NetworkConfig(code_size=4, pyramid_levels=2, input_width=32,
                    input_height=24)


def test_training_reduces_loss():
    data = td.synthetic_depth_dataset(CFG, batch=2)
    model = td.VAEModel(code_size=CFG.code_size, levels=CFG.pyramid_levels)
    import optax

    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((CFG.input_height, CFG.input_width))
    params = model.init(rng, img, jnp.full_like(img, 0.5), rng, 1e-4)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    state = td.TrainState(params, tx.init(params), jnp.asarray(0))
    step = td.make_train_step(model, tx)

    nlls = []
    for i in range(40):
        imgs, dpts = next(data)
        gts = jnp.asarray(2.0 / (2.0 + dpts))
        rng, k = jax.random.split(rng)
        state, loss, aux = step(state, jnp.asarray(imgs), gts, k)
        nlls.append(float(aux["nll"]))
    # Laplace NLL (can go negative) must improve on average
    assert np.mean(nlls[-5:]) < np.mean(nlls[:5]), \
        f"{np.mean(nlls[:5]):.3f} -> {np.mean(nlls[-5:]):.3f}"

    dec_params = td.extract_decoder_params(state.params)
    dec = Decoder(CFG, params=dec_params)
    res = dec.decode(img, jnp.zeros(CFG.code_size))
    assert res.prx[0].shape == (CFG.input_height, CFG.input_width)
    # linearity preserved after training
    c = jnp.ones(CFG.code_size) * 0.3
    res_c = dec.decode(img, c)
    pred = np.asarray(res.prx[0]) + np.asarray(res.jac[0]) @ np.asarray(c)
    np.testing.assert_allclose(np.asarray(res_c.prx[0]), pred, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.mapping.mapper import MapperConfig
    from deepfactors_tpu.system import DeepFactors, SystemConfig
    from deepfactors_tpu.utils import checkpoint as ckpt

    H, W = 48, 64
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (0.5 + 0.3 * np.sin(xs / 5) * np.cos(ys / 4)).astype(np.float32)
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = SystemConfig(
        mapper=MapperConfig(max_keyframes=4, max_frames=1, max_factors=8,
                            code_size=4, height=H, width=W, pyramid_levels=2,
                            pho_iters=(2, 3), use_schur=False),
        tracking_iterations=(4, 4), loop_closure=False,
    )
    df = DeepFactors(cfg, cam, decoder=None)
    df.bootstrap_two_frames(img, img)
    df.process_frame(2.0, img)

    ckpt.save_checkpoint(str(tmp_path / "ck"), df)

    df2 = DeepFactors(cfg, cam, decoder=None)
    ckpt.load_checkpoint(str(tmp_path / "ck"), df2)
    assert df2.bootstrapped
    assert df2.curr_kf == df.curr_kf
    assert len(df2.trajectory) == len(df.trajectory)
    np.testing.assert_allclose(
        np.asarray(df2.mapper.state.pose.t), np.asarray(df.mapper.state.pose.t),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(df2.mapper.state.code), np.asarray(df.mapper.state.code),
        atol=1e-6,
    )
    # resumed system keeps processing
    df2.process_frame(3.0, img)
    assert len(df2.trajectory) == len(df.trajectory) + 1


def test_nearest_psd():
    from deepfactors_tpu.solver.nearest_psd import nearest_psd, is_psd

    rng = np.random.RandomState(0)
    A = rng.randn(6, 6).astype(np.float32)
    A = (A + A.T) / 2
    A = A - 3.0 * np.eye(6, dtype=np.float32)  # make indefinite
    assert not bool(is_psd(jnp.asarray(A)))
    P = nearest_psd(jnp.asarray(A))
    assert bool(is_psd(P, tol=1e-4))
    # projection is idempotent-ish: PSD input unchanged
    B = A @ A.T
    np.testing.assert_allclose(np.asarray(nearest_psd(jnp.asarray(B))), B,
                               rtol=1e-3, atol=1e-3)
