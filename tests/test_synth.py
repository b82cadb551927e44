"""Procedural room renderer (io/synth.py): geometric + photometric
consistency of the ray-cast images and depths."""
import numpy as np
import jax
import jax.numpy as jnp

from deepfactors_tpu.geometry import se3 as se3m, warping as wp
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.io import synth
from deepfactors_tpu.ops import image as ip

H, W = 96, 128


def make_cam():
    return PinholeCamera.create(fx=110.0, fy=110.0, u0=W / 2, v0=H / 2,
                                width=W, height=H)


def test_render_warp_consistency():
    """Pixels of view A, reprojected with the rendered depth into view B,
    must sample equal intensities (validates the depth's z-convention
    against geometry/warping and the renderer's multi-view consistency)."""
    cam = make_cam()
    sc = synth.random_room(3)
    poses = synth.orbit_trajectory(200)
    i0, i1 = 60, 62
    img0, dpt0 = synth.render(sc, cam, poses[i0], H, W)
    img1, _ = synth.render(sc, cam, poses[i1], H, W)
    pix0 = jnp.stack(
        jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                     jnp.arange(H, dtype=jnp.float32)), -1).reshape(-1, 2)
    pose_10 = se3m.mul(se3m.inverse(poses[i1]), poses[i0])
    corr = wp.find_correspondence(pix0, dpt0.reshape(-1), cam, pose_10,
                                  border=1)
    samp = ip.bilinear_sample(img1, corr.pix1).reshape(-1)
    valid = np.asarray(corr.valid)
    assert valid.mean() > 0.7
    err = np.abs(np.asarray(samp) - np.asarray(img0).reshape(-1))[valid]
    assert err.mean() < 0.01, err.mean()


def test_render_depth_and_image_ranges():
    cam = make_cam()
    sc = synth.random_room(0, n_boxes=3)
    img, dpt = synth.render(sc, cam, synth.orbit_trajectory(10)[3], H, W)
    img, dpt = np.asarray(img), np.asarray(dpt)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert 0.3 < dpt.min() and dpt.max() < 8.0
    # texture must carry gradients for photometric alignment
    assert np.abs(np.diff(img, axis=1)).mean() > 0.003


def test_render_aa_matches_render_statistics():
    """Anti-aliased render keeps the same scene content (correlation with
    point-sampled render high, ranges preserved)."""
    cam = make_cam()
    sc = synth.random_room(5)
    pose = synth.orbit_trajectory(10)[5]
    img, dpt = synth.render(sc, cam, pose, H, W)
    img_aa, dpt_aa = synth.render_aa(sc, cam, pose, H, W)
    assert np.allclose(np.asarray(dpt), np.asarray(dpt_aa))
    a = np.asarray(img).reshape(-1)
    b = np.asarray(img_aa).reshape(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr


def test_oracle_decoder_roundtrip():
    cam = make_cam()
    sc = synth.random_room(7)
    poses = synth.orbit_trajectory(4)
    frames, depths = synth.render_sequence(sc, cam, poses, H, W,
                                           with_depth=True)
    oracle = synth.OracleDecoder(frames, depths, levels=2, code_size=4)
    dec = oracle.predict_and_decode(jnp.asarray(frames[2]))
    d = np.asarray(wp.prox_to_depth(dec.prx[0], 2.0))
    np.testing.assert_allclose(d, depths[2], rtol=1e-4)
    assert all(np.asarray(j).max() == 0 for j in dec.jac)


def test_room_dataset_iterator():
    cam = make_cam()
    it = synth.room_dataset(H, W, cam, batch=2, rooms=2)
    imgs, dpts = next(it)
    assert imgs.shape == (2, H, W) and dpts.shape == (2, H, W)
    assert np.isfinite(imgs).all() and np.isfinite(dpts).all()
