"""Preprocessing (undistort/remap, io/preprocess.py — PreprocessImage,
deepfactors.cpp:634-680), interp utils, sequence collections."""
import json

import numpy as np
import pytest

from deepfactors_tpu.io import preprocess as pp


def test_identity_remap():
    src = pp.SourceCamera(60.0, 60.0, 32.0, 24.0, 64, 48)
    mx, my = pp.build_remap(src, 60.0, 60.0, 32.0, 24.0, 64, 48)
    xs, ys = np.meshgrid(np.arange(64, dtype=np.float32),
                         np.arange(48, dtype=np.float32))
    np.testing.assert_allclose(mx, xs, atol=1e-5)
    np.testing.assert_allclose(my, ys, atol=1e-5)
    img = np.random.RandomState(0).rand(48, 64).astype(np.float32)
    out = pp.remap_bilinear(img, mx, my)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_principal_point_shift_translates():
    src = pp.SourceCamera(60.0, 60.0, 34.0, 24.0, 64, 48)
    # network principal point 2px left of the source -> sample 2px right
    mx, my = pp.build_remap(src, 60.0, 60.0, 32.0, 24.0, 64, 48)
    xs, _ = np.meshgrid(np.arange(64, dtype=np.float32),
                        np.arange(48, dtype=np.float32))
    np.testing.assert_allclose(mx, xs + 2.0, atol=1e-5)


def test_focal_scale_matches_resize_model():
    """Halving the resolution with halved intrinsics samples at 2x pitch."""
    src = pp.SourceCamera(120.0, 120.0, 64.0, 48.0, 128, 96)
    mx, my = pp.build_remap(src, 60.0, 60.0, 32.0, 24.0, 64, 48)
    # output pixel (x, y) -> source (2x, 2y)
    np.testing.assert_allclose(mx[0, 10], 20.0, atol=1e-5)
    np.testing.assert_allclose(my[10, 0], 20.0, atol=1e-5)


def test_radial_distortion_moves_corners_outward():
    """Barrel distortion (k1 < 0): corner rays sample closer to center."""
    src = pp.SourceCamera(60.0, 60.0, 32.0, 24.0, 64, 48,
                          dist=(-0.2, 0.0, 0.0, 0.0))
    mx, my = pp.build_remap(src, 60.0, 60.0, 32.0, 24.0, 64, 48)
    # center is a fixed point
    np.testing.assert_allclose(mx[24, 32], 32.0, atol=1e-3)
    # corners pull inward for k1<0
    assert mx[0, 0] > 0.0 and my[0, 0] > 0.0


def test_to_gray_float():
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 2] = 255  # red in BGR
    g = pp.to_gray_float(img)
    assert g.shape == (4, 4) and abs(float(g[0, 0]) - 0.299) < 1e-3


def test_interp_and_spring():
    import jax.numpy as jnp
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.utils import interp as it

    p0 = se3m.identity()
    p1 = se3m.retract(se3m.identity(),
                      jnp.asarray([1.0, 0, 0, 0, 0, 0.4], jnp.float32))
    mid = it.interpolate_pose(p0, p1, 0.5)
    assert abs(float(mid.t[0]) - 0.5) < 1e-5
    assert float(jnp.linalg.norm(mid.q)) == pytest.approx(1.0, abs=1e-5)
    # spring converges to the target
    sp = it.DampedSpring(p0, smoothness=0.1)
    for _ in range(50):
        sp.step(p1, 0.1)
    assert float(jnp.linalg.norm(sp.pose.t - p1.t)) < 1e-3


def test_sequence_collection(tmp_path):
    from deepfactors_tpu.io.sequences import SequenceCollection

    f = tmp_path / "sequences.json"
    f.write_text(json.dumps({
        "scannet": {"base_dir": "/data/sn",
                    "sequences": {"scene0565_00": {"path": "s565",
                                                   "format": "scannet"}}},
    }))
    sc = SequenceCollection(str(f))
    assert sc.collections() == ["scannet"]
    assert sc.sequences("scannet") == ["scene0565_00"]
    assert sc.resolve("scannet/scene0565_00") == "scannet:///data/sn/s565"
