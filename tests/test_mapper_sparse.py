"""Mapper with reprojection + geometric factors enabled (BASELINE config 3
building block): the full factor mix optimizes without blowing up and the
rep/geo works follow the schedule."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig, RepWork, GeoWork

H, W, CS = 64, 96, 4


def textured(k=0.0):
    rng = np.random.RandomState(9)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img = 0.3 + 0.15 * np.sin(xs / 17 + k) * np.cos(ys / 13)
    for cy in range(16, H - 8, 16):
        for cx in range(16, W - 8, 16):
            img[cy - 3:cy + 3, cx - 3:cx + 3] = rng.uniform(0.5, 1.0)
    return img.astype(np.float32)


@pytest.fixture
def cfg():
    return MapperConfig(
        max_keyframes=4, max_frames=1, max_factors=8, code_size=CS,
        height=H, width=W, pyramid_levels=2, pho_iters=(4, 6),
        use_schur=False, use_reprojection=True, max_keypoints=64,
        rep_iters=5, rep_max_dist=80, rep_ransac_maxiters=64,
        use_geometric=True, geo_npoints=32, geo_iters=5,
        connection_mode="LAST",
    )


def test_full_factor_mix_runs(cfg):
    cam = PinholeCamera.create(fx=80.0, fy=80.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    m = Mapper(cfg, cam, decoder=None)
    img = textured()
    m.init_two_frames(img, img)
    m.enqueue_keyframe(textured(0.1), se3m.identity())
    kinds = {type(w).__name__ for w in m.work.work}
    assert "RepWork" in kinds or "PhotoWork" in kinds
    steps = 0
    while m.has_work() and steps < 60:
        m.mapping_step()
        steps += 1
    assert steps < 60
    # geo child promoted and consumed after photo finished
    poses = np.asarray(m.state.pose.t)
    assert np.all(np.isfinite(poses))
    codes = np.asarray(m.state.code)
    assert np.all(np.isfinite(codes))


def test_rep_pool_populated(cfg):
    cam = PinholeCamera.create(fx=80.0, fy=80.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    m = Mapper(cfg, cam, decoder=None)
    img = textured()
    m.init_two_frames(img, img)
    m.enqueue_keyframe(textured(0.05), se3m.identity())
    m.mapping_step()  # bookkeeping constructs factors
    # identical-ish images should yield plenty of matches -> rep factors live
    assert m.rep_pool.active.sum() >= 1
    assert m.rep_pool.mvalid[m.rep_pool.active].sum() >= 8
