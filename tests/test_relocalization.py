"""Relocalization + tracking-lost behavior (deepfactors.cpp:713-743,
852-879): a garbage frame trips the lost check; the next good frame
relocalizes against the map."""
import numpy as np
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.mapping.mapper import MapperConfig
from deepfactors_tpu.system import DeepFactors, SystemConfig

H, W = 48, 64


def test_lost_and_relocalize():
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (0.5 + 0.3 * np.sin(xs / 5) * np.cos(ys / 4)).astype(np.float32)
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = SystemConfig(
        mapper=MapperConfig(max_keyframes=4, max_frames=1, max_factors=8,
                            code_size=4, height=H, width=W, pyramid_levels=2,
                            pho_iters=(3, 4), use_schur=False),
        tracking_iterations=(6, 5),
        tracking_error_threshold=0.01,  # strict -> garbage frame trips it
        keyframe_mode="NEVER",
        loop_closure=False,
    )
    df = DeepFactors(cfg, cam, decoder=None)
    df.bootstrap_two_frames(img, img)
    assert not df.tracking_lost

    # garbage frame -> tracking lost, pose NOT updated
    rng = np.random.RandomState(0)
    noise = rng.rand(H, W).astype(np.float32)
    n_traj = len(df.trajectory)
    df.process_frame(2.0, noise)
    assert df.tracking_lost
    assert len(df.trajectory) == n_traj  # frame rejected

    # good frame again -> relocalizes against keyframes and recovers
    df.process_frame(3.0, img)
    assert not df.tracking_lost
    assert len(df.trajectory) == n_traj + 1
    # relocalized pose should be near the map (identity)
    t = np.asarray(df.pose_wc.t)
    assert np.linalg.norm(t) < 0.05
