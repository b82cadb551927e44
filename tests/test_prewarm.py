"""Facade prewarm (VERDICT r3 next #1): compiling every event variant
up front must leave the system state untouched and the subsequent run
identical to a cold system's."""
import numpy as np
import pytest

from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.io import synth
from deepfactors_tpu.mapping.mapper import MapperConfig
from deepfactors_tpu.system import DeepFactors, SystemConfig
from deepfactors_tpu.loop.vocabulary import random_vocabulary

H, W = 48, 64


def _build(oracle):
    cam = PinholeCamera.create(fx=55.0, fy=55.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = SystemConfig(
        mapper=MapperConfig(max_keyframes=4, max_frames=1, max_factors=16,
                            code_size=4, height=H, width=W,
                            pyramid_levels=2, pho_iters=(4, 6),
                            connection_mode="LASTN", max_back_connections=2,
                            use_schur=False),
        dist_threshold=0.6, frame_dist_threshold=0.5, loop_closure=True,
        loop_active_window=3, loop_max_dist=0.3)
    return DeepFactors(cfg, cam, decoder=oracle,
                       vocabulary=random_vocabulary(64)), cam


@pytest.fixture(scope="module")
def scene_seq():
    cam = PinholeCamera.create(fx=55.0, fy=55.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    scene = synth.random_room(11, n_boxes=2, freq_scale=0.3)
    n = 14
    poses = synth.orbit_trajectory(n, radius=0.5, sweep=0.5 * np.pi)
    frames, depths = synth.render_sequence(scene, cam, poses, H, W,
                                           with_depth=True)
    return frames, depths


def test_prewarm_is_state_neutral_and_run_identical(scene_seq):
    frames, depths = scene_seq
    oracle = synth.OracleDecoder(frames, depths, levels=2, code_size=4)

    df_cold, _ = _build(oracle)
    df_warm, _ = _build(oracle)
    df_warm.prewarm()
    # prewarm must not bootstrap, track, or touch counters
    assert not df_warm.bootstrapped
    assert df_warm.n_frames == 0 and df_warm.n_lost_frames == 0
    assert len(df_warm.mapper.kf_slots) == 0
    assert not np.asarray(df_warm.mapper.state.active).any()

    for df in (df_cold, df_warm):
        df.bootstrap_two_frames(frames[0], frames[1])
        df.trajectory = [(0.0, df.pose_wc)]
        for i in range(2, len(frames)):
            df.process_frame(float(i), frames[i])

    assert df_cold.n_lost_frames == df_warm.n_lost_frames
    assert len(df_cold.trajectory) == len(df_warm.trajectory)
    t_cold = np.stack([np.asarray(p.t) for _, p in df_cold.trajectory])
    t_warm = np.stack([np.asarray(p.t) for _, p in df_warm.trajectory])
    np.testing.assert_allclose(t_cold, t_warm, atol=1e-5)
