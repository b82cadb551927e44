"""CI-tier end-to-end run on the procedural room (downscaled version of
tools/bench_e2e.py): the full facade over an in-room orbit trajectory with
an oracle decoder (exact proximity, zero code Jacobian — io/synth.py
OracleDecoder), long enough to exercise keyframe capacity eviction, loop
machinery, and the trajectory/ATE plumbing.

The oracle isolates system behavior from decoder quality; the full-scale
trained-decoder ATE run lives in tools/bench_e2e.py and is captured in the
round bench.
"""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.io import synth
from deepfactors_tpu.mapping.mapper import MapperConfig
from deepfactors_tpu.system import DeepFactors, SystemConfig
from deepfactors_tpu.utils import tum_io

H, W = 48, 64


def test_room_sequence_with_eviction():
    cam = PinholeCamera.create(fx=55.0, fy=55.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    # freq_scale: the CI camera (fx=55) needs coarser texture than the
    # full-scale one or the finest component aliases (see random_room doc)
    scene = synth.random_room(11, n_boxes=2, freq_scale=0.3)
    n = 40
    poses = synth.orbit_trajectory(n, radius=0.5, sweep=1.2 * np.pi)
    frames, depths = synth.render_sequence(scene, cam, poses, H, W,
                                           with_depth=True)
    oracle = synth.OracleDecoder(frames, depths, levels=2, code_size=4)

    cfg = SystemConfig(
        mapper=MapperConfig(
            max_keyframes=4, max_frames=1, max_factors=16, code_size=4,
            height=H, width=W, pyramid_levels=2, pho_iters=(4, 6),
            connection_mode="LASTN", max_back_connections=2,
            use_schur=False,
        ),
        dist_threshold=0.6,
        frame_dist_threshold=0.5,   # effectively no one-way frames
        loop_closure=True,
        loop_active_window=3,
        loop_max_dist=0.3,
    )
    from deepfactors_tpu.loop.vocabulary import random_vocabulary

    df = DeepFactors(cfg, cam, decoder=oracle,
                     vocabulary=random_vocabulary(64))
    df.bootstrap_two_frames(frames[0], frames[1])
    df.trajectory = [(0.0, df.pose_wc)]
    for i in range(2, n):
        df.process_frame(float(i), frames[i])

    assert not df.tracking_lost
    # capacity held and the window actually slid
    assert len(df.mapper.kf_slots) <= 4
    assert len(df.mapper.archived) >= 1
    total_kfs = len(df.mapper.kf_slots) + len(df.mapper.archived)
    assert total_kfs > 4

    # trajectory accuracy (oracle depth: errors are solver/tracker only).
    # Bound is loose at this 48x64 scale: the view-dependent band-limiting
    # mismatch at room corners biases each photometric factor by a few cm
    # here (measured; at the 256-wide bench scale it is ~8 mm) — the CI
    # tier tests machinery, the full-scale bench tests accuracy.
    est = df.trajectory
    gt_list = [(ts, poses[int(ts)]) for ts, _ in est]
    ate = tum_io.ate_rmse(est, gt_list)
    assert np.isfinite(ate) and ate < 0.15, ate
    ts_last, p_last = est[-1]
    # the facade's world frame is kf0's camera frame (bootstrap anchors at
    # identity); express GT in the same frame before comparing rotations
    gt = se3m.mul(se3m.inverse(poses[0]), poses[int(ts_last)])
    rot_err = float(jnp.linalg.norm(
        se3m.so3_log(se3m.quat_mul(se3m.quat_conj(gt.q), p_last.q))))
    assert rot_err < 0.15, rot_err

    # results writer includes archived keyframes
    with tempfile.TemporaryDirectory() as d:
        df.save_results(d)
        kf_lines = open(os.path.join(d, "keyframes.txt")).readlines()
        assert len(kf_lines) == total_kfs
