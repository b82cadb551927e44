"""End-to-end system test (BASELINE config 2 analogue): synthetic camera
sweep over a textured plane -> bootstrap + odometry -> TUM trajectory + ATE
against the synthetic ground truth."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m, warping as wp
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.ops import dense_sfm as ds, image as ip
from deepfactors_tpu.system import DeepFactors, SystemConfig
from deepfactors_tpu.mapping.mapper import MapperConfig
from deepfactors_tpu.utils import tum_io

H, W = 48, 64


def make_sequence(n_frames=8, step=0.012):
    """Views of a textured plane at depth 2 from poses translating along x
    with slight yaw."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (0.5 + 0.22 * np.sin(xs / 5.0) + 0.18 * np.cos(ys / 4.0)
            + 0.08 * np.sin((2 * xs + ys) / 7.0)).astype(np.float32)
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    pix = ds._pixel_grid(H, W).reshape(-1, 2)
    dpt = jnp.full((H * W,), 2.0)

    frames, poses = [], []
    for i in range(n_frames):
        d = np.array([step * i, 0.0, 0.4 * step * i, 0.0, 0.1 * step * i, 0.0],
                     dtype=np.float32)
        pose = se3m.retract(se3m.identity(), jnp.asarray(d))  # pose_wc
        corresp = wp.find_correspondence(pix, dpt, cam, pose,
                                         check_bounds=False)
        img = np.asarray(
            ip.bilinear_sample(jnp.asarray(base), corresp.pix1)
        ).reshape(H, W)
        frames.append(img)
        poses.append(pose)
    return frames, poses, cam


@pytest.fixture(scope="module")
def system_run(tmp_path_factory):
    frames, gt_poses, cam = make_sequence()
    cfg = SystemConfig(
        mapper=MapperConfig(
            max_keyframes=6, max_frames=2, max_factors=16, code_size=4,
            height=H, width=W, pyramid_levels=2, pho_iters=(6, 10),
            use_schur=False, connection_mode="LASTN", max_back_connections=2,
        ),
        tracking_iterations=(10, 8),
        keyframe_mode="AUTO",
        dist_threshold=0.35,        # pose_distance weights translation x8
        frame_dist_threshold=0.01,
        tracking_error_threshold=0.5,
        loop_closure=False,
    )
    df = DeepFactors(cfg, cam, decoder=None)
    df.bootstrap_two_frames(frames[0], frames[1])
    for i in range(2, len(frames)):
        df.process_frame(float(i), frames[i])
    out = tmp_path_factory.mktemp("results")
    df.save_results(str(out))
    return df, frames, gt_poses, str(out)


def test_tracks_whole_sequence(system_run):
    df, frames, gt_poses, out = system_run
    assert not df.tracking_lost
    assert len(df.trajectory) == len(frames) - 2


def test_trajectory_accuracy(system_run):
    df, frames, gt_poses, out = system_run
    for (ts, pose) in df.trajectory:
        gt = gt_poses[int(ts)]
        err = np.asarray(se3m.local(gt, pose))
        assert np.linalg.norm(err) < 0.02, \
            f"frame {ts}: pose err {np.linalg.norm(err):.4f}"


def test_results_files(system_run):
    df, frames, gt_poses, out = system_run
    assert os.path.exists(os.path.join(out, "trajectory.txt"))
    assert os.path.exists(os.path.join(out, "intrinsics.txt"))
    traj = tum_io.load_trajectory(os.path.join(out, "trajectory.txt"))
    assert len(traj) == len(df.trajectory)
    # roundtrip pose equality
    t0 = np.asarray(traj[0][1].t)
    np.testing.assert_allclose(t0, np.asarray(df.trajectory[0][1].t),
                               atol=1e-5)


def test_ate_computation(system_run):
    df, frames, gt_poses, out = system_run
    gt = [(float(i + 2), gt_poses[i + 2]) for i in range(len(df.trajectory))]
    ate = tum_io.ate_rmse(df.trajectory, gt)
    assert ate < 0.01, f"ATE {ate:.4f} m"


def test_force_keyframe(system_run):
    df, frames, gt_poses, out = system_run
    n_kf = len(df.mapper.kf_slots)
    df.force_keyframe()
    df.process_frame(99.0, frames[-1])
    assert len(df.mapper.kf_slots) == n_kf + 1


def test_nonfinite_tracking_declared_lost():
    """A diverged dense alignment yields NaN error/distance; NaN compares
    False against any threshold, so the lost check must catch it explicitly
    or the NaN pose poisons the trajectory and the keyframe pools."""
    import types

    fake = types.SimpleNamespace(
        cfg=types.SimpleNamespace(tracking_error_threshold=0.5,
                                  tracking_dist_threshold=2.0,
                                  min_tracking_inliers=0.25),
        curr_kf=0,
    )
    check = DeepFactors._check_tracking_lost
    ok = {"error": 0.1, "d_full": np.array([0.3]), "inliers": 0.9}
    assert not check(fake, ok)
    assert check(fake, {"error": float("nan"), "d_full": np.array([0.3]),
                        "inliers": 0.9})
    assert check(fake, {"error": 0.1, "d_full": np.array([float("nan")]),
                        "inliers": 0.9})
    assert check(fake, {"error": float("inf"), "d_full": np.array([0.3]),
                        "inliers": 0.9})
    # a sliver-overlap warp can have near-zero error over its few pixels:
    # low valid fraction must read as lost even with perfect error
    assert check(fake, {"error": 0.0, "d_full": np.array([0.3]),
                        "inliers": 0.05})
