"""Camera tracker tests: coarse-to-fine SE3 tracking recovers a synthetic
warp; keyframe switch preserves the world pose (camera_tracker.cpp:105-120)."""
import numpy as np
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m, warping as wp
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.ops import dense_sfm as ds, image as ip
from deepfactors_tpu.tracking.tracker import CameraTracker, TrackerConfig

H, W = 48, 64


def build_scene():
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img0 = (
        0.5 + 0.25 * np.sin(xs / 5.0) + 0.2 * np.cos(ys / 4.0)
        + 0.08 * np.sin((xs - 2 * ys) / 6.0)
    ).astype(np.float32)
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    return jnp.asarray(img0), cam


def render_view(img0, cam, pose_c0):
    """Render the view from pose_c0 (maps current-frame points to cam0)."""
    pix = ds._pixel_grid(H, W).reshape(-1, 2)
    dpt = jnp.full((H * W,), 2.0)
    corresp = wp.find_correspondence(pix, dpt, cam, pose_c0, check_bounds=False)
    return ip.bilinear_sample(img0, corresp.pix1).reshape(H, W)


def test_tracks_synthetic_motion():
    img0, cam = build_scene()
    d = np.array([0.02, -0.015, 0.025, 0.006, -0.004, 0.008], dtype=np.float32)
    # pose_ck maps keyframe->current; the view renders with its inverse
    pose_ck_true = se3m.retract(se3m.identity(), jnp.asarray(d))
    img1 = render_view(img0, cam, se3m.inverse(pose_ck_true))

    L = 2
    cfg = TrackerConfig(pyramid_levels=L, iterations_per_level=(10, 8),
                        huber_delta=0.3)
    tracker = CameraTracker(cfg, cam)

    kf_imgs = ip.build_pyramid(img0, L)
    kf_dpts = [jnp.full((H >> l, W >> l), 2.0) for l in range(L)]
    tracker.set_keyframe(kf_imgs, kf_dpts, se3m.identity())

    img_pyr = ip.build_pyramid(img1, L)
    grad_pyr = ip.build_gradient_pyramid(img_pyr)
    res = tracker.track_frame(img_pyr, grad_pyr)

    err = np.asarray(se3m.local(pose_ck_true, res.pose_ck))
    assert np.linalg.norm(err) < 5e-3, f"tracking error {err}"
    assert float(res.inliers) > 0.5


def test_keyframe_switch_preserves_world_pose():
    img0, cam = build_scene()
    L = 2
    cfg = TrackerConfig(pyramid_levels=L, iterations_per_level=(2, 2),
                        huber_delta=0.3)
    tracker = CameraTracker(cfg, cam)
    kf_imgs = ip.build_pyramid(img0, L)
    kf_dpts = [jnp.full((H >> l, W >> l), 2.0) for l in range(L)]

    pose_wk1 = se3m.identity()
    tracker.set_keyframe(kf_imgs, kf_dpts, pose_wk1)
    d = np.array([0.1, 0.0, 0.0, 0.0, 0.05, 0.0], dtype=np.float32)
    tracker.pose_ck = se3m.retract(se3m.identity(), jnp.asarray(d))
    pose_wc_before = tracker.get_pose_estimate()

    pose_wk2 = se3m.retract(se3m.identity(),
                            jnp.asarray([0.3, 0.1, 0, 0, 0, 0.1], jnp.float32))
    tracker.set_keyframe(kf_imgs, kf_dpts, pose_wk2)
    pose_wc_after = tracker.get_pose_estimate()

    err = np.asarray(se3m.local(pose_wc_before, pose_wc_after))
    assert np.linalg.norm(err) < 1e-5


def test_track_burst_matches_sequential():
    """track_burst (one-dispatch lax.scan pipeline) must produce the same
    trajectory as sequential track_frame calls."""
    img0, cam = build_scene()
    L = 2
    cfg = TrackerConfig(pyramid_levels=L, iterations_per_level=(6, 5),
                        huber_delta=0.3)
    kf_imgs = ip.build_pyramid(img0, L)
    kf_dpts = [jnp.full((H >> l, W >> l), 2.0) for l in range(L)]

    deltas = [
        np.array([0.01, -0.005, 0.01, 0.003, -0.002, 0.004], np.float32),
        np.array([0.02, -0.01, 0.02, 0.005, -0.004, 0.007], np.float32),
        np.array([0.03, -0.012, 0.028, 0.008, -0.005, 0.009], np.float32),
    ]
    pyrs, grads = [], []
    for d in deltas:
        pose_true = se3m.retract(se3m.identity(), jnp.asarray(d))
        img = render_view(img0, cam, se3m.inverse(pose_true))
        p = ip.build_pyramid(img, L)
        pyrs.append(p)
        grads.append(ip.build_gradient_pyramid(p))

    t_seq = CameraTracker(cfg, cam)
    t_seq.set_keyframe(kf_imgs, kf_dpts, se3m.identity())
    seq_poses = []
    for p, g in zip(pyrs, grads):
        seq_poses.append(t_seq.track_frame(p, g).pose_ck)

    t_burst = CameraTracker(cfg, cam)
    t_burst.set_keyframe(kf_imgs, kf_dpts, se3m.identity())
    img_pyrs = tuple(jnp.stack([p[l] for p in pyrs]) for l in range(L))
    grad_pyrs = tuple(jnp.stack([g[l] for g in grads]) for l in range(L))
    qs, ts, stats = t_burst.track_burst(img_pyrs, grad_pyrs)

    assert qs.shape == (3, 4) and ts.shape == (3, 3) and stats.shape == (3, 2)
    for k, sp in enumerate(seq_poses):
        np.testing.assert_allclose(np.asarray(qs[k]), np.asarray(sp.q),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ts[k]), np.asarray(sp.t),
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_burst.pose_ck.t),
                               np.asarray(seq_poses[-1].t), atol=1e-6)
