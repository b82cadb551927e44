"""Mapper + two-frame bootstrap tests — the minimum end-to-end slice
(BASELINE config 1): photometric-only GN over (pose0, pose1, code0, code1)
recovers a synthetic relative pose.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m, warping as wp
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.ops import dense_sfm as ds, image as ip
from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig

H, W, CS = 48, 64, 4


def make_scene(d_tangent):
    """Two views of a textured fronto-parallel-ish scene with known
    relative pose. Returns (img0, img1, cam, pose1_true)."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img0 = (
        0.5 + 0.25 * np.sin(xs / 5.0) + 0.2 * np.cos(ys / 4.0)
        + 0.05 * np.sin((2 * xs + 3 * ys) / 7.0)
    ).astype(np.float32)
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    pose1_true = se3m.retract(se3m.identity(), jnp.asarray(d_tangent))
    # depth = 2.0 everywhere (matches the decoder-less mapper prx0=0.5,
    # avg_dpt=2 -> depth 2)
    dpt = jnp.full((H * W,), 2.0)
    # render img1: sample img0 at the correspondence of each img1 pixel
    # pose_01 = pose1^-1 -> wait: pix1 -> point in cam1 at depth d1? Simpler:
    # use the forward warp from cam1 to cam0: for each pixel of cam1,
    # project into cam0 using pose_01 = pose0^-1 * pose1 applied to cam1 pts.
    # cam1 point X1; X0 = pose1 * X1 (pose1 maps cam1->world=cam0 frame).
    pix1 = ds._pixel_grid(H, W).reshape(-1, 2)
    corresp = wp.find_correspondence(pix1, dpt, cam, pose1_true,
                                     check_bounds=False)
    img1 = np.asarray(
        ip.bilinear_sample(jnp.asarray(img0), corresp.pix1)
    ).reshape(H, W)
    return img0, img1, cam, pose1_true


@pytest.fixture
def cfg():
    return MapperConfig(
        max_keyframes=4, max_frames=1, max_factors=8, code_size=CS,
        height=H, width=W, pyramid_levels=2, pho_iters=(10, 15),
        huber_delta=0.3, connection_mode="LASTN", max_back_connections=2,
        lm_lambda=1e-4, use_schur=False,
    )


def test_two_frame_bootstrap_recovers_pose(cfg):
    d = np.array([0.02, -0.01, 0.03, 0.008, -0.006, 0.01], dtype=np.float32)
    img0, img1, cam, pose1_true = make_scene(d)
    m = Mapper(cfg, cam, decoder=None)
    # init with identity guesses; the photometric factors must pull pose1
    s0, s1 = m.init_two_frames(img0, img1)
    m.update_map()

    pose0 = se3m.index(m.state.pose, s0)
    pose1 = se3m.index(m.state.pose, s1)
    # gauge: pose0 pinned at identity by the prior
    assert float(jnp.linalg.norm(pose0.t)) < 5e-3
    err = np.asarray(se3m.local(pose1_true, pose1))
    assert np.linalg.norm(err) < 8e-3, f"pose1 error {err}"


def test_two_frame_bootstrap_large_baseline(cfg):
    """The multi-hypothesis bootstrap aligner must recover a baseline far
    outside the identity-start BA basin (~18 deg yaw + lateral motion —
    the full-scale 24 deg profile pair used to converge to a wrong-
    direction baseline 4.5x too long and poison the whole run)."""
    d = np.array([0.12, 0.0, 0.05, 0.0, -0.32, 0.0], dtype=np.float32)
    img0, img1, cam, pose1_true = make_scene(d)
    m = Mapper(cfg, cam, decoder=None)
    s0, s1 = m.init_two_frames(img0, img1)
    m.update_map()
    pose1 = se3m.index(m.state.pose, s1)
    err = np.asarray(se3m.local(pose1_true, pose1))
    # rotation must land in the right basin; translation scale within 30%
    assert np.linalg.norm(err[3:]) < 0.08, f"rot err {err}"
    t_est = np.asarray(pose1.t)
    t_true = np.asarray(pose1_true.t)
    assert np.dot(t_est, t_true) > 0, "baseline direction flipped"
    assert 0.7 < (np.linalg.norm(t_est) / np.linalg.norm(t_true)) < 1.3


def test_work_schedule_descends_levels(cfg):
    d = np.array([0.01, 0.0, 0.01, 0.0, 0.0, 0.005], dtype=np.float32)
    img0, img1, cam, _ = make_scene(d)
    m = Mapper(cfg, cam, decoder=None)
    p0 = se3m.identity()
    s0 = m.add_keyframe_to_map(img0, p0)
    s1 = m.add_keyframe_to_map(img1, p0)
    m._anchor_pose = p0
    m._add_photo_pair(s0, s1)
    levels_seen = set()
    steps = 0
    while m.has_work() and steps < 100:
        m.mapping_step()
        for w in m.work.work:
            levels_seen.add(w.active_level)
        steps += 1
    assert not m.has_work()
    assert 0 in levels_seen or steps < 100  # reached the finest level


def test_enqueue_keyframe_connections(cfg):
    d = np.zeros(6, dtype=np.float32)
    img0, img1, cam, _ = make_scene(d)
    m = Mapper(cfg, cam, decoder=None)
    m.init_two_frames(img0, img1)
    n_works_before = len(m.work.work)
    m.enqueue_keyframe(img1, se3m.identity())
    # LASTN(2) -> connects to 2 previous keyframes, both ways = 4 works
    assert len(m.work.work) - n_works_before == 4
    while m.has_work():
        m.mapping_step()
    assert int(np.sum(np.asarray(m.state.active))) == 3


def test_one_way_frame(cfg):
    d = np.array([0.01, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=np.float32)
    img0, img1, cam, pose1_true = make_scene(d)
    m = Mapper(cfg, cam, decoder=None)
    m.init_two_frames(img0, img0)  # two identical keyframes at identity
    m.enqueue_frame(img1, se3m.identity(), kf_slot=m.kf_slots[-1])
    while m.has_work():
        m.mapping_step()
    # frame pose should have moved toward pose1_true
    fpose = SE3(m.frames.pose.q[0], m.frames.pose.t[0])
    err = np.asarray(se3m.local(pose1_true, fpose))
    assert np.linalg.norm(err) < 2e-2, f"frame pose error {err}"


def test_reset(cfg):
    img0, img1, cam, _ = make_scene(np.zeros(6, dtype=np.float32))
    m = Mapper(cfg, cam, decoder=None)
    m.init_two_frames(img0, img1)
    m.reset()
    assert int(np.sum(np.asarray(m.state.active))) == 0
    assert m.work.empty()


def test_frame_marginalization_folds_prior(cfg):
    """Marginalizing a one-way frame must leave a marginal prior on its
    keyframe (information preserved, not dropped)."""
    d = np.array([0.01, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=np.float32)
    img0, img1, cam, _ = make_scene(d)
    m = Mapper(cfg, cam, decoder=None)
    m.init_two_frames(img0, img0)
    kf = m.kf_slots[-1]
    m.enqueue_frame(img1, se3m.identity(), kf_slot=kf)
    while m.has_work():
        m.mapping_step()
    assert not bool(m.marginals.active[kf])
    # next enqueue marginalizes the live frame -> prior appears on kf
    m.enqueue_keyframe(img1, se3m.identity())
    assert bool(m.marginals.active[kf])
    H = np.asarray(m.marginals.H[kf])
    assert np.all(np.isfinite(H))
    assert np.trace(H) > 0
    # and the system still optimizes cleanly with the prior in place
    while m.has_work():
        m.mapping_step()
    assert np.all(np.isfinite(np.asarray(m.state.pose.t)))


def test_depth_prior_pulls_code_to_target_depth():
    """DepthPriorFactor equivalent (depth_prior_factor.cpp:83-123): with a
    flat synthetic decoder (prx = 0.5 + 0.1*code[0]) and zero photometric
    signal (identical images, identity poses), the GT-depth prior must pull
    the code so the decoded depth matches the target."""
    CS2 = 2
    cfg2 = MapperConfig(
        max_keyframes=2, max_frames=1, max_factors=4, code_size=CS2,
        height=H, width=W, pyramid_levels=2, pho_iters=(6, 6),
        huber_delta=0.3, connection_mode="LASTN", max_back_connections=1,
        lm_lambda=1e-4, use_schur=False,
        use_depth_prior=True, dpt_prior_sigma=0.05, code_prior=100.0,
    )
    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img = jnp.asarray(0.5 + 0.2 * np.sin(xs / 5) * np.cos(ys / 4))

    m = Mapper(cfg2, cam, decoder=None)
    img_pyr = ip.build_pyramid(img, 2)
    grad_pyr = ip.build_gradient_pyramid(img_pyr)
    prx0 = tuple(jnp.full_like(im, 0.5) for im in img_pyr)
    jac = tuple(
        jnp.stack([jnp.full_like(im, 0.1), jnp.zeros_like(im)], axis=-1)
        for im in img_pyr
    )
    stdev = tuple(jnp.zeros_like(im) for im in img_pyr)
    code0 = jnp.zeros((CS2,), jnp.float32)
    pyramids = (img_pyr, grad_pyr, prx0, jac, stdev, code0, None)

    p0 = se3m.identity()
    s0 = m.add_keyframe_to_map(img, p0, pyramids=pyramids)
    s1 = m.add_keyframe_to_map(img, p0, pyramids=pyramids)
    m._anchor_pose = p0
    m._add_photo_pair(s0, s1)

    target = np.full((H, W), 2.5, np.float32)
    m.set_depth_prior(s0, target)
    m.set_depth_prior(s1, target)
    while m.has_work():
        m.mapping_step()
    m.update_map()

    dpt = np.asarray(m.state.levels[0].dpt[s0])
    assert abs(float(np.mean(dpt)) - 2.5) < 0.05, float(np.mean(dpt))
    # prx = 0.5 + 0.1*c0 = 2/(2+2.5) => c0 ≈ -0.555
    c0 = float(m.state.code[s0, 0])
    assert abs(c0 - (2.0 / 4.5 - 0.5) / 0.1) < 0.1, c0
