"""Evicted-keyframe loop closure: archived keyframes stay closable.

VERDICT r3 weak #4: the flagship pool keeps ~10 live keyframes, so every
revisit target had been marginalized out and no loop ever fired. The archive
(loop_detector.archive_keyframe) retains BoW + level-0 image/depth + final
pose for evicted keyframes; detect_loop verifies against them and the facade
applies the correction as a pose prior (Mapper.add_loop_prior)."""
import numpy as np
import jax
import jax.numpy as jnp

from tests.test_loop import H, W, feats, scene
from deepfactors_tpu.loop.loop_detector import LoopDetector, LoopConfig
from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig
from deepfactors_tpu.ops import image as ip


def _mapper(cam):
    mcfg = MapperConfig(max_keyframes=6, max_frames=1, max_factors=8,
                        code_size=4, height=H, width=W, pyramid_levels=2,
                        pho_iters=(2, 2), use_schur=False)
    return Mapper(mcfg, cam, decoder=None)


def test_archived_keyframe_loop_detected():
    cam = PinholeCamera.create(fx=80.0, fy=80.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    m = _mapper(cam)
    imgs = [scene(1), scene(2), scene(3)]
    m.init_two_frames(imgs[0], imgs[1])
    m.enqueue_keyframe(imgs[2], se3m.identity())

    lcfg = LoopConfig(active_window=1, min_similarity=0.2, min_inliers=0.3,
                      iters_per_level=(4, 4))
    ld = LoopDetector(lcfg, cam, levels=2, max_keyframes=6, archive_cap=4)
    for i, s in enumerate(m.kf_slots):
        f = feats(imgs[i])
        ld.add_keyframe(s, f.descriptor, f.valid)

    # archive keyframe 0 (simulating capacity eviction), then remove it from
    # the live map the way marginalize_keyframe would
    s0 = m.kf_slots[0]
    a = ld.archive_keyframe(s0, kf_id=0, state=m.state)
    assert a == 0
    assert not bool(ld.db_valid[s0])
    assert bool(ld.db_valid[ld.K + a])

    # query with scene(1): the live row is gone, the ARCHIVE row must match
    f = feats(imgs[0])
    img_pyr = ip.build_pyramid(jnp.asarray(imgs[0]), 2)
    grad_pyr = ip.build_gradient_pyramid(img_pyr)
    res = ld.detect_loop(
        f.descriptor, f.valid, img_pyr, grad_pyr,
        se3m.identity(), m.state, m.kf_slots, next_kid=100,
    )
    assert res.detected
    assert res.slot == -1 and res.archived_idx == a
    assert float(jnp.linalg.norm(res.pose_cand_cur.t)) < 0.05
    # archived world pose is returned for the pose-prior construction
    assert np.all(np.isfinite(np.asarray(res.arch_pose_w.t)))


def test_archive_temporal_guard():
    """Recently-archived keyframes are excluded (they are temporally near,
    not a revisit)."""
    cam = PinholeCamera.create(fx=80.0, fy=80.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    m = _mapper(cam)
    imgs = [scene(1), scene(2)]
    m.init_two_frames(imgs[0], imgs[1])
    lcfg = LoopConfig(active_window=3, min_similarity=0.2, min_inliers=0.3,
                      iters_per_level=(4, 4))
    ld = LoopDetector(lcfg, cam, levels=2, max_keyframes=6, archive_cap=4)
    for i, s in enumerate(m.kf_slots):
        f = feats(imgs[i])
        ld.add_keyframe(s, f.descriptor, f.valid)
    ld.archive_keyframe(m.kf_slots[0], kf_id=5, state=m.state)
    f = feats(imgs[0])
    img_pyr = ip.build_pyramid(jnp.asarray(imgs[0]), 2)
    grad_pyr = ip.build_gradient_pyramid(img_pyr)
    # next_kid=6: archived id 5 is within active_window=3 -> excluded
    res = ld.detect_loop(
        f.descriptor, f.valid, img_pyr, grad_pyr,
        se3m.identity(), m.state, m.kf_slots, next_kid=6,
    )
    assert res.archived_idx == -1   # the archive row must not match


def test_add_loop_prior_pulls_pose():
    """A loop pose prior folded into the marginal store moves the keyframe
    toward the target on the next mapping run."""
    cam = PinholeCamera.create(fx=80.0, fy=80.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    m = _mapper(cam)
    imgs = [scene(1), scene(2)]
    m.init_two_frames(imgs[0], imgs[1])
    kf = m.kf_slots[1]
    pose_before = np.asarray(jax.device_get(m.state.pose.t[kf]))
    target = SE3(np.array([1.0, 0, 0, 0], np.float32),
                 pose_before + np.array([0.05, 0.0, 0.0], np.float32))
    m.add_loop_prior(kf, target, sigma=0.01)   # strong prior
    assert bool(m.marginals.active[kf])
    # re-optimize: add works on the existing pair and run mapping
    m._add_photo_pair(m.kf_slots[0], kf, second_removes=True)
    while m.has_work():
        m.mapping_run()
    pose_after = np.asarray(jax.device_get(m.state.pose.t[kf]))
    d_before = abs(pose_before[0] - target.t[0])
    d_after = abs(pose_after[0] - target.t[0])
    assert d_after < d_before * 0.5
