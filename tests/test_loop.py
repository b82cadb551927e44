"""Loop closure tests: BoW scoring discriminates scenes; local loop picks the
geometrically nearest out-of-window keyframe; global loop verifies densely."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.features import detector as det
from deepfactors_tpu.loop import vocabulary as vb
from deepfactors_tpu.loop.loop_detector import LoopDetector, LoopConfig
from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig
from deepfactors_tpu.ops import image as ip

H, W = 64, 96


def scene(seed, k=0.0):
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img = 0.3 + 0.15 * np.sin(xs / (11 + seed) + k) * np.cos(ys / (9 + seed))
    for _ in range(10):
        cy, cx = rng.randint(10, H - 10), rng.randint(10, W - 10)
        img[cy - 3:cy + 3, cx - 3:cx + 3] = rng.uniform(0.4, 1.0)
    return img.astype(np.float32)


def feats(img):
    cfg = det.DetectorConfig(max_keypoints=64, border=8)
    return det.detect(jnp.asarray(img), cfg)


def test_bow_self_similarity_highest():
    voc = vb.random_vocabulary(128)
    f0, f1, f2 = feats(scene(1)), feats(scene(2)), feats(scene(3))
    vs = [vb.bow_vector(voc, f.descriptor, f.valid) for f in (f0, f1, f2)]
    db = jnp.stack(vs)
    sims = np.asarray(vb.similarity(vs[0], db, jnp.ones(3, bool)))
    assert sims[0] > sims[1] and sims[0] > sims[2]
    assert sims[0] > 0.99


def test_vocabulary_training():
    rng = np.random.RandomState(0)
    descs = rng.randint(0, 2**32, (500, 8), dtype=np.uint32)
    voc = vb.train_vocabulary(descs, num_words=32, iters=3)
    assert voc.words.shape == (32, 8)
    assert np.all(np.isfinite(np.asarray(voc.idf)))


def test_local_loop_detection():
    cam = PinholeCamera.create(fx=80.0, fy=80.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = LoopConfig(active_window=2, max_dist=5.0)
    ld = LoopDetector(cfg, cam, levels=2, max_keyframes=8)
    # 5 keyframes along x; active window = last 2; query near kf0
    poses = se3m.identity((8,))
    t = np.zeros((8, 3), np.float32)
    for i in range(5):
        t[i, 0] = i * 0.5
    poses = SE3(poses.q, jnp.asarray(t))
    active = np.array([True] * 5 + [False] * 3)
    cur = SE3(se3m.identity().q, jnp.asarray([0.1, 0.0, 0.0], jnp.float32))
    slot = ld.detect_local_loop(cur, poses, active, [0, 1, 2, 3, 4], -1)
    assert slot == 0  # kfs 3,4 are in-window; kf0 at 0.0 is nearest


def test_global_loop_with_verification():
    cam = PinholeCamera.create(fx=80.0, fy=80.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    mcfg = MapperConfig(max_keyframes=6, max_frames=1, max_factors=8,
                        code_size=4, height=H, width=W, pyramid_levels=2,
                        pho_iters=(2, 2), use_schur=False)
    m = Mapper(mcfg, cam, decoder=None)
    imgs = [scene(1), scene(2), scene(3)]
    m.init_two_frames(imgs[0], imgs[1])
    m.enqueue_keyframe(imgs[2], se3m.identity())

    lcfg = LoopConfig(active_window=1, min_similarity=0.2, min_inliers=0.3,
                      iters_per_level=(4, 4))
    ld = LoopDetector(lcfg, cam, levels=2, max_keyframes=6)
    for i, s in enumerate(m.kf_slots):
        f = feats(imgs[i])
        ld.add_keyframe(s, f.descriptor, f.valid)

    # query with scene(1) again — should match keyframe slot 0 (out of window)
    f = feats(imgs[0])
    img_pyr = ip.build_pyramid(jnp.asarray(imgs[0]), 2)
    grad_pyr = ip.build_gradient_pyramid(img_pyr)
    res = ld.detect_loop(
        f.descriptor, f.valid, img_pyr, grad_pyr,
        se3m.identity(), m.state, m.kf_slots,
    )
    assert res.detected
    assert res.slot == m.kf_slots[0]
    # verified pose should be near identity (same image, same pose)
    assert float(jnp.linalg.norm(res.pose_cand_cur.t)) < 0.05
