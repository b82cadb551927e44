"""The fused per-frame step: tracking + decision probe + features + BoW in
ONE device dispatch.

The reference's ProcessFrame (deepfactors.cpp:220-366) issues dozens of GPU
kernel launches and host reads per frame; through the axon TPU tunnel each
dispatch costs 5-8 ms and each host sync ~50 ms, so the per-frame facade path
is fused into a single jitted function:

    pyramid build + Sobel           (UploadLiveFrame, deepfactors.cpp:616-630)
    keyframe-pool gather            (tracker SetKeyframe, indexing the pool
                                     IN-JIT instead of slicing it per frame)
    coarse-to-fine SE(3) tracking   (CameraTracker::TrackFrame,
                                     camera_tracker.cpp:42-91)
    feature detect + BoW vector     (BRISK detect + DBoW2 transform,
                                     deepfactors.cpp:634-680)
    every per-frame decision scalar (CheckTrackingLost :852,
                                     NewKeyframeRequired :747,
                                     NewFrameRequired :784, SelectKeyframe
                                     :813, loop similarity/distances,
                                     loop_detector.cpp:96-224)

The host reads back ONE packed vector (pose + distances + similarities +
stats) and makes all control-flow decisions from it; image pyramids,
features and the BoW vector stay on device for the (rare) keyframe / loop
events that consume them.

Tracking state: the camera world pose ``pose_wc`` is the only persistent
state. Each frame recomputes pose_ck = pose_wc^-1 * pose_wk from the CURRENT
keyframe pool pose, so mapping updates to the keyframe are picked up
automatically (the reference tracker re-reads shared GPU buffers for the
same effect) and keyframe switches preserve the world pose by construction
(camera_tracker.cpp:105-120).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import se3 as se3m
from .geometry.se3 import SE3
from .geometry.camera import PinholeCamera, camera_pyramid
from .ops import image as ip
from .mapping import factors as fct
from .tracking.tracker import TrackerConfig, track_c2f

Array = jax.Array


class FrameStepOut(NamedTuple):
    probe: Array      # packed decision vector (see layout below)
    feat: object      # Features or None (device)
    bow_v: Array      # [V] BoW vector (device; zeros when no loop detector)
    img_pyr: tuple    # per-level [h, w] device arrays
    grad_pyr: tuple   # per-level [h, w, 2] device arrays
    # tracked world pose as separate small outputs: the pipelined facade
    # chains frame i+1's constant-velocity prediction off these DEVICE
    # arrays without ever syncing them to the host (system.py pipelining)
    wc_q: Array       # [4]
    wc_t: Array       # [3]


def probe_layout(K: int, F: int, S: int = None):
    """Slice offsets of the packed probe vector:
    [wc_q(4) | wc_t(3) | d_full(K) | d_trans(K) | fr_trans(F) | sims(S) |
     rot | inliers | error].

    ``S`` is the BoW-similarity length: K + archive_cap when the loop
    detector keeps an evicted-keyframe archive, else K."""
    if S is None:
        S = K
    off = {}
    o = 0
    for name, n in (("wc_q", 4), ("wc_t", 3), ("d_full", K), ("d_trans", K),
                    ("fr_trans", F), ("sims", S), ("tail", 3)):
        off[name] = (o, o + n)
        o += n
    return off, o


def build_frame_fn(tracker_cfg: TrackerConfig, cam: PinholeCamera,
                   levels: int, with_loop: bool, det_cfg=None):
    """Build the jitted fused frame function.

    Call signature (all traced):
      frame_fn(img, kf_imgs, kf_dpts, kf_q, kf_t, fr_q, fr_t, curr_kf,
               prev_q, prev_t, prev2_q, prev2_t, voc_words, voc_idf, db,
               db_valid)
    where kf_imgs/kf_dpts are the map's per-level [K, h, w] pools and
    (prev2_q, prev2_t) is the pose one frame before prev (constant-velocity
    prediction; pass prev for a zero-velocity start).
    """
    cams = camera_pyramid(cam, levels)
    if with_loop:
        from .features import detector as det
        from .loop import vocabulary as vb

    @jax.jit
    def frame_fn(img, kf_imgs, kf_dpts, kf_q, kf_t, fr_q, fr_t, curr_kf,
                 prev_q, prev_t, prev2_q, prev2_t, voc_words, voc_idf, db,
                 db_valid):
        # reduced-precision upload path (SystemConfig.frame_upload): the
        # per-frame image is the largest host->device transfer on the hot
        # path, and the axon tunnel degrades to ~55 MB/s after the first
        # device_get — f16 halves the f32 cost; u8 quarters it for 8-bit
        # camera sources. Conversion back to f32 happens in-jit.
        img = jnp.asarray(img)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) * (1.0 / 255.0)
        else:
            img = img.astype(jnp.float32)
        img_pyr = tuple(ip.build_pyramid(img, levels))
        grad_pyr = tuple(ip.build_gradient_pyramid(img_pyr))

        # gather the active keyframe's pyramid from the pool (one-hot matmul
        # gathers: leading-axis dynamic slices run ~3 GB/s on TPU)
        idx = curr_kf[None]
        kf_img = tuple(fct.take_rows(p, idx)[0] for p in kf_imgs)
        kf_dpt = tuple(fct.take_rows(p, idx)[0] for p in kf_dpts)
        pose_wk = SE3(kf_q[curr_kf], kf_t[curr_kf])

        # constant-velocity initialization (the reference tracks from the
        # last relative motion, camera_tracker.cpp:42-91): predict
        # pred = prev ∘ (prev2⁻¹ ∘ prev). The caller passes prev2 == prev
        # when there is no motion history (bootstrap / relocalization /
        # keyframe switch), making the prediction the previous pose.
        prev = SE3(prev_q, prev_t)
        vel = se3m.mul(se3m.inverse(SE3(prev2_q, prev2_t)), prev)
        pred = se3m.mul(prev, vel)

        # track: world pose -> pose_ck -> C2F GN -> world pose
        pose_ck0 = se3m.mul(se3m.inverse(pred), pose_wk)
        q, t, stats = track_c2f(tracker_cfg, cams, pose_ck0, kf_img, kf_dpt,
                                img_pyr, grad_pyr)
        pose_wc = se3m.mul(pose_wk, se3m.inverse(SE3(q, t)))

        # decision probe (CheckTrackingLost / NewKeyframeRequired /
        # NewFrameRequired / SelectKeyframe / local loop distances)
        kf_poses = SE3(kf_q, kf_t)
        d_full = se3m.pose_distance(kf_poses, pose_wc)
        d_trans = se3m.pose_distance(kf_poses, pose_wc, 1.0, 0.0)
        fr_trans = se3m.pose_distance(SE3(fr_q, fr_t), pose_wc, 1.0, 0.0)
        rel_q = se3m.quat_mul(kf_q[curr_kf], se3m.quat_conj(pose_wc.q))
        rot = jnp.linalg.norm(se3m.so3_log(rel_q))

        if with_loop:
            feat = det.detect_pyramid(img_pyr, det_cfg)
            voc = vb.Vocabulary(voc_words, voc_idf)
            bow_v = vb.bow_vector(voc, feat.descriptor, feat.valid)
            sims = vb.similarity(bow_v, db, db_valid)
        else:
            feat = None
            bow_v = jnp.zeros((db.shape[1],), jnp.float32)
            sims = jnp.full((kf_q.shape[0],), -jnp.inf)

        probe = jnp.concatenate([
            pose_wc.q, pose_wc.t, d_full, d_trans, fr_trans, sims,
            jnp.stack([rot, stats[0], stats[1]]),
        ])
        return FrameStepOut(probe, feat, bow_v, img_pyr, grad_pyr,
                            pose_wc.q, pose_wc.t)

    return frame_fn
