"""Dense SE(3) camera tracker: coarse-to-fine Gauss-Newton odometry against
the active keyframe.

Reimplements sources/core/system/camera_tracker.{h,cpp} TPU-first: the whole
coarse-to-fine iteration schedule is ONE jitted function (per-level loops are
lax.fori_loop, level transitions are unrolled statically), so a TrackFrame is
a single device dispatch instead of ~20 kernel launches + D->H copies
(camera_tracker.cpp:42-91).

Pose state: pose_ck maps keyframe (cam k) points into the current frame
(cam c). World pose: pose_wc = pose_wk * pose_ck^-1
(camera_tracker.cpp:98-103).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera, camera_pyramid
from ..ops import dense_sfm as ds

Array = jax.Array


class TrackerConfig(NamedTuple):
    pyramid_levels: int = 3
    iterations_per_level: tuple = (10, 5, 4)  # finest-first like reference
    huber_delta: float = 0.3
    # 'interp' = exact bilinear-interpolant gradient (1-channel gathers,
    # fastest); 'sampled' = Sobel planes sampled at the warp (reference
    # parity, lucas_kanade_se3.h:52-58)
    grad_mode: str = "interp"


class TrackResult(NamedTuple):
    pose_ck: SE3
    inliers: Array   # fraction of valid pixels at the finest level
    error: Array     # avg residual at finest level (inf if no inliers)


def track_c2f(cfg: TrackerConfig, cams, pose_ck: SE3, kf_imgs, kf_dpts,
              imgs, grads):
    """Pure coarse-to-fine dense SE(3) tracking (camera_tracker.cpp:42-91):
    per-level lax.fori_loop GN with the decoupled retract. Trace-time
    building block shared by the tracker's jitted dispatch and the system's
    fused per-frame step. Returns (q, t, stats [inliers, error])."""
    pose = pose_ck
    inliers = jnp.asarray(0.0)
    error = jnp.asarray(jnp.inf)
    for level in reversed(range(cfg.pyramid_levels)):
        img0, dpt0 = kf_imgs[level], kf_dpts[level]
        img1, grad1 = imgs[level], grads[level]
        n_iters = cfg.iterations_per_level[level]

        def body(_, carry, level=level, img0=img0, dpt0=dpt0, img1=img1,
                 grad1=grad1):
            q, t, _inl, _err = carry
            sys = ds.se3_step(
                SE3(q, t), cams[level], img0, img1, dpt0, grad1,
                cfg.huber_delta, grad_mode=cfg.grad_mode,
            )
            new_pose = ds.se3_solve_and_update(
                sys.JtJ, sys.Jtr, SE3(q, t), damping=1e-8
            )
            inl = sys.inliers / (img1.shape[0] * img1.shape[1])
            err = jnp.where(
                sys.inliers > 0, sys.residual / jnp.maximum(sys.inliers, 1.0),
                jnp.inf,
            )
            return new_pose.q, new_pose.t, inl, err

        q, t, inliers, error = jax.lax.fori_loop(
            0, n_iters, body, (pose.q, pose.t, inliers, error)
        )
        pose = SE3(q, t)
    return pose.q, pose.t, jnp.stack([inliers, error])


def _make_track_fn(cfg: TrackerConfig, cam: PinholeCamera):
    cams = camera_pyramid(cam, cfg.pyramid_levels)

    def track(pose_q, pose_t, kf_imgs, kf_dpts, imgs, grads):
        """kf_imgs/kf_dpts/imgs/grads: tuples of per-level arrays."""
        return track_c2f(cfg, cams, SE3(pose_q, pose_t), kf_imgs, kf_dpts,
                         imgs, grads)

    return jax.jit(track)


def _make_burst_fn(track_fn):
    """lax.scan the single-frame track over a stacked frame batch: one device
    dispatch tracks N frames (each from the previous frame's pose), hiding
    per-dispatch host latency. This is the production streaming shape — the
    reference dispatches ~19 kernel launches + D->H copies per frame
    (camera_tracker.cpp:42-91)."""

    def burst(pose_q, pose_t, kf_imgs, kf_dpts, imgs_seq, grads_seq):
        def step(carry, frame):
            q, t = carry
            imgs, grads = frame
            q, t, stats = track_fn(q, t, kf_imgs, kf_dpts, imgs, grads)
            return (q, t), (q, t, stats)

        (q, t), (qs, ts, stats) = jax.lax.scan(
            step, (pose_q, pose_t), (imgs_seq, grads_seq)
        )
        return qs, ts, stats

    return jax.jit(burst)


class CameraTracker:
    """Stateful facade mirroring the reference CameraTracker."""

    def __init__(self, cfg: TrackerConfig, cam: PinholeCamera):
        assert len(cfg.iterations_per_level) == cfg.pyramid_levels
        self.cfg = cfg
        self.cam = cam
        self._track = _make_track_fn(cfg, cam)
        self._burst = None
        self.pose_ck: SE3 = se3m.identity()
        self.kf_imgs = None
        self.kf_dpts = None
        self.kf_pose_wk: SE3 = se3m.identity()
        self.inliers = 0.0
        self.error = float("inf")

    def set_keyframe(self, kf_imgs, kf_dpts, pose_wk: SE3):
        """SetKeyframe (camera_tracker.cpp:105-120): preserve the world pose
        across the keyframe switch."""
        if self.kf_imgs is not None:
            pose_wc = se3m.mul(self.kf_pose_wk, se3m.inverse(self.pose_ck))
            self.pose_ck = se3m.mul(se3m.inverse(pose_wc), pose_wk)
        self.kf_imgs = tuple(kf_imgs)
        self.kf_dpts = tuple(kf_dpts)
        self.kf_pose_wk = pose_wk

    def set_pose(self, pose_wc: SE3):
        self.pose_ck = se3m.mul(se3m.inverse(pose_wc), self.kf_pose_wk)

    def track_frame(self, img_pyr, grad_pyr, sync_stats: bool = True) -> TrackResult:
        """One dense track. With sync_stats=False the scalar stats stay on
        device (no D2H sync — use when pipelining; read .stats later)."""
        if self.kf_imgs is None:
            raise RuntimeError("TrackFrame called before a keyframe was set")
        q, t, stats = self._track(
            self.pose_ck.q, self.pose_ck.t,
            self.kf_imgs, self.kf_dpts, tuple(img_pyr), tuple(grad_pyr),
        )
        self.pose_ck = SE3(q, t)
        self.stats = stats
        if sync_stats:
            inl, err = jax.device_get(stats)
            self.inliers = float(inl)
            self.error = float(err)
        return TrackResult(self.pose_ck, stats[0], stats[1])

    def track_burst(self, img_pyrs, grad_pyrs):
        """Track a whole stacked frame batch in ONE dispatch.

        img_pyrs/grad_pyrs: tuples of per-level stacked arrays [N, h, w] /
        [N, h, w, 2]. Each frame tracks from the previous frame's pose
        (streaming semantics). Updates pose_ck to the last frame. Returns
        (poses_q [N, 4], poses_t [N, 3], stats [N, 2])."""
        if self.kf_imgs is None:
            raise RuntimeError("TrackBurst called before a keyframe was set")
        if self._burst is None:
            self._burst = _make_burst_fn(self._track)
        qs, ts, stats = self._burst(
            self.pose_ck.q, self.pose_ck.t,
            self.kf_imgs, self.kf_dpts, tuple(img_pyrs), tuple(grad_pyrs),
        )
        self.pose_ck = SE3(qs[-1], ts[-1])
        self.stats = stats[-1]
        return qs, ts, stats

    def get_pose_estimate(self) -> SE3:
        return se3m.mul(self.kf_pose_wk, se3m.inverse(self.pose_ck))

    def reset(self):
        self.pose_ck = se3m.identity()
