"""Loop detector: local (pose-distance) + global (BoW retrieval with dense
geometric verification).

Reimplements sources/core/system/loop_detector.cpp:
  - DetectLocalLoop (:190-224): nearest keyframe OUTSIDE the most recent
    ``active_window`` by the weighted pose distance (warping.h:139-147).
  - DetectLoop (:96-185): BoW query over keyframe descriptors, keep top
    candidates above min_similarity that are outside the active window, then
    geometrically verify by dense SE(3) tracking of the current frame against
    each candidate — and HERE the candidates are verified as ONE vmapped
    batch (the reference tracks each candidate sequentially,
    loop_detector.cpp:149-168 — the SURVEY §7.3 batching opportunity).
    Accept the best verified candidate with inliers > min_inliers and
    translation distance < max_dist.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera, camera_pyramid
from ..ops import dense_sfm as ds
from . import vocabulary as vb

Array = jax.Array


class LoopConfig(NamedTuple):
    max_dist: float = 0.5          # loop_max_dist
    active_window: int = 10        # loop_active_window
    min_similarity: float = 0.35   # loop_min_similarity
    max_candidates: int = 10       # loop_max_candidates
    min_inliers: float = 0.5       # inlier acceptance (loop_detector.cpp:160)
    iters_per_level: tuple = (10, 5, 4)
    huber_delta: float = 0.3
    grad_mode: str = "interp"   # see TrackerConfig.grad_mode


class LoopResult(NamedTuple):
    detected: bool
    slot: int                # matched keyframe slot (-1 if none)
    pose_cand_cur: Optional[SE3]  # verified relative pose candidate->current


def _make_verify_fn(cfg: LoopConfig, cam: PinholeCamera, levels: int):
    cams = camera_pyramid(cam, levels)

    def verify_batch(kf_imgs, kf_dpts, cur_imgs, cur_grads, pq, pt):
        """Dense C2F tracking of the current frame against ALL candidates at
        once. On TPU each GN iteration is ONE fused se3_gram_batch kernel
        over the candidate batch (the kernel's factor axis is the candidate
        axis — no vmap-over-pallas per-element dispatch); the CPU/exact path
        vmaps the XLA se3_step."""
        C = pq.shape[0]
        q, t = pq, pt
        inl = jnp.zeros((C,))
        err = jnp.full((C,), jnp.inf)
        src = jnp.arange(C, dtype=jnp.int32)
        dstz = jnp.zeros((C,), jnp.int32)
        for level in reversed(range(levels)):
            H, W = cur_imgs[level].shape
            area = float(H * W)
            fused = (ds.use_pallas_warp() and H % 8 == 0
                     and W % min(128, W) == 0)
            if fused:
                from ..ops.pallas import sfm_kernel as sk
                img1p = cur_imgs[level][None]
                gxp = cur_grads[level][..., 0][None]
                gyp = cur_grads[level][..., 1][None]

            def body(_, carry, level=level, fused=fused, area=area):
                q, t, _i, _e = carry
                if fused:
                    from ..ops.pallas import sfm_kernel as sk
                    kp = sk.make_sfm_params(SE3(q, t), cams[level], 1, 0.0,
                                            cfg.huber_delta, 2.0)
                    G = sk.se3_gram_batch(
                        kp, src, dstz, kf_imgs[level], kf_dpts[level],
                        cur_imgs[level][None],
                        cur_grads[level][..., 0][None],
                        cur_grads[level][..., 1][None],
                        grad_mode=cfg.grad_mode)
                    JtJ = 0.5 * (G[:, :6, :6]
                                 + jnp.swapaxes(G[:, :6, :6], -1, -2))
                    Jtr, resid, inliers = G[:, :6, 6], G[:, 6, 6], G[:, 7, 7]
                else:
                    sys = jax.vmap(
                        lambda qq, tt, i0, d0: ds.se3_step(
                            SE3(qq, tt), cams[level], i0, cur_imgs[level],
                            d0, cur_grads[level], cfg.huber_delta,
                            grad_mode=cfg.grad_mode)
                    )(q, t, kf_imgs[level], kf_dpts[level])
                    JtJ, Jtr = sys.JtJ, sys.Jtr
                    resid, inliers = sys.residual, sys.inliers
                newp = jax.vmap(
                    lambda A, b, qq, tt: ds.se3_solve_and_update(
                        A, b, SE3(qq, tt), damping=1e-8)
                )(JtJ, Jtr, q, t)
                return (newp.q, newp.t, inliers / area,
                        jnp.where(inliers > 0,
                                  resid / jnp.maximum(inliers, 1.0), jnp.inf))

            q, t, inl, err = jax.lax.fori_loop(
                0, cfg.iters_per_level[level], body, (q, t, inl, err)
            )
        return q, t, inl, err

    return jax.jit(verify_batch)


class LoopDetector:
    """Stateful facade over the map's BoW database."""

    def __init__(self, cfg: LoopConfig, cam: PinholeCamera, levels: int,
                 max_keyframes: int, voc: Optional[vb.Vocabulary] = None,
                 num_words: int = 256):
        self.cfg = cfg
        self.voc = voc if voc is not None else vb.random_vocabulary(num_words)
        self.db = jnp.zeros((max_keyframes, self.voc.words.shape[0]),
                            jnp.float32)
        self.db_valid = jnp.zeros((max_keyframes,), bool)
        self._verify = _make_verify_fn(cfg, cam, levels)
        self.levels = levels

    def add_keyframe(self, slot: int, desc: Array, valid: Array):
        """AddKeyframe: insert the keyframe's BoW vector into the database."""
        v = vb.bow_vector(self.voc, desc, valid)
        self.db = self.db.at[slot].set(v)
        self.db_valid = self.db_valid.at[slot].set(True)

    def remove_keyframe(self, slot: int):
        self.db_valid = self.db_valid.at[slot].set(False)

    def detect_local_loop(self, pose_cur: SE3, map_poses: SE3,
                          active: np.ndarray, kf_order: list,
                          cur_kf_slot: int) -> int:
        """Nearest keyframe outside the active window by pose distance
        (loop_detector.cpp:190-224). Returns slot or -1."""
        win = set(kf_order[-self.cfg.active_window:])
        dists = np.asarray(jax.device_get(
            se3m.pose_distance(map_poses, pose_cur)
        ))
        best, best_d = -1, np.inf
        for s in kf_order:
            if s in win or not active[s] or s == cur_kf_slot:
                continue
            if dists[s] < best_d:
                best, best_d = s, dists[s]
        if best >= 0 and best_d < self.cfg.max_dist:
            return best
        return -1

    def detect_loop(self, desc, desc_valid, cur_imgs, cur_grads,
                    pose_cur: SE3, state, kf_order: list,
                    sims_np: Optional[np.ndarray] = None) -> LoopResult:
        """Global loop detection with batched dense verification.

        ``sims_np`` may carry precomputed BoW similarities (the system's
        fused frame probe batches them into its single round trip); the
        active-window exclusion is applied on the host either way."""
        win = set(kf_order[-self.cfg.active_window:])
        if sims_np is None:
            v = vb.bow_vector(self.voc, desc, desc_valid)
            sims = vb.similarity(v, self.db, self.db_valid)
            sims_np = np.asarray(jax.device_get(sims))
        sims_np = np.array(sims_np, copy=True)
        for s in win:
            sims_np[s] = -np.inf
        order = np.argsort(-sims_np)[: self.cfg.max_candidates]
        cands = [int(s) for s in order
                 if sims_np[s] >= self.cfg.min_similarity]
        if not cands:
            return LoopResult(False, -1, None)

        # pad the candidate batch to max_candidates so the verifier compiles
        # ONCE (a per-candidate-count variant costs minutes through the axon
        # tunnel); padded rows repeat candidate 0 and are ignored on the host
        C = self.cfg.max_candidates
        cands_padded = cands + [cands[0]] * (C - len(cands))
        cs = jnp.asarray(cands_padded, jnp.int32)
        kf_imgs = tuple(state.levels[l].img[cs] for l in range(self.levels))
        kf_dpts = tuple(state.levels[l].dpt[cs] for l in range(self.levels))
        # init: relative pose candidate->current from current estimates
        kf_poses = SE3(state.pose.q[cs], state.pose.t[cs])
        init = se3m.mul(se3m.inverse(pose_cur),
                        kf_poses)  # maps cand kf points into cur frame...
        # pose_ck convention: cur_from_kf = pose_cur^-1 * pose_kf
        q, t, inl, err = self._verify(
            kf_imgs, kf_dpts, tuple(cur_imgs), tuple(cur_grads),
            init.q, init.t,
        )
        inl = np.asarray(jax.device_get(inl))
        tnorm = np.linalg.norm(np.asarray(jax.device_get(t)), axis=-1)
        best = -1
        best_inl = self.cfg.min_inliers
        for i in range(len(cands)):
            if inl[i] > best_inl and tnorm[i] < self.cfg.max_dist:
                best, best_inl = i, inl[i]
        if best < 0:
            return LoopResult(False, -1, None)
        return LoopResult(
            True, cands[best],
            SE3(jnp.asarray(q[best]), jnp.asarray(t[best])),
        )
