"""Batched factor evaluation over the SoA map.

The reference evaluates factors one at a time inside ISAM2 relinearization
(PhotometricFactor::linearize launches one CUDA reduction per factor,
photometric_factor.cpp:86-181). Here all factors of a pyramid level are
evaluated in ONE vmapped call — the per-factor 44x44 systems become a single
batched MXU matmul, and assembly is one scatter-add (solver/system.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera
from ..ops import dense_sfm as ds
from . import map_state as ms

Array = jax.Array


class FactorBatch(NamedTuple):
    """Result of evaluating P photometric factors at one level."""

    JtJ: Array       # [P, D, D]
    Jtr: Array       # [P, D]
    residual: Array  # [P] raw sum of squared weighted residuals
    inliers: Array   # [P]


def take_rows(arr: Array, idx: Array) -> Array:
    """Gather rows arr[idx] via a one-hot matmul.

    XLA's leading-axis gather runs at ~3 GB/s on TPU (measured) — a one-hot
    [P, K] @ [K, ...] contraction instead rides the MXU at memory speed.
    Used for all factor-pool data gathers (the K keyframe axis is small)."""
    K = arr.shape[0]
    onehot = jax.nn.one_hot(idx, K, dtype=arr.dtype)  # [P, K]
    flat = arr.reshape(K, -1)
    out = jnp.einsum("pk,kn->pn", onehot, flat,
                     preferred_element_type=arr.dtype)
    return out.reshape((idx.shape[0],) + arr.shape[1:])


def _fused_ok(H: int, W: int) -> bool:
    return ds.use_pallas_warp() and H % 8 == 0 and W % min(128, W) == 0


def photometric_gram_pools(
    pose0, pose1, code0, src, dst, cam_level, params,
    img0_pool, dpt_pool, jacT_pool, img1_pool, gx1_pool, gy1_pool,
    active=None, grad_mode="sampled", depth_from_code=False,
    loss="huber",
) -> FactorBatch:
    """Fused-kernel photometric batch straight from pooled keyframe tensors.

    One pallas_call linearizes every factor (warp + Jacobians + Gram
    reduction; ops/pallas/sfm_kernel.py) with src/dst selecting pool rows at
    block granularity — nothing per-factor is materialized in HBM.

    depth_from_code=True: dpt_pool holds prx0 and the kernel materializes
    depth at code0 in-kernel from the resident jac block (removes the
    per-iteration update_depth_all pyramid pass)."""
    from ..geometry import se3 as se3m
    from ..ops.pallas import sfm_kernel as sk

    CS = jacT_pool.shape[1]
    pose_10, j_pose1, j_pose0 = jax.vmap(se3m.relative_pose_jacobians)(
        pose1, pose0
    )
    kp = sk.make_sfm_params(pose_10, cam_level, params.valid_border,
                            params.min_dpt, params.huber_delta,
                            params.avg_dpt)
    G = sk.sfm_gram_batch(kp, src, dst, img0_pool, dpt_pool, jacT_pool,
                          img1_pool, gx1_pool, gy1_pool, active=active,
                          codes=code0 if depth_from_code else None,
                          grad_mode=grad_mode, loss=loss)
    JtJ, Jtr, res, inl = sk.system_from_gram(G, j_pose0, j_pose1, CS)
    return FactorBatch(JtJ, Jtr, res, inl)


def photometric_batch(
    state: ms.MapState,
    src: Array,    # [P] source keyframe slots (provide depth/code)
    dst: Array,    # [P] target keyframe slots (provide image)
    level: int,
    cam_level: PinholeCamera,
    params: ds.SfmParams,
    active: Array = None,  # [P] fused kernel skips inactive slots (G = 0)
    grad_mode: str = "sampled",
    depth_from_code: bool = False,  # fused path: skip lvl.dpt, use prx0+code
    loss: str = "huber",
) -> FactorBatch:
    """Evaluate photometric GN systems for factor pairs (src -> dst)."""
    lvl = state.levels[level]
    pose0 = ms.poses_of(state, src)
    pose1 = ms.poses_of(state, dst)
    code0 = state.code[src]

    H, W = lvl.img.shape[1:]
    if _fused_ok(H, W):
        return photometric_gram_pools(
            pose0, pose1, code0, src, dst, cam_level, params,
            lvl.img, lvl.prx0 if depth_from_code else lvl.dpt, lvl.jac,
            lvl.img, lvl.grad[..., 0], lvl.grad[..., 1],
            active=active, grad_mode=grad_mode,
            depth_from_code=depth_from_code, loss=loss,
        )

    sys = ds.sfm_step_batch(
        pose0, pose1, code0, cam_level,
        take_rows(lvl.img, src), take_rows(lvl.img, dst),
        take_rows(lvl.dpt, src), take_rows(lvl.stdev, src),
        jnp.transpose(take_rows(lvl.jac, src), (0, 2, 3, 1)),
        take_rows(lvl.grad, dst),
        params, grad_mode=grad_mode, loss=loss,
    )
    return FactorBatch(sys.JtJ, sys.Jtr, sys.residual, sys.inliers)


def depth_prior_batch(
    state: ms.MapState,
    tgt_pyr,           # tuple of [K, h, w] target-depth pyramids
    sigma: float,
    avg_dpt: float,
) -> FactorBatch:
    """Code-only GN systems tying each keyframe's code to a ground-truth
    depth pyramid, summed over all levels and scaled by 1/σ²
    (DepthPriorFactor::linearize/RunAlignment, depth_prior_factor.cpp:83-123;
    step math cu_depthaligner.cpp:46-68). Returns [K, CS, CS] / [K, CS]
    blocks addressed at each keyframe's code slot."""
    K, CS = state.code.shape
    JtJ = jnp.zeros((K, CS, CS))
    Jtr = jnp.zeros((K, CS))
    res = jnp.zeros((K,))
    inl = jnp.zeros((K,))
    for l, lvl in enumerate(state.levels):
        sys = jax.vmap(ds.depth_align_step_T, in_axes=(0, 0, 0, 0, None))(
            state.code, tgt_pyr[l], lvl.prx0, lvl.jac, avg_dpt
        )
        JtJ = JtJ + sys.JtJ
        Jtr = Jtr + sys.Jtr
        res = res + sys.residual
        inl = inl + sys.inliers
    w = 1.0 / (sigma * sigma)
    return FactorBatch(JtJ * w, Jtr * w, res, inl)


def photometric_error_batch(
    state: ms.MapState,
    src: Array,
    dst: Array,
    level: int,
    cam_level: PinholeCamera,
    params: ds.SfmParams,
):
    """Residual-only evaluation (for LM accept/reject and stats), mirroring
    PhotometricFactor::error -> RunWarping (photometric_factor.cpp:61-81)."""
    lvl = state.levels[level]
    pose0 = ms.poses_of(state, src)
    pose1 = ms.poses_of(state, dst)

    H, W = lvl.img.shape[1:]
    if _fused_ok(H, W):
        from ..geometry import se3 as se3m
        from ..ops.pallas import sfm_kernel as sk

        pose_10 = jax.vmap(se3m.relative_pose)(pose1, pose0)
        kp = sk.make_sfm_params(pose_10, cam_level, 1, 0.0,
                                params.huber_delta, params.avg_dpt)
        return sk.sfm_error_batch(kp, src, dst, lvl.img, lvl.dpt, lvl.img)

    def one(p0q, p0t, p1q, p1t, img0, img1, dpt0, std0, grad1):
        return ds.sfm_evaluate_error(
            SE3(p0q, p0t), SE3(p1q, p1t), cam_level,
            img0, img1, dpt0, std0, grad1, params,
        )

    res = jax.vmap(one)(
        pose0.q, pose0.t, pose1.q, pose1.t,
        take_rows(lvl.img, src), take_rows(lvl.img, dst),
        take_rows(lvl.dpt, src), take_rows(lvl.stdev, src),
        take_rows(lvl.grad, dst),
    )
    return res.residual, res.inliers
