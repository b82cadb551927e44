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


def photometric_batch(
    state: ms.MapState,
    src: Array,    # [P] source keyframe slots (provide depth/code)
    dst: Array,    # [P] target keyframe slots (provide image)
    level: int,
    cam_level: PinholeCamera,
    params: ds.SfmParams,
) -> FactorBatch:
    """Evaluate photometric GN systems for factor pairs (src -> dst)."""
    lvl = state.levels[level]
    pose0 = ms.poses_of(state, src)
    pose1 = ms.poses_of(state, dst)
    code0 = state.code[src]

    sys = ds.sfm_step_batch(
        pose0, pose1, code0, cam_level,
        take_rows(lvl.img, src), take_rows(lvl.img, dst),
        take_rows(lvl.dpt, src), take_rows(lvl.stdev, src),
        take_rows(lvl.jac, src), take_rows(lvl.grad, dst),
        params,
    )
    return FactorBatch(sys.JtJ, sys.Jtr, sys.residual, sys.inliers)


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
