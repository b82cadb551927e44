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

    def one(p0q, p0t, p1q, p1t, c0, img0, img1, dpt0, std0, jac0, grad1):
        sys, _vld = ds.sfm_step(
            SE3(p0q, p0t), SE3(p1q, p1t), c0, cam_level,
            img0, img1, dpt0, std0, jac0, grad1, params,
        )
        return sys

    sys = jax.vmap(one)(
        pose0.q, pose0.t, pose1.q, pose1.t, code0,
        lvl.img[src], lvl.img[dst], lvl.dpt[src], lvl.stdev[src],
        lvl.jac[src], lvl.grad[dst],
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
        lvl.img[src], lvl.img[dst], lvl.dpt[src], lvl.stdev[src], lvl.grad[dst],
    )
    return res.residual, res.inliers
