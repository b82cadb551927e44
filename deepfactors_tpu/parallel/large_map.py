"""Large-map distributed bundle adjustment (BASELINE config 4).

For maps beyond a single chip's working set the photometric factors are
sharded across the device mesh (parallel/dist_ba.py): every device
linearizes its local factor batch, the [D, D] global system psum-reduces
over ICI, and the Schur-complement solve (codes eliminated per-keyframe)
runs replicated. This module builds the sharded factor data from a map +
link table and drives BA to convergence.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera
from ..ops import dense_sfm as ds
from . import dist_ba

Array = jax.Array


class LargeMapProblem(NamedTuple):
    pose_q: Array    # [K, 4]
    pose_t: Array    # [K, 3]
    codes: Array     # [K, CS]
    active: Array    # [K]
    fd: dist_ba.ShardedFactorData


def build_problem(
    mesh: Mesh,
    axis: str,
    images: Array,    # [K, H, W]
    prx0: Array,      # [K, H, W]
    jac: Array,       # [K, H, W, CS]
    stdev: Array,     # [K, H, W]
    grads: Array,     # [K, H, W, 2]
    poses: SE3,       # [K]
    codes: Array,     # [K, CS]
    links: Sequence,  # list of (i, j) keyframe index pairs (both ways added)
) -> LargeMapProblem:
    """Gather per-factor data for all link pairs (both directions) and shard
    it over the mesh axis (padded to a multiple of the axis size)."""
    pairs = []
    for i, j in links:
        pairs.append((i, j))
        pairs.append((j, i))
    n_dev = mesh.shape[axis]
    P = ((len(pairs) + n_dev - 1) // n_dev) * n_dev
    src = np.zeros(P, np.int32)
    dst = np.zeros(P, np.int32)
    act = np.zeros(P, bool)
    for p, (i, j) in enumerate(pairs):
        src[p], dst[p], act[p] = i, j, True

    src_j = jnp.asarray(src)
    dst_j = jnp.asarray(dst)
    fd = dist_ba.ShardedFactorData(
        src=src_j, dst=dst_j, active=jnp.asarray(act),
        img0=images[src_j], img1=images[dst_j],
        prx0=prx0[src_j], jac0=jac[src_j], std0=stdev[src_j],
        grad1=grads[dst_j],
    )
    fd = dist_ba.shard_factors(mesh, axis, fd)
    K = images.shape[0]
    return LargeMapProblem(
        pose_q=poses.q, pose_t=poses.t, codes=codes,
        active=jnp.ones((K,), bool), fd=fd,
    )


class LargeMapBA:
    """Distributed BA driver: iterate the psum-reduced Schur GN step."""

    def __init__(self, mesh: Mesh, axis: str, K: int, CS: int,
                 cam: PinholeCamera, params: ds.SfmParams,
                 code_prior: float = 1.0, pose_prior: float = 0.3,
                 lam: float = 1e-4):
        self.step = dist_ba.make_ba_step(
            mesh, axis, K, CS, cam, params, code_prior, pose_prior, lam
        )

    def run(self, problem: LargeMapProblem, iters: int = 10):
        q, t, c = problem.pose_q, problem.pose_t, problem.codes
        stats_hist = []
        for _ in range(iters):
            q, t, c, stats = self.step(q, t, c, problem.fd, problem.active)
            stats_hist.append(stats)
        jax.block_until_ready(q)
        return SE3(q, t), c, stats_hist
