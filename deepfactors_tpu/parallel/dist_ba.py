"""Distributed photometric bundle adjustment over a device mesh.

The reference is single-GPU (SURVEY.md §2.3) — this is the new scale-out
design: photometric factors are sharded across devices along a ``factors``
mesh axis; every device linearizes its local factor batch (fused warp +
Jacobian + JtJ matmul), the small dense global systems are ``psum``-reduced
over ICI, and the solve + variable update runs replicated (it is tiny:
D = K*(6+CS)). Keyframe image data is sharded with the factors that read it
(each factor row carries its own gathered pyramids), so HBM scales with the
map while the reduction traffic is only the [D, D] system.

Used by the large-map stress config and by ``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera
from ..ops import dense_sfm as ds
from ..solver import system as sysm

Array = jax.Array


class ShardedFactorData(NamedTuple):
    """Per-factor gathered data, sharded on the leading (factor) axis."""

    src: Array    # [P] int32 keyframe index of the depth-owning keyframe
    dst: Array    # [P] int32 keyframe index of the target keyframe
    active: Array  # [P] bool
    img0: Array   # [P, H, W]
    img1: Array   # [P, H, W]
    prx0: Array   # [P, H, W]
    jac0: Array   # [P, H, W, CS]
    std0: Array   # [P, H, W]
    grad1: Array  # [P, H, W, 2]


def make_ba_step(
    mesh: Mesh,
    axis: str,
    K: int,
    CS: int,
    cam: PinholeCamera,
    params: ds.SfmParams,
    code_prior: float = 1.0,
    pose_prior: float = 0.3,
    lam: float = 1e-4,
):
    """Build a jitted distributed BA step.

    Inputs at call time: poses (q [K,4], t [K,3]) and codes [K,CS]
    (replicated), ShardedFactorData (factor-sharded). One step: linearize all
    factors in parallel, psum the assembled system, solve with Schur
    elimination of code blocks, retract.
    """
    D = 6 * K + CS * K

    def local_system(pose_q, pose_t, codes, fd: ShardedFactorData):
        poses = SE3(pose_q, pose_t)

        def one(src, dst, img0, img1, prx0, jac0, std0, grad1):
            code0 = codes[src]
            prx = prx0 + jnp.einsum("hwc,c->hw", jac0, code0)
            dpt0 = params.avg_dpt / prx - params.avg_dpt
            sys, _ = ds.sfm_step(
                se3m.index(poses, src), se3m.index(poses, dst), code0, cam,
                img0, img1, dpt0, std0, jac0, grad1, params,
            )
            return sys.JtJ, sys.Jtr, sys.residual, sys.inliers

        JtJ, Jtr, res, inl = jax.vmap(one)(
            fd.src, fd.dst, fd.img0, fd.img1, fd.prx0, fd.jac0, fd.std0,
            fd.grad1,
        )
        idx = sysm.factor_slot_indices(fd.src, fd.dst, K, CS)
        gsys = sysm.assemble(D, JtJ, Jtr, idx, fd.active)
        stats = jnp.stack([
            jnp.sum(res * fd.active), jnp.sum(inl * fd.active)
        ])
        return gsys.H, gsys.b, stats

    def step(pose_q, pose_t, codes, fd: ShardedFactorData, active_kf):
        # Each device computes its shard's system; psum over the factor axis.
        def shard_fn(pose_q, pose_t, codes, fd):
            H, b, stats = local_system(pose_q, pose_t, codes, fd)
            H = jax.lax.psum(H, axis)
            b = jax.lax.psum(b, axis)
            stats = jax.lax.psum(stats, axis)
            return H, b, stats

        H, b, stats = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis)),
            out_specs=(P(), P(), P()),
        )(pose_q, pose_t, codes, fd)

        gsys = sysm.GlobalSystem(H, b)
        # gauge priors (df_work.cpp:29-57 semantics)
        code_idx = (6 * K + jnp.arange(CS * K)).astype(jnp.int32)
        gsys = sysm.add_diagonal_prior(
            gsys, code_idx,
            (1.0 / code_prior**2) * jnp.repeat(active_kf, CS).astype(jnp.float32),
            codes.reshape(-1),
        )
        anchor_idx = jnp.arange(6, dtype=jnp.int32)
        anchor_res = se3m.local(
            se3m.identity(), SE3(pose_q[0], pose_t[0])
        )
        gsys = sysm.add_diagonal_prior(
            gsys, anchor_idx, jnp.full((6,), 1.0 / pose_prior**2), anchor_res
        )
        vmask = jnp.concatenate(
            [jnp.repeat(active_kf, 6), jnp.repeat(active_kf, CS)]
        )
        gsys = sysm.mask_inactive(gsys, vmask)

        delta = sysm.solve_schur_codes(gsys, K, CS, jnp.asarray(lam))
        dpose = delta[: 6 * K].reshape(K, 6)
        dcode = delta[6 * K:].reshape(K, CS)
        new_pose = jax.vmap(se3m.retract)(SE3(pose_q, pose_t), dpose)
        return new_pose.q, new_pose.t, codes + dcode, stats

    return jax.jit(step)


def shard_factors(mesh: Mesh, axis: str, fd: ShardedFactorData) -> ShardedFactorData:
    """Place factor data sharded over the mesh axis, padding the factor
    count to a multiple of the axis size with inactive rows."""
    n = fd.src.shape[0]
    size = mesh.shape[axis]
    pad = (-n) % size
    if pad:
        fd = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]), fd
        )
        fd = fd._replace(active=fd.active.at[n:].set(False))
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), fd)


def factors_from_map_state(state, src, dst, active,
                           level: int = 0) -> ShardedFactorData:
    """The live-Mapper -> distributed-BA bridge: gather per-factor pyramid
    rows for the given (src, dst) photometric factor table straight from a
    ``mapping.map_state.MapState`` (VERDICT r2 next #7 — a mapper window can
    be handed to dist_ba without reshaping the map).

    Use with ``shard_factors`` + ``make_ba_step``; equivalence with the
    mapper's own window BA is covered by tests/test_parallel.py."""
    from ..mapping import factors as fct

    lvl = state.levels[level]
    src = jnp.asarray(src, jnp.int32)
    dst = jnp.asarray(dst, jnp.int32)
    return ShardedFactorData(
        src=src, dst=dst, active=jnp.asarray(active, bool),
        img0=fct.take_rows(lvl.img, src),
        img1=fct.take_rows(lvl.img, dst),
        prx0=fct.take_rows(lvl.prx0, src),
        jac0=jnp.transpose(fct.take_rows(lvl.jac, src), (0, 2, 3, 1)),
        std0=fct.take_rows(lvl.stdev, src),
        grad1=fct.take_rows(lvl.grad, dst),
    )
