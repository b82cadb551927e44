"""Marginal priors: information-preserving frame marginalization.

The reference marginalizes one-way frames out of ISAM2 with
``marginalizeLeaves`` (mapper.cpp:395-436), which folds the frame's
information into the remaining variables. The sliding-window equivalent here:
when a frame is marginalized, its photometric factor is linearized once more
at the current estimate, the frame-pose block is eliminated by Schur
complement, and the resulting quadratic prior over the connected keyframe's
(pose, code) — anchored at the current estimate — is accumulated into a
per-keyframe marginal-prior store that the mapping iteration adds to the
global system.

Prior model per keyframe k (D = 6 + CS):
    E(x) = 0.5 * r^T H r + b^T r,  r = [local(anchor_pose, pose); code - anchor_code]
contributing H to the Hessian block and (H r + b) to the gradient.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3

Array = jax.Array


class MarginalStore(NamedTuple):
    H: Array         # [K, D, D]
    b: Array         # [K, D]
    anchor_q: Array  # [K, 4]
    anchor_t: Array  # [K, 3]
    anchor_c: Array  # [K, CS]
    active: Array    # [K] bool


def create(K: int, CS: int) -> MarginalStore:
    D = 6 + CS
    ident = se3m.identity((K,))
    return MarginalStore(
        H=jnp.zeros((K, D, D), jnp.float32),
        b=jnp.zeros((K, D), jnp.float32),
        anchor_q=ident.q,
        anchor_t=ident.t,
        anchor_c=jnp.zeros((K, CS), jnp.float32),
        active=jnp.zeros((K,), bool),
    )


def schur_marginalize_frame(JtJ: Array, Jtr: Array, CS: int, damping=1e-6):
    """Eliminate the frame-pose block from a photometric factor system.

    Factor layout [pose_kf(6) | pose_frame(6) | code_kf(CS)]
    (ops/dense_sfm.sfm_step). Returns (H_kk [6+CS, 6+CS], b_k [6+CS]) over
    the keyframe's (pose, code)."""
    keep = jnp.concatenate([jnp.arange(6), 12 + jnp.arange(CS)])
    elim = 6 + jnp.arange(6)
    Hkk = JtJ[jnp.ix_(keep, keep)]
    Hke = JtJ[jnp.ix_(keep, elim)]
    Hee = JtJ[jnp.ix_(elim, elim)] + damping * jnp.eye(6)
    bk = Jtr[keep]
    be = Jtr[elim]
    Hee_inv = jnp.linalg.inv(Hee)
    H_marg = Hkk - Hke @ Hee_inv @ Hke.T
    b_marg = bk - Hke @ Hee_inv @ be
    # f32 roundoff on an ill-conditioned frame block can push the Schur
    # complement slightly indefinite — project back to PSD (the reference's
    # NearestPsd hardening, nearest_psd.h:28-99)
    from ..solver.nearest_psd import clip_eigenvalues

    return clip_eigenvalues(H_marg), b_marg


def clear(store: MarginalStore, slot) -> MarginalStore:
    """Drop the marginal prior of an evicted slot (its information referenced
    only the evicted variable)."""
    D = store.H.shape[-1]
    return store._replace(
        H=store.H.at[slot].set(jnp.zeros((D, D), store.H.dtype)),
        b=store.b.at[slot].set(jnp.zeros((D,), store.b.dtype)),
        active=store.active.at[slot].set(False),
    )


def add_prior(store: MarginalStore, slot, H: Array, b: Array,
              pose: SE3, code: Array) -> MarginalStore:
    """Accumulate a marginal prior for keyframe ``slot`` anchored at the
    current (pose, code).

    An existing prior at an older anchor is re-anchored first: its gradient
    is transported to the new linearization point (b_old' = H_old·r + b_old
    with r the old-anchor residual at the new anchor; H kept — the standard
    relinearization-free prior shift). Without the transport, summed priors
    act at inconsistent anchors and drag the variable."""
    old_anchor = SE3(store.anchor_q[slot], store.anchor_t[slot])
    r_pose = se3m.local(old_anchor, pose)
    r_code = code - store.anchor_c[slot]
    r = jnp.concatenate([r_pose, r_code])
    w = store.active[slot].astype(store.b.dtype)
    b_shift = w * (store.H[slot] @ r)
    return MarginalStore(
        H=store.H.at[slot].add(H),
        b=store.b.at[slot].add(b + b_shift),
        anchor_q=store.anchor_q.at[slot].set(pose.q),
        anchor_t=store.anchor_t.at[slot].set(pose.t),
        anchor_c=store.anchor_c.at[slot].set(code),
        active=store.active.at[slot].set(True),
    )


def add_prior_masked(store: MarginalStore, slot, H: Array, b: Array,
                     pose: SE3, code: Array, on: Array) -> MarginalStore:
    """``add_prior`` gated by a traced boolean ``on`` — identity when off.
    Lets batched marginalization (padded neighbor slots) run with static
    shapes without corrupting slot 0's anchors."""
    upd = add_prior(store, slot, H, b, pose, code)
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(on, new, old), upd, store
    )


def prior_terms(store: MarginalStore, poses: SE3, codes: Array):
    """Batched prior contributions at the current estimate.

    Returns (H [K, D, D], g [K, D]) where g = H r + b with
    r = [local(anchor, pose); code - anchor_code]; inactive slots contribute
    zero."""
    anchors = SE3(store.anchor_q, store.anchor_t)
    r_pose = jax.vmap(se3m.local)(anchors, poses)         # [K, 6]
    r_code = codes - store.anchor_c                        # [K, CS]
    r = jnp.concatenate([r_pose, r_code], axis=-1)         # [K, D]
    g = jnp.einsum("kij,kj->ki", store.H, r) + store.b
    w = store.active.astype(jnp.float32)
    return store.H * w[:, None, None], g * w[:, None]
