"""Struct-of-arrays keyframe map with fixed capacity and active masks.

TPU-native redesign of the reference's pointer-based Map/FrameGraph/Keyframe
(sources/core/mapping/keyframe_map.h:31-129, keyframe.h:33-97, frame.h:35-120):
all keyframe state lives in dense [K, ...] tensors (one pytree), so mapping
steps jit once, factors batch with vmap/gather, and the map shards across
devices by the keyframe axis. Links are an index table instead of adjacency
lists. Shapes are static; "allocation" flips an active flag.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry import warping as wp
from ..ops import image as ip

Array = jax.Array


class LevelData(NamedTuple):
    """Per-pyramid-level keyframe tensors, each [K, H_l, W_l, ...]."""

    img: Array    # [K, H, W]
    grad: Array   # [K, H, W, 2]
    prx0: Array   # [K, H, W] zero-code proximity (pyr_prx_orig)
    # code jacobian (pyr_jac), stored FEATURE-MAJOR [K, CS, H, W]: the fused
    # SfM kernel reads (CS, 8, 128) blocks directly and the [N, CS] layout
    # would pad CS to 128 lanes in every kernel/matmul touching it
    jac: Array    # [K, CS, H, W]
    stdev: Array  # [K, H, W] log-b uncertainty
    dpt: Array    # [K, H, W] materialized depth (pyr_dpt)
    vld: Array    # [K, H, W] validity (pyr_vld)


class MapState(NamedTuple):
    """The keyframe map. Capacity K static; ``active`` masks live slots."""

    active: Array   # [K] bool
    ids: Array      # [K] int32 assigned keyframe id (IndexedMap equivalent)
    pose: SE3       # q [K, 4], t [K, 3] — camera-to-world
    code: Array     # [K, CS]
    levels: tuple   # tuple[LevelData], finest first
    # undirected link table (keyframe_map.h links), stored directed per slot
    link_src: Array     # [Lmax] int32 slot index
    link_dst: Array     # [Lmax] int32 slot index
    link_active: Array  # [Lmax] bool
    next_id: Array      # [] int32
    # sparse features (Frame::features, frame.h:104) — fixed capacity per kf
    kp_xy: Array       # [K, Kp, 2]
    kp_desc: Array     # [K, Kp, 8] uint32
    kp_valid: Array    # [K, Kp] bool
    # level-0 depth gradient for the geometric factor (keyframe.h dpt_grad)
    dpt_grad: Array    # [K, H, W, 2]


def create(K: int, CS: int, H: int, W: int, num_levels: int, max_links: int,
           max_keypoints: int = 0) -> MapState:
    levels = []
    for l in range(num_levels):
        h, w = H >> l, W >> l
        levels.append(
            LevelData(
                img=jnp.zeros((K, h, w), jnp.float32),
                grad=jnp.zeros((K, h, w, 2), jnp.float32),
                prx0=jnp.zeros((K, h, w), jnp.float32),
                jac=jnp.zeros((K, CS, h, w), jnp.float32),
                stdev=jnp.zeros((K, h, w), jnp.float32),
                dpt=jnp.ones((K, h, w), jnp.float32),
                vld=jnp.zeros((K, h, w), jnp.float32),
            )
        )
    return MapState(
        active=jnp.zeros((K,), bool),
        ids=jnp.full((K,), -1, jnp.int32),
        pose=se3m.identity((K,)),
        code=jnp.zeros((K, CS), jnp.float32),
        levels=tuple(levels),
        link_src=jnp.zeros((max_links,), jnp.int32),
        link_dst=jnp.zeros((max_links,), jnp.int32),
        link_active=jnp.zeros((max_links,), bool),
        next_id=jnp.asarray(0, jnp.int32),
        kp_xy=jnp.zeros((K, max_keypoints, 2), jnp.float32),
        kp_desc=jnp.zeros((K, max_keypoints, 8), jnp.uint32),
        kp_valid=jnp.zeros((K, max_keypoints), bool),
        dpt_grad=jnp.zeros((K, H, W, 2), jnp.float32),
    )


def num_keyframes(state: MapState) -> Array:
    return jnp.sum(state.active.astype(jnp.int32))


def add_keyframe(
    state: MapState,
    slot: int,
    pose: SE3,
    code: Array,
    img_pyr: Sequence[Array],
    grad_pyr: Sequence[Array],
    prx0_pyr: Sequence[Array],
    jac_pyr: Sequence[Array],
    stdev_pyr: Sequence[Array],
    avg_dpt: float,
    features=None,
) -> MapState:
    """Write a decoded keyframe into slot (Mapper::BuildKeyframe equivalent,
    mapper.cpp:919-1007 — pyramids come from the decoder + image ops; depth is
    materialized immediately like the UpdateDepth calls at mapper.cpp:984-991,
    and the depth gradient for the geometric factor like mapper.cpp dpt-grad)."""
    new_levels = []
    dpt0_fine = None
    for l, lvl in enumerate(state.levels):
        dpt = ip.update_depth(code, prx0_pyr[l], jac_pyr[l], avg_dpt)
        if l == 0:
            dpt0_fine = dpt
        new_levels.append(
            LevelData(
                img=lvl.img.at[slot].set(img_pyr[l]),
                grad=lvl.grad.at[slot].set(grad_pyr[l]),
                prx0=lvl.prx0.at[slot].set(prx0_pyr[l]),
                jac=lvl.jac.at[slot].set(jnp.transpose(jac_pyr[l], (2, 0, 1))),
                stdev=lvl.stdev.at[slot].set(stdev_pyr[l]),
                dpt=lvl.dpt.at[slot].set(dpt),
                vld=lvl.vld.at[slot].set(jnp.ones_like(dpt)),
            )
        )
    state = state._replace(
        dpt_grad=state.dpt_grad.at[slot].set(ip.sobel_gradients(dpt0_fine))
    )
    if features is not None:
        state = state._replace(
            kp_xy=state.kp_xy.at[slot].set(features.xy),
            kp_desc=state.kp_desc.at[slot].set(features.descriptor),
            kp_valid=state.kp_valid.at[slot].set(features.valid),
        )
    return state._replace(
        active=state.active.at[slot].set(True),
        ids=state.ids.at[slot].set(state.next_id),
        pose=SE3(
            state.pose.q.at[slot].set(pose.q), state.pose.t.at[slot].set(pose.t)
        ),
        code=state.code.at[slot].set(code),
        levels=tuple(new_levels),
        next_id=state.next_id + 1,
    )


def update_depth_all(state: MapState, avg_dpt: float) -> MapState:
    """Re-materialize depth pyramids from current codes for ALL active
    keyframes (the UpdateMap writeback, mapper.cpp:859-899) — one batched
    einsum per level instead of per-keyframe kernel launches."""
    new_levels = []
    for lvl in state.levels:
        prx = lvl.prx0 + jnp.einsum(
            "kchw,kc->khw", lvl.jac, state.code, preferred_element_type=jnp.float32
        )
        # clamp: keeps depth finite on empty slots (prx0=0) so one-hot
        # pool gathers (factors.take_rows) stay NaN-free
        dpt = wp.prox_to_depth(jnp.clip(prx, 1e-4, None), avg_dpt)
        new_levels.append(lvl._replace(dpt=dpt))
    return state._replace(levels=tuple(new_levels))


def add_link(state: MapState, link_idx: int, src: Array, dst: Array) -> MapState:
    return state._replace(
        link_src=state.link_src.at[link_idx].set(src),
        link_dst=state.link_dst.at[link_idx].set(dst),
        link_active=state.link_active.at[link_idx].set(True),
    )


def remove_link(state: MapState, link_idx: int) -> MapState:
    return state._replace(
        link_active=state.link_active.at[link_idx].set(False)
    )


def poses_of(state: MapState, slots: Array) -> SE3:
    return SE3(state.pose.q[slots], state.pose.t[slots])
