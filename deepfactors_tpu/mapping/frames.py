"""One-way frame storage (SoA, fixed capacity).

Equivalent of the reference's Frame (frame.h:35-120): image+gradient pyramids
and an auxiliary SE(3) pose variable, used as photometric targets between
keyframes and later marginalized (mapper.cpp:395-436).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3

Array = jax.Array


class FrameLevel(NamedTuple):
    img: Array   # [F, H, W]
    grad: Array  # [F, H, W, 2]


class FrameStore(NamedTuple):
    active: Array        # [F] bool — holds data & a live pose variable
    marginalized: Array  # [F] bool
    ids: Array           # [F] int32
    pose: SE3            # [F]
    levels: tuple        # tuple[FrameLevel]
    next_id: Array


def create(F: int, H: int, W: int, num_levels: int) -> FrameStore:
    levels = []
    for l in range(num_levels):
        h, w = H >> l, W >> l
        levels.append(
            FrameLevel(
                img=jnp.zeros((F, h, w), jnp.float32),
                grad=jnp.zeros((F, h, w, 2), jnp.float32),
            )
        )
    return FrameStore(
        active=jnp.zeros((F,), bool),
        marginalized=jnp.zeros((F,), bool),
        ids=jnp.full((F,), -1, jnp.int32),
        pose=se3m.identity((F,)),
        levels=tuple(levels),
        next_id=jnp.asarray(0, jnp.int32),
    )


def add_frame(
    store: FrameStore,
    slot: int,
    pose: SE3,
    img_pyr: Sequence[Array],
    grad_pyr: Sequence[Array],
) -> FrameStore:
    new_levels = tuple(
        FrameLevel(
            img=lvl.img.at[slot].set(img_pyr[l]),
            grad=lvl.grad.at[slot].set(grad_pyr[l]),
        )
        for l, lvl in enumerate(store.levels)
    )
    return store._replace(
        active=store.active.at[slot].set(True),
        marginalized=store.marginalized.at[slot].set(False),
        ids=store.ids.at[slot].set(store.next_id),
        pose=SE3(store.pose.q.at[slot].set(pose.q), store.pose.t.at[slot].set(pose.t)),
        levels=new_levels,
        next_id=store.next_id + 1,
    )
