"""Binary descriptor matching + 8-point RANSAC, batched for TPU.

Replaces the reference's BFMatcher/Hamming + OpenGV CentralRelativePose
RANSAC (sources/core/features/matching.cpp:25-128). Everything is
fixed-capacity + masked:

  - Hamming distances: XOR + popcount over uint32 words, full [K0, K1]
    distance matrix in one fused op.
  - Matching: nearest neighbor with Lowe-style threshold cut
    (PruneMatchesByThreshold, matching.cpp:29-37 keeps matches with
    distance <= max_dist after sorting).
  - PruneMatchesEightPoint (matching.cpp:75-128): hypothesize-and-verify
    RANSAC on bearing vectors; hypotheses are a vmapped batch of 8-point
    essential-matrix solves (batched SVD), inliers scored by angular
    epipolar error like OpenGV's CentralRelativePoseSacProblem.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import PinholeCamera

Array = jax.Array


class Matches(NamedTuple):
    idx0: Array    # [M] index into features0
    idx1: Array    # [M] index into features1
    dist: Array    # [M] hamming distance
    valid: Array   # [M] bool


def popcount32(x: Array) -> Array:
    """Vectorized popcount for uint32."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_matrix(desc0: Array, desc1: Array) -> Array:
    """[K0, 8] x [K1, 8] uint32 -> [K0, K1] int32 Hamming distances."""
    x = jnp.bitwise_xor(desc0[:, None, :], desc1[None, :, :])
    return jnp.sum(popcount32(x), axis=-1)


def match(
    desc0: Array, valid0: Array, desc1: Array, valid1: Array,
    max_dist: int = 64,
) -> Matches:
    """Nearest-neighbour match 0->1 with distance threshold. Returns one
    candidate per query keypoint (masked)."""
    D = hamming_matrix(desc0, desc1)
    big = jnp.int32(1 << 30)
    D = jnp.where(valid1[None, :], D, big)
    best = jnp.argmin(D, axis=1)
    bestd = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    ok = valid0 & (bestd <= max_dist)
    return Matches(
        idx0=jnp.arange(desc0.shape[0], dtype=jnp.int32),
        idx1=best.astype(jnp.int32),
        dist=bestd,
        valid=ok,
    )


def bearing_vectors(cam: PinholeCamera, xy: Array) -> Array:
    """Pixels [..., 2] -> normalized bearing vectors [..., 3]
    (matching.cpp:39-58)."""
    x = (xy[..., 0] - cam.u0) / cam.fx
    y = (xy[..., 1] - cam.v0) / cam.fy
    v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _essential_from_8(b0: Array, b1: Array) -> Array:
    """8-point essential matrix from bearing pairs [8, 3] each. Returns
    [3, 3] (nullspace of the epipolar constraint via SVD)."""
    A = (b1[:, :, None] * b0[:, None, :]).reshape(8, 9)  # rows: kron(b1, b0)
    # TPU SVD is an iterative device loop — non-finite input (garbage
    # keypoints in padded slots) can spin it forever and wedge the chip
    A = jnp.where(jnp.isfinite(A), A, 0.0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    # project onto the essential manifold (two equal singular values)
    u, s, vt2 = jnp.linalg.svd(E)
    s_fixed = jnp.array([1.0, 1.0, 0.0], E.dtype)
    return (u * s_fixed[None, :]) @ vt2


def _epipolar_error(E: Array, b0: Array, b1: Array) -> Array:
    """Squared 'angular' epipolar residual per correspondence [N]."""
    Eb0 = b0 @ E.T       # [N, 3]
    Etb1 = b1 @ E        # [N, 3]
    x = jnp.sum(b1 * Eb0, axis=-1)
    # Sampson-like normalization on the bearing sphere
    denom = (
        Eb0[:, 0] ** 2 + Eb0[:, 1] ** 2 + Etb1[:, 0] ** 2 + Etb1[:, 1] ** 2
    )
    return (x * x) / jnp.maximum(denom, 1e-12)


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def prune_matches_eight_point(
    xy0: Array,          # [M, 2] matched pixels in frame 0
    xy1: Array,          # [M, 2] matched pixels in frame 1
    valid: Array,        # [M]
    cam: PinholeCamera,
    key: Array,
    threshold: float = 1e-4,
    max_iterations: int = 256,
) -> Array:
    """RANSAC inlier mask [M] (PruneMatchesEightPoint semantics). All
    hypotheses are solved as one batched SVD — hypothesize-and-verify in a
    single fused dispatch instead of OpenGV's sequential loop."""
    M = xy0.shape[0]
    b0 = bearing_vectors(cam, xy0)
    b1 = bearing_vectors(cam, xy1)

    # sample hypothesis index sets, restricted to valid matches
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits, shape=(max_iterations, 8))

    Es = jax.vmap(lambda i: _essential_from_8(b0[i], b1[i]))(idx)  # [I, 3, 3]
    errs = jax.vmap(lambda E: _epipolar_error(E, b0, b1))(Es)      # [I, M]
    inl = (errs < threshold) & valid[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    return inl[best]
