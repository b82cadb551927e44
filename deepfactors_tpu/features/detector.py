"""Batched TPU feature detection: Harris-scored corners + oriented binary
descriptors.

TPU-native replacement for the reference's BRISK/ORB detectors
(sources/core/features/feature_detection.h:47-120). The reference uses
CPU BRISK (Harris-score scale-space + binary descriptor, uniformity radius,
max 400 keypoints); here detection is a jitted pipeline with STATIC keypoint
capacity and validity masks:

  Harris response (Sobel products + box filter, pure XLA convs)
  -> 3x3 non-max suppression (max-pool equality)
  -> top-K scores (lax.top_k)
  -> intensity-centroid orientation (ORB-style)
  -> rotated-BRIEF 256-bit descriptors packed into uint32[8]

Everything vectorizes over keyframes with vmap for batched detection.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import _conv2d_clamped, bilinear_sample

Array = jax.Array


class Features(NamedTuple):
    """Fixed-capacity keypoint set (mirror of df::Features,
    feature_detection.h:33-45)."""

    xy: Array           # [K, 2] float pixel coords (x, y)
    score: Array        # [K]
    angle: Array        # [K] radians
    descriptor: Array   # [K, 8] uint32 (256-bit binary)
    valid: Array        # [K] bool


class DetectorConfig(NamedTuple):
    max_keypoints: int = 400
    harris_k: float = 0.04
    nms_radius: int = 2
    border: int = 16           # keep descriptors inside the image
    score_threshold: float = 1e-7
    patch_radius: int = 15     # BRIEF pattern radius


def _brief_pattern(n_bits: int = 256, radius: int = 15, seed: int = 7):
    """Fixed Gaussian-distributed test-pair pattern (BRIEF-style)."""
    rng = np.random.RandomState(seed)
    sigma = radius / 2.5
    pts = np.clip(rng.randn(n_bits, 4) * sigma, -radius, radius)
    return jnp.asarray(pts.astype(np.float32))  # [256, 4] = (x1, y1, x2, y2)


_PATTERN = _brief_pattern()


def harris_response(img: Array, k: float = 0.04) -> Array:
    """Harris corner response via Sobel products + 3x3 box filter."""
    gx = _conv2d_clamped(img, jnp.array([[-1., 0., 1.], [-2., 0., 2.],
                                         [-1., 0., 1.]]) / 8.0)
    gy = _conv2d_clamped(img, jnp.array([[-1., -2., -1.], [0., 0., 0.],
                                         [1., 2., 1.]]) / 8.0)
    box = jnp.ones((3, 3), jnp.float32) / 9.0
    sxx = _conv2d_clamped(gx * gx, box)
    syy = _conv2d_clamped(gy * gy, box)
    sxy = _conv2d_clamped(gx * gy, box)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def _nms(score: Array, radius: int) -> Array:
    """Keep only local maxima within a (2r+1)^2 window."""
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return jnp.where(score >= pooled, score, -jnp.inf)


def _orientation(img: Array, xy: Array, radius: int = 7) -> Array:
    """Intensity-centroid orientation (ORB): theta = atan2(m01, m10)."""
    offs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx * dx + dy * dy <= radius * radius:
                offs.append((dx, dy))
    offs = jnp.asarray(np.asarray(offs, np.float32))  # [O, 2]
    pts = xy[:, None, :] + offs[None, :, :]           # [K, O, 2]
    vals = bilinear_sample(img, pts)                   # [K, O]
    m10 = jnp.sum(vals * offs[None, :, 0], axis=-1)
    m01 = jnp.sum(vals * offs[None, :, 1], axis=-1)
    return jnp.arctan2(m01, m10)


def _descriptors(img: Array, xy: Array, angle: Array) -> Array:
    """Rotated-BRIEF 256-bit descriptors packed into uint32 [K, 8]."""
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # [K]
    p = _PATTERN  # [256, 4]

    def rot(px, py):
        # [K, 256] rotated offsets
        return (
            ca[:, None] * px[None, :] - sa[:, None] * py[None, :],
            sa[:, None] * px[None, :] + ca[:, None] * py[None, :],
        )

    r1x, r1y = rot(p[:, 0], p[:, 1])
    r2x, r2y = rot(p[:, 2], p[:, 3])
    pts1 = jnp.stack([xy[:, None, 0] + r1x, xy[:, None, 1] + r1y], axis=-1)
    pts2 = jnp.stack([xy[:, None, 0] + r2x, xy[:, None, 1] + r2y], axis=-1)
    v1 = bilinear_sample(img, pts1)  # [K, 256]
    v2 = bilinear_sample(img, pts2)
    bits = (v1 < v2).astype(jnp.uint32)  # [K, 256]
    bits = bits.reshape(bits.shape[0], 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect(img: Array, cfg: DetectorConfig = DetectorConfig()) -> Features:
    """Detect up to cfg.max_keypoints oriented corners with descriptors."""
    H, W = img.shape
    score = harris_response(img, cfg.harris_k)
    # suppress borders
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    b = cfg.border
    inb = (xs >= b) & (xs < W - b) & (ys >= b) & (ys < H - b)
    score = jnp.where(inb, score, -jnp.inf)
    score = _nms(score, cfg.nms_radius)

    flat = score.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, cfg.max_keypoints)
    xy = jnp.stack(
        [(top_idx % W).astype(jnp.float32), (top_idx // W).astype(jnp.float32)],
        axis=-1,
    )
    valid = top_scores > cfg.score_threshold

    angle = _orientation(img, xy)
    desc = _descriptors(img, xy, angle)
    return Features(xy=xy, score=top_scores, angle=angle, descriptor=desc,
                    valid=valid)


def detect_batch(imgs: Array, cfg: DetectorConfig = DetectorConfig()) -> Features:
    """vmapped detection over a batch of images [B, H, W]."""
    return jax.vmap(lambda im: detect(im, cfg))(imgs)
