"""Image processing ops: bilinear sampling, Sobel gradients, Gaussian
blur-downsample, pyramid construction, squared error, depth materialization.

TPU-native equivalents of the reference CUDA kernels in
sources/cuda/cu_image_proc.cpp:
  - SobelGradients (cu_image_proc.cpp:57-112): canonical 3x3 Sobel, /8,
    clamped borders.
  - GaussianBlurDown (cu_image_proc.cpp:134-183): 5x5 binomial blur + 2x
    decimation with boundary renormalization (clamped taps, weight wall).
  - SquaredError (cu_image_proc.cpp:190-232).
  - UpdateDepth (cu_image_proc.cpp:248-278): dpt = ProxToDepth(prx0 + J·c).

Filters are expressed as unrolled shift-multiply-adds over static taps (XLA
fuses them into one VPU kernel; see _conv2d_clamped for why the conv
primitive is avoided); bilinear sampling is a vectorized gather, the memory
pattern that also backs the dense aligners.

Image layout: [H, W] float arrays; pixel coords (x, y), x along W.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import warping

Array = jax.Array


# ----------------------------------------------------------------------------
# Bilinear sampling (VisionCore Image2D::getBilinear equivalent)
# ----------------------------------------------------------------------------

def bilinear_sample(img: Array, pix: Array) -> Array:
    """Sample img [H, W] at float pixels pix [..., 2] (x, y).

    Uses floor-based bilinear interpolation like VisionCore's getBilinear.
    Out-of-range coords are clamped; callers mask validity separately.
    """
    H, W = img.shape[-2], img.shape[-1]
    x = pix[..., 0]
    y = pix[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    flat = img.reshape(img.shape[:-2] + (H * W,))
    take = lambda yy, xx: jnp.take(flat, yy * W + xx, axis=-1)
    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_sample_multi(imgs: Array, pix: Array) -> Array:
    """Sample C images [C, H, W] at the same pixels [..., 2] -> [..., C]."""
    out = jax.vmap(lambda im: bilinear_sample(im, pix))(imgs)
    return jnp.moveaxis(out, 0, -1)


def bilinear_sample_packed(img_chans: Array, pix: Array) -> Array:
    """Sample a channel-packed image [H, W, C] at pixels [..., 2] -> [..., C].

    One gather per bilinear corner for ALL channels (4 total instead of 4*C) —
    gathers break XLA fusion into separate kernels on TPU, so minimizing their
    count is the main lever for the dense-warp ops.
    """
    H, W, C = img_chans.shape
    x = pix[..., 0]
    y = pix[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    flat = img_chans.reshape(H * W, C)
    take = lambda yy, xx: jnp.take(flat, yy * W + xx, axis=0)
    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def pack_bilinear_quad(img_chans: Array) -> Array:
    """Precompute the 2x2 neighborhood pack: [H, W, C] -> [H, W, 4C] where
    quad[y, x] = (p[y,x], p[y,x+1], p[y+1,x], p[y+1,x+1]) with edge clamping.

    Trades 4x memory for a SINGLE gather per bilinear sample
    (``bilinear_sample_quad``) — on TPU each gather is a separate unfused
    kernel, so this quarters the fixed overhead of the dense-warp hot path.
    Loop-invariant for GN iterations (hoisted by XLA inside jitted loops).
    """
    right = jnp.concatenate([img_chans[:, 1:], img_chans[:, -1:]], axis=1)
    down = jnp.concatenate([img_chans[1:], img_chans[-1:]], axis=0)
    down_right = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return jnp.concatenate([img_chans, right, down, down_right], axis=-1)


def bilinear_sample_quad(quad: Array, pix: Array) -> Array:
    """Sample a quad-packed image [H, W, 4C] at pixels [..., 2] -> [..., C]
    with one gather (see ``pack_bilinear_quad``)."""
    H, W, C4 = quad.shape
    C = C4 // 4
    x = pix[..., 0]
    y = pix[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)

    flat = quad.reshape(H * W, C4)
    v = jnp.take(flat, y0i * W + x0i, axis=0)  # [..., 4C]
    v00, v01, v10, v11 = v[..., :C], v[..., C:2*C], v[..., 2*C:3*C], v[..., 3*C:]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_sample_grad(img: Array, pix: Array):
    """Sample img [H, W] at float pixels pix [..., 2] and return the EXACT
    gradient of the bilinear interpolant from the same corner values:
    (value, dI/dx, dI/dy). One gather (quad-packing inline) services all
    three — the XLA reference for the Pallas kernels' grad_mode='interp'
    (ops/pallas/sfm_kernel._band_sample_interp). Matches the kernel's edge
    convention: interpolation weights zeroed at the clamped last row/col."""
    H, W = img.shape[-2], img.shape[-1]
    quad = pack_bilinear_quad(img[..., None])  # [H, W, 4]
    x = pix[..., 0]
    y = pix[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = jnp.where(x0 >= W - 1, 0.0, x - x0)
    wy = jnp.where(y0 >= H - 1, 0.0, y - y0)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    flat = quad.reshape(H * W, 4)
    v = jnp.take(flat, y0i * W + x0i, axis=0)
    v00, v01, v10, v11 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    top = v00 + wx * (v01 - v00)
    bot = v10 + wx * (v11 - v10)
    val = top + wy * (bot - top)
    gx = (1 - wy) * (v01 - v00) + wy * (v11 - v10)
    gy = bot - top
    return val, gx, gy


# ----------------------------------------------------------------------------
# Sobel gradients (cu_image_proc.cpp:57-112)
# ----------------------------------------------------------------------------

_SOBEL_X = np.array(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=jnp.float32
)
_SOBEL_Y = np.array(
    [[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], dtype=jnp.float32
)


def _conv2d_clamped(img: Array, kernel: Array) -> Array:
    """2D correlation with clamped (edge-replicate) borders, [H, W] in/out.

    Implemented as an unrolled shift-multiply-add over the (small, static)
    kernel taps instead of lax.conv_general_dilated: single-channel tiny-
    kernel convs never ride the MXU anyway (XLA fuses the tap sum into one
    VPU kernel), and the conv primitive's first lowering through the axon
    tunnel measures minutes of one-time latency (environment pathology) —
    shifted adds lower instantly."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    H, W = img.shape
    padded = jnp.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    k = np.asarray(kernel)  # static taps; zero taps drop out of the graph
    out = jnp.zeros_like(img)
    for i in range(kh):
        for j in range(kw):
            if k[i, j] != 0.0:
                out = out + k[i, j] * jax.lax.slice(
                    padded, (i, j), (i + H, j + W))
    return out


def sobel_gradients(img: Array) -> Array:
    """[H, W] -> [H, W, 2] (dx, dy), divided by 8 like the reference."""
    gx = _conv2d_clamped(img, _SOBEL_X) / 8.0
    gy = _conv2d_clamped(img, _SOBEL_Y) / 8.0
    return jnp.stack([gx, gy], axis=-1)


# ----------------------------------------------------------------------------
# Gaussian blur + 2x downsample (cu_image_proc.cpp:134-183)
# ----------------------------------------------------------------------------

_GAUSS5 = np.array(
    [
        [1.0, 4.0, 6.0, 4.0, 1.0],
        [4.0, 16.0, 24.0, 16.0, 4.0],
        [6.0, 24.0, 36.0, 24.0, 6.0],
        [4.0, 16.0, 24.0, 16.0, 4.0],
        [1.0, 4.0, 6.0, 4.0, 1.0],
    ],
    dtype=np.float32,
)


def gaussian_blur_down(img: Array) -> Array:
    """[H, W] -> [H//2, W//2]: 5x5 binomial blur at even pixels with clamped
    taps; reference renormalizes by the sum of kernel weights ('wall') which
    is constant under clamping, so /256.

    Unrolled strided shift-adds instead of a strided conv primitive (see
    _conv2d_clamped for why); the binomial kernel is separable so this is
    two passes of 5 taps each."""
    Ho, Wo = img.shape[0] // 2, img.shape[1] // 2
    # output pixel (x,y) taps input at 2x+px-2, 2y+py-2 for px,py in [0,5)
    padded = jnp.pad(img, ((2, 2), (2, 2)), mode="edge")
    w = (1.0, 4.0, 6.0, 4.0, 1.0)
    H2 = padded.shape[0]
    # vertical pass strided in y: rows 2y+i, all columns
    rows = jnp.zeros((Ho, padded.shape[1]), img.dtype)
    for i, wi in enumerate(w):
        rows = rows + wi * jax.lax.slice(
            padded, (i, 0), (i + 2 * Ho, padded.shape[1]), (2, 1))
    # horizontal pass strided in x
    out = jnp.zeros((Ho, Wo), img.dtype)
    for j, wj in enumerate(w):
        out = out + wj * jax.lax.slice(
            rows, (0, j), (Ho, j + 2 * Wo), (1, 2))
    return out / 256.0


def build_pyramid(img: Array, levels: int):
    """Image pyramid [finest..coarsest] via gaussian_blur_down, matching the
    reference's Frame::FillPyramids (frame.h:80-94)."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(gaussian_blur_down(pyr[-1]))
    return pyr


def build_gradient_pyramid(img_pyr):
    return [sobel_gradients(im) for im in img_pyr]


# ----------------------------------------------------------------------------
# Squared error (cu_image_proc.cpp:190-232)
# ----------------------------------------------------------------------------

def squared_error(a: Array, b: Array) -> Array:
    d = a - b
    return jnp.sum(d * d)


# ----------------------------------------------------------------------------
# UpdateDepth: code -> depth materialization (cu_image_proc.cpp:248-278)
# ----------------------------------------------------------------------------

def update_depth(code: Array, prx_orig: Array, prx_jac: Array, avg_dpt) -> Array:
    """dpt[y,x] = ProxToDepth(prx_orig[y,x] + prx_jac[y,x,:]·code, avg_dpt).

    prx_jac is stored [H, W, CS] (the reference packs it as a W*CS x H image,
    keyframe.h:92 — here it is a dense tensor that maps to one MXU matmul).
    """
    prx = prx_orig + jnp.einsum(
        "hwc,c->hw", prx_jac, code, preferred_element_type=jnp.float32
    )
    return warping.prox_to_depth(jnp.clip(prx, 1e-4, None), avg_dpt)
