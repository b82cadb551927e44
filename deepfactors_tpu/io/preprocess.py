"""Frame preprocessing: undistort + remap to the network's trained camera.

Reimplements the reference's PreprocessImage (deepfactors.cpp:634-680),
which builds a cv::initUndistortRectifyMap from the source camera to the
network's trained intrinsics/resolution once and cv::remaps every frame.
Host-side numpy on purpose — this sits on the camera-IO path in front of
the device pipeline (SURVEY.md §7.2 step 8).

Distortion model: OpenCV plumb_bob (k1, k2, p1, p2, k3). The map is built
output→input: each network pixel is lifted through K_net⁻¹, distorted, and
projected through K_src — exactly initUndistortRectifyMap's convention with
R = I and newCameraMatrix = K_net.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np


class SourceCamera(NamedTuple):
    fx: float
    fy: float
    u0: float
    v0: float
    width: int
    height: int
    dist: Optional[Sequence[float]] = None  # (k1, k2, p1, p2[, k3])


def build_remap(src: SourceCamera, fx: float, fy: float, u0: float,
                v0: float, width: int, height: int):
    """Precompute the (map_x, map_y) sampling grid from the trained camera
    (fx, fy, u0, v0, width, height) back into source pixels."""
    xs, ys = np.meshgrid(np.arange(width, dtype=np.float64),
                         np.arange(height, dtype=np.float64))
    # normalized rays through the trained camera
    x = (xs - u0) / fx
    y = (ys - v0) / fy
    if src.dist is not None and np.any(np.asarray(src.dist) != 0):
        d = list(src.dist) + [0.0] * (5 - len(src.dist))
        k1, k2, p1, p2, k3 = d[:5]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x, y = xd, yd
    map_x = (src.fx * x + src.u0).astype(np.float32)
    map_y = (src.fy * y + src.v0).astype(np.float32)
    return map_x, map_y


def remap_bilinear(img: np.ndarray, map_x: np.ndarray,
                   map_y: np.ndarray) -> np.ndarray:
    """Sample ``img`` at (map_y, map_x) with bilinear interpolation and
    border clamp (cv::remap BORDER_REPLICATE semantics on the IO path)."""
    try:
        import cv2

        return cv2.remap(img.astype(np.float32), map_x, map_y,
                         interpolation=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REPLICATE)
    except ImportError:
        pass
    H, W = img.shape[:2]
    x0 = np.clip(np.floor(map_x).astype(np.int32), 0, W - 1)
    y0 = np.clip(np.floor(map_y).astype(np.int32), 0, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = np.clip(map_x - x0, 0.0, 1.0)
    wy = np.clip(map_y - y0, 0.0, 1.0)
    img = img.astype(np.float32)
    top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
    bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def to_gray_float(img: np.ndarray) -> np.ndarray:
    """BGR/RGB uint8 or float image -> grayscale float32 in [0, 1]
    (deepfactors.cpp:648-655)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    if img.ndim == 3:
        img = img @ np.asarray([0.114, 0.587, 0.299], np.float32)  # BGR
    return img.astype(np.float32)
