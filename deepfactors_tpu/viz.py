"""Headless visualization + export.

Replaces the reference's Pangolin GUI (sources/gui/: surfel keyframe renderer
drawkf.geom, live/residual views, plots) with headless equivalents suitable
for a TPU host: colored point-cloud export (PLY) with the same
stdev/validity/crop filtering the geometry shader applies
(shaders/drawkf.geom:1-186), depth colormaps, image mosaics
(display_utils.h equivalents) and trajectory plots.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax

from .geometry import se3 as se3m
from .geometry.se3 import SE3
from .geometry.camera import PinholeCamera

Array = jax.Array


def keyframe_pointcloud(
    img: np.ndarray,      # [H, W] gray or [H, W, 3]
    dpt: np.ndarray,      # [H, W]
    pose_wk: SE3,
    cam: PinholeCamera,
    stdev: Optional[np.ndarray] = None,
    vld: Optional[np.ndarray] = None,
    stdev_thresh: float = 0.15,   # drawkf.geom stdev filter
    crop_pix: int = 2,            # border crop
    max_depth: float = 10.0,
):
    """World-space colored points from one keyframe, filtered like the
    reference surfel shader. Returns (xyz [N,3], rgb [N,3] uint8)."""
    H, W = dpt.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    fx, fy = float(cam.fx), float(cam.fy)
    u0, v0 = float(cam.u0), float(cam.v0)
    z = dpt
    x = (xs - u0) / fx * z
    y = (ys - v0) / fy * z
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)

    keep = (z > 0) & (z < max_depth)
    keep &= (xs >= crop_pix) & (xs < W - crop_pix)
    keep &= (ys >= crop_pix) & (ys < H - crop_pix)
    if stdev is not None:
        keep &= np.exp(stdev) * np.sqrt(2.0) < stdev_thresh * z
    if vld is not None:
        keep &= vld > 0.5
    keep = keep.reshape(-1)

    R = np.asarray(jax.device_get(se3m.quat_to_matrix(pose_wk.q)))
    t = np.asarray(jax.device_get(pose_wk.t))
    xyz = pts[keep] @ R.T + t

    if img.ndim == 2:
        rgb = np.stack([img] * 3, axis=-1)
    else:
        rgb = img
    if rgb.dtype != np.uint8:
        rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    rgb = rgb.reshape(-1, 3)[keep]
    return xyz, rgb


def save_ply(path: str, xyz: np.ndarray, rgb: np.ndarray):
    """ASCII PLY point cloud."""
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(xyz)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(xyz, rgb):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{c[0]} {c[1]} {c[2]}\n")


def export_map_ply(path: str, mapper, cam: PinholeCamera, level: int = 0):
    """Export the whole keyframe map as one PLY (the GUI's map view)."""
    st = mapper.state
    act = np.asarray(jax.device_get(st.active))
    all_xyz, all_rgb = [], []
    lvl_cam = cam.level(level)
    for s in mapper.kf_slots:
        if not act[s]:
            continue
        xyz, rgb = keyframe_pointcloud(
            np.asarray(jax.device_get(st.levels[level].img[s])),
            np.asarray(jax.device_get(st.levels[level].dpt[s])),
            se3m.index(st.pose, s),
            lvl_cam,
            stdev=np.asarray(jax.device_get(st.levels[level].stdev[s])),
            vld=np.asarray(jax.device_get(st.levels[level].vld[s])),
        )
        all_xyz.append(xyz)
        all_rgb.append(rgb)
    if all_xyz:
        save_ply(path, np.concatenate(all_xyz), np.concatenate(all_rgb))
    return sum(len(x) for x in all_xyz)


def export_error_mosaics(path: str, mapper, cam, level: int = 0):
    """Per-factor photometric error images as one mosaic png (the debug
    error-image dumps of the reference, mapper.cpp:647-795): for every
    active kf->kf factor, |img0 − warp(img1)| masked by warp validity."""
    import cv2
    import jax
    import jax.numpy as jnp

    from .geometry import se3 as se3m, warping as wp
    from .geometry.camera import camera_pyramid
    from .mapping import map_state as ms
    from .ops import image as ip

    state = ms.update_depth_all(mapper.state, mapper.cfg.avg_dpt)
    cams = camera_pyramid(cam, mapper.cfg.pyramid_levels)
    pool = mapper.sched.photo_pool
    lvl = state.levels[level]
    H, W = lvl.img.shape[1:]
    pix = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                 jnp.arange(H, dtype=jnp.float32)),
                    -1).reshape(-1, 2)

    tiles, labels = [], []
    for i in range(mapper.cfg.max_factors):
        if not pool.active[i] or pool.dst_is_frame[i]:
            continue
        s, d = int(pool.src[i]), int(pool.dst[i])
        pose_10 = se3m.mul(se3m.inverse(se3m.index(state.pose, d)),
                           se3m.index(state.pose, s))
        corr = wp.find_correspondence(pix, lvl.dpt[s].reshape(-1), cams[level],
                                      pose_10, border=1)
        samp = ip.bilinear_sample(lvl.img[d], corr.pix1).reshape(H, W)
        err = jnp.abs(lvl.img[s] - samp) * corr.valid.reshape(H, W)
        tiles.append(np.asarray(jax.device_get(err)))
        labels.append(f"{s}->{d}")
    if not tiles:
        return None
    vmax = max(1e-6, max(float(t.max()) for t in tiles))
    colored = [apply_colormap(t, vmin=0.0, vmax=vmax) for t in tiles]
    cols = int(np.ceil(np.sqrt(len(colored))))
    rows = int(np.ceil(len(colored) / cols))
    mosaic = create_mosaic(colored, rows, cols)
    cv2.imwrite(path, mosaic[..., ::-1])  # RGB -> BGR for cv2
    return labels


def apply_colormap(img: np.ndarray, vmin=None, vmax=None) -> np.ndarray:
    """Turbo-ish depth colormap -> [H, W, 3] uint8 (display_utils
    apply_colormap equivalent)."""
    import matplotlib

    vmin = np.nanmin(img) if vmin is None else vmin
    vmax = np.nanmax(img) if vmax is None else vmax
    norm = np.clip((img - vmin) / max(vmax - vmin, 1e-9), 0, 1)
    cmap = matplotlib.colormaps["turbo"]
    return (cmap(norm)[..., :3] * 255).astype(np.uint8)


def create_mosaic(images, rows: int, cols: int) -> np.ndarray:
    """Tile images into a grid (display_utils CreateMosaic equivalent)."""
    imgs = [np.asarray(im) for im in images]
    h = max(im.shape[0] for im in imgs)
    w = max(im.shape[1] for im in imgs)

    def norm(im):
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        if im.dtype != np.uint8:
            im = (np.clip(im, 0, 1) * 255).astype(np.uint8)
        out = np.zeros((h, w, 3), np.uint8)
        out[: im.shape[0], : im.shape[1]] = im
        return out

    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(imgs[: rows * cols]):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = norm(im)
    return grid


def plot_trajectory(path: str, trajectory, gt=None):
    """Top-down (x, z) trajectory plot saved as PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    P = np.stack([np.asarray(jax.device_get(p.t)) for _, p in trajectory])
    ax.plot(P[:, 0], P[:, 2], "b-", label="estimate")
    if gt is not None:
        G = np.stack([np.asarray(jax.device_get(p.t)) for _, p in gt])
        ax.plot(G[:, 0], G[:, 2], "g--", label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
