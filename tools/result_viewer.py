#!/usr/bin/env python
"""result_viewer — headless inspection of a run directory
(reference sources/tools/result_viewer.cpp: GT trajectory/depth reprojection
viewer; here: trajectory plot, per-keyframe depth colormaps, point-cloud PLY
reconstruction from the saved keyframes).

Usage: python tools/result_viewer.py <run_dir> [--out dir]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv):
    from deepfactors_tpu.config import parse_args
    from deepfactors_tpu.utils import tum_io
    from deepfactors_tpu.viz import apply_colormap, plot_trajectory, save_ply

    flags = parse_args(argv)
    pos = flags.get("__positional__", [])
    if not pos:
        print("usage: result_viewer.py <run_dir>")
        return 1
    run_dir = pos[0]
    out = flags.get("out", os.path.join(run_dir, "viewer"))
    os.makedirs(out, exist_ok=True)

    traj_file = os.path.join(run_dir, "trajectory.txt")
    if os.path.exists(traj_file):
        traj = tum_io.load_trajectory(traj_file)
        plot_trajectory(os.path.join(out, "trajectory.png"), traj)
        print(f"trajectory: {len(traj)} poses -> trajectory.png")

    intr = os.path.join(run_dir, "intrinsics.txt")
    fx = fy = u0 = v0 = None
    if os.path.exists(intr):
        fx, fy, u0, v0 = np.loadtxt(intr)[:4]

    import cv2

    all_xyz, all_rgb = [], []
    for dpt_file in sorted(glob.glob(os.path.join(run_dir, "kf_*_dpt.png"))):
        kid = os.path.basename(dpt_file).split("_")[1]
        dpt = cv2.imread(dpt_file, cv2.IMREAD_ANYDEPTH).astype(np.float32) / 5000.0
        cv2.imwrite(os.path.join(out, f"kf_{kid}_depth_color.png"),
                    apply_colormap(dpt)[..., ::-1])
        img_file = os.path.join(run_dir, f"kf_{kid}_img.png")
        if fx is not None and os.path.exists(img_file):
            img = cv2.imread(img_file, cv2.IMREAD_GRAYSCALE)
            H, W = dpt.shape
            ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
            z = dpt
            keep = (z > 0.05).reshape(-1)
            pts = np.stack([(xs - u0) / fx * z, (ys - v0) / fy * z, z],
                           axis=-1).reshape(-1, 3)[keep]
            rgb = np.stack([img] * 3, axis=-1).reshape(-1, 3)[keep]
            all_xyz.append(pts)
            all_rgb.append(rgb)
    if all_xyz:
        save_ply(os.path.join(out, "map.ply"),
                 np.concatenate(all_xyz), np.concatenate(all_rgb))
        print(f"point cloud: {sum(len(x) for x in all_xyz)} pts -> map.ply")
    print(f"viewer output in {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
