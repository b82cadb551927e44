#!/usr/bin/env python
"""test_matching — detect + match features between consecutive dataset
frames; print statistics and save a match visualization
(reference sources/tools/test_matching.cpp).

Usage: python tools/test_matching.py --source <url> [--out matches.png]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(argv):
    from deepfactors_tpu.config import parse_args
    from deepfactors_tpu.features import detector as det, matching as mt
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.io import drivers

    flags = parse_args(argv)
    source = flags.get("source", "synthetic://128x96:5:0.02")
    iface = drivers.get_interface_from_url(source)
    fx, fy, u0, v0, W, H = iface.intrinsics()
    cam = PinholeCamera.create(fx=fx, fy=fy, u0=u0, v0=v0, width=W, height=H)

    cfg = det.DetectorConfig(max_keypoints=int(flags.get("nfeatures", 200)))
    it = iface.frames()
    f0d = next(it)
    f1d = next(it)
    f0 = det.detect(jnp.asarray(f0d.img), cfg)
    f1 = det.detect(jnp.asarray(f1d.img), cfg)
    m = mt.match(f0.descriptor, f0.valid, f1.descriptor, f1.valid,
                 max_dist=int(flags.get("max_dist", 64)))
    kp0 = f0.xy
    kp1 = f1.xy[m.idx1]
    inl = mt.prune_matches_eight_point(
        kp0, kp1, m.valid, cam, jax.random.PRNGKey(0),
        threshold=float(flags.get("ransac_threshold", 1e-4)),
    )
    nv = int(np.sum(np.asarray(m.valid)))
    ni = int(np.sum(np.asarray(m.valid & inl)))
    print(f"keypoints: {int(np.sum(np.asarray(f0.valid)))} / "
          f"{int(np.sum(np.asarray(f1.valid)))}")
    print(f"matches: {nv}  ransac inliers: {ni}")

    out = flags.get("out", "/tmp/matches.png")
    import cv2

    i0 = (np.asarray(f0d.img) * 255).astype(np.uint8)
    i1 = (np.asarray(f1d.img) * 255).astype(np.uint8)
    vis = cv2.cvtColor(np.concatenate([i0, i1], axis=1), cv2.COLOR_GRAY2BGR)
    kp0n = np.asarray(kp0)
    kp1n = np.asarray(kp1)
    ok = np.asarray(m.valid & inl)
    for i in range(len(ok)):
        if ok[i]:
            p0 = (int(kp0n[i, 0]), int(kp0n[i, 1]))
            p1 = (int(kp1n[i, 0]) + i0.shape[1], int(kp1n[i, 1]))
            cv2.line(vis, p0, p1, (0, 255, 0), 1)
    cv2.imwrite(out, vis)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
