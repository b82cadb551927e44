#!/usr/bin/env python
"""Real-image evaluation on the reference's shipped test images
(VERDICT r2 item 4 — first contact with non-synthetic data).

The reference ships 4 real indoor frames WITH ground-truth depth:
/root/reference/data/testimg/{0,25,1047,1052}.jpg + .png (uint16 mm,
/1000 -> meters per tests/ut_se3aligner.cpp:71), camera = GetSceneNetCam
(tests/testing_utils.h:34: fx = W/2/tan(30deg), fy = H/2/tan(22.5deg)).
Frames (0, 25) and (1047, 1052) are consecutive-ish pairs used by
ut_sfmaligner.cpp:137-216 and ut_se3aligner.cpp:52-54.

Measures, on these images remapped to the trained camera (256x192):
  1. decoder depth RMSE with zero / predicted / ridge-optimal code — how the
     synthetic-room-trained decoder behaves off-distribution
     (ut_decoder.cpp:78-117 protocol);
  2. dense SE(3) tracking on a real pair using GT depth (decoder-free):
     inliers + photometric error after C2F GN, vs the identity-warp
     baseline (ut_se3aligner.cpp ImageAlignmentTest protocol);
  3. a full two-frame photometric bootstrap (decoder in the loop,
     Mapper::InitTwoFrames semantics) — photometric residual drop and
     post-BA depth RMSE vs GT (raw + median-scaled, monocular scale being
     set by the decoder prior);
  4. the scannet:// driver end-to-end on a directory constructed from these
     images (scannet_interface.cpp:42-137 layout).

Writes data/REALIMG.json and prints a summary.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/real_image_eval.py
     [--cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TESTIMG = "/root/reference/data/testimg"
IDS = ["0", "25", "1047", "1052"]
H, W = 192, 256
FX = FY = 220.0  # trained camera (data/nets/room256_32.json)


def scenenet_cam(w, h):
    """GetSceneNetCam (testing_utils.h:34-41)."""
    return (w / 2 / 0.5773502691896257, h / 2 / 0.41421356237309503,
            w / 2.0, h / 2.0)


def load_remapped():
    """Load test images + GT depth, remapped to the trained camera."""
    import cv2

    from deepfactors_tpu.io import preprocess as pp

    out = {}
    for i in IDS:
        img = cv2.imread(f"{TESTIMG}/{i}.jpg", cv2.IMREAD_GRAYSCALE)
        dpt = cv2.imread(f"{TESTIMG}/{i}.png", cv2.IMREAD_ANYDEPTH)
        h0, w0 = img.shape
        fx, fy, u0, v0 = scenenet_cam(w0, h0)
        src = pp.SourceCamera(fx, fy, u0, v0, w0, h0)
        mx, my = pp.build_remap(src, FX, FY, W / 2, H / 2, W, H)
        g = pp.remap_bilinear(img.astype(np.float32) / 255.0, mx, my)
        d = cv2.remap(dpt.astype(np.float32) / 1000.0, mx, my,
                      interpolation=cv2.INTER_NEAREST)
        out[i] = (g.astype(np.float32), d.astype(np.float32))
    return out


def decoder_eval(decoder, data):
    """Per-image depth RMSE: zero / predicted / ridge-optimal code
    (the train_room_decoder held-out protocol, on real frames)."""
    import jax
    import jax.numpy as jnp

    from deepfactors_tpu.geometry import warping as wp

    CS = decoder.cfg.code_size
    avg = decoder.cfg.avg_dpt

    @jax.jit
    def eval_one(img, dpt, valid):
        out = decoder._apply(decoder.params, img)
        prx_gt = wp.depth_to_prox(jnp.maximum(dpt, 1e-3), avg)
        w = valid.reshape(-1).astype(jnp.float32)
        J = out["jac"][0].reshape(-1, CS) * w[:, None]
        r = ((prx_gt - out["prx0"][0]).reshape(-1)) * w
        A = J.T @ J + jnp.eye(CS)  # code_prior sigma 1
        code_opt = jnp.linalg.solve(A, J.T @ r)
        code_pred = out["code_pred"]

        def depth_of(code):
            prx = out["prx0"][0] + jnp.einsum("hwc,c->hw", out["jac"][0],
                                              code)
            # cap at 20 m: prox near 0 maps to unbounded depth and a few
            # sky-pixels would otherwise dominate the RMSE unreadably
            return jnp.clip(
                wp.prox_to_depth(jnp.clip(prx, 1e-4, 1 - 1e-4), avg),
                0.0, 20.0)

        nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

        def rmse(d):
            err = jnp.where(valid, d - dpt, 0.0)
            return jnp.sqrt(jnp.sum(err ** 2) / nv)

        def abs_rel(d):
            r = jnp.where(valid, jnp.abs(d - dpt) / jnp.maximum(dpt, 1e-3),
                          0.0)
            return jnp.sum(r) / nv

        z = jnp.zeros((CS,), jnp.float32)
        return jnp.stack([rmse(depth_of(z)), rmse(depth_of(code_pred)),
                          rmse(depth_of(code_opt)),
                          jnp.sqrt(jnp.mean(code_pred ** 2)),
                          jnp.sqrt(jnp.mean(code_opt ** 2)),
                          abs_rel(depth_of(z)), abs_rel(depth_of(code_pred)),
                          abs_rel(depth_of(code_opt))])

    rows = {}
    for i, (g, d) in data.items():
        v = d > 1e-3
        r = np.asarray(jax.device_get(eval_one(
            jnp.asarray(g), jnp.asarray(d), jnp.asarray(v))))
        rows[i] = {"rmse_zero_code": round(float(r[0]), 4),
                   "rmse_pred_code": round(float(r[1]), 4),
                   "rmse_opt_code": round(float(r[2]), 4),
                   "abs_rel_zero_code": round(float(r[5]), 4),
                   "abs_rel_pred_code": round(float(r[6]), 4),
                   "abs_rel_opt_code": round(float(r[7]), 4),
                   "code_rms_pred": round(float(r[3]), 3),
                   "code_rms_opt": round(float(r[4]), 3),
                   "median_gt_depth": round(float(np.median(d[v])), 3)}
    mean = {k: round(float(np.mean([r[k] for r in rows.values()])), 4)
            for k in ("rmse_zero_code", "rmse_pred_code", "rmse_opt_code",
                      "abs_rel_zero_code", "abs_rel_pred_code",
                      "abs_rel_opt_code")}
    return {"per_image": rows, "mean": mean}


def se3_tracking_eval(data, pair=("1047", "1052")):
    """Dense C2F SE(3) tracking of a real pair with GT depth (decoder-free):
    the ut_se3aligner ImageAlignmentTest protocol on real imagery."""
    import jax
    import jax.numpy as jnp

    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.ops import image as ip
    from deepfactors_tpu.ops import dense_sfm as ds
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.tracking.tracker import (CameraTracker,
                                                  TrackerConfig)

    cam = PinholeCamera.create(fx=FX, fy=FY, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    L = 3
    g0, d0 = data[pair[0]]
    g1, _ = data[pair[1]]
    # fill depth holes with the median so the warp stays finite
    d0 = np.where(d0 > 1e-3, d0, np.median(d0[d0 > 1e-3])).astype(np.float32)
    img0_pyr = ip.build_pyramid(jnp.asarray(g0), L)
    dpt0_pyr = ip.build_pyramid(jnp.asarray(d0), L)
    img1_pyr = ip.build_pyramid(jnp.asarray(g1), L)
    grad1_pyr = ip.build_gradient_pyramid(img1_pyr)

    err0 = ds.sfm_evaluate_error(
        se3m.identity(), se3m.identity(), cam, img0_pyr[0], img1_pyr[0],
        dpt0_pyr[0], jnp.zeros_like(dpt0_pyr[0]), grad1_pyr[0],
        ds.SfmParams(huber_delta=0.3, avg_dpt=2.0))
    tracker = CameraTracker(
        TrackerConfig(pyramid_levels=L, iterations_per_level=(12, 8, 6),
                      huber_delta=0.3), cam)
    tracker.set_keyframe(img0_pyr, dpt0_pyr, se3m.identity())
    res = tracker.track_frame(img1_pyr, grad1_pyr)
    t = np.asarray(jax.device_get(tracker.pose_ck.t))
    e0 = float(jax.device_get(
        err0.residual / jnp.maximum(err0.inliers, 1.0)))
    return {"pair": list(pair),
            "identity_err": round(e0, 5),
            "tracked_err": round(tracker.error, 5),
            "tracked_inliers": round(tracker.inliers, 3),
            "trans_norm_m": round(float(np.linalg.norm(t)), 4),
            "err_reduction": round(e0 / max(tracker.error, 1e-9), 2)}


def bootstrap_eval(decoder, data, pair=("1047", "1052")):
    """Two-frame photometric bootstrap with the decoder in the loop
    (InitTwoFrames, mapper.cpp:164-189) on a real pair."""
    import jax
    import jax.numpy as jnp

    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig
    from deepfactors_tpu.geometry import se3 as se3m

    cam = PinholeCamera.create(fx=FX, fy=FY, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = MapperConfig(max_keyframes=4, max_frames=1, max_factors=16,
                       code_size=32, height=H, width=W, pyramid_levels=3,
                       pho_iters=(4, 8, 15))
    m = Mapper(cfg, cam, decoder=decoder)
    g0, d0 = data[pair[0]]
    g1, _ = data[pair[1]]
    s0, s1 = m.init_two_frames(g0, g1)
    m.update_map()
    dump = m.dump_state(verbose_errors=True)
    errs = [f.get("residual") for f in dump["photo_factors"]
            if f.get("residual") is not None]
    dpt = np.asarray(jax.device_get(m.state.levels[0].dpt[s0]))
    v = d0 > 1e-3
    rmse = float(np.sqrt(np.mean((dpt[v] - d0[v]) ** 2)))
    scale = float(np.median(d0[v]) / max(np.median(dpt[v]), 1e-6))
    rmse_s = float(np.sqrt(np.mean((scale * dpt[v] - d0[v]) ** 2)))
    t = np.asarray(jax.device_get(m.state.pose.t[s1]))
    return {"pair": list(pair),
            "post_ba_residuals": [round(float(e), 5) for e in errs],
            "depth_rmse_m": round(rmse, 4),
            "depth_rmse_scaled_m": round(rmse_s, 4),
            "median_scale": round(scale, 3),
            "rel_trans_norm_m": round(float(np.linalg.norm(t)), 4),
            "code_norm": round(float(np.linalg.norm(np.asarray(
                jax.device_get(m.state.code[s0])))), 3)}


def scannet_driver_eval(data, decoder):
    """Exercise the scannet:// driver end-to-end on a constructed directory
    (scannet_interface.cpp:42-137 layout), then bootstrap + track one frame
    through the facade."""
    import cv2
    import shutil

    root = "/tmp/real_scannet_seq"
    shutil.rmtree(root, ignore_errors=True)
    for sub in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for n, i in enumerate(IDS):
        img = cv2.imread(f"{TESTIMG}/{i}.jpg")
        dpt = cv2.imread(f"{TESTIMG}/{i}.png", cv2.IMREAD_ANYDEPTH)
        cv2.imwrite(f"{root}/color/{n}.jpg", img)
        cv2.imwrite(f"{root}/depth/{n}.png", dpt)
        np.savetxt(f"{root}/pose/{n}.txt", np.eye(4))
    h0, w0 = 240, 320
    fx, fy, u0, v0 = scenenet_cam(w0, h0)
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, u0, v0
    np.savetxt(f"{root}/intrinsic/intrinsic_color.txt", K)
    np.savetxt(f"{root}/intrinsic/intrinsic_depth.txt", K)

    from deepfactors_tpu.io.drivers import get_interface_from_url
    from deepfactors_tpu.io.preprocess import SourceCamera
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from tools.bench_e2e import build_system

    drv = get_interface_from_url(f"scannet://{root}")
    frames = list(drv.frames())
    assert len(frames) == 4, len(frames)
    assert frames[0].img.shape == (240, 320)
    assert frames[0].gt_depth is not None

    cam = PinholeCamera.create(fx=FX, fy=FY, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    df = build_system(cam, H, W, decoder, max_keyframes=4,
                      dist_threshold=2.0)
    ifx, ify, iu0, iv0, iw, ih = drv.intrinsics()
    df.set_source_camera(SourceCamera(ifx, ify, iu0, iv0, iw, ih))
    # (1047, 1052) are the consecutive pair -> frames 2, 3
    df.bootstrap_two_frames(df.preprocess_image(frames[2].img),
                            df.preprocess_image(frames[3].img))
    pose_boot = df.pose_wc
    # Track a DISTINCT image from the current keyframe (VERDICT r3 weak #5:
    # tracking the bootstrap frame itself made tracked_err vacuous). Frame 2
    # (image 1047) against the post-bootstrap keyframe exercises a real
    # SE(3) solve with a non-identity optimum (ut_se3aligner.cpp:173).
    df.process_frame(4.0, frames[2].img)
    import jax

    from deepfactors_tpu.geometry import se3 as se3m

    dt = np.asarray(jax.device_get(
        se3m.mul(se3m.inverse(pose_boot), df.pose_wc).t))
    res = {"frames_read": len(frames),
           "gt_depth": True,
           "bootstrap_ok": bool(df.bootstrapped),
           "tracked_frame": "1047 (distinct from bootstrap pose frame)",
           "tracked_err": round(df.tracker.error, 5),
           "tracking_lost": bool(df.tracking_lost),
           "rel_trans_norm_m": round(float(np.linalg.norm(dt)), 4)}
    # A far-away frame (image 0, ~1000 frames earlier in the sequence) must
    # be DECLARED lost, not silently absorbed into the trajectory.
    df.process_frame(5.0, frames[0].img)
    res["far_frame_declared_lost"] = bool(df.tracking_lost)
    res["n_lost_frames"] = int(df.n_lost_frames)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="data/REALIMG.json")
    ap.add_argument("--decoder", default="data/nets/room256_32v4",
                    help="domain-randomized weights: the real-imagery set "
                         "(the in-domain room256_32 weights predict "
                         "catastrophically off-distribution)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    sys.path.insert(0, "/root/repo")
    import json as js

    from deepfactors_tpu.models.decoder import (Decoder, NetworkConfig,
                                                load_params)

    nj = js.load(open(args.decoder + ".json"))
    ncfg = NetworkConfig(
        code_size=nj["code_size"], pyramid_levels=nj["pyramid_levels"],
        input_width=nj["input_width"], input_height=nj["input_height"],
        avg_dpt=nj["avg_dpt"], base_ch=nj.get("base_ch", 32),
        pred_head=nj.get("pred_head", "gap"),
    )
    decoder = Decoder(ncfg, params=load_params(args.decoder + ".pkl"))
    dec_name = os.path.basename(args.decoder)
    data = load_remapped()

    print("[1/4] decoder depth RMSE on real images...", flush=True)
    dec_res = decoder_eval(decoder, data)
    print(json.dumps(dec_res["mean"]))
    print("[2/4] dense SE(3) tracking with GT depth...", flush=True)
    trk = se3_tracking_eval(data)
    print(json.dumps(trk))
    print("[3/4] two-frame photometric bootstrap...", flush=True)
    boot = bootstrap_eval(decoder, data)
    print(json.dumps(boot))
    print("[4/4] scannet:// driver e2e...", flush=True)
    drv = scannet_driver_eval(data, decoder)
    print(json.dumps(drv))

    out = {"decoder": dec_name,
           "source": "/root/reference/data/testimg (real indoor frames + "
                     "GT depth mm/1000, SceneNet intrinsics)",
           "decoder_depth_rmse": dec_res,
           "se3_tracking_gt_depth": trk,
           "two_frame_bootstrap": boot,
           "scannet_driver": drv}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
