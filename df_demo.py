#!/usr/bin/env python
"""df_demo — run the TPU-native DeepFactors SLAM system on a dataset.

Equivalent of the reference demo binary (sources/demo/main.cpp,
live_demo.cpp): URL-scheme dataset source, layered --flagfile configuration,
bootstrap + per-frame processing loop, crash-save, results + provenance in a
run directory.

Usage:
  python df_demo.py --source synthetic://256x192:50 --log_dir /tmp/run
  python df_demo.py --source scannet:///data/scene0565_00 \
      --flagfile data/flags/dataset_odom.flags
"""
import os
import sys
import time
import traceback

import numpy as np


def main(argv):
    from deepfactors_tpu import config as cfgm
    from deepfactors_tpu.io import drivers
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.system import DeepFactors
    from deepfactors_tpu.models.decoder import Decoder, NetworkConfig
    from deepfactors_tpu.utils.timing import enable_timing, timing_summary

    flags = cfgm.parse_args(argv)
    if flags.get("compilation_cache", "true").lower() != "false":
        from deepfactors_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache(flags.get("compilation_cache_dir"))
    source = flags.get("source", "synthetic://256x192:30")
    log_dir = flags.get("log_dir", os.path.join("/tmp", "df_run"))
    init_on_start = flags.get("init_on_start", "true").lower() != "false"
    frame_limit = int(flags.get("frame_limit", 0))
    if flags.get("enable_timing", "false").lower() == "true":
        enable_timing(True)

    cam_iface = drivers.get_interface_from_url(source)
    fx, fy, u0, v0, W0, H0 = cam_iface.intrinsics()

    # network setup: config file or defaults; image is remapped to the
    # network's trained resolution (deepfactors.cpp:634-680)
    if "network_path" in flags:
        netcfg = cfgm.load_network_config(flags["network_path"])
    else:
        netcfg = NetworkConfig(
            code_size=int(flags.get("code_size", 32)),
            pyramid_levels=int(flags.get("pyramid_levels", 3)),
            input_width=int(flags.get("input_width", 256)),
            input_height=int(flags.get("input_height", 192)),
        )
    H, W = netcfg.input_height, netcfg.input_width
    if netcfg.fx > 0:
        # the network was trained at specific intrinsics: remap every frame
        # to them (deepfactors.cpp:634-646)
        cam = PinholeCamera.create(fx=netcfg.fx, fy=netcfg.fy, u0=netcfg.u0,
                                   v0=netcfg.v0, width=W, height=H)
    else:
        sx, sy = W / W0, H / H0
        cam = PinholeCamera.create(fx=fx * sx, fy=fy * sy, u0=u0 * sx,
                                   v0=v0 * sy, width=W, height=H)

    sys_cfg = cfgm.build_system_config(flags, H, W)

    decoder = None
    if flags.get("use_decoder", "true").lower() == "true":
        params = None
        wpath = flags.get("network_weights")
        if wpath and os.path.exists(wpath):
            from deepfactors_tpu.models.decoder import load_params

            params = load_params(wpath)
        decoder = Decoder(netcfg._replace(
            pyramid_levels=sys_cfg.mapper.pyramid_levels,
            code_size=sys_cfg.mapper.code_size,
        ), params=params)

    from deepfactors_tpu.loop.vocabulary import default_vocabulary

    df = DeepFactors(sys_cfg, cam, decoder=decoder,
                     vocabulary=default_vocabulary())
    src_sig = (float(fx), float(fy), float(u0), float(v0), int(W0), int(H0))
    net_sig = (float(cam.fx), float(cam.fy), float(cam.u0), float(cam.v0),
               int(W), int(H))
    if src_sig != net_sig:
        from deepfactors_tpu.io.preprocess import SourceCamera

        dist = None
        if "camera_distortion" in flags:
            dist = [float(x) for x in
                    flags["camera_distortion"].split(",")]
        df.set_source_camera(SourceCamera(fx, fy, u0, v0, W0, H0, dist))

    os.makedirs(log_dir, exist_ok=True)
    cfgm.save_run_flags(log_dir, flags)

    print(f"source: {source}  net: {W}x{H} CS={sys_cfg.mapper.code_size} "
          f"levels={sys_cfg.mapper.pyramid_levels}", flush=True)

    t_start = time.perf_counter()
    n_frames = 0
    prev = None
    try:
        for fd in cam_iface.frames():
            img = df.preprocess_image(fd.img)
            if not df.bootstrapped:
                if prev is None:
                    prev = img
                    continue
                if init_on_start:
                    df.bootstrap_two_frames(prev, img)
                    print("bootstrapped (two frames)", flush=True)
                continue
            df.process_frame(fd.timestamp, img)
            n_frames += 1
            if n_frames % 10 == 0:
                dt = time.perf_counter() - t_start
                print(f"frame {n_frames}: {n_frames / dt:.1f} fps, "
                      f"kfs={len(df.mapper.kf_slots)} "
                      f"inliers={df.stats.inliers:.2f} "
                      f"lost={df.tracking_lost}", flush=True)
            if frame_limit and n_frames >= frame_limit:
                break
    except Exception:
        # post-crash state save (deepfactors.cpp:493-537, live_demo crash
        # marker :398-413)
        traceback.print_exc()
        crash_dir = os.path.join(log_dir, "crash")
        os.makedirs(crash_dir, exist_ok=True)
        with open(os.path.join(crash_dir, "crash"), "w") as f:
            f.write(traceback.format_exc())
        try:
            df.save_results(crash_dir)
        except Exception:
            pass
        raise

    df.save_results(log_dir)
    if flags.get("dump_state", "false").lower() == "true":
        # observability dumps (mapper.cpp:569-632 SaveGraphs/PrintWork +
        # :647-795 error-image mosaics)
        import json as _json

        from deepfactors_tpu import viz

        with open(os.path.join(log_dir, "state.json"), "w") as f:
            _json.dump(df.mapper.dump_state(verbose_errors=True), f,
                       indent=1)
        df.mapper.save_graphs(os.path.join(log_dir, "factor_graph.dot"))
        viz.export_error_mosaics(
            os.path.join(log_dir, "photo_errors.png"), df.mapper, cam)
        print(f"state dumps -> {log_dir}", flush=True)
    dt = time.perf_counter() - t_start
    print(f"done: {n_frames} frames in {dt:.1f}s ({n_frames / max(dt, 1e-9):.1f} fps), "
          f"{len(df.mapper.kf_slots)} keyframes -> {log_dir}", flush=True)

    # ATE if the dataset has ground truth
    if cam_iface.has_ground_truth:
        from deepfactors_tpu.utils import tum_io

        gt = [(fd.timestamp, fd.gt_pose)
              for fd in cam_iface.frames() if fd.gt_pose is not None]
        gt_by_ts = dict(gt)
        pairs = [(ts, p) for ts, p in df.trajectory if ts in gt_by_ts]
        if len(pairs) >= 3:
            est = pairs
            gtm = [(ts, gt_by_ts[ts]) for ts, _ in pairs]
            ate = tum_io.ate_rmse(est, gtm)
            print(f"ATE RMSE: {ate:.4f} m", flush=True)

    summary = timing_summary()
    if summary:
        for k, v in summary.items():
            print(f"[timing] {k}: avg {v['avg_ms']:.2f} ms x{v['count']}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
