"""Full-scale end-to-end SLAM benchmark: the facade on a long synthetic
indoor sequence at the reference problem size (256x192, CS=32, decoder in
the loop), reporting ATE + throughput.

This is the reference's evaluation protocol (long indoor sequences,
deepfactors.cpp:220-366 per frame, SaveResults + external TUM ATE tooling,
README.md:156-160) recreated on the procedural room distribution
(io/synth.py) since no ScanNet data exists in this environment. Every stage
runs for real: preprocess, dense tracking, BoW + dense-verified loop
closure, keyframe/frame policies, window BA with keyframe
marginalization-to-prior past capacity.

Prints one JSON line:
  {"e2e_fps", "ate_m", "ate_scaled_m", "n_keyframes", "n_evicted",
   "final_err_m", "lost"}

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_e2e.py \
       [--frames 300] [--decoder data/nets/room256_32] [--save-dir DIR]
"""
import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def build_system(cam, H, W, decoder, max_keyframes=32,
                 dist_threshold=2.0, loop_closure=True,
                 use_reprojection=True, pipeline_depth=0,
                 frame_upload="f32"):
    from deepfactors_tpu.mapping.mapper import MapperConfig
    from deepfactors_tpu.system import DeepFactors, SystemConfig
    from deepfactors_tpu.loop.vocabulary import default_vocabulary

    cfg = SystemConfig(
        mapper=MapperConfig(
            max_keyframes=max_keyframes, max_frames=2,
            max_factors=4 * max_keyframes,
            code_size=32, height=H, width=W, pyramid_levels=3,
            pho_iters=(4, 8, 15), connection_mode="LASTN",
            max_back_connections=2,
            use_reprojection=use_reprojection,
        ),
        dist_threshold=dist_threshold,
        # the lost check runs BEFORE the keyframe policy each frame
        # (deepfactors.cpp:220-366 ordering): keep it strictly above the
        # keyframe threshold or the system declares lost at exactly the
        # distance where it should have made a keyframe
        tracking_dist_threshold=2.5 * dist_threshold,
        frame_dist_threshold=0.12,
        # loop closure must be disabled HERE, not by nulling loop_detector
        # post-construction: the fused frame fn compiles with_loop at
        # __init__ (ADVICE r3 #3)
        loop_closure=loop_closure,
        loop_active_window=8,
        loop_max_dist=0.35,
        pipeline_depth=pipeline_depth,
        frame_upload=frame_upload,
    )
    return DeepFactors(cfg, cam, decoder=decoder,
                       vocabulary=default_vocabulary() if loop_closure
                       else None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--decoder", default="data/nets/room256_32v4")
    ap.add_argument("--no-decoder", action="store_true")
    ap.add_argument("--oracle", action="store_true",
                    help="GT-depth OracleDecoder (io/synth.py): the solver/"
                         "tracker error floor with decoder error removed — "
                         "the promised oracle row (VERDICT r2 missing #5)")
    ap.add_argument("--no-loop-closure", action="store_true",
                    help="disable loop closure (ATE ablation row)")
    ap.add_argument("--max-keyframes", type=int, default=32)
    ap.add_argument("--dist-threshold", type=float, default=2.0)
    # >2π sweep revisits the start; 3.2π puts the revisit gap (~187
    # frames) inside the retained keyframe window so loop closure can fire
    ap.add_argument("--sweep", type=float, default=3.2 * np.pi)
    ap.add_argument("--scene-seed", type=int, default=7)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--pipeline-depth", type=int, default=0,
                    help="frames in flight (0 = sequential probe sync)")
    ap.add_argument("--viz-serve", default=None, metavar="DIR",
                    help="live viewer: write DIR/viewer.html (auto-refresh)"
                         " during the run — open it in a browser to watch"
                         " the map grow (tools/live_viewer.py)")
    args = ap.parse_args()

    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.io import synth
    from deepfactors_tpu.utils import tum_io

    H, W = 192, 256
    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)

    decoder = None
    if args.no_decoder or args.oracle:
        pass
    else:
        from deepfactors_tpu.models.decoder import (Decoder, NetworkConfig,
                                                    load_params)
        with open(args.decoder + ".json") as f:
            nj = json.load(f)
        ncfg = NetworkConfig(
            code_size=nj["code_size"], pyramid_levels=nj["pyramid_levels"],
            input_width=nj["input_width"], input_height=nj["input_height"],
            avg_dpt=nj["avg_dpt"], base_ch=nj.get("base_ch", 32),
            pred_head=nj.get("pred_head", "gap"),
        )
        decoder = Decoder(ncfg, params=load_params(args.decoder + ".pkl"))

    scene = synth.random_room(args.scene_seed, n_boxes=3)
    poses = synth.orbit_trajectory(args.frames, sweep=args.sweep)
    cache = (f"/tmp/room_seq_{args.scene_seed}_{args.frames}_"
             f"{args.sweep:.3f}_{H}x{W}_d.npz")
    if os.path.exists(cache):
        print(f"loading cached sequence {cache}", file=sys.stderr)
        z = np.load(cache)
        frames, depths = list(z["frames"]), list(z["depths"])
    else:
        print(f"rendering {args.frames}-frame room sequence...",
              file=sys.stderr)
        frames, depths = synth.render_sequence(scene, cam, poses, H, W,
                                               with_depth=True)
        np.savez_compressed(cache, frames=np.stack(frames),
                            depths=np.stack(depths))
    if args.oracle:
        decoder = synth.OracleDecoder(frames, depths, levels=3,
                                      code_size=32)

    df = build_system(cam, H, W, decoder, args.max_keyframes,
                      args.dist_threshold,
                      loop_closure=not args.no_loop_closure,
                      pipeline_depth=args.pipeline_depth)
    df.prewarm()   # compile every event variant before the run
    df.bootstrap_two_frames(frames[0], frames[2], frame_gap=2)
    # timestamps: frame index (the TUM protocol uses seconds; index is fine
    # for ATE association)
    df.trajectory = [(0.0, df.pose_wc)]
    viz = None
    if args.viz_serve:
        from tools.live_viewer import LiveViewer
        viz = LiveViewer(args.viz_serve, df)
        print(f"live viewer: open {args.viz_serve}/viewer.html",
              file=sys.stderr)

    t_warm0 = time.perf_counter()
    for i in range(3, 3 + args.warmup):
        df.process_frame(float(i), frames[i])
    jax.block_until_ready(df.mapper.state.pose.t)
    print(f"warmup {args.warmup} frames: "
          f"{time.perf_counter() - t_warm0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(3 + args.warmup, args.frames):
        df.process_frame(float(i), frames[i])
    df.flush()
    jax.block_until_ready(df.mapper.state.pose.t)
    dt = time.perf_counter() - t0
    n_timed = args.frames - 3 - args.warmup
    fps = n_timed / dt
    if viz is not None:
        viz.finish()

    # ATE: associate estimated trajectory (timestamps = frame index) with GT
    est = df.trajectory
    gt = [(ts, poses[int(ts)]) for ts, _ in est]
    n_bad = sum(1 for _, p in est
                if not np.isfinite(np.asarray(p.t)).all())
    ate = tum_io.ate_rmse(est, gt)
    ate_s = tum_io.ate_rmse(est, gt, align_scale=True)
    gt_last = poses[int(est[-1][0])]
    final_err = float(jnp.linalg.norm(se3m.local(gt_last, est[-1][1])))

    n_kf = len(df.mapper.kf_slots)
    n_evicted = len(df.mapper.archived)
    if args.save_dir:
        df.save_results(args.save_dir)

    print(json.dumps({
        "e2e_fps": round(fps, 2),
        "ate_m": round(ate, 4),
        "ate_scaled_m": round(ate_s, 4),
        "n_keyframes": n_kf,
        "n_evicted": n_evicted,
        "n_loop_links": len(df.loop_links),
        "n_archived_loops": sum(1 for _, b in df.loop_links
                                if isinstance(b, tuple)),
        "n_live_global_loops": df.n_live_global_loops,
        "n_local_links": df.n_local_links,
        "final_err_m": round(final_err, 4),
        "frames": args.frames,
        "n_nonfinite_poses": n_bad,
        "n_tracked": len(est),
        "tracked_fraction": round(1.0 - df.n_lost_frames
                                  / max(df.n_frames, 1), 4),
        "n_lost_frames": df.n_lost_frames,
        "n_relocalizations": df.n_relocalizations,
        "lost": bool(df.tracking_lost),
        "decoder": ("oracle" if args.oracle
                    else None if args.no_decoder else args.decoder),
        "loop_closure": not args.no_loop_closure,
    }))


if __name__ == "__main__":
    main()
