"""Per-stage wall-clock profile of the facade's process_frame on the real
chip — where does the e2e frame budget go? (bench e2e measured ~1 fps at
the 256x192 bench config while tracking alone runs at ~900 fps: the gap is
host-side dispatch count, not device compute. The axon tunnel charges
5-8 ms PER DISPATCH.)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_e2e.py
     [--frames 40]
"""
import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--no-rep", action="store_true")
    ap.add_argument("--pipeline-depth", type=int, default=0)
    ap.add_argument("--f16", action="store_true")
    args = ap.parse_args()

    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.io import synth
    from deepfactors_tpu.utils import timing
    from bench import load_decoder, H, W
    from tools.bench_e2e import build_system

    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    decoder, _ = load_decoder()
    scene = synth.random_room(7, n_boxes=3)
    n = args.frames
    poses = synth.orbit_trajectory(n)
    # cache the rendered sequence: the renderer's own (re)compile through
    # the tunnel can dwarf the thing being profiled
    cache = f"/tmp/profile_seq_7_{n}_{H}x{W}.npz"
    if os.path.exists(cache):
        frames = list(np.load(cache)["frames"])
    else:
        frames = synth.render_sequence(scene, cam, poses, H, W)
        np.savez_compressed(cache, frames=np.stack(frames))

    df = build_system(cam, H, W, decoder, max_keyframes=10,
                      dist_threshold=2.0,
                      use_reprojection=not args.no_rep,
                      pipeline_depth=args.pipeline_depth,
                      frame_upload="f16" if args.f16 else "f32")
    if args.no_loop:
        df.loop_detector = None
    df.prewarm()   # compile every event variant before the run
    df.bootstrap_two_frames(frames[0], frames[2], frame_gap=2)
    df.trajectory = [(0.0, df.pose_wc)]
    warm = max(0, min(10, n - 4))
    if n - 3 - warm < 1:
        sys.exit(f"--frames {n} leaves no timed frames (need >= {4 + warm})")
    for i in range(3, 3 + warm):
        df.process_frame(float(i), frames[i])
    df.flush()
    jax.block_until_ready(df.mapper.state.pose.t)

    timing.reset_timing()
    timing.enable_timing(True)
    # tic/toc prints each pair; swallow the stream, keep the summary
    buf = io.StringIO()
    per_frame = []
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        for i in range(3 + warm, n):
            tf0 = time.perf_counter()
            nl0, nr0, nk0 = (df.n_lost_frames, df.n_relocalizations,
                             len(df.mapper.kf_slots)
                             + len(df.mapper.archived))
            df.process_frame(float(i), frames[i])
            per_frame.append((
                i, (time.perf_counter() - tf0) * 1e3,
                df.tracker.error, df.n_lost_frames - nl0,
                df.n_relocalizations - nr0,
                (len(df.mapper.kf_slots) + len(df.mapper.archived)) - nk0,
            ))
        df.flush()
        jax.block_until_ready(df.mapper.state.pose.t)
    dt = time.perf_counter() - t0
    timing.enable_timing(False)
    for i, ms, err, lost, reloc, kf in per_frame:
        tag = ("LOST" if lost else "") + (" RELOC" if reloc else "") + \
            (" KF" if kf else "")
        print(f"  frame {i:3d}: {ms:8.1f} ms  err={err:.4f} {tag}",
              file=sys.stderr)
    print(f"n_lost={df.n_lost_frames} n_reloc={df.n_relocalizations} "
          f"tracked={1 - df.n_lost_frames / max(df.n_frames, 1):.3f}",
          file=sys.stderr)

    n_timed = n - 3 - warm
    print(f"{n_timed} frames in {dt:.2f}s = {n_timed / dt:.2f} fps "
          f"({dt / n_timed * 1e3:.0f} ms/frame)")
    summ = timing.timing_summary()
    total_known = sum(v["total_s"] for v in summ.values())
    for k, v in sorted(summ.items(), key=lambda kv: -kv[1]["total_s"]):
        print(f"  {k:<20} {v['avg_ms']:8.1f} ms avg x{v['count']:<4} "
              f"= {v['total_s']:6.2f}s")
    print(f"  {'(unaccounted)':<20} {'':8} "
          f"= {dt - total_known:6.2f}s")


if __name__ == "__main__":
    main()
