"""End-to-end odometry throughput: frames/s through the full DeepFactors
facade (preprocess -> track -> loop closure -> keyframe/frame policy ->
mapping), BASELINE.md's ">=2x real-time end-to-end" target (reference claims
interactive real-time ~30 fps on a CUDA-10-era GPU).

Synthetic sequence: textured fronto-parallel plane at depth 2 (matches the
decoder-less flat-prox prior) with a smooth sideways+forward trajectory —
every stage of the pipeline runs for real (dense tracking, BoW loop queries,
keyframe decisions, window BA). Reports fps + final pose error vs GT.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_e2e.py [N]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.se3 import SE3
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.geometry.warping import find_correspondence
    from deepfactors_tpu.ops.image import bilinear_sample
    from deepfactors_tpu.mapping.mapper import MapperConfig
    from deepfactors_tpu.system import DeepFactors, SystemConfig

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    H, W = 192, 256
    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img0 = (0.5 + 0.25 * np.sin(xs / 9) * np.cos(ys / 7)
            + 0.15 * np.sin((xs + 2 * ys) / 13)
            + 0.08 * np.cos(xs / 3.1) * np.sin(ys / 4.3)).astype(np.float32)

    @jax.jit
    def render(q, t):
        pix = jnp.stack([jnp.asarray(xs).reshape(-1),
                         jnp.asarray(ys).reshape(-1)], -1)
        corr = find_correspondence(
            pix, jnp.full((H * W,), 2.0), cam,
            se3m.inverse(SE3(q, t)), border=0, min_dpt=0.0)
        return bilinear_sample(jnp.asarray(img0), corr.pix1).reshape(H, W)

    # smooth trajectory: sideways sweep + slight push-in + small yaw
    def gt_pose_tw(i):
        s = i / max(1, n_frames - 1)
        t = np.array([0.35 * np.sin(2 * np.pi * s * 0.5),
                      -0.10 * np.sin(2 * np.pi * s * 0.25), 0.15 * s],
                     np.float32)
        yaw = 0.04 * np.sin(2 * np.pi * s * 0.5)
        q = np.array([np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0], np.float32)
        return SE3(jnp.asarray(q), jnp.asarray(t))

    frames = []
    for i in range(n_frames):
        p = gt_pose_tw(i)
        frames.append(np.asarray(render(p.q, p.t)))

    cfg = SystemConfig(
        mapper=MapperConfig(
            max_keyframes=12, max_frames=2, max_factors=32, code_size=32,
            height=H, width=W, pyramid_levels=3, pho_iters=(4, 8, 15),
            connection_mode="LASTN", max_back_connections=2,
        ),
        loop_closure=True,
    )
    from deepfactors_tpu.loop.vocabulary import random_vocabulary

    df = DeepFactors(cfg, cam, decoder=None,
                     vocabulary=random_vocabulary())
    df.bootstrap_two_frames(frames[0], frames[1])

    # warm up compiles on the first few frames
    for i in range(2, 6):
        df.process_frame(float(i), frames[i])

    t0 = time.perf_counter()
    for i in range(6, n_frames):
        df.process_frame(float(i), frames[i])
    jax.block_until_ready(df.mapper.state.pose.t)
    dt = time.perf_counter() - t0
    fps = (n_frames - 6) / dt

    gt_last = se3m.inverse(gt_pose_tw(n_frames - 1))
    err = float(jnp.linalg.norm(se3m.local(gt_last, df.pose_wc)))
    n_kf = len(df.mapper.kf_slots)
    print(f"frames={n_frames - 6} fps={fps:.1f} keyframes={n_kf} "
          f"final_pose_err={err:.4f} lost={df.tracking_lost}")


if __name__ == "__main__":
    main()
