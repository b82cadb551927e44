"""Benchmark: sustained photometric bundle-adjustment throughput at the
reference problem size (256x192 images, CS=32, 5-keyframe window, 8 active
both-way photometric factors at the finest level).

Prints ONE JSON line: BA iterations/s per chip (BASELINE.json: "keyframes/s
and BA iters/s per chip"). One BA iteration = relinearize all active 44-dim
photometric factors (fused warp + Jacobian + JtJ reduction) + assemble +
solve + retract — the reference's per-MappingStep work
(mapper.cpp:449-552). vs_baseline compares against the reference's effective
ISAM2 step rate (~30/s: interactive real-time with interleaved mapping on a
CUDA-10-era GPU, BASELINE.md).

Secondary numbers (printed to stderr): dense-tracking frames/s, keyframe
decode+build/s.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from deepfactors_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig
    from deepfactors_tpu.tracking.tracker import CameraTracker, TrackerConfig
    from deepfactors_tpu.ops import image as ip

    H, W, CS, L = 192, 256, 32, 3
    N_KF = 5

    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = MapperConfig(
        max_keyframes=N_KF, max_frames=1, max_factors=16, code_size=CS,
        height=H, width=W, pyramid_levels=L, pho_iters=(4, 8, 15),
        connection_mode="LASTN", max_back_connections=2, use_schur=True,
        relin_threshold=0.0,  # benchmark: never early-exit
    )

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)

    def synth(k):
        return (0.5 + 0.3 * np.sin(xs / 7 + k) * np.cos(ys / 5 + 0.3 * k)
                + 0.1 * np.sin((xs + 2 * ys) / 11 + k)).astype(np.float32)

    m = Mapper(cfg, cam, decoder=None)
    # build the window without running the full optimization schedule
    m.add_keyframe_to_map(synth(0), se3m.identity())
    for k in range(1, N_KF):
        m.add_keyframe_to_map(synth(k), se3m.identity())
        m._add_photo_pair(m.kf_slots[-2], m.kf_slots[-1])
    # pin all factors at the finest level (the expensive configuration)
    for w in m.work.work:
        w.active_level = 0
    m._bookkeeping()
    # dispatch exactly what the mapper dispatches: the compacted pool
    # (inactive Pallas grid slots still pay block DMA, mapper._compact_pool)
    pool = m._compact_pool()
    n_factors = int(np.sum(pool.active))

    kf_mask = jnp.ones((cfg.max_keyframes,), bool)
    fr_mask = jnp.ones((cfg.max_frames,), bool)
    rep = {k: jnp.asarray(v) for k, v in m.rep_pool._asdict().items()}
    geo = {k: jnp.asarray(v) for k, v in m.geo_pool._asdict().items()}
    args = lambda n: (
        m.state, m.frames,
        jnp.asarray(pool.src), jnp.asarray(pool.dst),
        jnp.asarray(pool.dst_is_frame), jnp.asarray(pool.level),
        jnp.asarray(pool.active), rep, geo, m.marginals, m.dprior,
        kf_mask, fr_mask,
        jnp.asarray(0, jnp.int32),
        se3m.identity().q, se3m.identity().t,
        jnp.asarray(cfg.lm_lambda, jnp.float32),
        jnp.asarray(n, jnp.int32), (0,), False,
    )
    # warmup/compile
    out = m._run_fn(*args(2))
    jax.block_until_ready(out)

    N_ITERS = 100
    t0 = time.perf_counter()
    state, frames, stats = m._run_fn(*args(N_ITERS))
    jax.block_until_ready(stats)
    dt = time.perf_counter() - t0
    ba_iters_per_s = N_ITERS / dt

    # secondary: dense tracking throughput (async pipeline, one sync at end)
    tracker = CameraTracker(
        TrackerConfig(pyramid_levels=L, iterations_per_level=(10, 5, 4),
                      huber_delta=0.3), cam)
    kf = m.kf_slots[-1]
    tracker.set_keyframe(
        [m.state.levels[l].img[kf] for l in range(L)],
        [m.state.levels[l].dpt[kf] for l in range(L)],
        se3m.identity(),
    )
    img_pyr = ip.build_pyramid(jnp.asarray(synth(1.5)), L)
    grad_pyr = ip.build_gradient_pyramid(img_pyr)
    tracker.track_frame(img_pyr, grad_pyr)
    n_track = 64
    img_pyrs = tuple(jnp.broadcast_to(p, (n_track,) + p.shape) for p in img_pyr)
    grad_pyrs = tuple(jnp.broadcast_to(g, (n_track,) + g.shape)
                      for g in grad_pyr)
    tracker.track_burst(img_pyrs, grad_pyrs)  # compile
    t0 = time.perf_counter()
    qs, ts, stats = tracker.track_burst(img_pyrs, grad_pyrs)
    jax.block_until_ready(ts)
    track_fps = n_track / (time.perf_counter() - t0)

    print(f"factors={n_factors} track_fps={track_fps:.1f}", file=sys.stderr)

    baseline_iters = 30.0  # reference effective ISAM2 step rate (BASELINE.md)
    print(json.dumps({
        "metric": "ba_iters_per_s",
        "value": round(ba_iters_per_s, 2),
        "unit": f"full-window BA iterations/s ({n_factors} photometric "
                f"factors, 256x192, CS=32)",
        "vs_baseline": round(ba_iters_per_s / baseline_iters, 3),
    }))


if __name__ == "__main__":
    main()
