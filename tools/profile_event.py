"""Device-inclusive breakdown of the keyframe event's jitted pieces at the
bench configuration (VERDICT r4 weak #8: keyframes_per_s had no internal
breakdown artifact). Times each stage with block_until_ready so the cost
is dispatch + device compute + one sync, then reports the rep match/RANSAC
sweep over pair counts.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_event.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=10):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.io import synth
    from bench import load_decoder, H, W
    from tools.bench_e2e import build_system

    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    decoder, _ = load_decoder()
    df = build_system(cam, H, W, decoder, max_keyframes=10,
                      dist_threshold=2.0)
    m = df.mapper
    df.prewarm()

    scene = synth.random_room(7, n_boxes=3)
    poses = synth.orbit_trajectory(24)
    frames = synth.render_sequence(scene, cam, poses, H, W)
    # fill to capacity so evictions are exercised
    for i in range(10):
        m.enqueue_keyframe(frames[i], se3m.identity())
        while m.has_work():
            m.mapping_run()
    m.update_map()
    jax.block_until_ready(m.state.pose.t)

    from deepfactors_tpu.ops import image as ip
    L = m.cfg.pyramid_levels
    img = jnp.asarray(frames[11])
    pyr_fn = jax.jit(lambda im: (
        tuple(ip.build_pyramid(im, L)),
        tuple(ip.build_gradient_pyramid(ip.build_pyramid(im, L)))))
    img_pyr, grad_pyr = pyr_fn(img)
    jax.block_until_ready(img_pyr[0])

    # --- keyframe build (decoder decode + detect + pool write) -------------
    build = m._fused_build_kf_fn()
    code0 = jnp.zeros((m.cfg.code_size,), jnp.float32)
    ms_build = timeit(lambda: build(
        m.state, jnp.asarray(0, jnp.int32),
        se3m.identity().q, se3m.identity().t, img_pyr, grad_pyr,
        code0, m.decoder.params, True, jnp.asarray(0, jnp.int32),
        jnp.asarray(False))[0].code)
    print(f"kf build (decoder+detect+write): {ms_build:7.1f} ms")

    # --- rep pairs: match + RANSAC over n back-connections -----------------
    pairs = m._rep_pair_fn()
    for n in (1, 2):
        ias = jnp.zeros(n, jnp.int32)
        ibs = jnp.ones(n, jnp.int32)
        ms_rep = timeit(lambda: pairs(
            m.state.kp_xy, m.state.kp_desc, m.state.kp_valid,
            ias, ibs, jax.random.PRNGKey(0), n))
        print(f"rep match+RANSAC n={n}:          {ms_rep:7.1f} ms")

    # --- eviction ----------------------------------------------------------
    victim = m.kf_slots[0]
    pool = m.sched.photo_pool
    CS = m.cfg.code_size
    # reproduce the evict call shape the real eviction uses
    facs = []
    neighbors = []
    for i in range(m.cfg.max_factors):
        if not pool.active[i] or pool.dst_is_frame[i]:
            continue
        s, d = int(pool.src[i]), int(pool.dst[i])
        if victim not in (s, d):
            continue
        nb = d if s == victim else s
        if nb not in m.kf_slots:
            continue
        if nb not in neighbors:
            neighbors.append(nb)
        facs.append((s, d, int(pool.level[i])))
    if facs:
        P = 1
        while P < len(facs):
            P *= 2
        N = 1
        while N < len(neighbors):
            N *= 2
        levels_present = tuple(sorted({lv for _, _, lv in facs}))
        B = 6 + CS

        def base(slot):
            return 0 if slot == victim else B * (1 + neighbors.index(slot))

        src = np.zeros(P, np.int32)
        dst = np.zeros(P, np.int32)
        lvl = np.zeros(P, np.int32)
        act = np.zeros(P, bool)
        idx = np.zeros((P, 12 + CS), np.int32)
        for j, (s, d, level) in enumerate(facs):
            src[j], dst[j], lvl[j], act[j] = s, d, level, True
            idx[j] = np.concatenate([
                base(s) + np.arange(6), base(d) + np.arange(6),
                base(s) + 6 + np.arange(CS)])
        nb_slot = np.zeros(N, np.int32)
        nb_on = np.zeros(N, bool)
        nb_slot[:len(neighbors)] = neighbors
        nb_on[:len(neighbors)] = True
        evict = m._evict_fn(P, N, levels_present)
        ms_ev = timeit(lambda: evict(
            m.state, m.marginals, jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(lvl), jnp.asarray(act), jnp.asarray(idx),
            jnp.asarray(nb_slot), jnp.asarray(nb_on),
            jnp.asarray(victim, jnp.int32))[1])
        print(f"evict P={P} N={N}:               {ms_ev:7.1f} ms")

    # --- the fused C2F descent (map:segments) ------------------------------
    segs = tuple((l, m.cfg.pho_iters[l] + 1) for l in range(L - 1, -1, -1))
    m._bookkeeping()
    pool_c = m._compact_pool()
    packed = np.stack([
        pool_c.src.astype(np.int32), pool_c.dst.astype(np.int32),
        pool_c.dst_is_frame.astype(np.int32), pool_c.level.astype(np.int32),
        pool_c.active.astype(np.int32),
        np.zeros_like(pool_c.src, np.int32),
    ])
    rep, geo = m._rep_geo_dev()
    aq, at, aslot = m._anchor_dev()
    ms_seg = timeit(lambda: m._run_segments_fn(
        m.state, m.frames, jnp.asarray(packed), rep, geo, m.marginals,
        m.dprior, aq, at, aslot, segs, False)[2])
    print(f"C2F descent segs={segs}: {ms_seg:7.1f} ms")

    # --- update_map --------------------------------------------------------
    ms_um = timeit(lambda: m._update_depth_jit(m.state).code
                   if getattr(m, "_update_depth_jit", None)
                   else (m.update_map(), m.state.code)[1])
    print(f"update_map:                     {ms_um:7.1f} ms")


if __name__ == "__main__":
    main()
