"""Stage-by-stage device-time profile of one BA (mapping GN) iteration.

Measures each stage of Mapper's gn_iteration at the bench problem size by
loop-length differencing inside one jit (axon tunnel adds ~5-8 ms per
dispatch, so wall-clock of a single call is meaningless). Run on the real
TPU:  PYTHONPATH=/root/repo python tools/profile_ba.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed_loop(step, init, n_lo=20, n_hi=200):
    """Device-side per-call time of `step` (carry -> carry)."""
    def make(n):
        @jax.jit
        def run(c):
            return lax.scan(lambda c, _: (step(c), None), c, None, length=n)[0]
        return run
    lo, hi = make(n_lo), make(n_hi)
    jax.block_until_ready(lo(init)); jax.block_until_ready(hi(init))
    t0 = time.perf_counter(); jax.block_until_ready(lo(init))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(hi(init))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.camera import PinholeCamera, camera_pyramid
    from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig
    from deepfactors_tpu.mapping import map_state as ms
    from deepfactors_tpu.mapping import factors as fct
    from deepfactors_tpu.mapping import marginal as mg
    from deepfactors_tpu.ops import dense_sfm as ds
    from deepfactors_tpu.solver import system as sysm

    H, W, CS, L = 192, 256, 32, 3
    N_KF = 5
    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = MapperConfig(
        max_keyframes=N_KF, max_frames=1, max_factors=16, code_size=CS,
        height=H, width=W, pyramid_levels=L, pho_iters=(4, 8, 15),
        connection_mode="LASTN", max_back_connections=2, use_schur=True,
        relin_threshold=0.0,
    )
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)

    def synth(k):
        return (0.5 + 0.3 * np.sin(xs / 7 + k) * np.cos(ys / 5 + 0.3 * k)
                + 0.1 * np.sin((xs + 2 * ys) / 11 + k)).astype(np.float32)

    m = Mapper(cfg, cam, decoder=None)
    m.add_keyframe_to_map(synth(0), se3m.identity())
    for k in range(1, N_KF):
        m.add_keyframe_to_map(synth(k), se3m.identity())
        m._add_photo_pair(m.kf_slots[-2], m.kf_slots[-1])
    for w in m.work.work:
        w.active_level = 0
    m._bookkeeping()
    pool = m._compact_pool()
    print(f"P={pool.active.sum()} slots={len(pool.active)}")

    K, F = cfg.max_keyframes, cfg.max_frames
    Dp, Dc = 6 * K, CS * K
    D = Dp + Dc + 6 * F
    cams = camera_pyramid(cam, L)
    params = ds.SfmParams(huber_delta=cfg.huber_delta, avg_dpt=cfg.avg_dpt,
                          min_dpt=cfg.min_dpt, valid_border=cfg.valid_border)

    state0 = m.state
    src = jnp.asarray(pool.src); dst = jnp.asarray(pool.dst)
    act = jnp.asarray(pool.active)

    # --- full iteration (as the bench measures it) ---
    kf_mask = jnp.ones((K,), bool); fr_mask = jnp.ones((F,), bool)
    rep = {k: jnp.asarray(v) for k, v in m.rep_pool._asdict().items()}
    geo = {k: jnp.asarray(v) for k, v in m.geo_pool._asdict().items()}
    args = lambda n: (
        m.state, m.frames, src, dst,
        jnp.asarray(pool.dst_is_frame), jnp.asarray(pool.level), act,
        rep, geo, m.marginals, m.dprior, kf_mask, fr_mask,
        jnp.asarray(0, jnp.int32), se3m.identity().q, se3m.identity().t,
        jnp.asarray(cfg.lm_lambda, jnp.float32),
        jnp.asarray(n, jnp.int32), (0,), False,
    )
    jax.block_until_ready(m._run_fn(*args(20)))
    jax.block_until_ready(m._run_fn(*args(200)))
    t0 = time.perf_counter(); jax.block_until_ready(m._run_fn(*args(20)))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(m._run_fn(*args(200)))
    t_full = (time.perf_counter() - t0 - t_lo) / 180
    print(f"full gn_iteration        : {t_full*1e6:8.1f} us")

    # --- stage: update_depth_all ---
    def s_depth(state):
        return ms.update_depth_all(state, cfg.avg_dpt)
    t = timed_loop(s_depth, state0)
    print(f"update_depth_all (L0-2)  : {t*1e6:8.1f} us")

    # depth update at level 0 only
    def s_depth0(state):
        lvl = state.levels[0]
        dpt = ms._materialize_depth(lvl.prx0, lvl.jac, state.code,
                                    cfg.avg_dpt) \
            if hasattr(ms, "_materialize_depth") else None
        if dpt is None:
            return state
        return state._replace(levels=(lvl._replace(dpt=dpt),)
                              + state.levels[1:])
    try:
        t = timed_loop(s_depth0, state0)
        print(f"update_depth level0 only : {t*1e6:8.1f} us")
    except Exception as e:
        print("  (no level0-only path)", type(e).__name__)

    # --- stage: photometric batch (fused Gram kernel, level 0) ---
    def s_photo(carry):
        state, acc = carry
        b = fct.photometric_batch(state, src, dst, 0, cams[0], params,
                                  active=act, grad_mode=cfg.grad_mode)
        # perturb code so the call can't be hoisted out of the scan
        return state._replace(code=state.code + 1e-12 * b.Jtr[0, 12:44]), \
            acc + b.JtJ
    t = timed_loop(s_photo, (state0, jnp.zeros((len(pool.active), 44, 44))))
    print(f"photometric_batch L0     : {t*1e6:8.1f} us")

    # --- stage: assemble ---
    b0 = fct.photometric_batch(state0, src, dst, 0, cams[0], params,
                               active=act, grad_mode=cfg.grad_mode)
    idx = sysm.factor_slot_indices(src, dst, K, CS)

    def s_assemble(carry):
        Hacc, bacc = carry
        g = sysm.assemble(D, b0.JtJ, b0.Jtr + bacc[None, :44], idx, act)
        return Hacc + g.H, g.b
    t = timed_loop(s_assemble, (jnp.zeros((D, D)), jnp.zeros((D,))))
    print(f"assemble (one-hot MXU)   : {t*1e6:8.1f} us")

    # --- stage: priors + mask (everything between assemble and solve) ---
    gs = sysm.assemble(D, b0.JtJ, b0.Jtr, idx, act)

    def s_priors(carry):
        Hc, bc = carry
        gsys = sysm.GlobalSystem(Hc, bc)
        mH, mg_ = mg.prior_terms(m.marginals, state0.pose, state0.code)
        slots = jnp.arange(K, dtype=jnp.int32)
        midx = jnp.concatenate(
            [slots[:, None] * 6 + jnp.arange(6),
             Dp + slots[:, None] * CS + jnp.arange(CS)], axis=-1
        ).astype(jnp.int32)
        mgsys = sysm.assemble(D, mH, mg_, midx, m.marginals.active)
        gsys = sysm.GlobalSystem(gsys.H + mgsys.H, gsys.b + mgsys.b)
        code_idx_all = (Dp + jnp.arange(Dc)).astype(jnp.int32)
        code_res = state0.code.reshape(-1)
        code_mask = jnp.repeat(state0.active, CS).astype(jnp.float32)
        gsys = sysm.add_diagonal_prior(gsys, code_idx_all, code_mask,
                                       code_res)
        vmask = jnp.concatenate([jnp.repeat(state0.active, 6),
                                 jnp.repeat(state0.active, CS),
                                 jnp.zeros((6 * F,), bool)])
        gsys = sysm.mask_inactive(gsys, vmask)
        return gsys.H, gsys.b
    t = timed_loop(s_priors, (gs.H, gs.b))
    print(f"priors+mask              : {t*1e6:8.1f} us")

    # --- stage: dense Cholesky solve (196) ---
    A = gs.H + jnp.eye(D) * 10.0

    def s_solve(carry):
        bvec = carry
        # perturb A so the factorization can't be hoisted out of the scan
        A2 = A + bvec[0] * 1e-12 * jnp.eye(D)
        d = sysm.solve_damped(sysm.GlobalSystem(A2, bvec),
                              jnp.asarray(1e-4, jnp.float32))
        return bvec + 1e-12 * d
    t = timed_loop(s_solve, gs.b)
    print(f"solve_damped chol({D})   : {t*1e6:8.1f} us")

    # --- stage: schur solve (incl. frame block) ---
    def s_schur(carry):
        bvec = carry
        A2 = A + bvec[0] * 1e-12 * jnp.eye(D)
        d = sysm.solve_schur_codes(
            sysm.GlobalSystem(A2, bvec),
            K, CS, jnp.asarray(1e-4, jnp.float32))
        return bvec + 1e-12 * d
    t = timed_loop(s_schur, gs.b)
    print(f"solve_schur_codes        : {t*1e6:8.1f} us")

    # --- stage: retract ---
    def s_retract(carry):
        state, delta = carry
        dpose = delta[:Dp].reshape(K, 6)
        dcode = delta[Dp:Dp + Dc].reshape(K, CS)
        new_pose = jax.vmap(se3m.retract)(state.pose, 1e-9 * dpose)
        state = state._replace(pose=new_pose, code=state.code + 1e-9 * dcode)
        return state, delta
    t = timed_loop(s_retract, (state0, jnp.ones((D,))))
    print(f"retract+update           : {t*1e6:8.1f} us")


if __name__ == "__main__":
    main()
