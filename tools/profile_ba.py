"""Decompose the BA iteration cost on the real TPU.

Times each stage of the gn_iteration (mapping/mapper.py) in isolation using
loop-length differencing inside one jit (the axon tunnel adds ~5-8 ms per
dispatch, so per-iteration device time = (t_long - t_short) / (n_long -
n_short)). Run from /root/repo: python tools/profile_ba.py
"""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from deepfactors_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera, camera_pyramid
from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig
from deepfactors_tpu.mapping import map_state as ms
from deepfactors_tpu.mapping import factors as fct
from deepfactors_tpu.mapping import marginal as mg
from deepfactors_tpu.ops import dense_sfm as ds
from deepfactors_tpu.ops.pallas import sfm_kernel as sk
from deepfactors_tpu.solver import system as sysm

H, W, CS, L = 192, 256, 32, 3
N_KF = 5

cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                           width=W, height=H)
cfg = MapperConfig(
    max_keyframes=N_KF, max_frames=1, max_factors=16, code_size=CS,
    height=H, width=W, pyramid_levels=L, pho_iters=(4, 8, 15),
    connection_mode="LASTN", max_back_connections=2, use_schur=False,
    relin_threshold=0.0,
)
K = cfg.max_keyframes
F = cfg.max_frames
Dp, Dc = 6 * K, CS * K
D = Dp + Dc + 6 * F
cams = camera_pyramid(cam, L)
params = ds.SfmParams(huber_delta=cfg.huber_delta, avg_dpt=cfg.avg_dpt,
                      min_dpt=cfg.min_dpt, valid_border=cfg.valid_border)

ys_, xs_ = np.mgrid[0:H, 0:W].astype(np.float32)


def synth(k):
    return (0.5 + 0.3 * np.sin(xs_ / 7 + k) * np.cos(ys_ / 5 + 0.3 * k)
            + 0.1 * np.sin((xs_ + 2 * ys_) / 11 + k)).astype(np.float32)


m = Mapper(cfg, cam, decoder=None)
m.add_keyframe_to_map(synth(0), se3m.identity())
for k in range(1, N_KF):
    m.add_keyframe_to_map(synth(k), se3m.identity())
    m._add_photo_pair(m.kf_slots[-2], m.kf_slots[-1])
for w in m.work.work:
    w.active_level = 0
m._bookkeeping()
print("active factors:", int(np.sum(m.pool.active)))

state = m.state
pool_src = jnp.asarray(m.pool.src)
pool_dst = jnp.asarray(m.pool.dst)
pool_active = jnp.asarray(m.pool.active)
marginals = m.marginals


def timeloop(fn, carry, n_lo=20, n_hi=220):
    """fn: carry -> carry. Returns per-iteration seconds via differencing."""
    @functools.partial(jax.jit, static_argnames=())
    def run(carry, n):
        def body(i, c):
            return fn(c)
        return jax.lax.fori_loop(0, n, body, carry)

    out = run(carry, jnp.asarray(n_lo))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(carry, jnp.asarray(n_lo))
    jax.block_until_ready(out)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = run(carry, jnp.asarray(n_hi))
    jax.block_until_ready(out)
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


EPS = 1e-30

# ---- 1. update_depth_all ---------------------------------------------------
def f_depth(st):
    st2 = ms.update_depth_all(st, cfg.avg_dpt)
    # feed dpt back into code so the loop body can't be hoisted
    return st2._replace(code=st2.code + EPS * st2.levels[0].dpt[0, 0, 0])

t = timeloop(f_depth, state)
print(f"update_depth_all (3 levels, K=5): {t*1e6:9.1f} us")

# ---- 2. gram kernel --------------------------------------------------------
def f_gram(st):
    pose0 = ms.poses_of(st, pool_src)
    pose1 = ms.poses_of(st, pool_dst)
    pose_10, j1, j0 = jax.vmap(se3m.relative_pose_jacobians)(pose1, pose0)
    kp = sk.make_sfm_params(pose_10, cams[0], params.valid_border,
                            params.min_dpt, params.huber_delta, params.avg_dpt)
    lvl = st.levels[0]
    G = sk.sfm_gram_batch(kp, pool_src, pool_dst, lvl.img, lvl.dpt, lvl.jac,
                          lvl.img, lvl.grad[..., 0], lvl.grad[..., 1],
                          active=pool_active, grad_mode=cfg.grad_mode)
    return st._replace(code=st.code + EPS * G[0, 0, 0])

t_gram = timeloop(f_gram, state)
print(f"pose-jac + gram kernel (16 slots, 8 active): {t_gram*1e6:9.1f} us")

# ---- 3. gram -> systems -> assemble ---------------------------------------
pose0 = ms.poses_of(state, pool_src)
pose1 = ms.poses_of(state, pool_dst)
pose_10, j1, j0 = jax.vmap(se3m.relative_pose_jacobians)(pose1, pose0)
kp0 = sk.make_sfm_params(pose_10, cams[0], params.valid_border,
                         params.min_dpt, params.huber_delta, params.avg_dpt)
lvl0 = state.levels[0]
G0 = sk.sfm_gram_batch(kp0, pool_src, pool_dst, lvl0.img, lvl0.dpt, lvl0.jac,
                       lvl0.img, lvl0.grad[..., 0], lvl0.grad[..., 1],
                       active=pool_active)
G0 = jax.block_until_ready(G0)


def f_expand(carry):
    G, acc = carry
    JtJ, Jtr, res, inl = sk.system_from_gram(G, j0, j1, CS)
    idx = sysm.factor_slot_indices(pool_src, pool_dst, K, CS)
    gsys = sysm.assemble(D, JtJ, Jtr, idx, pool_active)
    return (G + EPS * gsys.H[0, 0], acc + gsys.b[0])

t_exp = timeloop(f_expand, (G0, jnp.float32(0)))
print(f"system_from_gram + assemble:                 {t_exp*1e6:9.1f} us")

# ---- 4. priors + mask + solve ----------------------------------------------
gsys0 = sysm.assemble(D, *sk.system_from_gram(G0, j0, j1, CS)[:2],
                      sysm.factor_slot_indices(pool_src, pool_dst, K, CS),
                      pool_active)
Hm = jax.block_until_ready(gsys0.H)
bm = gsys0.b


def f_solve(carry):
    Hc, bc = carry
    delta = sysm.solve_damped(sysm.GlobalSystem(Hc, bc),
                              jnp.float32(cfg.lm_lambda))
    return (Hc + EPS * delta[0], bc + EPS * delta[1])

t_solve = timeloop(f_solve, (Hm, bm))
print(f"solve_damped (chol {D}):                     {t_solve*1e6:9.1f} us")


def f_schur(carry):
    Hc, bc = carry
    delta = sysm.solve_schur_codes(
        sysm.GlobalSystem(Hc[:Dp + Dc, :Dp + Dc], bc[:Dp + Dc]), K, CS,
        jnp.float32(cfg.lm_lambda))
    return (Hc + EPS * delta[0], bc + EPS * delta[1])

t_schur = timeloop(f_schur, (Hm, bm))
print(f"solve_schur_codes:                           {t_schur*1e6:9.1f} us")

# ---- 5. priors/mask/retract remainder --------------------------------------
def f_rest(carry):
    st, Hc, bc = carry
    gsys = sysm.GlobalSystem(Hc, bc)
    mH, mg_ = mg.prior_terms(marginals, st.pose, st.code)
    slots = jnp.arange(K, dtype=jnp.int32)
    midx = jnp.concatenate(
        [slots[:, None] * 6 + jnp.arange(6),
         Dp + slots[:, None] * CS + jnp.arange(CS)], axis=-1
    ).astype(jnp.int32)
    mgsys = sysm.assemble(D, mH, mg_, midx, marginals.active)
    gsys = sysm.GlobalSystem(gsys.H + mgsys.H, gsys.b + mgsys.b)
    code_w = 1.0 / (cfg.code_prior ** 2)
    code_idx_all = (Dp + jnp.arange(Dc)).astype(jnp.int32)
    code_res = st.code.reshape(-1)
    code_mask = jnp.repeat(st.active, CS).astype(jnp.float32)
    gsys = sysm.add_diagonal_prior(gsys, code_idx_all, code_w * code_mask,
                                   code_res)
    pose_w = 1.0 / (cfg.pose_prior ** 2)
    anchor_pose = SE3(st.pose.q[0], st.pose.t[0])
    pose_res = se3m.local(se3m.identity(), anchor_pose)
    anchor_idx = (0 * 6 + jnp.arange(6)).astype(jnp.int32)
    gsys = sysm.add_diagonal_prior(gsys, anchor_idx, jnp.full((6,), pose_w),
                                   pose_res)
    pose_m = jnp.repeat(st.active, 6)
    code_m = jnp.repeat(st.active, CS)
    fr_m = jnp.zeros((6 * F,), bool)
    vmask = jnp.concatenate([pose_m, code_m, fr_m])
    gsys = sysm.mask_inactive(gsys, vmask)
    delta = sysm.solve_damped(gsys, jnp.float32(cfg.lm_lambda))
    dpose = delta[:Dp].reshape(K, 6)
    dcode = delta[Dp:Dp + Dc].reshape(K, CS)
    new_pose = jax.vmap(se3m.retract)(st.pose, dpose)
    st = st._replace(pose=new_pose, code=st.code + dcode)
    return (st, Hc + EPS * delta[0], bc)

t_rest = timeloop(f_rest, (state, Hm, bm))
print(f"priors+mask+solve+retract:                   {t_rest*1e6:9.1f} us")

# ---- 6. the full run fn ----------------------------------------------------
kf_mask = jnp.ones((K,), bool)
fr_mask = jnp.ones((F,), bool)
rep = {k: jnp.asarray(v) for k, v in m.rep_pool._asdict().items()}
geo = {k: jnp.asarray(v) for k, v in m.geo_pool._asdict().items()}
args = lambda n: (
    m.state, m.frames, pool_src, pool_dst,
    jnp.asarray(m.pool.dst_is_frame), jnp.asarray(m.pool.level),
    pool_active, rep, geo, m.marginals, m.dprior, kf_mask, fr_mask,
    jnp.asarray(0, jnp.int32), se3m.identity().q, se3m.identity().t,
    jnp.asarray(cfg.lm_lambda, jnp.float32), jnp.asarray(n, jnp.int32),
    (0,), False,
)
out = m._run_fn(*args(2))
jax.block_until_ready(out)
t0 = time.perf_counter()
out = m._run_fn(*args(20))
jax.block_until_ready(out)
t20 = time.perf_counter() - t0
t0 = time.perf_counter()
out = m._run_fn(*args(220))
jax.block_until_ready(out)
t220 = time.perf_counter() - t0
t_full = (t220 - t20) / 200
print(f"FULL gn_iteration:                           {t_full*1e6:9.1f} us")
print(f"  sum of parts: {(t + t_gram + t_exp + t_rest)*1e6:.1f} us")
