"""Isolate fixed dispatch cost vs marginal per-iteration cost of the
mapper run-fn at the bench problem size.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_dispatch.py
Probes: `... profile_dispatch.py fixed` (what makes up the fixed cost),
        `... profile_dispatch.py n0`    (cost with zero loop iterations).
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp


def _bench_mapper():
    """Build the bench-size Mapper + a run-fn args factory (shared setup)."""
    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig

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
    return m, args


def main():
    m, args = _bench_mapper()
    jax.block_until_ready(m._run_fn(*args(2)))
    for n in (2, 2, 20, 100, 100, 200):
        t0 = time.perf_counter()
        out = m._run_fn(*args(n))
        jax.block_until_ready(out[2])
        dt = time.perf_counter() - t0
        print(f"n={n:4d}: total {dt*1e3:8.2f} ms  ({dt/n*1e6:7.1f} us/iter)")

    # how much of the fixed cost is arg prep / transfer?
    a = args(100)
    t0 = time.perf_counter()
    out = m._run_fn(*a)
    jax.block_until_ready(out[2])
    print(f"prebuilt args n=100: {(time.perf_counter()-t0)*1e3:8.2f} ms")


def probe_fixed():
    """What does the ~30 ms fixed dispatch cost consist of?"""
    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    k = jax.random.PRNGKey(0)
    big = jax.random.normal(k, (5, 32, 192, 256))  # ~31.5 MB, like jac L0
    small = jnp.ones((8, 8))

    @jax.jit
    def touch_big(x):
        return x[0, 0, 0, :2].sum()

    @jax.jit
    def touch_small(x):
        return x.sum()

    for name, fn, arg in (("big-arg jit", touch_big, big),
                          ("small-arg jit", touch_small, small)):
        jax.block_until_ready(fn(arg))
        t0 = time.perf_counter()
        for _ in range(5):
            jax.block_until_ready(fn(arg))
        print(f"{name}: {(time.perf_counter()-t0)/5*1e3:7.2f} ms/dispatch")


def probe_n0():
    """Fixed cost with ZERO loop iterations: everything outside the body."""
    m, args = _bench_mapper()
    jax.block_until_ready(m._run_fn(*args(0)))
    for n in (0, 0, 1, 1, 2, 4):
        t0 = time.perf_counter()
        out = m._run_fn(*args(n))
        jax.block_until_ready(out[2])
        print(f"n={n}: {(time.perf_counter()-t0)*1e3:8.2f} ms")
    # wait for full output materialization too
    t0 = time.perf_counter()
    out = m._run_fn(*args(0))
    jax.block_until_ready(out)
    print(f"n=0 full-output block: {(time.perf_counter()-t0)*1e3:8.2f} ms")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "main"
    {"main": main, "fixed": probe_fixed, "n0": probe_n0}[mode]()
