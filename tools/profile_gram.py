"""Micro-profile of the fused SfM Gram kernel: isolate DMA floor vs compute.

Loop-differencing inside one jit (axon tunnel: per-dispatch ms-scale noise).
Run: PYTHONPATH=/root/repo python tools/profile_gram.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, n_lo=20, n_hi=100):
    def make(n):
        @jax.jit
        def run(pp):
            def body(c, _):
                out = fn(c, *args[1:])
                return c + 1e-20 * out[0, 0, 0], None
            return lax.scan(body, pp, None, length=n)[0]
        return run
    lo, hi = make(n_lo), make(n_hi)
    p0 = args[0]
    jax.block_until_ready(lo(p0)); jax.block_until_ready(hi(p0))
    t0 = time.perf_counter(); jax.block_until_ready(lo(p0))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(hi(p0))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.se3 import SE3
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.ops.pallas import sfm_kernel as sk

    H, W, CS, K, P = 192, 256, 32, 5, 8
    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    img0 = jax.random.uniform(ks[0], (K, H, W))
    dpt = 1.5 + jax.random.uniform(ks[1], (K, H, W))
    jacT = jax.random.normal(ks[2], (K, CS, H, W)) * 0.1
    img1 = jax.random.uniform(ks[3], (K, H, W))
    gx1 = jax.random.normal(ks[4], (K, H, W)) * 0.1
    gy1 = jax.random.normal(ks[5], (K, H, W)) * 0.1
    src = jnp.arange(P, dtype=jnp.int32) % K
    dst = (jnp.arange(P, dtype=jnp.int32) + 1) % K
    # small random pose offsets (realistic warp spread)
    dw = 0.02 * jax.random.normal(ks[6], (P, 6))
    pose = jax.vmap(lambda d: se3m.retract(se3m.identity(), d))(dw)
    params = sk.make_sfm_params(pose, cam, 2, 0.0, 0.3, 2.0)

    act1 = jnp.ones((P,), jnp.int32)
    act0 = jnp.zeros((P,), jnp.int32)

    jac_bytes = (P * CS * H * W + 2 * P * H * W) * 4
    img1_bytes = P * H * W * 4 * 1
    print(f"traffic: jac+img0+dpt {jac_bytes/1e6:.1f} MB "
          f"+ img1 {img1_bytes/1e6:.1f} MB; "
          f"roofline @819GB/s = {(jac_bytes+img1_bytes)/819e9*1e6:.1f} us")

    for bh in (8, 24, 32, 48, 96):
        for mode, name in (("interp", "interp"), ("sampled", "sampled")):
            def fn(p, m=mode, b=bh):
                if m == "interp":
                    return sk.sfm_gram_batch(p, src, dst, img0, dpt, jacT,
                                             img1, active=act1, grad_mode=m,
                                             block_h=b)
                return sk.sfm_gram_batch(p, src, dst, img0, dpt, jacT, img1,
                                         gx1, gy1, active=act1, grad_mode=m,
                                         block_h=b)
            t = timed(fn, params)
            print(f"bh={bh:3d} {name:8s}: {t*1e6:8.1f} us")

    # DMA+machinery floor: all slots inactive
    def fn_inactive(p):
        return sk.sfm_gram_batch(p, src, dst, img0, dpt, jacT, img1,
                                 active=act0, grad_mode="interp", block_h=96)
    t = timed(fn_inactive, params)
    print(f"all-inactive (DMA floor) : {t*1e6:8.1f} us")

    # error kernel for comparison (no jac reads)
    def fn_err(p):
        return jnp.zeros((1, 1, 1)) + sk.sfm_error_batch(
            p, src, dst, img0, dpt, img1, active=act1)[0][None, None, :1]
    t = timed(fn_err, params)
    print(f"error kernel (no jac)    : {t*1e6:8.1f} us")


if __name__ == "__main__":
    main()
