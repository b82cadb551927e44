"""Isolate sampler vs correspondence vs rows cost in the fused SfM kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_gram3.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, p0, n_lo=10, n_hi=50):
    def make(n):
        @jax.jit
        def run(pp):
            def body(c, _):
                out = fn(c)
                return c + 1e-20 * out[0, 0, 0], None
            return lax.scan(body, pp, None, length=n)[0]
        return run
    lo, hi = make(n_lo), make(n_hi)
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
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.ops.pallas import sfm_kernel as sk

    H, W, CS, K, P = 192, 256, 32, 5, 8
    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    img0 = jax.random.uniform(ks[0], (K, H, W))
    dpt = 1.5 + jax.random.uniform(ks[1], (K, H, W))
    jacT = jax.random.normal(ks[2], (K, CS, H, W)) * 0.1
    img1 = jax.random.uniform(ks[3], (K, H, W))
    src = jnp.arange(P, dtype=jnp.int32) % K
    dst = (jnp.arange(P, dtype=jnp.int32) + 1) % K
    dw = 0.02 * jax.random.normal(ks[6], (P, 6))
    pose = jax.vmap(lambda d: se3m.retract(se3m.identity(), d))(dw)
    params = sk.make_sfm_params(pose, cam, 2, 0.0, 0.3, 2.0)
    act1 = jnp.ones((P,), jnp.int32)

    orig_sample = sk._sample_planes
    orig_acc = sk._accumulate_gram

    def sample_noop(grad_mode, img1_ref, gx1_ref, gy1_ref, acc_refs,
                    x1, y1, H, W, tw, band, bh=8):
        i = img1_ref[0, pl_ds0(bh), :] if False else x1 * 0.5
        return x1 * 0.3, y1 * 0.1, x1 * 0.01, (x1 < W)

    def pl_ds0(bh):
        from jax.experimental import pallas as pl
        return pl.ds(0, bh)

    def acc_noop(g_ref, rows, tw, bh=8):
        s = rows[0]
        for r in rows[1:]:
            s = s + r
        g_ref[0, 0] += jnp.sum(s)

    def run_variant(name):
        def fn(p):
            return sk.sfm_gram_batch(p, src, dst, img0, dpt, jacT, img1,
                                     active=act1, grad_mode="interp",
                                     block_h=96)
        fn(params)
        t = timed(fn, params)
        print(f"{name:32s}: {t*1e6:8.1f} us")
        sk.sfm_gram_batch._clear_cache()

    sk._sample_planes = sample_noop
    run_variant("sampler->noop")
    sk._accumulate_gram = acc_noop
    run_variant("sampler+gram->noop")
    sk._sample_planes = orig_sample
    sk._accumulate_gram = orig_acc


if __name__ == "__main__":
    main()
