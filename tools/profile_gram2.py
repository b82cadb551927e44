"""Isolate the Gram-accumulation cost inside the fused SfM kernel by
monkeypatching _accumulate_gram with alternative lowerings.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_gram2.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, p0, n_lo=20, n_hi=100):
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

    orig = sk._accumulate_gram

    def acc_noop(g_ref, rows, tw, bh=8):
        # cheapest data-dependent accumulation: sum of rows into col 0
        s = rows[0]
        for r in rows[1:]:
            s = s + r
        g_ref[0, 0] += jnp.sum(s)

    def acc_2d_dot(g_ref, rows, tw, bh=8):
        R = len(rows)
        Bs = jnp.stack(rows)  # [R, bh, tw]
        dims = (((1, 2), (1, 2)), ((), ()))
        g_ref[:] += jax.lax.dot_general(Bs, Bs, dims,
                                        preferred_element_type=jnp.float32)

    def acc_chunk8(g_ref, rows, tw, bh=8):
        R = len(rows)
        Bs = jnp.stack(rows)  # [R, bh, tw]
        acc = jnp.zeros((R, R), jnp.float32)
        for r in range(bh // 8):
            Bc = Bs[:, r * 8:(r + 1) * 8, :].reshape(R, 8 * tw)
            dims = (((1,), (1,)), ((), ()))
            acc += jax.lax.dot_general(Bc, Bc, dims,
                                       preferred_element_type=jnp.float32)
        g_ref[:] += acc

    def acc_nostack(g_ref, rows, tw, bh=8):
        # avoid jnp.stack: concatenate along sublanes then reshape
        R = len(rows)
        Bs = jnp.concatenate([r.reshape(1, bh * tw) for r in rows], axis=0)
        dims = (((1,), (1,)), ((), ()))
        g_ref[:] += jax.lax.dot_general(Bs, Bs, dims,
                                        preferred_element_type=jnp.float32)

    variants = [("orig (stack+flat dot)", orig), ("noop-sum", acc_noop),
                ("2d-contract dot", acc_2d_dot), ("chunk8 dots", acc_chunk8),
                ("reshape-each", acc_nostack)]
    for name, acc in variants:
        sk._accumulate_gram = acc
        for bh in (96,):
            def fn(p, b=bh):
                return sk.sfm_gram_batch(p, src, dst, img0, dpt, jacT, img1,
                                         active=act1, grad_mode="interp",
                                         block_h=b)
            try:
                fn(params)  # compile outside timing
                t = timed(fn, params)
                print(f"{name:24s} bh={bh}: {t*1e6:8.1f} us")
            except Exception as e:
                print(f"{name:24s} bh={bh}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")
            sk.sfm_gram_batch._clear_cache()
    sk._accumulate_gram = orig


if __name__ == "__main__":
    main()
