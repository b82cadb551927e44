"""Gather-cost isolation in the interp band sampler.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_gram4.py
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

    def run_variant(name):
        def fn(p):
            return sk.sfm_gram_batch(p, src, dst, img0, dpt, jacT, img1,
                                     active=act1, grad_mode="interp",
                                     block_h=96)
        fn(params)
        t = timed(fn, params)
        print(f"{name:32s}: {t*1e6:8.1f} us")
        sk.sfm_gram_batch._clear_cache()

    run_variant("baseline KGROUP=4")

    sk._KGROUP = 2
    run_variant("KGROUP=2")
    sk._KGROUP = 4

    # replace gathers with static slices (wrong results; times the gathers)
    orig_fast = sk._band_sample_interp_fast
    orig_take = jnp.take_along_axis

    import deepfactors_tpu.ops.pallas.sfm_kernel as mod
    src_code = orig_fast.__code__

    def patched(chan_ref, acc_refs, x1, y1, H, W, tw, band, kmax, bh=8):
        # same structure, but slices instead of gathers
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        x0f = jnp.floor(x1); y0f = jnp.floor(y1)
        wx = jnp.where(x0f >= W - 1, 0.0, x1 - x0f)
        wy = jnp.where(y0f >= H - 1, 0.0, y1 - y0f)
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
        rr = jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 0)
        e = y0 - rr
        emin = jnp.min(e)
        b0 = jnp.clip((emin // 8) * 8, 0, H - band)
        b0 = pl.multiple_of(b0, 8)
        sh = emin - b0
        d = e - emin
        cover = ((sh + d + rr >= 0) & (sh + d + rr + 2 <= band)
                 & (d <= kmax - 2))
        dcap = jnp.minimum(d, kmax - 2)
        dmax = jnp.max(jnp.where(cover, dcap, 0))
        n_xb = W // tw
        xl = [x0 - xb * tw for xb in range(n_xb)]
        inb = [(q >= 0) & (q < tw) for q in xl]
        B = chan_ref[0, pl.ds(b0, band), :]
        RB = pltpu.roll(B, jax.lax.rem(b0 - emin + band, band), 0)
        RBx = pltpu.roll(RB, W - 1, 1)
        for c in range(3):
            acc_refs[c][:] = jnp.zeros((bh, tw), jnp.float32)
        for g in range((kmax + 4 - 1) // 4):
            @pl.when(g * 4 <= dmax + 1)
            def _(g=g):
                acc_i = acc_refs[0][:]
                acc_gx = acc_refs[1][:]
                acc_gy = acc_refs[2][:]
                for kk in range(4):
                    k = g * 4 + kk
                    sel0 = (d == k)
                    w_row = jnp.where(sel0, 1.0 - wy, 0.0)
                    v_row = jnp.where(sel0, -1.0, 0.0)
                    if k > 0:
                        sel1 = (d == k - 1)
                        w_row = w_row + jnp.where(sel1, wy, 0.0)
                        v_row = v_row + jnp.where(sel1, 1.0, 0.0)
                    Sk = RB[k:k + bh]
                    Skx = RBx[k:k + bh]
                    for xb in range(n_xb):
                        wv = jnp.where(inb[xb], w_row, 0.0)
                        vv = jnp.where(inb[xb], v_row, 0.0)
                        gA = Sk[:, xb * tw:(xb + 1) * tw]   # << no gather
                        gB = Skx[:, xb * tw:(xb + 1) * tw]  # << no gather
                        t = gB - gA
                        xi = gA + wx * t
                        acc_i = acc_i + wv * xi
                        acc_gx = acc_gx + wv * t
                        acc_gy = acc_gy + vv * xi
                acc_refs[0][:] = acc_i
                acc_refs[1][:] = acc_gx
                acc_refs[2][:] = acc_gy
        return cover

    sk._band_sample_interp_fast = patched
    run_variant("gathers->slices")
    sk._band_sample_interp_fast = orig_fast


if __name__ == "__main__":
    main()
