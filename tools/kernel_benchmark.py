#!/usr/bin/env python
"""kernel_benchmark — sweep the dense-alignment hot ops across problem
configurations and report timings.

Reference analogue: sources/tools/kernel_benchmark.cpp:144-228 grid-searches
CUDA launch configs (threads x blocks). On TPU the compiler owns scheduling,
so the tunable axes are *problem shape*: factor batch size, pyramid level,
code size, and implementation (XLA reference vs Pallas kernels when present).
Results guide the mapper's batching choices.

Usage: python tools/kernel_benchmark.py [--width 256 --height 192 --cs 32]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def main(argv):
    from deepfactors_tpu.config import parse_args
    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.se3 import SE3
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.ops import dense_sfm as ds, image as ip

    flags = parse_args(argv)
    W = int(flags.get("width", 256))
    H = int(flags.get("height", 192))
    CS = int(flags.get("cs", 32))

    rng = np.random.RandomState(0)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img0 = jnp.asarray((0.5 + 0.3 * np.sin(xs / 7) * np.cos(ys / 5)).astype(np.float32))
    img1 = jnp.asarray((0.5 + 0.3 * np.sin(xs / 7 + 0.2) * np.cos(ys / 5)).astype(np.float32))
    grad1 = ip.sobel_gradients(img1)
    dpt0 = jnp.full((H, W), 2.0)
    std0 = jnp.zeros((H, W))
    jac0 = jnp.asarray(0.01 * rng.standard_normal((H, W, CS)).astype(np.float32))
    cam = PinholeCamera.create(fx=0.9 * W, fy=0.9 * W, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    params = ds.SfmParams(0.3, 2.0, 0.0, 2)
    p0 = se3m.identity()

    print(f"problem: {W}x{H} CS={CS} on {jax.devices()[0]}")
    print("note: per-dispatch host latency (~1-8 ms over a tunneled chip) "
          "floors single-shot numbers; deltas across batch sizes reflect "
          "true device cost")
    print(f"{'op':<34}{'batch':>6}{'ms':>10}{'ms/item':>10}")

    for B in (1, 2, 4, 8, 16):
        @jax.jit
        def batched():
            def one(_):
                s, _v = ds.sfm_step(p0, p0, jnp.zeros(CS), cam, img0, img1,
                                    dpt0, std0, jac0, grad1, params)
                return s.JtJ
            return jax.vmap(one)(jnp.arange(B))

        ms = bench(batched)
        print(f"{'sfm_step (44-dim system)':<34}{B:>6}{ms:>10.3f}{ms / B:>10.3f}")

    for level, (h, w) in enumerate([(H, W), (H // 2, W // 2), (H // 4, W // 4)]):
        i0 = img0[:h, :w]
        i1 = img1[:h, :w]
        g1 = ip.sobel_gradients(i1)
        d0 = jnp.full((h, w), 2.0)
        caml = cam.level(level)

        @jax.jit
        def se3s():
            return ds.se3_step(p0, caml, i0, i1, d0, g1, 0.3).JtJ

        print(f"{'se3_step level ' + str(level):<34}{1:>6}{bench(se3s):>10.3f}")

    @jax.jit
    def blur():
        return ip.gaussian_blur_down(img0)

    @jax.jit
    def sobel():
        return ip.sobel_gradients(img0)

    @jax.jit
    def upd():
        return ip.update_depth(jnp.zeros(CS), img0 * 0 + 0.5, jac0, 2.0)

    print(f"{'gaussian_blur_down':<34}{1:>6}{bench(blur):>10.3f}")
    print(f"{'sobel_gradients':<34}{1:>6}{bench(sobel):>10.3f}")
    print(f"{'update_depth (code->dpt)':<34}{1:>6}{bench(upd):>10.3f}")

    # fused Pallas Gram kernels (sfm_kernel.py) — the production hot path
    if H % 8 == 0 and W % min(128, W) == 0:
        from deepfactors_tpu.ops.pallas import sfm_kernel as pk

        K = 5
        imgs = jnp.stack([img0] * K)
        dpts = jnp.stack([dpt0] * K)
        jacT = jnp.stack([jnp.transpose(jac0, (2, 0, 1))] * K)
        gxs = jnp.stack([grad1[..., 0]] * K)
        gys = jnp.stack([grad1[..., 1]] * K)
        on_cpu = jax.devices()[0].platform == "cpu"
        for B in (1, 8, 16):
            src = jnp.asarray(np.arange(B) % K, jnp.int32)
            dst = jnp.asarray((np.arange(B) + 1) % K, jnp.int32)
            kp = pk.make_sfm_params(
                SE3(jnp.tile(p0.q, (B, 1)), jnp.tile(p0.t, (B, 1))),
                cam, 2, 0.0, 0.3, 2.0)

            @jax.jit
            def sfm_gram():
                return pk.sfm_gram_batch(kp, src, dst, imgs, dpts, jacT,
                                         imgs, gxs, gys, interpret=on_cpu)

            @jax.jit
            def se3_gram():
                return pk.se3_gram_batch(kp, src, dst, imgs, dpts,
                                         imgs, gxs, gys, interpret=on_cpu)

            ms = bench(sfm_gram)
            print(f"{'sfm_gram_batch PALLAS':<34}{B:>6}{ms:>10.3f}"
                  f"{ms / B:>10.3f}")
            ms = bench(se3_gram)
            print(f"{'se3_gram_batch PALLAS':<34}{B:>6}{ms:>10.3f}"
                  f"{ms / B:>10.3f}")

        src = jnp.zeros((1,), jnp.int32)
        kp = pk.make_sfm_params(SE3(p0.q[None], p0.t[None]), cam, 1, 0.0,
                                0.1, 2.0)

        @jax.jit
        def warp():
            return pk.se3_warp_batch(kp, src, src, imgs[:1], dpts[:1],
                                     imgs[:1], interpret=on_cpu)

        print(f"{'se3_warp_batch PALLAS':<34}{1:>6}{bench(warp):>10.3f}")
    else:
        print("(image shape not tile-aligned; fused kernels skipped)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
