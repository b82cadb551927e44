"""Image op tests vs naive NumPy references (mirrors ut_cuda_utils.cpp:73,110
which check Downsample and SobelGradients against a CPU loop)."""
import numpy as np
import jax.numpy as jnp

from deepfactors_tpu.ops import image as ip


def _np_sobel(img):
    H, W = img.shape
    mx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
    my = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)
    out = np.zeros((H, W, 2), dtype=np.float32)
    for y in range(H):
        for x in range(W):
            sdx = sdy = 0.0
            for py in (-1, 0, 1):
                for px in (-1, 0, 1):
                    xx = min(max(x + px, 0), W - 1)
                    yy = min(max(y + py, 0), H - 1)
                    sdx += img[yy, xx] * mx[1 + py, 1 + px]
                    sdy += img[yy, xx] * my[1 + py, 1 + px]
            out[y, x] = (sdx / 8.0, sdy / 8.0)
    return out


def _np_blur_down(img):
    H, W = img.shape
    k = np.array(
        [
            [1, 4, 6, 4, 1],
            [4, 16, 24, 16, 4],
            [6, 24, 36, 24, 6],
            [4, 16, 24, 16, 4],
            [1, 4, 6, 4, 1],
        ],
        dtype=np.float32,
    )
    Ho, Wo = H // 2, W // 2
    out = np.zeros((Ho, Wo), dtype=np.float32)
    for y in range(Ho):
        for x in range(Wo):
            s = w = 0.0
            for py in range(5):
                for px in range(5):
                    nx = min(max(2 * x + px - 2, 0), W - 1)
                    ny = min(max(2 * y + py - 2, 0), H - 1)
                    s += img[ny, nx] * k[py, px]
                    w += k[py, px]
            out[y, x] = s / w
    return out


def test_sobel_matches_reference_loop():
    rng = np.random.RandomState(0)
    img = rng.rand(17, 23).astype(np.float32)
    ref = _np_sobel(img)
    out = np.asarray(ip.sobel_gradients(jnp.asarray(img)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_blur_down_matches_reference_loop():
    rng = np.random.RandomState(1)
    img = rng.rand(18, 24).astype(np.float32)
    ref = _np_blur_down(img)
    out = np.asarray(ip.gaussian_blur_down(jnp.asarray(img)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bilinear_exact_at_integers():
    rng = np.random.RandomState(2)
    img = rng.rand(10, 12).astype(np.float32)
    ys, xs = np.mgrid[0:10, 0:12]
    pix = jnp.asarray(np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32))
    out = np.asarray(ip.bilinear_sample(jnp.asarray(img), pix)).reshape(10, 12)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_bilinear_midpoint():
    img = jnp.asarray([[0.0, 1.0], [2.0, 3.0]], dtype=jnp.float32)
    v = float(ip.bilinear_sample(img, jnp.asarray([0.5, 0.5])))
    assert abs(v - 1.5) < 1e-6


def test_pyramid_shapes():
    img = jnp.zeros((64, 96))
    pyr = ip.build_pyramid(img, 4)
    assert [p.shape for p in pyr] == [(64, 96), (32, 48), (16, 24), (8, 12)]


def test_update_depth_linearity():
    rng = np.random.RandomState(3)
    H, W, CS = 12, 16, 8
    prx0 = jnp.asarray(rng.uniform(0.3, 0.7, (H, W)).astype(np.float32))
    jac = jnp.asarray(rng.uniform(-0.02, 0.02, (H, W, CS)).astype(np.float32))
    c = jnp.asarray(rng.uniform(-1, 1, CS).astype(np.float32))
    d = ip.update_depth(c, prx0, jac, 2.0)
    prx = np.asarray(prx0) + np.asarray(jac) @ np.asarray(c)
    np.testing.assert_allclose(np.asarray(d), 2.0 / prx - 2.0, rtol=1e-4)
