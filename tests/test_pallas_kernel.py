"""Pallas warp kernel logic tests (interpreter mode on CPU — the real-TPU
equivalence and speed are exercised by bench.py / tools/kernel_benchmark)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.ops.pallas import warp_kernel as wk

H, W = 32, 128


def test_band_warp_matches_reference_interpret():
    rng = np.random.RandomState(0)
    chans = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    x1 = jnp.asarray(xs + 2.0 * np.sin(ys / 10) + 0.7)
    y1 = jnp.asarray(ys + 1.5 * np.cos(xs / 15) - 0.3)
    out, cover = wk.bilinear_warp_planes(chans, x1, y1, band=16,
                                         interpret=True)
    ref, _ = wk.bilinear_warp_reference(chans, x1, y1)
    c = np.asarray(cover) > 0.5
    assert c.mean() > 0.9
    err = np.abs(np.asarray(out) - np.asarray(ref))[:, c]
    assert err.max() < 1e-5


def test_band_warp_extreme_coords_masked():
    """Coordinates far outside the band report zero coverage, not garbage."""
    rng = np.random.RandomState(1)
    chans = jnp.asarray(rng.rand(1, H, W).astype(np.float32))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    x1 = jnp.asarray(xs)
    y1 = jnp.asarray((ys * 7) % H)  # violently scattered rows
    out, cover = wk.bilinear_warp_planes(chans, x1, y1, band=16,
                                         interpret=True)
    ref, _ = wk.bilinear_warp_reference(chans, x1, y1)
    c = np.asarray(cover) > 0.5
    # wherever the kernel claims coverage it must be correct
    if c.any():
        err = np.abs(np.asarray(out) - np.asarray(ref))[:, c]
        assert err.max() < 1e-5
