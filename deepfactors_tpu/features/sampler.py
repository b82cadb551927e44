"""Uniform pixel sampling (reference sources/core/gtsam/uniform_sampler.cpp,
mt19937-based) — here a jittable jax.random sampler used by the sparse
geometric factor (fixed N, stochastic resampling per relinearization when
enabled, sparse_geometric_factor.cpp:153-157)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_uniform_pixels(key, n: int, width: int, height: int, border: int = 1):
    """[n, 2] float (x, y) pixel coordinates, uniform inside the border."""
    kx, ky = jax.random.split(key)
    x = jax.random.uniform(kx, (n,), minval=border, maxval=width - 1 - border)
    y = jax.random.uniform(ky, (n,), minval=border, maxval=height - 1 - border)
    return jnp.stack([x, y], axis=-1)
