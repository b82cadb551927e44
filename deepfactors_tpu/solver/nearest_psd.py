"""Nearest-PSD projection + eigenvalue clipping for Gauss-Newton Hessians.

Reimplements sources/common/algorithm/nearest_psd.h:28-99 (Higham-style
projection; the reference keeps it as a hardening utility, currently
commented out of the photometric factor at photometric_factor.cpp:116-119).
Batched + jittable here so it can run inline on factor Hessians when f32
Gram accumulation produces slightly indefinite blocks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def clip_eigenvalues(A: Array, min_eig: float = 0.0) -> Array:
    """Clamp eigenvalues of a symmetric matrix [..., D, D] from below.

    Non-finite entries are zeroed FIRST: TPU eigh is an iterative device
    program whose convergence loop can spin forever on NaN/Inf input
    (observed as a wedged dispatch hanging every later device_get through
    the axon tunnel). A non-finite factor Hessian carries no usable
    information — dropping it (zero block) is the safe projection."""
    A = jnp.where(jnp.isfinite(A), A, 0.0)
    w, V = jnp.linalg.eigh((A + jnp.swapaxes(A, -1, -2)) * 0.5)
    w = jnp.maximum(w, min_eig)
    return jnp.einsum("...ij,...j,...kj->...ik", V, w, V)


def nearest_psd(A: Array, eps: float = 0.0) -> Array:
    """Higham projection: symmetrize then clip negative eigenvalues."""
    return clip_eigenvalues(A, eps)


def is_psd(A: Array, tol: float = 0.0) -> Array:
    w = jnp.linalg.eigvalsh((A + jnp.swapaxes(A, -1, -2)) * 0.5)
    return jnp.all(w >= -tol, axis=-1)
