"""Robust M-estimator weights (reference sources/common/algorithm/m_estimators.h).

Weights are applied to both residual and Jacobian rows (IRLS square-root
weighting). Branches become jnp.where so the functions vectorize.
"""
from __future__ import annotations

import jax.numpy as jnp


def huber_weight(x, delta):
    """sqrt(delta(2|x|-delta))/|x| outside the delta band (m_estimators.h:50-56)."""
    aa = jnp.abs(x)
    safe = jnp.maximum(aa, 1e-12)
    w = jnp.sqrt(delta * (2.0 * aa - delta)) / safe
    return jnp.where(aa <= delta, jnp.ones_like(w), w)


def cauchy_weight(x, delta):
    """(m_estimators.h:42-48)."""
    safe_x = jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)
    a = delta / safe_x
    return jnp.abs(a) / jnp.sqrt(2.0) * jnp.sqrt(jnp.log1p(1.0 / (a * a)))


def tukey_weight(x, delta):
    """(m_estimators.h:26-40)."""
    safe_x = jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)
    a = delta / safe_x
    first = 1.0 - 1.0 / (a * a)
    inside = jnp.abs(a) * jnp.sqrt(jnp.maximum(1.0 - first**3, 0.0) / 6.0)
    outside = jnp.abs(a) * jnp.sqrt(1.0 / 6.0)
    return jnp.where(jnp.abs(safe_x) <= delta, inside, outside)


def tukey_sqrt_weight(x, c):
    """Tukey biweight as a square-root IRLS weight: w = max(0, 1-(x/c)²),
    effective weight w² = biweight. REDESCENDING: residuals beyond c get
    exactly zero weight — unlike Huber's linear tail, occlusion and
    image-formation outliers stop biasing the solution entirely (measured
    4x lower photometric-BA equilibrium bias on synthetic room pairs; see
    MapperConfig.fine_loss). Only safe near convergence — use at the
    finest pyramid level after the Huber-weighted coarse descent."""
    a = x / c
    return jnp.maximum(0.0, 1.0 - a * a)
