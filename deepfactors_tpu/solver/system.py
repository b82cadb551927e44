"""Dense block assembly + damped solving for factor-graph MAP inference.

TPU-native replacement for GTSAM's HessianFactor/JacobianFactor elimination
(the reference drives ISAM2 from mapper.cpp:517-533 and splits the per-factor
44x44 system into Hessian blocks at photometric_factor.cpp:135-161).

Design: variables live in fixed-capacity arrays (K keyframe poses [K, 6] and
codes [K, CS] in tangent/linear space); each factor contributes a dense
(D_f x D_f) GN system plus the global indices of its variable slots. Assembly
is ONE scatter-add of [P, D_f, D_f] blocks into the global Hessian — XLA
compiles this to an efficient dense update, and the subsequent solve is a
single Cholesky (or a Schur-complement solve eliminating the per-keyframe code
blocks first, which is the unit of communication for the distributed BA path,
SURVEY.md §2.3).

Inactive variables are masked by identity rows so the solve stays static-shape.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class GlobalSystem(NamedTuple):
    H: Array  # [D, D]
    b: Array  # [D]  (gradient: Jtr)


def factor_slot_indices(idx0: Array, idx1: Array, K: int, CS: int) -> Array:
    """Global variable indices for a photometric factor (pose0, pose1, code0).

    Layout: poses occupy [0, 6K), code i occupies [6K + i*CS, 6K + (i+1)*CS).
    Returns [..., 12 + CS] int32 index vectors.
    """
    pose0 = idx0[..., None] * 6 + jnp.arange(6)
    pose1 = idx1[..., None] * 6 + jnp.arange(6)
    code0 = 6 * K + idx0[..., None] * CS + jnp.arange(CS)
    return jnp.concatenate([pose0, pose1, code0], axis=-1).astype(jnp.int32)


def assemble(
    D: int,
    factor_H: Array,      # [P, Df, Df]
    factor_b: Array,      # [P, Df]
    factor_idx: Array,    # [P, Df] global indices
    factor_active: Array,  # [P] bool
) -> GlobalSystem:
    """Sum all factor systems into a global dense system: H = Σ EᵀH_fE.

    Implemented as one-hot matmuls (E[p, i, idx[p, i]] = 1) instead of a
    2D scatter-add: XLA's TPU scatter runs serially (~800 µs for 48 44x44
    blocks into 196²) while the equivalent congruence rides the MXU
    (~30 µs). Overlapping indices superpose exactly like scatter-add.
    HIGHEST precision: assembly feeds a Cholesky, bf16 rounding of 1e5-scale
    entries would make the damped system indefinite."""
    w = factor_active.astype(factor_H.dtype)
    Hf = factor_H * w[:, None, None]
    bf = factor_b * w[:, None]
    P, Df = factor_b.shape
    hp = jax.lax.Precision.HIGHEST
    E = (factor_idx[:, :, None] == jnp.arange(D)[None, None, :]).astype(
        factor_H.dtype)  # [P, Df, D]
    HE = jnp.einsum("pij,pjd->pid", Hf, E,
                    preferred_element_type=factor_H.dtype, precision=hp)
    Ef = E.reshape(P * Df, D)
    H = jnp.einsum("rd,re->de", Ef, HE.reshape(P * Df, D),
                   preferred_element_type=factor_H.dtype, precision=hp)
    b = jnp.einsum("rd,r->d", Ef, bf.reshape(P * Df),
                   preferred_element_type=factor_b.dtype, precision=hp)
    return GlobalSystem(H, b)


def add_diagonal_prior(
    sys: GlobalSystem, idx: Array, weight: Array, residual: Array
) -> GlobalSystem:
    """Gaussian prior on variables at ``idx``: H += w·I, b += w·r where r is
    the current residual (x - x_prior) in local coordinates. Mirrors the
    reference's zero-pose/zero-code prior factors (df_work.cpp:29-57)."""
    H = sys.H.at[idx, idx].add(weight)
    b = sys.b.at[idx].add(weight * residual)
    return GlobalSystem(H, b)


def mask_inactive(sys: GlobalSystem, active_mask: Array) -> GlobalSystem:
    """Pin inactive variable slots: zero their rows/cols and put 1 on the
    diagonal so the Cholesky stays well-posed and their update is 0."""
    m = active_mask.astype(sys.H.dtype)
    H = sys.H * m[:, None] * m[None, :]
    H = H + jnp.diag(1.0 - m)
    b = sys.b * m
    return GlobalSystem(H, b)


def solve_damped(sys: GlobalSystem, lam: Array) -> Array:
    """Levenberg-Marquardt step: solve (H + lam·diag(H)+eps·I) dx = -b."""
    D = sys.H.shape[0]
    damping = lam * jnp.diag(sys.H) + 1e-8
    A = sys.H + jnp.diag(damping)
    L, low = jax.scipy.linalg.cho_factor(A, lower=True)
    return -jax.scipy.linalg.cho_solve((L, low), sys.b)


def solve_schur_codes(
    sys: GlobalSystem, K: int, CS: int, lam: Array
) -> Array:
    """Solve eliminating per-keyframe code blocks by Schur complement.

    Variable layout [poses 6K | codes CS·K | frame poses 6F] (any F ≥ 0).
    Codes of different keyframes only couple through poses in the
    photometric factor structure (the 44-dim factor touches one code), so
    the code block C is block-diagonal [K, CS, CS]. Eliminate it:

        S  = A_xx − A_xc C⁻¹ A_cx      over x = [poses | frames]
        dx = −S⁻¹ (b_x − A_xc C⁻¹ b_c)
        dc = −C⁻¹ (b_c + A_cx dx)

    C⁻¹ applications use one BATCHED Cholesky over the K code blocks (a
    [K, CS, CS] lax.linalg.cholesky — ~2x faster than jnp.linalg.inv's LU,
    measured) and the reduced solve is a (6K+6F) Cholesky instead of the
    full D-dim one. This is the distributed-BA unit: the C-block solves are
    per-keyframe-local; only the small pose system is global (SURVEY.md
    §7.1, geometric-factor code-code coupling excepted — those use the
    dense path).
    """
    Dp = 6 * K
    Dc = CS * K
    D = sys.H.shape[0]
    F6 = D - Dp - Dc
    damping = lam * jnp.diag(sys.H) + 1e-8
    H = sys.H + jnp.diag(damping)
    hp = jax.lax.Precision.HIGHEST

    Axx = jnp.concatenate([
        jnp.concatenate([H[:Dp, :Dp], H[:Dp, Dp + Dc:]], axis=1),
        jnp.concatenate([H[Dp + Dc:, :Dp], H[Dp + Dc:, Dp + Dc:]], axis=1),
    ], axis=0)                                     # [Dx, Dx]
    Axc = jnp.concatenate([H[:Dp, Dp:Dp + Dc],
                           H[Dp + Dc:, Dp:Dp + Dc]], axis=0)  # [Dx, Dc]
    bx = jnp.concatenate([sys.b[:Dp], sys.b[Dp + Dc:]])
    bc = sys.b[Dp:Dp + Dc]
    Dx = Dp + F6

    # block-diagonal code blocks: [K, CS, CS]. One-hot contraction instead
    # of vmapped dynamic_slice (TPU leading-axis gathers run ~3 GB/s).
    C = H[Dp:Dp + Dc, Dp:Dp + Dc].reshape(K, CS, K, CS)
    Cd = jnp.einsum("kcjd,kj->kcd", C, jnp.eye(K, dtype=C.dtype),
                    preferred_element_type=jnp.float32, precision=hp)
    Lc = jax.lax.linalg.cholesky(Cd)               # batched [K, CS, CS]

    # C⁻¹ [A_cx | b_c] via two batched triangular solves
    U = jnp.concatenate(
        [jnp.swapaxes(Axc, 0, 1).reshape(K, CS, Dx), bc.reshape(K, CS, 1)],
        axis=-1,
    )
    Y = jax.lax.linalg.triangular_solve(Lc, U, left_side=True, lower=True)
    X = jax.lax.linalg.triangular_solve(Lc, Y, left_side=True, lower=True,
                                        transpose_a=True)  # [K, CS, Dx+1]
    CinvAcx = X[..., :Dx]
    Cinv_bc = X[..., Dx]

    Axc_b = Axc.reshape(Dx, K, CS)
    S = Axx - jnp.einsum("pkc,kcq->pq", Axc_b, CinvAcx,
                         preferred_element_type=jnp.float32, precision=hp)
    rhs = bx - jnp.einsum("pkc,kc->p", Axc_b, Cinv_bc,
                          preferred_element_type=jnp.float32, precision=hp)

    L, low = jax.scipy.linalg.cho_factor(S, lower=True)
    dx = -jax.scipy.linalg.cho_solve((L, low), rhs)
    dc = -(Cinv_bc + jnp.einsum("kcp,p->kc", CinvAcx, dx,
                                preferred_element_type=jnp.float32,
                                precision=hp))
    return jnp.concatenate([dx[:Dp], dc.reshape(-1), dx[Dp:]])
