#!/usr/bin/env python
"""Dense-Cholesky vs Schur-complement solve crossover (VERDICT r1 item 8).

Builds realistic photometric-BA global systems for K-keyframe windows
(chain + 2 back-connections, 44-dim factors, layout [poses 6K | codes
CS*K | 1 frame pose]) and times `solver.system.solve_damped` against
`solve_schur_codes` on the real chip. Per-solve device time is measured by
loop-length differencing inside one jit (the axon tunnel adds 5-8 ms per
dispatch; see CLAUDE.md).

The result calibrates the `D > 256` heuristic in mapper.py's solve-path
selection (mapping/mapper.py:452-461). Reference analogue: GTSAM eliminates
code blocks inside ISAM2's Bayes tree (photometric_factor.cpp:135-161 block
structure).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/schur_crossover.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CS = 32


def build_system(K, seed=0):
    """Assemble a PSD global system with photometric-BA sparsity."""
    from deepfactors_tpu.solver import system as sysm

    rng = np.random.RandomState(seed)
    pairs = [(i, i + 1) for i in range(K - 1)]
    pairs += [(i, i + 2) for i in range(K - 2)]
    D = 6 * K + CS * K + 6  # one tracked frame pose, like the bench mapper
    Df = 12 + CS
    P = len(pairs)
    G = rng.randn(P, Df, Df + 16).astype(np.float32)
    Hf = np.einsum("pij,pkj->pik", G, G) / Df
    bf = rng.randn(P, Df).astype(np.float32)
    i0 = np.array([p[0] for p in pairs], np.int32)
    i1 = np.array([p[1] for p in pairs], np.int32)
    idx = sysm.factor_slot_indices(jnp.asarray(i0), jnp.asarray(i1), K, CS)
    gsys = sysm.assemble(D, jnp.asarray(Hf), jnp.asarray(bf), idx,
                         jnp.ones((P,), bool))
    # weak prior so the frame-pose slot (untouched by factors) is well-posed
    H = gsys.H + 1e-2 * jnp.eye(D, dtype=jnp.float32)
    return sysm.GlobalSystem(H, gsys.b)


def timed_per_solve(solve, gsys, n_lo=30, n_hi=300):
    def make(n):
        @jax.jit
        def run(b):
            def body(b, _):
                # H must depend on the carried b: with a loop-invariant H the
                # Cholesky factorization (the dominant cost of both paths) is
                # eligible for while-loop invariant code motion and the
                # differencing would time only the triangular solves. In the
                # real LM loop H changes every solve. The epsilon is ~1e-12
                # of the diagonal scale, numerically irrelevant.
                eps = 1e-6 * b[0] * b[0]
                D = gsys.H.shape[0]
                s = gsys._replace(H=gsys.H + eps * jnp.eye(D), b=b)
                d = solve(s)
                return d / (jnp.linalg.norm(d) + 1e-6), None
            return lax.scan(body, b, None, length=n)[0]
        return run

    lo, hi = make(n_lo), make(n_hi)
    b0 = gsys.b / (jnp.linalg.norm(gsys.b) + 1e-6)
    jax.block_until_ready(lo(b0)); jax.block_until_ready(hi(b0))
    t0 = time.perf_counter(); jax.block_until_ready(lo(b0))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(hi(b0))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e6  # us/solve


def main():
    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from deepfactors_tpu.solver import system as sysm

    lam = jnp.asarray(1e-3, jnp.float32)
    ks = [int(a) for a in sys.argv[1:]] or [4, 5, 8, 12, 16, 24, 32, 48]
    print(f"{'K':>3} {'D':>5} {'dense us':>9} {'schur us':>9} "
          f"{'winner':>7} {'rel err':>9}")
    rows = []
    for K in ks:
        gsys = build_system(K)
        d_dense = jax.jit(lambda s: sysm.solve_damped(s, lam))(gsys)
        d_schur = jax.jit(
            lambda s: sysm.solve_schur_codes(s, K, CS, lam))(gsys)
        rel = float(jnp.linalg.norm(d_dense - d_schur)
                    / (jnp.linalg.norm(d_dense) + 1e-12))
        t_dense = timed_per_solve(lambda s: sysm.solve_damped(s, lam), gsys)
        t_schur = timed_per_solve(
            lambda s: sysm.solve_schur_codes(s, K, CS, lam), gsys)
        D = gsys.H.shape[0]
        win = "schur" if t_schur < t_dense else "dense"
        rows.append((K, D, t_dense, t_schur, win, rel))
        print(f"{K:>3} {D:>5} {t_dense:>9.1f} {t_schur:>9.1f} "
              f"{win:>7} {rel:>9.2e}")
    cross = next((r[1] for r in rows if r[4] == "schur"), None)
    print(f"\ncrossover: schur first wins at D={cross}" if cross
          else "\ncrossover: dense wins at every tested size")


if __name__ == "__main__":
    main()
