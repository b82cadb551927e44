"""TUM-format trajectory IO (reference sources/common/tum_io.h).

Format per line: ``timestamp tx ty tz qx qy qz qw``.
"""
from __future__ import annotations

import numpy as np

from ..geometry.se3 import SE3


def save_trajectory(path: str, trajectory):
    """trajectory: list of (timestamp, SE3 pose_wc)."""
    with open(path, "w") as f:
        for ts, pose in trajectory:
            t = np.asarray(pose.t, dtype=np.float64)
            q = np.asarray(pose.q, dtype=np.float64)  # wxyz
            f.write(
                f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
            )


def load_trajectory(path: str):
    """Returns list of (timestamp, SE3)."""
    import jax.numpy as jnp

    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            ts, tx, ty, tz, qx, qy, qz, qw = v[:8]
            out.append((ts, SE3(jnp.asarray([qw, qx, qy, qz]),
                                jnp.asarray([tx, ty, tz]))))
    return out


def ate_rmse(est, gt, align_scale: bool = False) -> float:
    """Absolute trajectory error RMSE after Umeyama/Horn alignment of the
    estimated trajectory to ground truth (the external TUM evaluation the
    reference relies on, README.md:156-160)."""
    P = np.stack([np.asarray(p.t, np.float64) for _, p in est])  # [N, 3]
    Q = np.stack([np.asarray(p.t, np.float64) for _, p in gt])
    assert P.shape == Q.shape and len(P) >= 3
    finite = np.isfinite(P).all(axis=1) & np.isfinite(Q).all(axis=1)
    if not finite.all():
        # non-finite estimates would NaN the Umeyama SVD; align on the
        # finite subset (callers should surface the bad count separately)
        P, Q = P[finite], Q[finite]
        if len(P) < 3:
            return float("inf")
    mp, mq = P.mean(0), Q.mean(0)
    Pc, Qc = P - mp, Q - mq
    W = Qc.T @ Pc / len(P)
    U, D, Vt = np.linalg.svd(W)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if align_scale:
        var_p = (Pc**2).sum() / len(P)
        s = np.trace(np.diag(D) @ S) / var_p
    else:
        s = 1.0
    t = mq - s * R @ mp
    P_aligned = (s * (R @ P.T)).T + t
    err = np.linalg.norm(P_aligned - Q, axis=1)
    return float(np.sqrt((err**2).mean()))
