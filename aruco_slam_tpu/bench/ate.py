"""Trajectory evaluation: ATE (absolute) and RPE (relative) errors.

Fills the reference's evaluation vacuum (it writes a trajectory file
but ships no ATE tooling, SURVEY.md §6). Standard TUM-style metrics:
rigid (SE(3), optionally Sim(3)) Umeyama alignment then RMSE over
translations.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False):
    """Least-squares similarity transform aligning src -> dst.

    Returns (s, R, t) with dst ≈ s R src + t.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    u, d, vt = np.linalg.svd(cov)
    sgn = np.sign(np.linalg.det(u @ vt))
    ss = np.ones(3)
    ss[-1] = sgn
    r = u @ np.diag(ss) @ vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float((d * ss).sum() / var_s)
    else:
        s = 1.0
    t = mu_d - s * r @ mu_s
    return s, r, t


def ate_rmse(est_t: np.ndarray, gt_t: np.ndarray,
             with_scale: bool = False) -> float:
    """Absolute trajectory error (RMSE, meters) after alignment."""
    s, r, t = umeyama_alignment(est_t, gt_t, with_scale)
    aligned = (s * (r @ est_t.T)).T + t
    return float(np.sqrt(((aligned - gt_t) ** 2).sum(axis=-1).mean()))


def rpe_rmse(est_t: np.ndarray, gt_t: np.ndarray, delta: int = 1) -> float:
    """Relative pose (translation drift) error over a frame delta."""
    de = est_t[delta:] - est_t[:-delta]
    dg = gt_t[delta:] - gt_t[:-delta]
    return float(np.sqrt(((de - dg) ** 2).sum(axis=-1).mean()))
