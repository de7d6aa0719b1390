"""Trajectory evaluation: drift statistics, ATE, RPE.

Rebuilds the reference's ground-truth comparison tooling:
  * per-frame drift vs GT with mean/median/RMS normalized per second
    (`getDriftFromPose` / `analyzeDriftVector`,
    /root/reference/src/SolveDVO.cpp:1371-1390 — normalization ÷ (n/30) at
    :1383-1388),
  * the TUM-tooling ATE/RPE metrics the reference exports trajectories for
    (est/gt pose files, /root/reference/include/SolveDVO.h:84-86).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass
class DriftStats:
    mean: float
    median: float
    rms: float


def drift_stats(
    est_t: np.ndarray, gt_t: np.ndarray, fps: float = 30.0
) -> DriftStats:
    """Per-frame positional drift vs GT, normalized per second of trajectory
    (reference divides by v.size()/30.0, src/SolveDVO.cpp:1383-1388)."""
    n = min(len(est_t), len(gt_t))
    d = np.linalg.norm(est_t[:n] - gt_t[:n], axis=-1)
    dur = max(n / fps, 1e-9)
    return DriftStats(
        mean=float(d.mean() / dur),
        median=float(np.median(d) / dur),
        rms=float(np.sqrt((d**2).mean()) / dur),
    )


def align_umeyama(est_t: np.ndarray, gt_t: np.ndarray, with_scale: bool = False):
    """Least-squares rigid (optionally similarity) alignment est -> gt
    (Horn/Umeyama) — the alignment step of the TUM ATE tool."""
    mu_e = est_t.mean(0)
    mu_g = gt_t.mean(0)
    xe = est_t - mu_e
    xg = gt_t - mu_g
    cov = xg.T @ xe / len(est_t)
    U, S, Vt = np.linalg.svd(cov)
    sgn = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        sgn[2, 2] = -1.0
    R = U @ sgn @ Vt
    if with_scale:
        var_e = (xe**2).sum() / len(est_t)
        s = float(np.trace(np.diag(S) @ sgn) / max(var_e, 1e-12))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est_t: np.ndarray, gt_t: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE (TUM definition) over positions."""
    n = min(len(est_t), len(gt_t))
    est = np.asarray(est_t[:n], np.float64)
    gt = np.asarray(gt_t[:n], np.float64)
    if align and n >= 3:
        s, R, t = align_umeyama(est, gt)
        est = (s * (R @ est.T)).T + t
    return float(np.sqrt(((est - gt) ** 2).sum(-1).mean()))


def rpe(
    est_R: np.ndarray,
    est_t: np.ndarray,
    gt_R: np.ndarray,
    gt_t: np.ndarray,
    delta: int = 1,
) -> Tuple[float, float]:
    """Relative pose error over `delta`-frame intervals (TUM definition).

    Returns (translational RMSE [m], rotational RMSE [rad]).
    """
    n = min(len(est_t), len(gt_t))
    terrs, rerrs = [], []
    for i in range(n - delta):
        # relative motions
        dR_e = est_R[i].T @ est_R[i + delta]
        dt_e = est_R[i].T @ (est_t[i + delta] - est_t[i])
        dR_g = gt_R[i].T @ gt_R[i + delta]
        dt_g = gt_R[i].T @ (gt_t[i + delta] - gt_t[i])
        E_R = dR_g.T @ dR_e
        E_t = dt_e - dt_g  # after rotating into frame i; standard approx
        terrs.append(np.linalg.norm(E_t))
        ang = np.arccos(np.clip((np.trace(E_R) - 1) / 2, -1.0, 1.0))
        rerrs.append(ang)
    if not terrs:
        return 0.0, 0.0
    return (
        float(np.sqrt(np.mean(np.square(terrs)))),
        float(np.sqrt(np.mean(np.square(rerrs)))),
    )


def rebase_to_first(R: np.ndarray, t: np.ndarray):
    """Rebase a trajectory so the first pose is identity — the reference's GT
    registration against the first frame (/root/reference/src/SolveDVO.cpp:
    1983-2014; loadGTPath.cpp:125-143)."""
    R0, t0 = R[0], t[0]
    R_out = np.einsum("ij,tjk->tik", R0.T, R)
    t_out = np.einsum("ij,tj->ti", R0.T, t - t0)
    return R_out, t_out
