"""Trajectory evaluation: Umeyama alignment + ATE / RPE.

Formalizes what the reference only visualizes — its AlignTrajectory
(ref src/optimizer.cpp:282-344) aligns estimate to GT with an SE3 g2o
solve for the viewer overlay (src/qmap_viewer.cpp:342-346) and computes
no error metric. Here: closed-form Umeyama alignment (SE3, or Sim3 per
the author's own SE3->Sim3 TODO at src/loopcloser.cpp:107) and standard
ATE RMSE / RPE metrics. Host-side numpy — this is offline evaluation.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def camera_centers(T_cw_list: Sequence[np.ndarray]) -> np.ndarray:
    """(N, 3) camera centers from world->cam poses: c = -R^T t."""
    out = np.empty((len(T_cw_list), 3))
    for i, T in enumerate(T_cw_list):
        R, t = T[:3, :3], T[:3, 3]
        out[i] = -R.T @ t
    return out


def umeyama(src: np.ndarray, dst: np.ndarray,
            with_scale: bool = False) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity transform: dst ~= s * R @ src + t.

    Returns (R, t, s). Closed-form Umeyama (1991).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / src.shape[0]
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def ate_rmse(est_T_cw: Sequence[np.ndarray], gt_T_cw: Sequence[np.ndarray],
             align: bool = True, with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE over camera centers [m].

    NaN/Inf-tolerant: non-finite estimated poses are excluded from both
    the alignment and the RMSE, with a loud stderr report of how many
    were dropped (a degenerate solver step must show up as a diagnostic,
    not as `SVD did not converge` three layers up). Returns inf when
    fewer than 3 finite pose pairs remain.
    """
    import sys

    est = camera_centers(est_T_cw)
    gt = camera_centers(gt_T_cw)
    assert est.shape == gt.shape
    finite = np.isfinite(est).all(axis=1) & np.isfinite(gt).all(axis=1)
    n_bad = int((~finite).sum())
    if n_bad:
        sys.stderr.write(
            f"[traj] WARNING: {n_bad}/{len(est)} non-finite poses "
            f"excluded from ATE (first bad index "
            f"{int(np.argmin(finite))})\n")
    est, gt = est[finite], gt[finite]
    if len(est) < 3:
        return float("inf")
    if align:
        R, t, s = umeyama(est, gt, with_scale)
        est = est @ (s * R).T + t
    err = np.linalg.norm(est - gt, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def rpe(est_T_cw: Sequence[np.ndarray], gt_T_cw: Sequence[np.ndarray],
        delta: int = 1) -> Tuple[float, float]:
    """Relative pose error over frame gap `delta`.

    Returns (translation RMSE [m], rotation RMSE [rad]).
    """
    terr, rerr = [], []
    for i in range(len(est_T_cw) - delta):
        if not (np.isfinite(est_T_cw[i]).all()
                and np.isfinite(est_T_cw[i + delta]).all()):
            continue
        dE = est_T_cw[i + delta] @ np.linalg.inv(est_T_cw[i])
        dG = gt_T_cw[i + delta] @ np.linalg.inv(gt_T_cw[i])
        E = np.linalg.inv(dG) @ dE
        terr.append(np.linalg.norm(E[:3, 3]))
        c = np.clip((np.trace(E[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
        rerr.append(np.arccos(c))
    if not terr:
        return float("inf"), float("inf")
    return (float(np.sqrt(np.mean(np.square(terr)))),
            float(np.sqrt(np.mean(np.square(rerr)))))
