"""Batched PnP-RANSAC and Euclidean clustering on device.

Replaces the reference's per-cluster cv::solvePnPRansac loops and FLANN
Euclidean clustering (ref examples/epip_cluster/src/tracker.cpp:202-392,
:518-693): all RANSAC hypotheses are solved and scored at once as one
batched tensor program, and clustering is iterative label propagation
over a masked radius graph — fixed shapes, no per-cluster kernel
launches.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.optim import pose_lm
from slam_toolkit_tpu.config import TrackerConfig


def kabsch_se3(P: jnp.ndarray, Q: jnp.ndarray,
               w: jnp.ndarray) -> jnp.ndarray:
    """Weighted rigid alignment Q ~= R P + t, batched over leading axes.

    P, Q: (..., N, 3); w: (..., N). Returns (..., 4, 4).
    """
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-9
    mp = jnp.sum(P * w[..., None], axis=-2) / wsum
    mq = jnp.sum(Q * w[..., None], axis=-2) / wsum
    Pc = P - mp[..., None, :]
    Qc = Q - mq[..., None, :]
    H = jnp.einsum('...ni,...n,...nj->...ij', Pc, w, Qc)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(jnp.einsum('...ij,...jk->...ik',
                                  jnp.swapaxes(Vt, -1, -2),
                                  jnp.swapaxes(U, -1, -2)))
    S = jnp.broadcast_to(jnp.eye(3), U.shape).at[..., 2, 2].multiply(0)
    S = S.at[..., 2, 2].add(d)
    R = jnp.einsum('...ij,...jk,...lk->...il',
                   jnp.swapaxes(Vt, -1, -2), S, U)
    t = mq - jnp.einsum('...ij,...j->...i', R, mp)
    return se3.make(R, t)


class RansacResult(NamedTuple):
    T_cw: jnp.ndarray       # (4, 4) best model
    inliers: jnp.ndarray    # (N,) bool
    n_inliers: jnp.ndarray  # ()
    ok: jnp.ndarray         # ()


def pnp_ransac(Xw: jnp.ndarray, uv_norm: jnp.ndarray, valid: jnp.ndarray,
               key: jnp.ndarray, n_hypotheses: int = 64,
               sample_size: int = 4, inlier_norm: float = 0.01,
               min_inliers: int = 20,
               refine_iters: int = 5) -> RansacResult:
    """3D->2D pose RANSAC, all hypotheses batched.

    Each hypothesis solves a small weighted DLT-free problem: rather than
    a minimal P3P (quartic roots are hostile to batching), we run 3
    Gauss-Newton steps from identity on `sample_size` points — with 4-6
    points this converges like a minimal solver and batches perfectly.
    Scoring = normalized reprojection error. The best model is refined on
    its inliers by a short LM (optim/pose_lm.py).
    """
    n = Xw.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, n, (n_hypotheses, sample_size),
                            replace=True, p=probs)

    cfgs = TrackerConfig(num_iterations=3, huber_delta=1e9)

    def solve_one(sample_idx):
        Xs = Xw[sample_idx]
        zs = uv_norm[sample_idx]
        res = pose_lm.optimize_pose(jnp.eye(4), Xs, zs,
                                    jnp.full((sample_size,), 1.0),
                                    jnp.ones((sample_size,)), cfgs)
        return res.T_cw

    Ts = jax.vmap(solve_one)(idx)                       # (H, 4, 4)

    Xc = jnp.einsum('hij,nj->hni', Ts[:, :3, :3], Xw) + Ts[:, None, :3, 3]
    good = Xc[..., 2] > 1e-3
    zs = jnp.where(good, Xc[..., 2], 1.0)
    pred = Xc[..., :2] / zs[..., None]
    err = jnp.linalg.norm(pred - uv_norm[None], axis=-1)
    inl = good & (err < inlier_norm) & valid[None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    T_best = Ts[best]
    inliers = inl[best]

    # refine on inliers
    cfgr = TrackerConfig(num_iterations=refine_iters)
    res = pose_lm.optimize_pose(T_best, Xw, uv_norm,
                                jnp.full((n,), (1.0 / 500.0) ** 2),
                                inliers, cfgr)
    Xc = se3.transform(res.T_cw, Xw)
    goodr = Xc[..., 2] > 1e-3
    zr = jnp.where(goodr, Xc[..., 2], 1.0)
    errr = jnp.linalg.norm(Xc[..., :2] / zr[..., None] - uv_norm, axis=-1)
    inliers = valid & goodr & (errr < inlier_norm)
    n_in = jnp.sum(inliers)
    return RansacResult(T_cw=res.T_cw, inliers=inliers, n_inliers=n_in,
                        ok=n_in >= min_inliers)


def euclidean_cluster(X: jnp.ndarray, valid: jnp.ndarray, radius: float,
                      iters: int = 32,
                      min_size: int = 50) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Connected components over the radius graph by min-label propagation.

    X: (N, D) points. Returns (labels (N,) int32 — the component's lowest
    point index, -1 for invalid/small clusters; sizes (N,) per point).
    Replaces FLANN-based EuclideanCluster (ref tracker.cpp:332-392) with
    `iters` rounds of masked min-propagation with pointer jumping
    (label-of-label each sweep), covering components of graph diameter
    ~2^iters.
    """
    n = X.shape[0]
    d2 = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
    adj = (d2 <= radius * radius) & valid[:, None] & valid[None, :]
    labels0 = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), n)

    def body(_, labels):
        neigh = jnp.where(adj, labels[None, :], n)
        labels = jnp.minimum(labels, jnp.min(neigh, axis=1))
        jump = labels[jnp.clip(labels, 0, n - 1)]
        return jnp.minimum(labels, jnp.where(labels < n, jump, n))

    labels = jax.lax.fori_loop(0, iters, body, labels0)
    sizes = jnp.zeros((n + 1,), jnp.int32).at[labels].add(1)[labels]
    keep = valid & (sizes >= min_size)
    return jnp.where(keep, labels, -1), jnp.where(keep, sizes, 0)
