"""Dense optical flow: Farneback-style polynomial expansion, conv-only.

TPU-native replacement for cv::cuda::FarnebackOpticalFlow(levels=5,
scale=0.5, winsize=13) (ref examples/epip_cluster/src/tracker.cpp:57,
130-145). Farneback fits a local quadratic I(x) ~ x^T A x + b^T x + c to
each neighborhood via separable Gaussian-weighted correlations, then
reads displacement from coefficient differences:
    d = -0.5 * (A0 + A1)^-1 (b1 - b0)
iterated coarse-to-fine over an image pyramid with window-averaged
updates. Everything is separable convolutions and 2x2 solves — ideal
VPU/MXU work, no data-dependent control flow.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from slam_toolkit_tpu.ops.pyramid import resize_bilinear


@functools.lru_cache(maxsize=8)
def _poly_basis(n: int, sigma: float):
    """1-D Gaussian applicability and inverse Gram for quadratic basis."""
    import numpy as np
    x = np.arange(-n, n + 1, dtype=np.float64)
    w = np.exp(-x * x / (2.0 * sigma * sigma))
    # separable moments needed by Farneback's normalization
    G = np.zeros((6, 6))
    basis = [np.ones_like(x), x, x, x * x, x * x, x]  # placeholder
    # compute on the 2D grid directly (small n, host-side, cached)
    X, Y = np.meshgrid(x, x)
    W = np.outer(w, w)
    B = np.stack([np.ones_like(X), X, Y, X * X, Y * Y, X * Y], axis=-1)
    G = np.einsum('ija,ij,ijb->ab', B, W, B)
    Ginv = np.linalg.inv(G)
    return (tuple(w.tolist()), tuple(x.tolist()),
            tuple(map(tuple, Ginv.tolist())))


def _sep_correlate(img: jnp.ndarray, kx: jnp.ndarray,
                   ky: jnp.ndarray) -> jnp.ndarray:
    """Separable correlation with edge padding."""
    n = kx.shape[0] // 2
    pad = jnp.pad(img, ((n, n), (n, n)), mode='edge')[None, None]
    out = jax.lax.conv_general_dilated(
        pad, ky.reshape(1, 1, -1, 1), (1, 1), 'VALID')
    out = jax.lax.conv_general_dilated(
        out, kx.reshape(1, 1, 1, -1), (1, 1), 'VALID')
    return out[0, 0]


def poly_expand(img: jnp.ndarray, n: int = 5,
                sigma: float = 1.1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel quadratic coefficients (A (H,W,2,2), b (H,W,2))."""
    wt, xt, ginv_t = _poly_basis(n, sigma)
    w = jnp.asarray(wt, jnp.float32)
    x = jnp.asarray(xt, jnp.float32)
    Ginv = jnp.asarray(ginv_t, jnp.float32)

    wx = w * x
    wx2 = w * x * x
    # raw moments via separable correlations
    m = {}
    m['1'] = _sep_correlate(img, w, w)
    m['x'] = _sep_correlate(img, wx, w)
    m['y'] = _sep_correlate(img, w, wx)
    m['x2'] = _sep_correlate(img, wx2, w)
    m['y2'] = _sep_correlate(img, w, wx2)
    m['xy'] = _sep_correlate(img, wx, wx)
    raw = jnp.stack([m['1'], m['x'], m['y'], m['x2'], m['y2'], m['xy']],
                    axis=-1)
    coef = jnp.einsum('ab,hwb->hwa', Ginv, raw)  # [c, bx, by, axx, ayy, axy]
    b = coef[..., 1:3]
    A = jnp.stack([
        jnp.stack([coef[..., 3], 0.5 * coef[..., 5]], axis=-1),
        jnp.stack([0.5 * coef[..., 5], coef[..., 4]], axis=-1),
    ], axis=-2)
    return A, b


def _warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img by flow (H, W, 2) with bilinear sampling."""
    h, w = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + flow[..., 1]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + flow[..., 0]
    from slam_toolkit_tpu.geometry.camera import bilinear_sample
    uv = jnp.stack([xs, ys], axis=-1)
    return bilinear_sample(img, uv.reshape(-1, 2)).reshape(h, w)


def _flow_update(A0, b0, A1w, b1w, flow, win: int = 13) -> jnp.ndarray:
    """One Farneback displacement update, window-averaged normal equations."""
    A = 0.5 * (A0 + A1w)                                  # (H, W, 2, 2)
    # db accounts for the pre-warp: the residual polynomial difference
    db = -0.5 * (b1w - b0) + jnp.einsum('hwij,hwj->hwi', A, flow)
    # accumulate G = A^T A and h = A^T db over the window
    G = jnp.einsum('hwji,hwjk->hwik', A, A).reshape(*A.shape[:2], 4)
    hvec = jnp.einsum('hwji,hwj->hwi', A, db)
    stack = jnp.concatenate([G, hvec], axis=-1)           # (H, W, 6)
    k = jnp.ones((win,), jnp.float32) / win
    n = win // 2
    pad = jnp.pad(stack, ((n, n), (n, n), (0, 0)), mode='edge')
    pad = pad.transpose(2, 0, 1)[:, None]
    out = jax.lax.conv_general_dilated(pad, k.reshape(1, 1, -1, 1),
                                       (1, 1), 'VALID')
    out = jax.lax.conv_general_dilated(out, k.reshape(1, 1, 1, -1),
                                       (1, 1), 'VALID')
    out = out[:, 0].transpose(1, 2, 0)
    g11, g12, g21, g22 = out[..., 0], out[..., 1], out[..., 2], out[..., 3]
    h1, h2 = out[..., 4], out[..., 5]
    det = g11 * g22 - g12 * g21
    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
    fx = (g22 * h1 - g12 * h2) / det
    fy = (-g21 * h1 + g11 * h2) / det
    return jnp.stack([fx, fy], axis=-1)


def farneback_flow(img0: jnp.ndarray, img1: jnp.ndarray, levels: int = 5,
                   scale: float = 0.5, win: int = 13,
                   iters: int = 2) -> jnp.ndarray:
    """(H, W) pair -> (H, W, 2) dense flow img0 -> img1."""
    h, w = img0.shape
    shapes = []
    for lvl in range(levels):
        s = scale ** lvl
        shapes.append((max(int(round(h * s)), 8), max(int(round(w * s)), 8)))
    shapes = shapes[::-1]

    flow = jnp.zeros(shapes[0] + (2,), jnp.float32)
    for (hh, ww) in shapes:
        i0 = resize_bilinear(img0.astype(jnp.float32), (hh, ww))
        i1 = resize_bilinear(img1.astype(jnp.float32), (hh, ww))
        if flow.shape[:2] != (hh, ww):
            sy = hh / flow.shape[0]
            sx = ww / flow.shape[1]
            fx = resize_bilinear(flow[..., 0], (hh, ww)) * sx
            fy = resize_bilinear(flow[..., 1], (hh, ww)) * sy
            flow = jnp.stack([fx, fy], axis=-1)
        A0, b0 = poly_expand(i0)
        for _ in range(iters):
            i1w = _warp(i1, flow)
            A1, b1 = poly_expand(i1w)
            flow = _flow_update(A0, b0, A1, b1, flow, win)
    return flow
