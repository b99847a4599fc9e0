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
import numpy as np

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
    """Separable correlation with edge padding, as two banded MXU
    matmuls (ops/sepconv.py — 1-channel `lax.conv` cannot tile onto
    the MXU; the matmul form cut the KITTI-scale flow pass ~10x)."""
    from slam_toolkit_tpu.ops.sepconv import sep_correlate2d
    return sep_correlate2d(img, np.asarray(kx), np.asarray(ky))


def poly_expand(img: jnp.ndarray, n: int = 5,
                sigma: float = 1.1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel quadratic coefficients (A (H,W,2,2), b (H,W,2))."""
    wt, xt, ginv_t = _poly_basis(n, sigma)
    w = np.asarray(wt, np.float32)         # numpy: sepconv caches the
    x = np.asarray(xt, np.float32)         # banded matrices per taps
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


def _warp(img: jnp.ndarray, flow: jnp.ndarray,
          rx: int = 48, ry: int = 16) -> jnp.ndarray:
    """Backward-warp img by flow (H, W, 2), bilinear, gather-free.

    A per-pixel gather of 467k bilinear taps cost ~17 ms of device time
    per warp at KITTI scale (XLA lowers arbitrary 2-D gathers to a slow
    path) — and the pyramid schedule warps ~10x per flow field. Instead:
    two separable shift-and-select passes over the BOUNDED flow range
    (|fx|<rx, |fy|<ry, flow clipped): for each integer offset k the
    contribution is a static slice of the edge-padded image times a
    selection weight, a pure VPU stream the compiler pipelines (~1 ms).
    Separability evaluates fx at the unshifted row — a ~|fy * d(fx)/dy|
    subpixel approximation, negligible for box-smoothed flow fields.
    """
    h, w = img.shape
    fx = jnp.clip(flow[..., 0], -rx + 1e-3, rx - 1e-3)
    fy = jnp.clip(flow[..., 1], -ry + 1e-3, ry - 1e-3)

    x0 = jnp.floor(fx)
    frx = fx - x0
    padx = jnp.pad(img, ((0, 0), (rx, rx + 2)), mode='edge')

    def bx(i, acc):
        k = i - rx
        sl = jax.lax.dynamic_slice(padx, (0, i), (h, w))
        wk = jnp.where(x0 == k, 1.0 - frx, 0.0) \
            + jnp.where(x0 == k - 1, frx, 0.0)
        return acc + sl * wk

    acc = jax.lax.fori_loop(0, 2 * rx + 2, bx, jnp.zeros_like(img))

    y0 = jnp.floor(fy)
    fry = fy - y0
    pady = jnp.pad(acc, ((ry, ry + 2), (0, 0)), mode='edge')

    def by(i, out):
        k = i - ry
        sl = jax.lax.dynamic_slice(pady, (i, 0), (h, w))
        wk = jnp.where(y0 == k, 1.0 - fry, 0.0) \
            + jnp.where(y0 == k - 1, fry, 0.0)
        return out + sl * wk

    return jax.lax.fori_loop(0, 2 * ry + 2, by, jnp.zeros_like(img))


def _flow_update(A0, b0, A1w, b1w, flow, win: int = 13) -> jnp.ndarray:
    """One Farneback displacement update, window-averaged normal equations."""
    A = 0.5 * (A0 + A1w)                                  # (H, W, 2, 2)
    # db accounts for the pre-warp: the residual polynomial difference
    db = -0.5 * (b1w - b0) + jnp.einsum('hwij,hwj->hwi', A, flow)
    # accumulate G = A^T A and h = A^T db over the window
    G = jnp.einsum('hwji,hwjk->hwik', A, A).reshape(*A.shape[:2], 4)
    hvec = jnp.einsum('hwji,hwj->hwi', A, db)
    stack = jnp.concatenate([G, hvec], axis=-1)           # (H, W, 6)
    from slam_toolkit_tpu.ops.sepconv import sep_correlate2d
    k = np.full((win,), 1.0 / win, np.float32)
    out = sep_correlate2d(stack.transpose(2, 0, 1), k, k)
    out = out.transpose(1, 2, 0)
    g11, g12, g21, g22 = out[..., 0], out[..., 1], out[..., 2], out[..., 3]
    h1, h2 = out[..., 4], out[..., 5]
    det = g11 * g22 - g12 * g21
    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
    fx = (g22 * h1 - g12 * h2) / det
    fy = (-g21 * h1 + g11 * h2) / det
    return jnp.stack([fx, fy], axis=-1)


def farneback_flow(img0: jnp.ndarray, img1: jnp.ndarray, levels: int = 5,
                   scale: float = 0.5, win: int = 13,
                   iters: int = 2, max_flow_x: int = 64,
                   max_flow_y: int = 24) -> jnp.ndarray:
    """(H, W) pair -> (H, W, 2) dense flow img0 -> img1.

    max_flow_x/y bound the recoverable displacement AT FULL RESOLUTION:
    the gather-free warp saturates flow beyond its shift range, so a
    too-small bound biases exactly the fast near-field movers the
    clustering workload targets (r4 advisor — the old hardcoded 48/16 px
    silently clipped KITTI near-field flow). The per-level range scales
    with the level (flow in level pixels is full flow x the level
    scale), so widening the bound costs warp iterations mostly at the
    finest level while the coarse levels get CHEAPER than the old
    fixed-48 range."""
    h, w = img0.shape
    shapes = []
    for lvl in range(levels):
        s = scale ** lvl
        shapes.append((max(int(round(h * s)), 8), max(int(round(w * s)), 8)))
    shapes = shapes[::-1]

    # anti-aliased pyramids by successive blur-then-downsample (the
    # cv::pyrDown construction). A direct bilinear resize from full
    # resolution samples ~2 taps of a 16x-decimated signal — high-
    # frequency texture ALIASES, the coarse levels decorrelate between
    # the two frames, and large motions never lock on: measured on the
    # cluster bench scene as flow failing exactly where |flow| >= 18 px
    # (coarse-level capture needed) while <= 13 px bands tracked to
    # 0.01 px (r5). Blur taps ride the same banded-MXU sep_correlate2d
    # as every other filter here.
    from slam_toolkit_tpu.ops.sepconv import sep_correlate2d
    g5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
    pyr0 = [img0.astype(jnp.float32)]
    pyr1 = [img1.astype(jnp.float32)]
    for (hh, ww) in shapes[-2::-1]:         # fine-1 ... coarsest
        pyr0.append(resize_bilinear(
            sep_correlate2d(pyr0[-1], g5, g5), (hh, ww)))
        pyr1.append(resize_bilinear(
            sep_correlate2d(pyr1[-1], g5, g5), (hh, ww)))
    pyr0, pyr1 = pyr0[::-1], pyr1[::-1]     # coarsest first

    flow = jnp.zeros(shapes[0] + (2,), jnp.float32)
    for lvl, (hh, ww) in enumerate(shapes):
        i0 = pyr0[lvl]
        i1 = pyr1[lvl]
        if flow.shape[:2] != (hh, ww):
            sy = hh / flow.shape[0]
            sx = ww / flow.shape[1]
            fx = resize_bilinear(flow[..., 0], (hh, ww)) * sx
            fy = resize_bilinear(flow[..., 1], (hh, ww)) * sy
            flow = jnp.stack([fx, fy], axis=-1)
        rx = max(4, min(max_flow_x, int(np.ceil(max_flow_x * ww / w)) + 2))
        ry = max(4, min(max_flow_y, int(np.ceil(max_flow_y * hh / h)) + 2))
        A0, b0 = poly_expand(i0)
        for _ in range(iters):
            i1w = _warp(i1, flow, rx=rx, ry=ry)
            A1, b1 = poly_expand(i1w)
            flow = _flow_update(A0, b0, A1, b1, flow, win)
    return flow
