"""Subpixel disparity refinement via batched SAD + parabola fit.

The reference pairs integer keypoint coordinates directly
(StereoMatch, ref src/matcher.cpp:54-132), which quantizes disparity by
~1px and, at stereo depth z = fx*b/d (src/frame.cpp:391-409), produces
z^2/(fx*b) metric depth error. ORB-SLAM-family systems counter this with
a correlation sweep along the epipolar row; we implement that as one
batched gather: K patches x D candidate shifts scored at once on the
VPU, then a 3-point parabola for the subpixel minimum.
"""

from __future__ import annotations

import jax.numpy as jnp

WIN = 5        # half-width of the correlation window (11x11)
SEARCH = 3     # +/- candidate integer shifts around the matched x


def refine_disparity(img_left: jnp.ndarray, img_right: jnp.ndarray,
                     xy_left: jnp.ndarray, x_right: jnp.ndarray,
                     valid: jnp.ndarray):
    """Refine matched right x-coordinates to subpixel precision.

    xy_left: (K, 2) integer-ish left keypoint coords; x_right: (K,) the
    descriptor-matched right x at the same row. Returns (x_right_refined,
    ok) where ok clears matches whose SAD minimum is at the search edge.
    """
    h, w = img_left.shape
    k = xy_left.shape[0]
    d = jnp.arange(-WIN, WIN + 1)

    xl = jnp.round(xy_left[:, 0]).astype(jnp.int32)
    yl = jnp.round(xy_left[:, 1]).astype(jnp.int32)
    xr = jnp.round(x_right).astype(jnp.int32)

    yy = jnp.clip(yl[:, None, None] + d[None, :, None], 0, h - 1)
    xxl = jnp.clip(xl[:, None, None] + d[None, None, :], 0, w - 1)
    patch_l = img_left[yy, xxl]                       # (K, 11, 11)

    shifts = jnp.arange(-SEARCH, SEARCH + 1)
    # right patches at each candidate shift: (K, S, 11, 11)
    xxr = jnp.clip(xr[:, None, None, None] + shifts[None, :, None, None]
                   + d[None, None, None, :], 0, w - 1)
    yyr = jnp.broadcast_to(yy[:, None, :, :], (k, shifts.shape[0],
                                               d.shape[0], d.shape[0]))
    patch_r = img_right[yyr, xxr]
    sad = jnp.sum(jnp.abs(patch_r - patch_l[:, None, :, :]), axis=(2, 3))

    best = jnp.argmin(sad, axis=1)
    at_edge = (best == 0) | (best == shifts.shape[0] - 1)
    bc = jnp.clip(best, 1, shifts.shape[0] - 2)
    rows = jnp.arange(k)
    c0 = sad[rows, bc - 1]
    c1 = sad[rows, bc]
    c2 = sad[rows, bc + 1]
    denom = c0 + c2 - 2.0 * c1
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      0.5 * (c0 - c2) / jnp.maximum(denom, 1e-6), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    x_ref = xr.astype(jnp.float32) + bc.astype(jnp.float32) - SEARCH + delta
    ok = valid & ~at_edge
    return jnp.where(ok, x_ref, x_right), ok
