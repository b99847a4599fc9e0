"""Pinhole + radial-tangential camera model, batched jnp.

Mirrors the behavior of the reference Camera (project src/camera.cpp:50-93,
fixed-point undistortion src/camera.cpp:95-122, bounds test :26-36, bilinear
sampling with reflected border :136-157) as pure functions over arrays. A
camera is a small pytree of scalars so it can be closed over by jitted
programs without retracing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from slam_toolkit_tpu.config import CameraConfig


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray      # [k1, k2, p1, p2]
    width: int             # static
    height: int            # static

    @staticmethod
    def from_config(c: CameraConfig, dtype=jnp.float32) -> "Camera":
        return Camera(
            fx=jnp.asarray(c.fx, dtype), fy=jnp.asarray(c.fy, dtype),
            cx=jnp.asarray(c.cx, dtype), cy=jnp.asarray(c.cy, dtype),
            dist=jnp.asarray([c.k1, c.k2, c.p1, c.p2], dtype),
            width=c.width, height=c.height)


class StereoCamera(NamedTuple):
    """Rectified stereo rig: left camera + baseline; T_rl translates x by -b."""
    left: Camera
    baseline: jnp.ndarray

    @staticmethod
    def from_config(c: CameraConfig, dtype=jnp.float32) -> "StereoCamera":
        return StereoCamera(left=Camera.from_config(c, dtype),
                            baseline=jnp.asarray(c.baseline, dtype))


def distort(cam: Camera, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: Camera, xd: jnp.ndarray,
                         iters: int = 5) -> jnp.ndarray:
    """Invert distortion by fixed-point iteration (ref src/camera.cpp:95-122).

    The reference runs exactly 5 iterations of x <- (xd - tangential(x)) / radial(x).
    """
    k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
    x0, y0 = xd[..., 0], xd[..., 1]
    x, y = x0, y0
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x, y], axis=-1)


def pixel_to_normalized(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords (..., 2) -> undistorted normalized coords (..., 2)."""
    xd = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                    (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    return undistort_normalized(cam, xd)


def project(cam: Camera, Xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixel coords (..., 2).

    Z is clamped away from 0 so padded/invalid entries never produce NaNs;
    callers gate on depth > 0 separately (ref culls behind-camera points,
    src/matcher.cpp:143-160).
    """
    z = Xc[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    xn = jnp.stack([Xc[..., 0] / zsafe, Xc[..., 1] / zsafe], axis=-1)
    xd = distort(cam, xn)
    return jnp.stack([cam.fx * xd[..., 0] + cam.cx,
                      cam.fy * xd[..., 1] + cam.cy], axis=-1)


def normalized_project(Xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points -> normalized image coords (fx=fy=1, c=0).

    The reference optimizes on normalized coordinates (src/method.cpp:59-80);
    so do our LM solvers.
    """
    z = Xc[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    return jnp.stack([Xc[..., 0] / zsafe, Xc[..., 1] / zsafe], axis=-1)


def in_image(cam: Camera, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Bounds test (ref src/camera.cpp:26-36)."""
    return ((uv[..., 0] >= margin) & (uv[..., 0] < cam.width - margin) &
            (uv[..., 1] >= margin) & (uv[..., 1] < cam.height - margin))


def stereo_depth(cam: StereoCamera, x_left: jnp.ndarray,
                 x_right: jnp.ndarray) -> jnp.ndarray:
    """z = fx * b / (xL - xR) (ref src/frame.cpp:391-409). Invalid -> 0."""
    disp = x_left - x_right
    valid = disp > 1e-3
    z = cam.left.fx * cam.baseline / jnp.where(valid, disp, 1.0)
    return jnp.where(valid, z, 0.0)


def _reflect101(idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 index folding: -1 -> 1, size -> size-2."""
    period = 2 * (size - 1)
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= size, period - idx, idx)


def bilinear_sample(image: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear intensity at subpixel uv (..., 2) with reflected border.

    Equivalent of GetInetrpolatedIntensity (ref src/camera.cpp:136-157),
    vectorized over any batch of sample locations.
    """
    h, w = image.shape[-2], image.shape[-1]
    x, y = uv[..., 0], uv[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    x0r = _reflect101(x0, w)
    x1r = _reflect101(x0 + 1, w)
    y0r = _reflect101(y0, h)
    y1r = _reflect101(y0 + 1, h)
    i00 = image[..., y0r, x0r]
    i01 = image[..., y0r, x1r]
    i10 = image[..., y1r, x0r]
    i11 = image[..., y1r, x1r]
    top = i00 * (1.0 - fx) + i01 * fx
    bot = i10 * (1.0 - fx) + i11 * fx
    return top * (1.0 - fy) + bot * fy
