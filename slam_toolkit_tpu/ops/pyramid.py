"""Image pyramid + Gaussian blur as XLA convolutions.

Replaces ORBextractor::ComputePyramid (ref src/orb_extractor.cpp:1107-1132):
8 levels at scale factor 1.2, each level bilinearly downsampled from level 0.
Levels keep static shapes derived from the config, so the whole pyramid is
one traced program. The 19px reflected border of the reference is handled
by masking detections near edges instead of physically padding.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

from slam_toolkit_tpu.config import ExtractorConfig


def level_shapes(height: int, width: int,
                 cfg: ExtractorConfig) -> List[Tuple[int, int]]:
    """Static (h, w) per pyramid level (matching cvRound semantics)."""
    shapes = []
    for s in cfg.scales:
        shapes.append((int(round(height / s)), int(round(width / s))))
    return shapes


def resize_bilinear(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of a 2D image to a static target shape.

    Uses align-corners=False (pixel-center) sampling like cv::resize(INTER_LINEAR).
    Implemented as two 1-D gathers + lerps, which XLA fuses well on TPU.
    """
    h, w = image.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return image

    def axis_coords(n_in, n_out):
        x = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
        x = jnp.clip(x, 0.0, n_in - 1.0)
        x0 = jnp.floor(x).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, n_in - 1)
        f = x - x0
        return x0, x1, f

    y0, y1, fy = axis_coords(h, oh)
    x0, x1, fx = axis_coords(w, ow)
    top = image[y0, :] * (1.0 - fy)[:, None] + image[y1, :] * fy[:, None]
    out = top[:, x0] * (1.0 - fx)[None, :] + top[:, x1] * fx[None, :]
    return out


def build_pyramid(image: jnp.ndarray, cfg: ExtractorConfig) -> List[jnp.ndarray]:
    """Level-0 image (H, W) float32 -> list of per-level images."""
    h, w = image.shape
    return [resize_bilinear(image, hw) for hw in level_shapes(h, w, cfg)]


@functools.lru_cache(maxsize=8)
def _gaussian_kernel1d(size: int, sigma: float) -> tuple:
    import math
    half = size // 2
    vals = [math.exp(-(i - half) ** 2 / (2.0 * sigma * sigma))
            for i in range(size)]
    s = sum(vals)
    return tuple(v / s for v in vals)


def gaussian_blur(image: jnp.ndarray, size: int = 7,
                  sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with reflect-101 padding.

    Matches the pre-BRIEF GaussianBlur(7x7, sigma=2, BORDER_REFLECT_101)
    at ref src/orb_extractor.cpp:1086.
    """
    k = jnp.asarray(_gaussian_kernel1d(size, sigma), dtype=image.dtype)
    half = size // 2
    padded = jnp.pad(image, ((half, half), (half, half)), mode='reflect')
    x = padded[None, None]  # NCHW
    kh = k.reshape(1, 1, size, 1)
    kw = k.reshape(1, 1, 1, size)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), 'VALID')
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), 'VALID')
    return x[0, 0]
