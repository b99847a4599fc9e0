"""Direct (photometric) pose tracker: coarse-to-fine over a pyramid.

Counterpart of BrightenDirectPoseTracker (ref src/posetracker.cpp:250-353,
built but not wired into the reference Pipeline either): track the
camera against landmarks with known reference intensities by minimizing
the 8-point-pattern photometric error at a coarse-to-fine schedule
(DirectPyramid ratio 0.6, ref src/optimizer.cpp:15-37), estimating SE3
pose plus affine brightness (a, b).

The alternate tracking backend of the Method-strategy axis
(IndirectStereoMethod vs DirectStereoMethod, ref include/method.h:33-50):
set SlamConfig.tracker.method = "direct" and SlamEngine tracks every
frame photometrically against the latest keyframe image, with post-hoc
keypoint binding for map bookkeeping (pipeline/engine.py _track_dir).
The reference builds this tracker but never wires it into its Pipeline;
here it is selectable end-to-end (tests/test_direct_engine.py).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp

from slam_toolkit_tpu.geometry.camera import Camera
from slam_toolkit_tpu.ops.pyramid import resize_bilinear
from slam_toolkit_tpu.optim import direct_lm
from slam_toolkit_tpu.optim.direct_lm import DirectResult, DirectState

PYRAMID_RATIO = 0.6
PYRAMID_LEVELS = 4


def build_direct_pyramid(image: jnp.ndarray,
                         levels: int = PYRAMID_LEVELS,
                         ratio: float = PYRAMID_RATIO):
    """[(image, scale)] from fine to coarse (ref DirectPyramid ratio 0.6)."""
    h, w = image.shape
    out = []
    for lvl in range(levels):
        s = ratio ** lvl
        hh, ww = max(int(round(h * s)), 16), max(int(round(w * s)), 16)
        out.append((resize_bilinear(image, (hh, ww)), s))
    return out


def track_direct(ref_image: jnp.ndarray, ref_state: DirectState,
                 image: jnp.ndarray, T_pred: jnp.ndarray, cam: Camera,
                 Xw: jnp.ndarray, valid: jnp.ndarray,
                 iters_per_level: int = 7) -> DirectResult:
    """Estimate the new frame's (pose, a, b) from photometric alignment.

    ref_image/ref_state: the anchor frame (its pose and brightness);
    Xw/valid: landmark positions visible in the anchor.
    Coarse-to-fine: each level runs a damped LM (optim/direct_lm.py),
    mirroring the search-radius schedule of ref :319-353.
    """
    pyr_ref = build_direct_pyramid(ref_image)
    pyr_new = build_direct_pyramid(image)
    state = DirectState(T_cw=T_pred, a=ref_state.a, b=ref_state.b)
    result = None
    for (img_r, s), (img_n, _) in zip(reversed(pyr_ref), reversed(pyr_new)):
        ref_vals = direct_lm.reference_values(ref_state, img_r, cam, Xw,
                                              valid, s)
        result = direct_lm.optimize_direct(state, img_n, cam, Xw, ref_vals,
                                           valid, s, iters=iters_per_level)
        state = result.state
    return result
