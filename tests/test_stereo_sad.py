"""ops/stereo_sad.py: correlation stereo against known disparities."""

import numpy as np
import pytest
import jax.numpy as jnp

from slam_toolkit_tpu.ops import stereo_sad
from slam_toolkit_tpu.ops.stereo_sad import (_curve_fallback, _curve_pallas,
                                             _shifts, _strip_w, WIN, PAD)


def _textured_pair(h, w, disp, seed=0):
    """Right image = left shifted by `disp` px (constant disparity)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h, w + 200)).astype(np.float32)
    # smooth a little so subpixel parabola is meaningful
    k = np.array([0.25, 0.5, 0.25], np.float32)
    for ax in (0, 1):
        base = (np.roll(base, 1, ax) * 0.25 + base * 0.5 +
                np.roll(base, -1, ax) * 0.25)
    left = base[:, 100:100 + w]
    right = base[:, 100 + disp:100 + disp + w]
    return jnp.asarray(left), jnp.asarray(right)


def test_recovers_constant_disparity():
    h, w, d = 96, 512, 23
    left, right = _textured_pair(h, w, d)
    rng = np.random.default_rng(1)
    k = 64
    xy = np.stack([rng.uniform(150, w - 20, k),
                   rng.uniform(20, h - 20, k)], -1).astype(np.float32)
    xr, ok = stereo_sad.match(left, right, jnp.asarray(xy),
                              jnp.ones(k, bool), max_disp=60)
    xr, ok = np.asarray(xr), np.asarray(ok)
    assert ok.mean() > 0.9
    err = np.abs((np.round(xy[ok, 0]) - xr[ok]) - d)
    assert np.median(err) < 0.25, np.median(err)


@pytest.mark.slow
def test_uniqueness_rejects_flat_regions():
    h, w = 96, 384
    left = jnp.zeros((h, w), jnp.float32)
    right = jnp.zeros((h, w), jnp.float32)
    xy = jnp.asarray([[200.0, 48.0], [250.0, 30.0]], jnp.float32)
    _, ok = stereo_sad.match(left, right, xy, jnp.ones(2, bool), max_disp=60)
    assert not bool(np.asarray(ok).any())


def test_kernel_matches_fallback_interpret():
    h, w, d = 96, 512, 17
    left, right = _textured_pair(h, w, d, seed=2)
    rng = np.random.default_rng(3)
    k = 48
    max_disp = 60
    side = 2 * WIN + 1
    xl = rng.integers(120, w - 20, k).astype(np.int32)
    yl = rng.integers(20, h - 20, k).astype(np.int32)
    ys0 = jnp.asarray(np.clip(yl - WIN, 0, h - side))
    xl0 = jnp.asarray(np.clip(xl - WIN, 0, w - side))
    xs0 = jnp.asarray(np.clip(xl - (max_disp + WIN + PAD), 0,
                              w - _strip_w(max_disp)))
    ref = _curve_fallback(left, right, ys0, xl0, xs0, max_disp)
    out = _curve_pallas(left, right, ys0, xl0, xs0, max_disp, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-3)
