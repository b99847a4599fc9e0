"""ops/fast_kernel.py: fused FAST+NMS kernel vs the XLA reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from slam_toolkit_tpu.ops import fast
from slam_toolkit_tpu.ops.fast_kernel import detect, detect_fused


def _image(h, w, seed, n_blobs=60):
    """Random blobs on a textured background: plenty of FAST corners."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(40, 60, (h, w)).astype(np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(3, h - 3), rng.integers(3, w - 3)
        img[y - 2:y + 3, x - 2:x + 3] += rng.uniform(30, 180)
    return jnp.asarray(np.clip(img, 0, 255))


@pytest.mark.slow
def test_dual_matches_xla_interpret():
    for (h, w, seed) in [(96, 200, 0), (64, 130, 1), (130, 383, 2)]:
        img = _image(h, w, seed)
        ref = np.asarray(fast.detect_dual(img, 20.0, 7.0, 16))
        out = np.asarray(detect_fused(img, 20.0, 7.0, 16, interpret=True))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)
        assert (out > 0).sum() == (ref > 0).sum() and (ref > 0).sum() > 20


def test_single_matches_xla_interpret():
    img = _image(96, 200, 3)
    ref = np.asarray(fast.detect(img, 7.0, 16))
    out = np.asarray(detect_fused(img, None, 7.0, 16, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)
    assert (ref > 0).sum() > 20


def test_boost_semantics_interpret():
    """High-threshold survivors carry the +1e4 rank boost, exactly as
    the XLA formulation defines it (fast.detect_dual docstring)."""
    img = _image(128, 256, 4, n_blobs=120)
    out = np.asarray(detect_fused(img, 20.0, 7.0, 16, interpret=True))
    ref = np.asarray(fast.detect_dual(img, 20.0, 7.0, 16))
    assert ((out >= 1e4) == (ref >= 1e4)).all()
    assert (out >= 1e4).sum() > 5


def test_public_entry_cpu_fallback():
    """Off-TPU the public entry routes to the XLA path bit-exactly."""
    img = _image(96, 200, 5)
    np.testing.assert_array_equal(
        np.asarray(detect(img, 20.0, 7.0, 16)),
        np.asarray(fast.detect_dual(img, 20.0, 7.0, 16)))
    np.testing.assert_array_equal(
        np.asarray(detect(img, None, 7.0, 16)),
        np.asarray(fast.detect(img, 7.0, 16)))
