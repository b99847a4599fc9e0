"""Color k-means quantization tool (ref epip_cluster scripts/kmean.py)."""

import numpy as np

from slam_toolkit_tpu.tools.color_kmeans import quantize_image


def test_quantize_recovers_flat_regions():
    # image of 3 flat gray levels -> 3-means must recover them exactly
    img = np.zeros((32, 48), np.uint8)
    img[:, 16:32] = 120
    img[:, 32:] = 250
    quant, edges, centers = quantize_image(img, k=3, iters=10, seed=1)
    got = np.sort(np.unique(quant))
    assert len(got) == 3
    np.testing.assert_allclose(got, [0, 120, 250], atol=1.0)
    # edges exist only at the two boundaries
    cols = np.flatnonzero(edges.any(axis=0))
    assert set(cols) <= {15, 16, 17, 31, 32, 33}
    assert len(cols) > 0


def test_quantize_color_image():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    quant, edges, centers = quantize_image(img, k=4, iters=5)
    assert quant.shape == (16, 16, 3)
    assert centers.shape == (4, 3)
    # every quantized pixel is one of the centers
    flat = quant.reshape(-1, 3)
    d = np.min(np.linalg.norm(flat[:, None] - centers[None], axis=-1),
               axis=1)
    assert d.max() < 1e-3
