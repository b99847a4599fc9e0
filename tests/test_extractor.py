import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.config import ExtractorConfig
from slam_toolkit_tpu.ops import brief, extractor, fast, hamming, pyramid, topk_grid


def blob_image(h=96, w=128, n=30, seed=0):
    img = np.zeros((h, w), np.float32)
    rng = np.random.default_rng(seed)
    pts = rng.integers(20, min(h, w) - 20, size=(n, 2))
    for y, x in pts:
        img[y - 1:y + 2, x - 1:x + 2] = 200.0
    # add texture so descriptors are informative
    img += rng.uniform(0, 30, size=(h, w)).astype(np.float32)
    return jnp.asarray(img), pts


CFG = ExtractorConfig(num_features=128, num_levels=3, cell_size=16)


def test_extract_shapes_and_validity():
    img, _ = blob_image()
    feats = jax.jit(lambda x: extractor.extract(x, CFG))(img)
    k = CFG.max_keypoints
    assert feats.xy.shape == (k, 2)
    assert feats.desc.shape == (k, 8) and feats.desc.dtype == jnp.uint32
    assert int(feats.valid.sum()) > 10
    # valid keypoints are inside the image
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 128).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 96).all()


def test_descriptor_rotation_invariance():
    """A rotated image should produce similar descriptors at the same blob."""
    img, _ = blob_image(n=1, seed=3)
    # place a single asymmetric corner pattern in the center
    base = np.zeros((96, 96), np.float32)
    base[40:56, 40:56] = 200.0
    base[40:48, 40:48] = 0.0
    img0 = jnp.asarray(base)
    img90 = jnp.rot90(img0, k=1)  # 90-degree rotation

    blurred0 = pyramid.gaussian_blur(img0)
    blurred90 = pyramid.gaussian_blur(img90)
    c = jnp.array([[47.5, 47.5]])
    a0 = brief.ic_angle(img0, c)
    a90 = brief.ic_angle(img90, c)
    d0 = brief.compute_descriptors(blurred0, c, a0)
    d90 = brief.compute_descriptors(blurred90, c, a90)
    dist = int(hamming.distance_matrix(d0, d90)[0, 0])
    assert dist < 64, f"rotation-steered BRIEF too far: {dist}"
    # sanity: a random descriptor pair should be ~128 apart
    rng = np.random.default_rng(0)
    ra = jnp.asarray(rng.integers(0, 2**32, (1, 8), dtype=np.uint32))
    rb = jnp.asarray(rng.integers(0, 2**32, (1, 8), dtype=np.uint32))
    assert int(hamming.distance_matrix(ra, rb)[0, 0]) > 90


def test_hamming_matrix_against_numpy():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, (24, 8), dtype=np.uint32)
    got = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = np.zeros((16, 24), np.int32)
    for i in range(16):
        for j in range(24):
            want[i, j] = bin(int.from_bytes((a[i] ^ b[j]).tobytes(), 'little')
                             ).count('1')
    np.testing.assert_array_equal(got, want)


def test_ratio_test_match():
    dist = jnp.asarray([
        [10.0, 50.0, 60.0],   # best 10, second 50 -> pass (10 < 0.5*50? 10<25 yes)
        [30.0, 40.0, 35.0],   # best 30, second 35 -> fail ratio
        [90.0, 95.0, 99.0],   # best 90 > max_dist -> fail
    ])
    idx, ok = hamming.ratio_test_match(dist, ratio=0.5, max_dist=80.0)
    np.testing.assert_array_equal(np.asarray(idx), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(ok), [True, False, False])


def test_keep_best_per_target():
    idx = jnp.asarray([2, 2, 1, 0], jnp.int32)
    ok = jnp.asarray([True, True, True, False])
    dist = jnp.asarray([5.0, 3.0, 7.0, 1.0])
    refined = hamming.keep_best_per_target(idx, ok, dist, num_targets=4)
    np.testing.assert_array_equal(np.asarray(refined),
                                  [False, True, True, False])


def test_extractor_multilevel_budget():
    budgets = extractor.level_budgets(CFG)
    assert sum(budgets) == CFG.num_features
    assert budgets[0] > budgets[1] > budgets[2]


def test_selected_keypoints_on_blobs():
    img, pts = blob_image()
    feats = jax.jit(lambda x: extractor.extract(x, CFG))(img)
    v = np.asarray(feats.valid) & (np.asarray(feats.octave) == 0)
    xy = np.asarray(feats.xy)[v]
    # most level-0 keypoints should be near planted blobs
    near = sum(1 for p in xy
               if min(abs(p[0] - x) + abs(p[1] - y) for y, x in pts) <= 3)
    assert near >= len(xy) * 0.5, f"only {near}/{len(xy)} near blobs"


def test_poly_pyramid_matches_sampling_grid():
    """poly mode == bilinear at x = 1.2*o + 0.1 per axis, exactly."""
    import dataclasses
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (94, 130)).astype(np.float32)

    def np_down(a, axis):
        pad = (-a.shape[axis]) % 6
        if pad:
            a = np.concatenate([a, np.take(a, [-1] * pad, axis=axis)],
                               axis=axis)
        m = a.shape[axis] // 6
        o = np.arange(5 * m)
        x = 1.2 * o + 0.1
        x0 = np.floor(x).astype(int)
        f = x - x0
        g0 = np.take(a, x0, axis=axis)
        g1 = np.take(a, x0 + 1, axis=axis)
        if axis == 0:
            f = f[:, None]
        return (1 - f) * g0 + f * g1

    cfg = dataclasses.replace(ExtractorConfig(), num_levels=4,
                              pyramid_mode="poly")
    levels = jax.jit(lambda x: pyramid.build_pyramid(x, cfg))(
        jnp.asarray(img))
    ref = img
    shapes = pyramid.level_shapes(94, 130, cfg)
    for i, lv in enumerate(levels):
        lv = np.asarray(lv)
        assert lv.shape == shapes[i]
        np.testing.assert_allclose(lv, ref, atol=2e-4)
        ref = np_down(np_down(ref, 0), 1)


def test_poly_and_matmul_pyramids_agree():
    """The two modes sample the same pyramid up to shape padding."""
    import dataclasses
    rng = np.random.default_rng(11)
    # 6|h and 6|w: identical shapes at level 1, comparable content
    img = jnp.asarray(rng.uniform(0, 255, (96, 132)).astype(np.float32))
    poly = dataclasses.replace(ExtractorConfig(), num_levels=2,
                               pyramid_mode="poly")
    mat = dataclasses.replace(ExtractorConfig(), num_levels=2,
                              pyramid_mode="matmul")
    lv_p = np.asarray(pyramid.build_pyramid(img, poly)[1])
    lv_m = np.asarray(pyramid.build_pyramid(img, mat)[1])
    h = min(lv_p.shape[0], lv_m.shape[0])
    w = min(lv_p.shape[1], lv_m.shape[1])
    # same 1.2x bilinear downsample, bf16-HIGH matmul vs exact f32:
    # agree to well under an intensity LSB
    assert np.abs(lv_p[:h, :w] - lv_m[:h, :w]).max() < 0.5
