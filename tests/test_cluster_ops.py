"""Dense stereo BM, Farneback flow, RANSAC, clustering — tiny-shape tests."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.cluster import flow as flow_mod
from slam_toolkit_tpu.cluster import ransac as ransac_mod
from slam_toolkit_tpu.cluster import stereo_bm
from slam_toolkit_tpu.geometry import se3


def textured(h, w, seed=0, cell=4):
    rng = np.random.default_rng(seed)
    coarse = rng.uniform(0, 255, (h // cell + 1, w // cell + 1))
    img = np.kron(coarse, np.ones((cell, cell)))[:h, :w]
    img += rng.uniform(-10, 10, (h, w))
    return img.astype(np.float32)


def test_disparity_constant_shift():
    h, w, d_true = 48, 96, 6
    left = textured(h, w, seed=1)
    right = np.roll(left, -d_true, axis=1)  # right image shifted left
    disp = jax.jit(lambda a, b: stereo_bm.disparity(
        a, b, num_disparities=16, block_size=7))(
        jnp.asarray(left), jnp.asarray(right))
    d = np.asarray(disp)
    valid = d > 0
    # interior pixels should recover the constant disparity
    inner = d[8:-8, 24:-8]
    got = np.median(inner[inner > 0])
    assert abs(got - d_true) < 0.5, got
    assert (inner > 0).mean() > 0.6


def test_sobel_edge_mask():
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 200.0
    mask = np.asarray(stereo_bm.sobel_edge_mask(jnp.asarray(img),
                                                threshold=50.0, dilate=1))
    assert mask[16, 15] and mask[16, 16]
    assert not mask[16, 4] and not mask[16, 28]


def test_farneback_constant_translation():
    h, w = 64, 64
    img0 = textured(h, w, seed=2, cell=6)
    dx, dy = 3.0, 1.0
    img1 = np.roll(np.roll(img0, int(dy), axis=0), int(dx), axis=1)
    flw = jax.jit(lambda a, b: flow_mod.farneback_flow(
        a, b, levels=3, win=9, iters=2))(jnp.asarray(img0), jnp.asarray(img1))
    f = np.asarray(flw)[12:-12, 12:-12]
    assert abs(np.median(f[..., 0]) - dx) < 0.6, np.median(f[..., 0])
    assert abs(np.median(f[..., 1]) - dy) < 0.6, np.median(f[..., 1])


def test_kabsch_recovers_transform():
    rng = np.random.default_rng(3)
    P = jnp.asarray(rng.uniform(-5, 5, (40, 3)).astype(np.float32))
    T = se3.exp(jnp.asarray([0.3, -0.1, 0.5, 0.1, -0.2, 0.05]))
    Q = se3.transform(T, P)
    T_est = ransac_mod.kabsch_se3(P, Q, jnp.ones(40))
    err = float(jnp.abs(se3.log(T_est @ se3.inv(T))).max())
    assert err < 1e-4, err


def test_pnp_ransac_with_outliers():
    rng = np.random.default_rng(4)
    n = 128
    Xw = jnp.asarray(np.stack([rng.uniform(-4, 4, n), rng.uniform(-2, 2, n),
                               rng.uniform(4, 20, n)], -1).astype(np.float32))
    T = se3.exp(jnp.asarray([0.2, 0.05, 0.4, 0.02, -0.03, 0.01]))
    Xc = se3.transform(T, Xw)
    uv = Xc[:, :2] / Xc[:, 2:3]
    # 25% outliers
    bad = rng.choice(n, n // 4, replace=False)
    uv = uv.at[jnp.asarray(bad)].add(
        jnp.asarray(rng.uniform(-0.3, 0.3, (len(bad), 2)).astype(np.float32)))
    res = jax.jit(lambda X, z, v, k: ransac_mod.pnp_ransac(X, z, v, k))(
        Xw, uv, jnp.ones(n, bool), jax.random.PRNGKey(0))
    assert bool(res.ok)
    err = float(jnp.abs(se3.log(res.T_cw @ se3.inv(T))).max())
    assert err < 0.01, err
    assert int(res.n_inliers) > n * 0.6


def test_euclidean_cluster():
    rng = np.random.default_rng(5)
    a = rng.normal([0, 0, 0], 0.1, (60, 3))
    b = rng.normal([5, 0, 0], 0.1, (80, 3))
    noise = rng.uniform(-10, 10, (20, 3))
    X = jnp.asarray(np.concatenate([a, b, noise]).astype(np.float32))
    valid = jnp.ones(160, bool)
    labels, sizes = ransac_mod.euclidean_cluster(X, valid, radius=0.5,
                                                 min_size=50)
    lab = np.asarray(labels)
    assert len(set(lab[:60])) == 1 and lab[0] >= 0
    assert len(set(lab[60:140])) == 1 and lab[60] >= 0
    assert lab[0] != lab[60]
    # isolated noise rejected by min_size
    assert (lab[140:] == -1).mean() > 0.8
