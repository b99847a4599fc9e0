import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.config import CameraConfig
from slam_toolkit_tpu.geometry import camera as cam_mod
from slam_toolkit_tpu.geometry.camera import Camera, StereoCamera


def make_cam(distorted=True):
    cfg = CameraConfig(fx=500.0, fy=510.0, cx=320.0, cy=240.0,
                       k1=-0.28 if distorted else 0.0,
                       k2=0.07 if distorted else 0.0,
                       p1=1e-4 if distorted else 0.0,
                       p2=-2e-4 if distorted else 0.0,
                       baseline=0.5, width=640, height=480)
    return Camera.from_config(cfg), StereoCamera.from_config(cfg)


def test_project_pinhole_center():
    cam, _ = make_cam(distorted=False)
    uv = cam_mod.project(cam, jnp.array([0.0, 0.0, 5.0]))
    np.testing.assert_allclose(np.asarray(uv), [320.0, 240.0], atol=1e-5)


def test_undistort_inverts_distort():
    cam, _ = make_cam(distorted=True)
    key = jax.random.PRNGKey(0)
    xn = jax.random.uniform(key, (256, 2), minval=-0.4, maxval=0.4)
    xd = cam_mod.distort(cam, xn)
    xn2 = cam_mod.undistort_normalized(cam, xd, iters=8)
    np.testing.assert_allclose(np.asarray(xn2), np.asarray(xn), atol=1e-4)


def test_pixel_normalized_roundtrip():
    cam, _ = make_cam(distorted=True)
    key = jax.random.PRNGKey(1)
    xn = jax.random.uniform(key, (128, 2), minval=-0.3, maxval=0.3)
    z = jax.random.uniform(jax.random.PRNGKey(2), (128, 1), minval=2.0, maxval=30.0)
    Xc = jnp.concatenate([xn * z, z], axis=-1)
    uv = cam_mod.project(cam, Xc)
    xn_rec = cam_mod.pixel_to_normalized(cam, uv)
    np.testing.assert_allclose(np.asarray(xn_rec), np.asarray(xn), atol=1e-4)


def test_in_image():
    cam, _ = make_cam()
    uv = jnp.array([[0.0, 0.0], [639.5, 479.5], [-1.0, 10.0], [10.0, 480.0]])
    got = cam_mod.in_image(cam, uv)
    np.testing.assert_array_equal(np.asarray(got), [True, True, False, False])


def test_stereo_depth():
    _, stereo = make_cam(distorted=False)
    # z = fx*b/d = 500*0.5/10 = 25
    z = cam_mod.stereo_depth(stereo, jnp.array([110.0]), jnp.array([100.0]))
    np.testing.assert_allclose(np.asarray(z), [25.0], atol=1e-5)
    # zero/negative disparity -> 0
    z = cam_mod.stereo_depth(stereo, jnp.array([100.0, 90.0]),
                             jnp.array([100.0, 100.0]))
    np.testing.assert_array_equal(np.asarray(z), [0.0, 0.0])


def test_bilinear_sample_exact_on_grid():
    img = jnp.arange(48.0).reshape(6, 8)
    uv = jnp.array([[3.0, 2.0], [0.0, 0.0], [7.0, 5.0]])
    got = cam_mod.bilinear_sample(img, uv)
    np.testing.assert_allclose(np.asarray(got), [19.0, 0.0, 47.0], atol=1e-5)


def test_bilinear_sample_midpoint():
    img = jnp.array([[0.0, 1.0], [2.0, 3.0]])
    got = cam_mod.bilinear_sample(img, jnp.array([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(got), [1.5], atol=1e-6)


def test_bilinear_sample_reflect_border():
    img = jnp.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0, 8.0]])
    # x=-0.5 reflects between col 0 and col 1 (BORDER_REFLECT_101)
    got = cam_mod.bilinear_sample(img, jnp.array([[-0.5, 0.0]]))
    np.testing.assert_allclose(np.asarray(got), [0.5], atol=1e-6)


def test_stereo_depth_invd_roundtrip():
    """SupplyMappoints-style invd from stereo must reproject consistently."""
    cam, stereo = make_cam(distorted=False)
    z = 17.0
    X = jnp.array([1.0, -2.0, z])
    uv_l = cam_mod.project(cam, X)
    uv_r = cam_mod.project(cam, X - jnp.array([0.5, 0.0, 0.0]))  # baseline 0.5
    z_est = cam_mod.stereo_depth(stereo, uv_l[0], uv_r[0])
    np.testing.assert_allclose(float(z_est), z, rtol=1e-4)
