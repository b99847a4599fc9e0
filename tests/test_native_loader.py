"""Native PNG loader: build, decode, prefetch-iterate (skips without g++)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "libslamloader.so")


@pytest.fixture(scope="module")
def built_lib():
    if not os.path.exists(LIB):
        if shutil.which("g++") is None:
            pytest.skip("no g++")
        subprocess.run(["bash", os.path.join(REPO, "native", "build.sh")],
                       check=True)
    # (re)load bindings after building
    import importlib
    from slam_toolkit_tpu.data import native_loader
    importlib.reload(native_loader)
    if not native_loader.available():
        pytest.skip("native lib unavailable")
    return native_loader


@pytest.fixture()
def png_pairs(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    lps, rps, truth = [], [], []
    for i in range(5):
        img_l = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        img_r = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        lp = str(tmp_path / f"l{i}.png")
        rp = str(tmp_path / f"r{i}.png")
        cv2.imwrite(lp, img_l)
        cv2.imwrite(rp, img_r)
        lps.append(lp)
        rps.append(rp)
        truth.append((img_l, img_r))
    return lps, rps, truth


def test_decode_matches_cv2(built_lib, png_pairs):
    lps, _, truth = png_pairs
    out = built_lib.decode_gray(lps[0], 48, 64)
    assert out is not None
    np.testing.assert_array_equal(out.astype(np.uint8), truth[0][0])


def test_prefetch_iteration_order(built_lib, png_pairs):
    lps, rps, truth = png_pairs
    loader = built_lib.PrefetchLoader(lps, rps, 48, 64, ring=2)
    got = list(loader)
    assert len(got) == 5
    for (gl, gr), (tl, tr) in zip(got, truth):
        np.testing.assert_array_equal(gl.astype(np.uint8), tl)
        np.testing.assert_array_equal(gr.astype(np.uint8), tr)
    loader.close()


def test_decode_missing_file(built_lib):
    assert built_lib.decode_gray("/nonexistent.png", 8, 8) is None
