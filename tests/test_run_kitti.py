"""The user-facing KITTI runner (run_kitti.py — the counterpart of the
reference's examples/kitti entrypoint) drives dataset -> engine ->
trajectory/plots/stats end-to-end on the checked-in mini fixture."""

import json
import os

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fixtures", "kitti_mini")


@pytest.mark.slow
def test_run_kitti_chunked(tmp_path, capsys):
    from slam_toolkit_tpu import run_kitti
    out = str(tmp_path / "out")
    run_kitti.main(["--root", ROOT, "--seq", "00", "--chunk", "2",
                    "--out", out])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 6
    assert stats["ate_rmse_m"] < 0.1
    # KITTI-format poses: 6 rows of 12 floats, first row ~identity
    poses = np.loadtxt(os.path.join(out, "00.txt")).reshape(-1, 3, 4)
    assert poses.shape == (6, 3, 4)
    np.testing.assert_allclose(poses[0], np.eye(4)[:3], atol=1e-5)
    for f in ("trajectory.png", "map.png", "stats.json"):
        assert os.path.exists(os.path.join(out, f))
    with open(os.path.join(out, "stats.json")) as f:
        full = json.load(f)
    assert len(full["frame_stats"]) == 6
