"""The dense-clustering runner (run_cluster.py — counterpart of the
reference's epip_cluster example binary, tracker_main.cpp) drives
dataset -> DenseTracker -> masks/stats end-to-end on the mini fixture."""

import json
import os

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fixtures", "kitti_mini")


@pytest.mark.slow
def test_run_cluster(tmp_path, capsys):
    from slam_toolkit_tpu import run_cluster
    out = str(tmp_path / "out")
    # the fixture's inter-frame motion is small; disable the p95 skip
    # gate so the cluster path actually runs
    run_cluster.main(["--root", ROOT, "--seq", "00", "--out", out,
                      "--min-flow-p95", "0.0"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == 6
    assert summary["processed"] >= 4          # first frame always skips
    with open(os.path.join(out, "stats.json")) as f:
        full = json.load(f)
    assert len(full["frames_detail"]) == 6
    done = [d for d in full["frames_detail"] if not d["skipped"]]
    assert all(d["n_points"] > 100 for d in done), \
        [d["n_points"] for d in done]         # disparity gate must pass
    assert any(d["clusters"] for d in done), "no cluster ever formed"
    masks = [f for f in os.listdir(out) if f.startswith("mask_")]
    assert masks, "no label-mask PNGs written"


def test_label_mask_rasterization():
    """MakeMask counterpart: each labeled point paints its stride cell;
    unlabeled area stays -1 (ref tracker.cpp:394-409)."""
    from slam_toolkit_tpu.run_cluster import label_mask
    pts = np.asarray([[10, 8], [30, 20]], np.float32)
    labels = np.asarray([2, -1], np.int32)
    mask = label_mask((40, 50), pts, labels, stride=5)
    assert mask[8, 10] == 2
    assert (mask[6:11, 8:13] == 2).all()      # full cell painted
    assert mask[20, 30] == -1                 # unlabeled point skipped
    assert (mask == 2).sum() == 5 * 5
