"""DenseTracker (epip_cluster workload) e2e: temporal cluster tracking.

The reference's core loop is TrackCluster (ref
examples/epip_cluster/src/tracker.cpp:518-693): cluster labels persist
across frames by flow propagation, per-cluster PnP-RANSAC, and
re-absorption; NEW movers are acquired mid-sequence by the residual
RansacCluster (:202-392). These tests drive a synthetic stereo scene
with multiple independently moving textured boxes and assert exactly
those properties: id persistence over >=10 frames, per-cluster rigid
motions, and mid-sequence acquisition of a new mover.
"""

import numpy as np
import pytest

from slam_toolkit_tpu.cluster.tracker import DenseConfig, DenseTracker
from slam_toolkit_tpu.config import CameraConfig

H, W = 96, 128
FX, BASE = 120.0, 0.5
Z_BOX = 7.5                      # box disparity: 8 px
D_BOX = FX * BASE / Z_BOX
# the static background carries DEPTH VARIATION (three bands), so a
# translation-only compromise model cannot cover both a near mover and
# the background within the 2-px gate (the degenerate single-depth
# plane admits exactly that ambiguity)
# the near band (d=7, z=8.6 m) sits almost at mover depth: any rigid
# compromise model reaching a mover's 3-px shift at z=7.5 must also
# shift that band by >2 px, so RANSAC cannot absorb movers into ground
BG_BANDS = [(0, 32, 2.0), (32, 64, 4.0), (64, 96, 7.0)]   # (y0, y1, disp)

_rng = np.random.default_rng(7)
_BG = np.kron(_rng.uniform(20, 235, (H // 4 + 2, W // 4 + 2)),
              np.ones((4, 4))).astype(np.float32)
_TEX = {name: np.kron(_rng.uniform(20, 235, (8, 8)),
                      np.ones((4, 4))).astype(np.float32)
        for name in "ABC"}


def movers_at(t: float):
    """Box (name, x, y, size) layout at frame t. A moves right 5 px/f,
    B left 5 px/f, C appears at t>=6 moving down 5 px/f. Speeds exceed
    TWICE the reference's 2-px RANSAC gate: a compromise model that
    halves a mover's residual to <2 px must displace same-region
    near-depth background by >2 px and lose more inliers than it gains,
    so no mover can be absorbed into the static cluster."""
    out = [("A", 40 + 5 * t, 8, 32), ("B", 94 - 5 * t, 56, 32)]
    if t >= 6:
        out.append(("C", 36, 4 + 5 * (t - 6), 24))
    return out


def make_scene(t: float):
    left = _BG[:H, :W].copy()
    right = np.empty_like(left)
    for y0, y1, d in BG_BANDS:
        right[y0:y1] = np.roll(_BG[y0:y1, :W], -int(round(d)), axis=1)
    for name, x, y, s in movers_at(t):
        x, y = int(round(x)), int(round(y))
        tex = _TEX[name][:s, :s]
        left[y:y + s, x:x + s] = tex
        xr = x - int(round(D_BOX))
        if 0 <= xr and xr + s <= W:
            right[y:y + s, xr:xr + s] = tex
    return left.astype(np.float32), right.astype(np.float32)


def tracker():
    cam = CameraConfig(fx=FX, fy=FX, cx=64.0, cy=48.0, baseline=BASE,
                       width=W, height=H)
    cfg = DenseConfig(num_disparities=32, block_size=9, flow_levels=3,
                      flow_win=9, sample_stride=4, min_disparity=1.0,
                      max_disparity=30.0, min_flow_p95=1.0,
                      cluster_radius_3d=0.6, min_cluster_size=20,
                      max_points=1024, track_capacity=768,
                      min_track_points=10, min_track_inliers=10,
                      min_near_points=8, max_rprj_px=2.0)
    return DenseTracker(cam, cfg)


def box_label(out, name, t):
    """Majority label among sampled points inside box `name` at time t."""
    for n, x, y, s in movers_at(t):
        if n != name:
            continue
        uv = out["pts_uv"]
        m = ((uv[:, 0] >= x + 4) & (uv[:, 0] < x + s - 4)
             & (uv[:, 1] >= y + 4) & (uv[:, 1] < y + s - 4))
        labs = out["labels"][m]
        labs = labs[labs >= 0]
        if labs.size == 0:
            return -1, 0.0
        vals, cnts = np.unique(labs, return_counts=True)
        return int(vals[np.argmax(cnts)]), cnts.max() / max(m.sum(), 1)
    raise KeyError(name)


@pytest.mark.slow
def test_temporal_cluster_tracking():
    tr = tracker()
    N = 12
    outs = {}
    for t in range(N):
        outs[t] = tr.track(*make_scene(t))
    assert outs[0]["skipped"]

    first = min(t for t in outs if not outs[t]["skipped"])
    assert first <= 1
    o1 = outs[first]
    # initial segmentation: a ground cluster + the two movers
    assert o1["n_new_clusters"] >= 3, o1["clusters"]
    ground_ids = [c["id"] for c in o1["clusters"] if c["is_ground"]]
    assert len(ground_ids) == 1

    # --- id persistence: A and B keep ONE label over >=10 frames ------
    id_a = {t: box_label(outs[t], "A", t)[0] for t in range(first + 1, N)}
    id_b = {t: box_label(outs[t], "B", t)[0] for t in range(first + 1, N)}
    assert len(set(id_a.values())) == 1, f"A id changed: {id_a}"
    assert len(set(id_b.values())) == 1, f"B id changed: {id_b}"
    assert set(id_a.values()) != set(id_b.values())
    assert all(v >= 0 for v in id_a.values())
    assert all(v >= 0 for v in id_b.values())
    assert N - (first + 1) >= 10

    # clusters are reported as TRACKED (flow-propagated PnP), not
    # re-created, after the first segmentation
    for t in range(first + 2, N):
        by_id = {c["id"]: c for c in outs[t]["clusters"]}
        assert by_id[id_a[t]]["tracked"], (t, outs[t]["clusters"])
        assert by_id[id_b[t]]["tracked"], (t, outs[t]["clusters"])

    # --- rigid motions: A x-positive, B x-negative (T maps current ----
    # camera coords to previous camera: sign flips)
    t = 4
    by_id = {c["id"]: c for c in outs[t]["clusters"]}
    ta = np.asarray(by_id[id_a[t]]["T"])[:3, 3]
    tb = np.asarray(by_id[id_b[t]]["T"])[:3, 3]
    assert ta[0] < -0.1 and abs(ta[0]) > 1.5 * max(abs(ta[1]), abs(ta[2])), ta
    assert tb[0] > 0.1 and abs(tb[0]) > 1.5 * max(abs(tb[1]), abs(tb[2])), tb
    ground = by_id.get(ground_ids[0])
    if ground is not None:
        assert np.linalg.norm(np.asarray(ground["T"])[:3, 3]) < 0.1

    # --- new mover acquired mid-sequence ------------------------------
    # C appears at t=6 (first flow evidence at t=7); within a couple of
    # frames the residual RansacCluster must mint a NEW id that then
    # persists to the end of the run.
    id_c = {t: box_label(outs[t], "C", t)[0] for t in range(8, N)}
    settled = [v for v in id_c.values() if v >= 0]
    assert settled, f"C never clustered: {id_c}"
    c_id = id_c[N - 1]
    assert c_id >= 0
    assert c_id not in {id_a[N - 1], id_b[N - 1], ground_ids[0]}
    # once acquired, the id persists to the end
    acq = min(t for t, v in id_c.items() if v == c_id)
    assert all(id_c[t] == c_id for t in range(acq, N)), id_c


@pytest.mark.slow
def test_drift_split_drops_far_fragment():
    """EuclideanFilter counterpart (ref tracker.cpp:411-516): when a
    tracked cluster's members split into disconnected 3D fragments, the
    fragment without enough near points must be dropped (label -1)."""
    import jax
    import jax.numpy as jnp
    from slam_toolkit_tpu.cluster import tracker as trk

    cam = CameraConfig(fx=FX, fy=FX, cx=64.0, cy=48.0, baseline=BASE,
                       width=W, height=H)
    cfg = DenseConfig(max_points=64, max_clusters=4, track_capacity=64,
                      min_track_points=4, min_track_inliers=4,
                      min_near_points=5, cluster_radius_3d=0.5,
                      sample_stride=16, near_z=50.0)
    # hand-built frame: 10 points in a tight blob (near), 4 points in a
    # second blob 5 m away (below min_near_points) — same prev label
    P = 64
    xyz = np.zeros((P, 3), np.float32)
    xyz[:10] = [0, 0, 10]
    xyz[:10, 0] = np.linspace(0, 0.4 * 9, 10) * 0.1
    xyz[10:14] = [5, 0, 10]
    xyz[10:14, 0] += np.linspace(0, 0.3, 4)
    valid = np.zeros(P, bool)
    valid[:14] = True
    uv = np.zeros((P, 2), np.float32)
    uv[:14, 0] = FX * xyz[:14, 0] / 10 + 64
    uv[:14, 1] = 48.0
    f = trk.DenseFrame(
        disparity=jnp.zeros((H, W)), depth=jnp.full((H, W), 10.0),
        flow=jnp.zeros((H, W, 2)), edge_mask=jnp.ones((H, W), bool),
        pts_uv=jnp.asarray(uv), pts_xyz=jnp.asarray(xyz),
        pts_valid=jnp.asarray(valid), flow_p95=jnp.float32(5.0))
    # prev labels: everything in cluster 1 (non-ground); grid cells of
    # these uv positions must map back to label 1 — use a uniform fill
    prev_labels = np.full(P, 1, np.int32)
    out = trk.track_clusters(
        f, jnp.asarray(prev_labels), jnp.full((H, W), 10.0),
        jnp.asarray([False, False, False, False]),
        jnp.asarray([False, True, False, False]),
        jax.random.PRNGKey(0), cam, cfg,
        (H // 16, W // 16))
    labels = np.asarray(out.labels)
    assert (labels[:10] == 1).sum() >= 8, labels[:14]
    assert (labels[10:14] == -1).all(), labels[10:14]


@pytest.mark.slow
def test_fused_matches_stepwise():
    """The fused single-program step (tracker.fused_step: on-device
    RANSAC rounds + rank-based slot allocation) must reproduce the
    stepwise host driver's labels bit-exactly — same RNG keys, same
    round gates, same first-free-slot allocation order."""
    from slam_toolkit_tpu.cluster.tracker import FusedDenseTracker

    tr = tracker()
    ftr = FusedDenseTracker(tr.cam, tr.cfg)
    step_outs, fused_outs = [], []
    N = 8
    for t in range(N):
        l, r = make_scene(t)
        step_outs.append(tr.track(l, r))
        o = ftr.process(l, r)
        if o is not None:
            fused_outs.append(o)
    fused_outs += ftr.flush()
    assert len(fused_outs) == N - 1          # frame 0 seeds
    for t in range(1, N):
        s, f = step_outs[t], fused_outs[t - 1]
        assert s.get("skipped", False) == f["skipped"], t
        if f["skipped"]:
            continue
        np.testing.assert_array_equal(
            s["labels"], f["labels"],
            err_msg=f"fused labels diverge at frame {t}")
        assert s["n_new_clusters"] == f["n_new_clusters"], t
        assert s["n_tracked"] == f["n_tracked"], t
