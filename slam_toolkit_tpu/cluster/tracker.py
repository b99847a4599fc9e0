"""Dense motion clustering: the epip_cluster workload, TPU-native.

Replaces DenseTracker (ref examples/epip_cluster/src/tracker.cpp):
per stereo pair — Sobel edge mask (:76-87), dense block-matching
disparity (:106-128), dense optical flow vs the previous frame
(:130-145), a p95 flow-magnitude skip gate (:147-164,722-724), stride-5
point sampling with disparity gates (:166-200), then TEMPORAL motion
clustering:

  1. `TrackCluster` (ref :518-693): propagate previous-frame cluster
     labels through the flow field (the label mask lookup at the
     flow-warped pixel, :529-544), per-cluster PnP-RANSAC on the
     propagated members (:567-592), re-absorb untracked points by
     reprojection under ground-cluster motion (:595-625) then by 3D
     nearest-neighbor <= 0.5 m (:627-662), and split drifted clusters
     with `EuclideanFilter` (:411-516) keeping only sub-components with
     enough near (<50 m) points.
  2. `RansacCluster` (ref :202-392): iterative RANSAC on the residual
     points — rigid fit, disparity-consistency gate (:274-282),
     Euclidean clustering of the inliers with the ground-2D(r=20 px) /
     object-3D(r=0.5 m) distinction (:315-323), components >= 50 points
     become NEW clusters; smaller components return to the pool.

TPU-first design: there is no per-cluster kernel-launch loop and no
FLANN tree. All per-cluster RANSACs run as ONE vmapped dispatch over
fixed cluster slots; label propagation is index arithmetic on the fixed
sample grid (the rasterized mask of ref MakeMask :394-409 never needs
materializing — the grid IS the mask); nearest-neighbor absorption and
Euclidean components are dense masked distance matrices + min-label
propagation. The host driver holds only the inter-frame label state and
the (bounded) residual-RANSAC loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.cluster import flow as flow_mod
from slam_toolkit_tpu.cluster import ransac as ransac_mod
from slam_toolkit_tpu.cluster import stereo_bm
from slam_toolkit_tpu.config import CameraConfig


class DenseConfig(NamedTuple):
    num_disparities: int = 128
    block_size: int = 19
    flow_levels: int = 5
    flow_win: int = 13
    sample_stride: int = 5
    min_disparity: float = 2.0
    max_disparity: float = 50.0
    min_flow_p95: float = 20.0
    cluster_radius_3d: float = 0.5     # object clustering / absorption radius [m] (ref :317,:655)
    ground_radius_px: float = 20.0     # ground clustering radius [px] (ref :317)
    min_cluster_size: int = 50         # new-cluster component minimum (ref :297,:352)
    max_points: int = 8192             # padded sample capacity
    max_clusters: int = 16             # cluster-id slot capacity
    track_capacity: int = 2048         # per-cluster gathered member capacity
    min_track_points: int = 20         # candidate-cluster minimum (ref :554)
    min_track_inliers: int = 20        # per-cluster PnP acceptance (ref :581)
    max_rprj_px: float = 2.0           # RANSAC inlier gate [px] (ref :209,:525)
    disp_consistency_px: float = 3.0   # disparity-error gate [px] (ref :280)
    near_z: float = 50.0               # "near" depth for drift splits [m] (ref :481)
    min_near_points: int = 20          # sub-cluster survival count (ref :495)
    max_ransac_rounds: int = 6         # bounded form of ref's while(true) (:238)


class DenseFrame(NamedTuple):
    """Per-frame device outputs."""
    disparity: jnp.ndarray      # (H, W)
    depth: jnp.ndarray          # (H, W)  fx*b/disp, 0 where invalid (ref :63-74)
    flow: jnp.ndarray           # (H, W, 2)
    edge_mask: jnp.ndarray      # (H, W) bool
    pts_uv: jnp.ndarray         # (P, 2) sampled pixel coords
    pts_xyz: jnp.ndarray        # (P, 3) camera-frame 3D points
    pts_valid: jnp.ndarray      # (P,) bool
    flow_p95: jnp.ndarray       # ()


def _label_propagate(adj: jnp.ndarray, lab0: jnp.ndarray,
                     P: int, n_iter: int = 16) -> jnp.ndarray:
    """Connected components by min-label propagation WITH pointer
    jumping: each sweep takes the neighborhood min, then follows the
    label-of-label (`lab[lab]`), so n_iter sweeps cover components of
    graph diameter ~2^n_iter instead of n_iter (r3 advisor: a
    full-width KITTI ground band on the stride-5 grid needs 60+
    one-hop sweeps and fragmented into several clusters under the old
    32-hop loop, each eating one of the 16 cluster slots). Padding /
    non-member labels are the sentinel P (out of range) and are left
    untouched."""
    def body(_, lab):
        neigh = jnp.where(adj, lab[None, :], P)
        lab = jnp.minimum(lab, jnp.min(neigh, axis=1))
        jump = lab[jnp.clip(lab, 0, P - 1)]
        return jnp.minimum(lab, jnp.where(lab < P, jump, P))

    return jax.lax.fori_loop(0, n_iter, body, lab0)


def _sample_grid(h: int, w: int, stride: int, max_points: int):
    ys = np.arange(stride // 2, h, stride)
    xs = np.arange(stride // 2, w, stride)
    uu, vv = np.meshgrid(xs, ys)
    pts = np.stack([uu.ravel(), vv.ravel()], axis=-1).astype(np.int32)
    if pts.shape[0] > max_points:
        raise ValueError(
            f"sample grid {len(ys)}x{len(xs)}={pts.shape[0]} exceeds "
            f"max_points={max_points}; raise max_points or the stride "
            "(label propagation needs the full grid resident)")
    pad = max_points - pts.shape[0]
    mask = np.ones(pts.shape[0], bool)
    if pad > 0:
        pts = np.pad(pts, ((0, pad), (0, 0)))
        mask = np.pad(mask, (0, pad))
    return pts, mask, (len(ys), len(xs))


def dense_frame(gray_l: jnp.ndarray, gray_r: jnp.ndarray,
                prev_gray: jnp.ndarray, cam: CameraConfig,
                cfg: DenseConfig) -> DenseFrame:
    """One jittable per-pair pass: edges, disparity, flow, samples."""
    h, w = gray_l.shape
    edge = stereo_bm.sobel_edge_mask(gray_l)
    disp = stereo_bm.disparity(gray_l, gray_r, cfg.num_disparities,
                               cfg.block_size)
    disp = jnp.where(edge, disp, 0.0)
    depth = jnp.where(disp > 0, cam.fx * cam.baseline
                      / jnp.maximum(disp, 1e-3), 0.0)
    flw = flow_mod.farneback_flow(prev_gray, gray_l,
                                  levels=cfg.flow_levels, win=cfg.flow_win)
    mag = jnp.linalg.norm(flw, axis=-1)
    p95 = jnp.percentile(mag.reshape(-1), 95.0)

    grid, gmask, _ = _sample_grid(h, w, cfg.sample_stride, cfg.max_points)
    grid_j = jnp.asarray(grid)
    d = disp[grid_j[:, 1], grid_j[:, 0]]
    ok = jnp.asarray(gmask) & (d > cfg.min_disparity) & \
        (d < cfg.max_disparity)
    z = cam.fx * cam.baseline / jnp.maximum(d, 1e-3)
    x = (grid_j[:, 0] - cam.cx) / cam.fx * z
    y = (grid_j[:, 1] - cam.cy) / cam.fy * z
    xyz = jnp.stack([x, y, z], axis=-1)
    return DenseFrame(disparity=disp, depth=depth, flow=flw, edge_mask=edge,
                      pts_uv=grid_j.astype(jnp.float32),
                      pts_xyz=jnp.where(ok[:, None], xyz, 0.0),
                      pts_valid=ok, flow_p95=p95)


class TrackOut(NamedTuple):
    labels: jnp.ndarray        # (P,) int32, -1 untracked
    cluster_T: jnp.ndarray     # (C, 4, 4) accepted rigid motions
    cluster_ok: jnp.ndarray    # (C,) bool PnP accepted
    cluster_inl: jnp.ndarray   # (C,) int32 inlier counts
    cand_counts: jnp.ndarray   # (C,) int32 propagated-candidate counts


def _grid_cell_index(uv: jnp.ndarray, stride: int, ny: int, nx: int):
    """Pixel coords -> nearest sample-grid point index (the implicit
    label mask of ref MakeMask :394-409: each grid point owns its
    stride-sized cell). Returns (idx (P,), in_grid (P,))."""
    ix = jnp.round((uv[:, 0] - stride // 2) / stride).astype(jnp.int32)
    iy = jnp.round((uv[:, 1] - stride // 2) / stride).astype(jnp.int32)
    ok = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    idx = jnp.clip(iy, 0, ny - 1) * nx + jnp.clip(ix, 0, nx - 1)
    return idx, ok


def track_clusters(f: DenseFrame, prev_labels: jnp.ndarray,
                   prev_depth: jnp.ndarray, is_ground: jnp.ndarray,
                   alive: jnp.ndarray, key: jnp.ndarray,
                   cam: CameraConfig, cfg: DenseConfig,
                   grid_shape) -> TrackOut:
    """TrackCluster (ref tracker.cpp:518-693), one jittable pass.

    All C cluster slots run PnP-RANSAC in ONE vmapped dispatch; the
    per-step absorption and the EuclideanFilter drift split are dense
    masked reductions.
    """
    P = f.pts_uv.shape[0]
    C = cfg.max_clusters
    ny, nx = grid_shape
    h, w = f.depth.shape
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy

    # -- step 1 (ref :529-544): flow-propagated candidate labels -------
    iy = jnp.clip(f.pts_uv[:, 1].astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(f.pts_uv[:, 0].astype(jnp.int32), 0, w - 1)
    img0 = f.pts_uv - f.flow[iy, ix]                      # prev-frame px
    in_img = ((img0[:, 0] >= 0) & (img0[:, 0] < w)
              & (img0[:, 1] >= 0) & (img0[:, 1] < h))
    cell, cell_ok = _grid_cell_index(img0, cfg.sample_stride, ny, nx)
    cand = jnp.where(f.pts_valid & in_img & cell_ok,
                     prev_labels[cell], -1)               # (P,)

    img0_norm = jnp.stack([(img0[:, 0] - cx) / fx,
                           (img0[:, 1] - cy) / fy], axis=-1)

    member = (cand[None, :] == jnp.arange(C)[:, None]) & alive[:, None]
    counts = member.sum(axis=1)                           # (C,)
    active = alive & (counts >= cfg.min_track_points)     # ref :554

    # -- step 2 (ref :567-592): per-cluster PnP-RANSAC, one dispatch ---
    M = min(cfg.track_capacity, P)
    order = jnp.argsort(~member, axis=1)[:, :M]           # members first
    memb_ok = jnp.take_along_axis(member, order, axis=1)  # (C, M)
    memb_xyz = f.pts_xyz[order]                           # (C, M, 3)
    memb_uv0 = img0_norm[order]                           # (C, M, 2)
    keys = jax.random.split(key, C)
    inlier_norm = cfg.max_rprj_px / fx

    res = jax.vmap(
        lambda X, z, m, k: ransac_mod.pnp_ransac(
            X, z, m, k, n_hypotheses=64,
            inlier_norm=inlier_norm,
            min_inliers=cfg.min_track_inliers)
    )(memb_xyz, memb_uv0, memb_ok, keys)
    cluster_ok = active & res.ok                          # (C,)

    # scatter accepted inliers back to point labels (members are
    # disjoint across clusters, so a plain max-combine is exact)
    inl_gathered = res.inliers & memb_ok & cluster_ok[:, None]  # (C, M)
    point_label = jnp.full((P,), -1, jnp.int32)
    lab_rows = jnp.where(inl_gathered, jnp.arange(C)[:, None], -1)
    point_label = point_label.at[order.reshape(-1)].max(
        lab_rows.reshape(-1).astype(jnp.int32))
    tracked = point_label >= 0

    # -- step 3 (ref :595-625): reprojection re-absorption under
    # GROUND cluster motion (anti-oversegmentation for the ground plane)
    Xc = jnp.einsum('cij,pj->cpi', res.T_cw[:, :3, :3], f.pts_xyz) \
        + res.T_cw[:, None, :3, 3]                        # (C, P, 3)
    zc = jnp.where(Xc[..., 2] > 1e-3, Xc[..., 2], 1.0)
    pred = Xc[..., :2] / zc[..., None]
    rprj_px = jnp.linalg.norm(
        (pred - img0_norm[None]) * jnp.asarray([fx, fy]), axis=-1)
    absorb = (cluster_ok & is_ground)[:, None] & (Xc[..., 2] > 1e-3) \
        & (rprj_px < cfg.max_rprj_px) \
        & (~tracked)[None, :] & f.pts_valid[None, :] & in_img[None, :]
    ground_lab = jnp.max(
        jnp.where(absorb, jnp.arange(C)[:, None], -1), axis=0)
    point_label = jnp.where((point_label < 0) & (ground_lab >= 0),
                            ground_lab, point_label)
    tracked = point_label >= 0

    # -- steps 4-5 (ref :627-662): 3D nearest-neighbor absorption ------
    d2 = jnp.sum((f.pts_xyz[:, None, :] - f.pts_xyz[None, :, :]) ** 2,
                 axis=-1)                                 # (P, P)
    d2_to_tracked = jnp.where(tracked[None, :] & f.pts_valid[None, :],
                              d2, jnp.inf)
    nn = jnp.argmin(d2_to_tracked, axis=1)
    nn_d2 = jnp.min(d2_to_tracked, axis=1)
    r2 = cfg.cluster_radius_3d ** 2
    adopt = (~tracked) & f.pts_valid & (nn_d2 <= r2)
    point_label = jnp.where(adopt, point_label[nn], point_label)
    tracked = point_label >= 0

    # -- step 6 (ref :411-516): EuclideanFilter drift split ------------
    # connected components per NON-ground cluster (adjacency requires
    # same label), keep only sub-components with >= min_near_points
    # near (<near_z) members; everything else drops to -1.
    lab_ground = jnp.where(point_label >= 0, is_ground[
        jnp.clip(point_label, 0, C - 1)], False)
    filt = tracked & ~lab_ground & f.pts_valid
    adj = (d2 <= r2) & filt[:, None] & filt[None, :] \
        & (point_label[:, None] == point_label[None, :])
    comp0 = jnp.where(filt, jnp.arange(P, dtype=jnp.int32), P)

    comp = _label_propagate(adj, comp0, P)
    near = filt & (f.pts_xyz[:, 2] < cfg.near_z)
    near_count = jnp.zeros((P + 1,), jnp.int32).at[comp].add(
        near.astype(jnp.int32))[comp]
    keep = ~filt | (near_count >= cfg.min_near_points)
    point_label = jnp.where(keep, point_label, -1)

    return TrackOut(labels=point_label, cluster_T=res.T_cw,
                    cluster_ok=cluster_ok,
                    cluster_inl=res.n_inliers.astype(jnp.int32),
                    cand_counts=counts.astype(jnp.int32))


class RansacRoundOut(NamedTuple):
    comp: jnp.ndarray          # (P,) int32 component root per inlier, -1 else
    comp_size: jnp.ndarray     # (P,) int32 component size at each point
    n_step1: jnp.ndarray       # () inliers surviving both gates
    T_cw: jnp.ndarray          # (4, 4)


def ransac_round(f: DenseFrame, residual: jnp.ndarray,
                 prev_depth: jnp.ndarray, is_ground_round: jnp.ndarray,
                 key: jnp.ndarray, cam: CameraConfig,
                 cfg: DenseConfig) -> RansacRoundOut:
    """One RansacCluster iteration (ref tracker.cpp:238-389), jittable.

    Rigid RANSAC over the residual pool, the disparity-consistency gate
    (ref :274-282), then Euclidean clustering of the surviving inliers
    with the ground-2D(px)/object-3D(m) coordinate choice (ref
    :315-323). Component-id assignment happens on the host.
    """
    P = f.pts_uv.shape[0]
    h, w = f.depth.shape
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy

    iy = jnp.clip(f.pts_uv[:, 1].astype(jnp.int32), 0, h - 1)
    ix = jnp.clip(f.pts_uv[:, 0].astype(jnp.int32), 0, w - 1)
    img0 = f.pts_uv - f.flow[iy, ix]
    in_img = ((img0[:, 0] >= 0) & (img0[:, 0] < w)
              & (img0[:, 1] >= 0) & (img0[:, 1] < h))
    img0_norm = jnp.stack([(img0[:, 0] - cx) / fx,
                           (img0[:, 1] - cy) / fy], axis=-1)

    pool = residual & f.pts_valid & in_img
    res = ransac_mod.pnp_ransac(
        f.pts_xyz, img0_norm, pool, key, n_hypotheses=100,
        inlier_norm=cfg.max_rprj_px / fx, min_inliers=cfg.min_cluster_size)

    # disparity-consistency gate (ref :274-282): predicted inverse depth
    # in the PREVIOUS camera vs the previous frame's measured depth at
    # the warped pixel, scaled to disparity pixels.
    i0y = jnp.clip(jnp.round(img0[:, 1]).astype(jnp.int32), 0, h - 1)
    i0x = jnp.clip(jnp.round(img0[:, 0]).astype(jnp.int32), 0, w - 1)
    d0 = prev_depth[i0y, i0x]
    Xc = jnp.einsum('ij,pj->pi', res.T_cw[:3, :3], f.pts_xyz) \
        + res.T_cw[:3, 3]
    zc = jnp.maximum(Xc[:, 2], 1e-3)
    disp_err = fx * cam.baseline * jnp.abs(
        1.0 / jnp.maximum(d0, 1e-3) - 1.0 / zc)
    gate = (d0 <= 0.0) | (disp_err <= cfg.disp_consistency_px)
    step1 = res.inliers & pool & gate
    n_step1 = jnp.sum(step1)

    # Euclidean clustering of step-1 inliers: ground rounds use 2D
    # pixel coords r=20 px, object rounds 3D coords r=0.5 m (ref :315-323)
    coords = jnp.where(is_ground_round,
                       jnp.concatenate([f.pts_uv,
                                        jnp.zeros((P, 1))], axis=-1),
                       f.pts_xyz)
    radius = jnp.where(is_ground_round, cfg.ground_radius_px,
                       cfg.cluster_radius_3d)
    d2 = jnp.sum((coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
    adj = (d2 <= radius * radius) & step1[:, None] & step1[None, :]
    comp0 = jnp.where(step1, jnp.arange(P, dtype=jnp.int32), P)

    comp = _label_propagate(adj, comp0, P)
    size = jnp.zeros((P + 1,), jnp.int32).at[comp].add(
        step1.astype(jnp.int32))[comp]
    comp = jnp.where(step1, comp, -1)
    size = jnp.where(step1, size, 0)
    return RansacRoundOut(comp=comp, comp_size=size, n_step1=n_step1,
                          T_cw=res.T_cw)


class DenseTracker:
    """Host driver holding previous-frame state and cluster labels.

    Inter-frame state mirrors the reference's members: `labels` is the
    sample-grid form of mask0_ (ref tracker.cpp:747), `is_ground`/`alive`
    the cluster_ground_/clusters_ maps, `prev_depth` depth0_ (:750), and
    `prev_gray` gray0_ (:751). Cluster-id slots are bounded at
    cfg.max_clusters and dead ids are recycled (deviation from the
    reference's unbounded n_cluster_ counter — required for fixed
    shapes; ids stay stable while a cluster remains tracked).
    """

    def __init__(self, cam: CameraConfig, cfg: Optional[DenseConfig] = None):
        self.cam = cam
        self.cfg = cfg or DenseConfig()
        self.prev_gray: Optional[jnp.ndarray] = None
        self.prev_frame: Optional[DenseFrame] = None
        self.prev_depth: Optional[jnp.ndarray] = None
        self.frame_idx = 0
        cfg_ = self.cfg
        cam_ = cam
        self.labels: Optional[np.ndarray] = None          # (P,) int32
        self.is_ground = np.zeros(cfg_.max_clusters, bool)
        self.alive = np.zeros(cfg_.max_clusters, bool)
        self.ever_created = False
        self._grid_shape = None

        @jax.jit
        def _frame(gl, gr, pg):
            return dense_frame(gl, gr, pg, cam_, cfg_)

        def _track(f, prev_labels, prev_depth, is_ground, alive, key,
                   grid_shape):
            return track_clusters(f, prev_labels, prev_depth, is_ground,
                                  alive, key, cam_, cfg_, grid_shape)

        @jax.jit
        def _round(f, residual, prev_depth, is_ground_round, key):
            return ransac_round(f, residual, prev_depth, is_ground_round,
                                key, cam_, cfg_)

        self._frame = _frame
        self._track = jax.jit(_track, static_argnames=("grid_shape",))
        self._round = _round

    def _alloc_cluster(self, ground: bool) -> int:
        """Allocate a cluster id slot; -1 when capacity is exhausted."""
        free = np.flatnonzero(~self.alive)
        if free.size == 0:
            return -1
        cid = int(free[0])
        self.alive[cid] = True
        self.is_ground[cid] = ground
        return cid

    def track(self, gray_l: np.ndarray, gray_r: np.ndarray) -> dict:
        """Process one stereo pair; returns cluster summary (host dict).

        Mirrors DenseTracker::Track (ref tracker.cpp:695-784): first
        frame only seeds depth/gray; low-motion frames are skipped
        WITHOUT advancing the reference frame (ref returns before the
        gray0_/depth0_ update at :750-752, so motion accumulates until
        the p95 gate passes).
        """
        cfg = self.cfg
        gl = jnp.asarray(gray_l, jnp.float32)
        gr = jnp.asarray(gray_r, jnp.float32)
        self.frame_idx += 1
        if self._grid_shape is None:
            _, _, self._grid_shape = _sample_grid(
                gl.shape[0], gl.shape[1], cfg.sample_stride, cfg.max_points)
        if self.prev_gray is None:
            # seed: depth only (ref :710-714)
            f0 = self._frame(gl, gr, gl)
            self.prev_gray = gl
            self.prev_depth = f0.depth
            return {"skipped": True, "reason": "first frame"}

        f = self._frame(gl, gr, self.prev_gray)
        if float(f.flow_p95) < cfg.min_flow_p95:
            return {"skipped": True, "reason": "low motion",
                    "flow_p95": float(f.flow_p95)}

        key = jax.random.PRNGKey(self.frame_idx)
        P = int(f.pts_uv.shape[0])
        clusters = []

        # ---- 1) TrackCluster: propagate previous labels (ref :740-741)
        if self.labels is not None and self.alive.any():
            out = self._track(f, jnp.asarray(self.labels),
                              self.prev_depth, jnp.asarray(self.is_ground),
                              jnp.asarray(self.alive), key,
                              self._grid_shape)
            labels = np.array(out.labels)        # copy: host loop mutates
            ok = np.asarray(out.cluster_ok)
            inl = np.asarray(out.cluster_inl)
            Ts = np.asarray(out.cluster_T)
            for cid in np.flatnonzero(ok):
                clusters.append({
                    "id": int(cid), "tracked": True,
                    "is_ground": bool(self.is_ground[cid]),
                    "size": int((labels == cid).sum()),
                    "rigid_inliers": int(inl[cid]), "ok": True,
                    "T": Ts[cid],
                })
        else:
            labels = np.full(P, -1, np.int32)

        # ---- 2) RansacCluster on the residual pool (ref :743-744) ----
        residual = labels < 0
        n_new = 0
        for rnd in range(cfg.max_ransac_rounds):
            if int(residual.sum()) < 10:                  # ref :239
                break
            ground_round = not self.ever_created          # ref :315
            rout = self._round(f, jnp.asarray(residual), self.prev_depth,
                               jnp.asarray(ground_round),
                               jax.random.fold_in(key, 100 + rnd))
            comp = np.asarray(rout.comp)
            size = np.asarray(rout.comp_size)
            if int(rout.n_step1) < cfg.min_cluster_size:  # ref :297
                break
            big_roots = np.unique(comp[(comp >= 0)
                                       & (size >= cfg.min_cluster_size)])
            assigned = 0
            T_round = np.asarray(rout.T_cw)
            for root in big_roots:
                cid = self._alloc_cluster(ground_round)
                if cid < 0:
                    break                                 # capacity full
                members = comp == root
                labels[members] = cid
                residual[members] = False
                assigned += int(members.sum())
                n_new += 1
                clusters.append({
                    "id": cid, "tracked": False,
                    "is_ground": bool(self.is_ground[cid]),
                    "size": int(members.sum()),
                    "rigid_inliers": int(members.sum()), "ok": True,
                    "T": T_round,
                })
                self.ever_created = True
            if assigned < cfg.min_cluster_size:           # ref :381-383
                break

        # ---- 3) persist state: the label grid is the new mask0_ ------
        self.alive = np.isin(np.arange(cfg.max_clusters), labels)
        self.labels = labels
        self.prev_gray = gl
        self.prev_depth = f.depth
        self.prev_frame = f

        return {"skipped": False, "flow_p95": float(f.flow_p95),
                "n_points": int(f.pts_valid.sum()),
                "n_tracked": int((labels >= 0).sum()),
                "n_new_clusters": n_new,
                "labels": labels,
                "pts_uv": np.asarray(f.pts_uv),
                "clusters": clusters}
