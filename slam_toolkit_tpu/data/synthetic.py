"""Synthetic stereo world: raycast textured-corridor renderer + GT poses.

The reference's only integration oracle is KITTI with GT poses
(SURVEY.md §4); since test environments may lack the dataset, this module
renders a fully 3D-consistent scene: two textured walls and a ground
plane raycast per pixel, so left/right and consecutive frames are exact
projections of one static world. Corner-rich block textures give ORB
plenty of distinctive features; trajectory error on this data isolates
engine bugs from sensor noise.

Host-side numpy (L7 dataset layer, not device compute).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np

from slam_toolkit_tpu.config import SlamConfig


class PlaneWorld(NamedTuple):
    cfg: SlamConfig
    plane_mips: tuple        # one mip pyramid PER plane (avoids perceptual
    #                          aliasing: identical textures on different
    #                          walls create false loop closures by design)
    texels_per_m: float
    half_width: float        # walls at x = +/- half_width
    ground_y: float          # ground plane at y = ground_y (y points down)
    half_length: float = 0.0  # if > 0, also walls at z = +/- half_length (box room)
    # optional fine-detail octave (separate small tileable texture added
    # on top of the base sample, with its own density): real surfaces
    # carry structure at ALL scales, while the base texture alone leaves
    # the NEAR field as featureless magnified blobs (at 12 texels/m one
    # texel spans ~8.5 px at z=7 m on KITTI intrinsics) whose matches
    # are inherently ambiguous — measured as the near-starved map and
    # the far-field-valley loop-edge bias of the r5 seam dissection.
    # The detail layer tiles at a short period (~5 m); the base layer
    # (period tex_size/texels_per_m, chosen > scene diameter)
    # disambiguates any detail-period alias.
    detail_mips: tuple = ()       # one pyramid per plane ((), = off)
    detail_texels_per_m: float = 0.0
    # lens PSF sigma in pixels, applied to the final rendered image.
    # The mip sampler integrates an ideal box footprint per pixel, so
    # adjacent pixels see INDEPENDENT patch means of sub-pixel texture —
    # "shimmer" at exactly Nyquist that decorrelates descriptors frame
    # to frame (measured: the detail octave alone quadrupled open-loop
    # drift). A real lens bandlimits before sampling; 0.7 px Gaussian
    # approximates that.
    psf_sigma: float = 0.0


def _smooth_noise(size: int, cells: int, amp: float, rng) -> np.ndarray:
    """Bilinearly upsampled coarse noise: smooth large-scale gradients."""
    g = rng.uniform(-amp, amp, (cells + 1, cells + 1)).astype(np.float32)
    idx = np.linspace(0, cells - 1e-6, size)
    i0 = idx.astype(np.int64)
    f = (idx - i0).astype(np.float32)
    rows = g[i0, :] * (1 - f)[:, None] + g[i0 + 1, :] * f[:, None]
    return rows[:, i0] * (1 - f)[None, :] + rows[:, i0 + 1] * f[None, :]


def _block_texture(size: int, cell: int, seed: int) -> np.ndarray:
    """Blocky value-noise + smooth gradients: abundant FAST corners and
    tie-free BRIEF comparisons (flat equal-value regions make descriptor
    bits coin-flips between views)."""
    rng = np.random.default_rng(seed)
    coarse = rng.uniform(30.0, 220.0, (size // cell, size // cell))
    tex = np.kron(coarse, np.ones((cell, cell))).astype(np.float32)
    # second octave for texture variety inside blocks
    fine = rng.uniform(-20.0, 20.0, (size // 2, size // 2))
    tex += np.kron(fine, np.ones((2, 2))).astype(np.float32)[:size, :size]
    tex += _smooth_noise(size, 16, 35.0, rng)
    return np.clip(tex, 0.0, 255.0)


def _mip_pyramid(tex: np.ndarray, levels: int = 8) -> tuple:
    mips = [tex]
    t = tex
    for _ in range(levels - 1):
        if t.shape[0] < 2:
            break
        t = 0.25 * (t[0::2, 0::2] + t[1::2, 0::2] + t[0::2, 1::2]
                    + t[1::2, 1::2])
        mips.append(t.astype(np.float32))
    return tuple(mips)


def make_world(cfg: SlamConfig, seed: int = 0, half_width: float = 6.0,
               ground_y: float = 1.6, tex_size: int = 512,
               texels_per_m: float = 24.0, half_length: float = 0.0,
               detail_texels_per_m: float = 0.0, detail_amp: float = 25.0,
               detail_tex_size: int = 512,
               **_compat) -> PlaneWorld:
    """half_length > 0 closes the corridor into a box room (loop tests).

    detail_texels_per_m > 0 adds the fine-detail octave (see PlaneWorld)
    — used by the KITTI-scale loop bench world so the near field has
    matchable structure like real imagery."""
    mips = tuple(_mip_pyramid(_block_texture(tex_size, 8, seed * 31 + i))
                 for i in range(5))
    detail = ()
    if detail_texels_per_m > 0.0:
        rngs = [np.random.default_rng(seed * 131 + 7 * i + 3)
                for i in range(5)]
        detail = tuple(
            _mip_pyramid(np.clip(
                r.uniform(-detail_amp, detail_amp,
                          (detail_tex_size, detail_tex_size)) +
                _smooth_noise(detail_tex_size, detail_tex_size // 4,
                              detail_amp, r),
                -2.0 * detail_amp, 2.0 * detail_amp).astype(np.float32))
            for r in rngs)
    return PlaneWorld(cfg=cfg,
                      plane_mips=mips,
                      texels_per_m=texels_per_m,
                      half_width=half_width,
                      ground_y=ground_y,
                      half_length=half_length,
                      detail_mips=detail,
                      detail_texels_per_m=detail_texels_per_m,
                      psf_sigma=0.7 if detail_texels_per_m > 0.0 else 0.0)


def _sample_bilinear(tex: np.ndarray, u: np.ndarray,
                     v: np.ndarray) -> np.ndarray:
    """Bilinear texture lookup with wraparound."""
    t = tex.shape[0]
    u = np.mod(u, t)
    v = np.mod(v, t)
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    fu = (u - u0).astype(np.float32)
    fv = (v - v0).astype(np.float32)
    u1 = (u0 + 1) % t
    v1 = (v0 + 1) % t
    return ((tex[v0, u0] * (1 - fu) + tex[v0, u1] * fu) * (1 - fv) +
            (tex[v1, u0] * (1 - fu) + tex[v1, u1] * fu) * fv)


def _sample_tex(mips: tuple, u: np.ndarray, v: np.ndarray,
                footprint: np.ndarray) -> np.ndarray:
    """Trilinear mipmapped lookup.

    footprint = texels of the base texture covered by one screen pixel;
    without it, distant texture aliases and the left/right images differ
    by sampling noise instead of true appearance.
    """
    lod = np.clip(np.log2(np.maximum(footprint, 1e-6)), 0.0,
                  len(mips) - 1.001)
    l0 = np.floor(lod).astype(np.int64)
    fl = (lod - l0).astype(np.float32)
    out = np.empty(u.shape, np.float32)
    for lev in range(len(mips) - 1):
        sel = l0 == lev
        if not sel.any():
            continue
        scale = 0.5 ** lev
        a = _sample_bilinear(mips[lev], u[sel] * scale, v[sel] * scale)
        b = _sample_bilinear(mips[lev + 1], u[sel] * scale * 0.5,
                             v[sel] * scale * 0.5)
        out[sel] = a * (1 - fl[sel]) + b * fl[sel]
    return out


def render_view(world: PlaneWorld, T_cw: np.ndarray,
                return_depth: bool = False):
    """Raycast one camera with pose T_cw (world->cam)."""
    cam = world.cfg.camera
    h, w = cam.height, cam.width
    R = T_cw[:3, :3].astype(np.float64)
    t = T_cw[:3, 3].astype(np.float64)
    origin = -R.T @ t                                     # camera center
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    d_cam = np.stack([(uu - cam.cx) / cam.fx,
                      (vv - cam.cy) / cam.fy,
                      np.ones_like(uu, np.float64)], axis=-1)
    d_w = d_cam @ R                                       # R^T d per pixel

    tpm = world.texels_per_m
    best_t = np.full((h, w), np.inf)
    img = np.full((h, w), 30.0, np.float32)               # sky intensity

    # plane list: (axis, offset, tex-u axis, tex-v axis)
    planes = [
        (0, -world.half_width, 2, 1),   # left wall:  x = -hw, tex from (z, y)
        (0, world.half_width, 2, 1),    # right wall: x = +hw
        (1, world.ground_y, 2, 0),      # ground:     y = gy, tex from (z, x)
    ]
    if world.half_length > 0.0:
        planes += [
            (2, -world.half_length, 0, 1),  # back wall:  z = -hl
            (2, world.half_length, 0, 1),   # front wall: z = +hl
        ]
    d_norm = np.linalg.norm(d_w, axis=-1)
    for plane_idx, (axis, off, ua, va) in enumerate(planes):
        dn = d_w[..., axis]
        with np.errstate(divide='ignore', invalid='ignore'):
            ti = (off - origin[axis]) / dn
            hit = (ti > 0.1) & np.isfinite(ti) & (ti < best_t)
            if not hit.any():
                continue
            pt = origin[None, None, :] + np.where(
                np.isfinite(ti), ti, 0.0)[..., None] * d_w
        tex_u = pt[..., ua][hit] * tpm
        tex_v = pt[..., va][hit] * tpm
        # texel footprint of one pixel: range * angular size / obliquity
        cosi = np.abs(dn[hit]) / d_norm[hit]
        rng = ti[hit] * d_norm[hit]
        footprint = tpm * rng / (cam.fx * np.maximum(cosi, 0.05))
        val = _sample_tex(world.plane_mips[plane_idx], tex_u, tex_v,
                          footprint)
        if world.detail_mips:
            # fine-detail octave: same hit points, its own density; the
            # mip chain melts it away at range, so only the near field
            # (where the base texture is magnified featureless blobs)
            # gains structure
            dtpm = world.detail_texels_per_m
            val = val + _sample_tex(
                world.detail_mips[plane_idx],
                pt[..., ua][hit] * dtpm, pt[..., va][hit] * dtpm,
                dtpm * rng / (cam.fx * np.maximum(cosi, 0.05)))
        img[hit] = np.clip(val, 0.0, 255.0)
        best_t[hit] = ti[hit]

    if world.psf_sigma > 0.0:
        img = _psf_blur(img, world.psf_sigma)
    if return_depth:
        # ray param t is the z-depth: p_cam = t * d_cam and d_cam_z = 1
        depth = np.where(np.isfinite(best_t), best_t, 0.0).astype(np.float32)
        return img, depth
    return img


def _psf_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable 5-tap Gaussian lens PSF (see PlaneWorld.psf_sigma)."""
    r = np.arange(-2, 3, dtype=np.float32)
    k = np.exp(-0.5 * (r / sigma) ** 2)
    k /= k.sum()
    p = np.pad(img, ((2, 2), (2, 2)), mode='edge')
    p = sum(k[i] * p[:, i:i + img.shape[1]] for i in range(5))
    return sum(k[i] * p[i:i + img.shape[0], :] for i in range(5))


def right_pose(T_cw: np.ndarray, baseline: float) -> np.ndarray:
    """Pose of the right camera: Xr = Xl - (b, 0, 0)."""
    T = T_cw.copy()
    T[0, 3] -= baseline
    return T


def render_stereo(world: PlaneWorld, T_cw: np.ndarray,
                  noise: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    left = render_view(world, T_cw)
    right = render_view(world, right_pose(T_cw, world.cfg.camera.baseline))
    if noise > 0.0:
        rng = np.random.default_rng(int.from_bytes(
            T_cw.tobytes()[:8], 'little') & 0x7FFFFFFF)
        left = left + rng.normal(0, noise, left.shape).astype(np.float32)
        right = right + rng.normal(0, noise, right.shape).astype(np.float32)
    return left, right


def forward_trajectory(n_frames: int, step: float = 0.4,
                       yaw_rate: float = 0.0) -> List[np.ndarray]:
    """T_cw per frame for a camera moving along +z, optionally turning."""
    from slam_toolkit_tpu.geometry import se3
    import jax.numpy as jnp
    poses = []
    T_wc = np.eye(4, dtype=np.float32)
    for _ in range(n_frames):
        poses.append(np.linalg.inv(T_wc).astype(np.float32))
        dT = np.asarray(se3.exp(jnp.asarray(
            [0.0, 0.0, step, 0.0, yaw_rate, 0.0], dtype=np.float32)))
        T_wc = T_wc @ dT
    return poses


def make_sequence(cfg: SlamConfig, n_frames: int = 30, seed: int = 0,
                  step: float = 0.4, yaw_rate: float = 0.0, noise: float = 0.0):
    """(world, gt T_cw list, [(left, right)] frames)."""
    world = make_world(cfg, seed=seed)
    poses = forward_trajectory(n_frames, step, yaw_rate)
    frames = [render_stereo(world, T, noise) for T in poses]
    return world, poses, frames


def fig8_track(n_lobe: int, step: float = 0.8, ramp: int = 8,
               revisit: int = 0) -> List[np.ndarray]:
    """Figure-eight: lobe 1 turns a full +yaw revolution, lobe 2 a full
    -yaw revolution; both close exactly at the origin, so the track
    produces TWO distinct loop seams (end of lobe 1 against the start,
    end of lobe 2 against the same junction) plus, with `revisit` > 0,
    a third pass over lobe 1's first poses AFTER both corrections —
    the multi-closure scenario the reference's closed-loop replay ring
    exists for (ref src/loopcloser.cpp:160-191). Yaw rate ramps over
    `ramp` frames at each lobe start/end and at the sign flip (a step
    change in curvature is untrackable at high focal lengths — same
    rationale as loop_track)."""
    import jax.numpy as jnp

    from slam_toolkit_tpu.geometry import se3

    def lobe_rates(sgn):
        prof = np.ones(n_lobe)
        r = min(ramp, n_lobe // 4)
        prof[:r] = np.linspace(0.0, 1.0, r, endpoint=False)
        prof[-r:] = np.linspace(1.0, 0.0, r)
        prof = prof * (2.0 * np.pi / prof.sum())
        return sgn * prof

    rates = np.concatenate([lobe_rates(+1.0), lobe_rates(-1.0)])
    out = []
    T_wc = np.eye(4, dtype=np.float32)
    for dyaw in rates:
        out.append(np.linalg.inv(T_wc).astype(np.float32))
        dT = np.asarray(se3.exp(jnp.asarray(
            [0.0, 0.0, step, 0.0, float(dyaw), 0.0], jnp.float32)))
        T_wc = (T_wc @ dT).astype(np.float32)
    # exact closure of each lobe: spread the tiny numerical closure
    # error of the composed increments across the whole track
    T_N = np.linalg.inv(T_wc).astype(np.float32)
    xi = np.asarray(se3.log(jnp.asarray(T_N)))
    n = len(out)
    fixed = []
    for t, T in enumerate(out):
        W = np.asarray(se3.exp(jnp.asarray(-xi * (t / n), jnp.float32)))
        fixed.append(np.asarray(se3.normalize(
            jnp.asarray(T @ W))).astype(np.float32))
    return fixed + fixed[:revisit]


def loop_track(n_track: int, step: float = 0.8,
               ramp: int = 12) -> List[np.ndarray]:
    """Closed KITTI-like test track: 4 corners with clothoid (linearly
    ramped yaw-rate) entry/exit, straights between, exact closure.

    A constant-curvature circle is untrackable from a standing start:
    the very first frame jumps to the full steady-state yaw rate, which
    at KITTI focal lengths shifts EVERY feature by tens of pixels
    before the constant-velocity model has seen any motion. Real roads
    insert clothoid transitions for exactly this reason (lateral jerk
    limits); with ramped corners the prediction error per frame stays
    at the ramp increment (~2 px) and tracking survives bootstrap.

    The integrated track does not close exactly (ramp quantization), so
    the SE3 closure error is distributed along the whole path pose-graph
    style: T'_t = T_t . exp(-(t/N) log(T_N)), making frame N land
    exactly on frame 0 — revisit frames can then replay gt[:k] without a
    teleport. Returns T_cw per frame.
    """
    from slam_toolkit_tpu.geometry import se3
    import jax.numpy as jnp

    # corner profile: ramp up (ramp frames), hold, ramp down; 4 corners
    # of pi/2 each, separated by straights. Choose hold/straight split
    # from what n_track allows.
    per_corner = n_track // 4
    hold = max(per_corner - 2 * ramp - 8, 4)
    straight = per_corner - 2 * ramp - hold
    prof = ([0.0] * straight + list(np.linspace(0, 1, ramp, endpoint=False))
            + [1.0] * hold + list(np.linspace(1, 0, ramp, endpoint=False)))
    dyaw = np.array((prof * 4)[:n_track], np.float64)
    dyaw = dyaw * (2.0 * np.pi / dyaw.sum())          # total yaw = 2 pi

    T_wc = np.eye(4, dtype=np.float32)
    raw = []
    for t in range(n_track):
        raw.append(np.linalg.inv(T_wc).astype(np.float32))
        dT = np.asarray(se3.exp(jnp.asarray(
            [0.0, 0.0, step, 0.0, float(dyaw[t]), 0.0], jnp.float32)))
        T_wc = (T_wc @ dT).astype(np.float32)
    T_N = np.linalg.inv(T_wc).astype(np.float32)      # closure error
    xi = np.asarray(se3.log(jnp.asarray(T_N)))
    out = []
    for t, T in enumerate(raw):
        W = np.asarray(se3.exp(jnp.asarray(-xi * (t / n_track),
                                           jnp.float32)))
        out.append(np.asarray(se3.normalize(
            jnp.asarray(T @ W))).astype(np.float32))
    # center the track's bounding box on the world origin (the flat
    # world of make_world is a box around 0; an uncentered track hugs
    # one wall)
    c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in out])
    mid = (c.min(axis=0) + c.max(axis=0)) / 2.0
    mid[1] = 0.0
    shift = np.eye(4, dtype=np.float32)
    shift[:3, 3] = mid
    return [(T @ shift).astype(np.float32) for T in out]


class ClusterScene(NamedTuple):
    """KITTI-scale synthetic stereo motion scene for the dense-clustering
    workload (ref examples/epip_cluster/src/tracker.cpp): a depth-banded
    background consistent with ONE rigid camera translation, plus
    independently moving textured boxes (the clusters to find). Frames
    are pulled from one wide texture by per-band integer shifts, so
    rendering is memcpy-cheap and the motion field is exactly rigid up
    to the 0.5 px rounding (inside the tracker's 2 px RANSAC gate)."""
    frames: list                 # [(left, right)] float32 (H, W)
    mover_boxes: list            # per frame: [(x, y, size, disp)]
    cam: "CameraConfig"
    # analytic ground truth (r5: BENCH_CLUSTER quality gates; None for
    # scenes built before these fields existed)
    band_rows: int = 0           # rows per disparity band
    band_disps: list = None      # per-band disparity [px]
    band_shift: list = None      # per frame: per-band texture shift [px]


def cluster_scene_gt(scene: ClusterScene, t: int):
    """Exact (disparity (H, W), flow_from_prev (H, W, 2), valid (H, W))
    for frame t of a make_cluster_scene scene. Disparity: band value
    with mover boxes overriding. Flow t-1 -> t: background moves
    -(shift_t - shift_{t-1}) px in x per band; mover pixels move
    (0, y_t - y_{t-1}). `valid` excludes a margin around band and box
    boundaries (mixed-content pixels where block matching/flow windows
    straddle two motions)."""
    H, W = scene.frames[0][0].shape
    # band margin: the 19-px stereo block / 13-px flow window half-width
    # (windows straddling a boundary mix two motions); box margin is
    # wider because the boxes also occlude background during motion
    margin, bmargin = 12, 10
    disp = np.zeros((H, W), np.float32)
    flow = np.zeros((H, W, 2), np.float32)
    valid = np.ones((H, W), bool)
    br = scene.band_rows
    n_bands = len(scene.band_disps)
    for b in range(n_bands):
        r0, r1 = b * br, min((b + 1) * br, H)
        disp[r0:r1] = scene.band_disps[b]
        flow[r0:r1, :, 0] = -(scene.band_shift[t][b]
                              - scene.band_shift[t - 1][b])
        # band boundaries mix two disparities/motions in any window
        valid[max(r0 - bmargin, 0):min(r0 + bmargin, H)] = False
    for (x, y, s, d), (xp, yp, _, _) in zip(scene.mover_boxes[t],
                                            scene.mover_boxes[t - 1]):
        disp[y:y + s, x:x + s] = d
        flow[y:y + s, x:x + s, 0] = 0.0
        flow[y:y + s, x:x + s, 1] = y - yp
        valid[max(y - margin, 0):y + s + margin,
              max(x - margin, 0):x + s + margin] = False
        valid[y + margin:y + s - margin,
              x + margin:x + s - margin] = True
    valid[:margin] = valid[-margin:] = False
    valid[:, :margin] = valid[:, -margin:] = False
    # flow-aware edge exclusion: a pixel whose source column in the
    # previous frame falls outside the image has NO correspondence —
    # the rendered bands roll, so the edge strip shows content that
    # entered from the opposite side, and no flow method can match it.
    # With band flow up to ~25 px the fixed 12 px margin left a ~13 px
    # unrecoverable strip inside `valid`, which alone pushed the bench's
    # flow EPE RMSE from ~1 px to 14 px (r5: EPE p50 was 0.01 px while
    # p90 spiked at GT-flow-magnitude pixels hugging the border).
    xs = np.arange(W, dtype=np.float32)[None, :]
    src_x = xs - flow[..., 0]
    valid &= (src_x >= margin) & (src_x < W - margin)
    return disp, flow, valid


def make_cluster_scene(n_frames: int = 50, height: int = 376,
                       width: int = 1241, tx: float = 0.3,
                       n_movers: int = 3, seed: int = 0,
                       band_rows: int = 24) -> ClusterScene:
    """Camera translating laterally by `tx` m/frame through a
    fronto-parallel staircase world (disparity 8..48 px by row band —
    all inside the tracker's (2, 50) disparity gate), with `n_movers`
    boxes moving at their own lateral velocities. Matches the
    reference's KITTI resolution and intrinsics
    (ref src/dataset.cpp:87-105)."""
    from slam_toolkit_tpu.config import CameraConfig
    cam = CameraConfig()          # KITTI intrinsics by default
    rng = np.random.default_rng(seed)
    H, W = height, width
    n_bands = (H + band_rows - 1) // band_rows
    disps = np.round(np.linspace(8, 48, n_bands)).astype(int)
    # background shift rate per band: flow = fx*tx/z = tx*d/baseline
    rate = tx * disps / cam.baseline                   # px/frame
    pad = int(np.ceil(rate.max() * n_frames)) + 64
    tex = np.kron(rng.uniform(15, 240, ((H + 3) // 4, (W + pad + 3) // 4)),
                  np.ones((4, 4)))[:H, :W + pad].astype(np.float32)

    # movers: textured squares at fixed disparity, STATIC horizontally
    # (the panning background slides past them — the relative motion is
    # the full per-band rate, 15-20 px/frame, >= 7x the RANSAC gate)
    # with a slow vertical drift; they stay in frame for any n_frames
    msize = 120
    mtex = [np.kron(rng.uniform(15, 240, (msize // 4, msize // 4)),
                    np.ones((4, 4))).astype(np.float32)
            for _ in range(n_movers)]
    # each mover is NEARER than the background of every row its box
    # ever covers (depth-ordered like a real object) — a farther-than-
    # background mover is physically impossible and bleeds into the
    # ground cluster through mixed-disparity box edges
    mdisp = ([30, 36, 42][:n_movers]
             + [28] * max(0, n_movers - 3))
    my0 = [40.0, 150.0, 100.0][:n_movers] + [120.0] * max(0, n_movers - 3)
    mx0 = [150, 500, 900][:n_movers] + [700] * max(0, n_movers - 3)
    mdy = [0.0, 0.8, -0.8][:n_movers] + [0.6] * max(0, n_movers - 3)
    y_max = H - msize - 1

    frames, boxes, shifts = [], [], []
    for t in range(n_frames):
        left = np.empty((H, W), np.float32)
        right = np.empty((H, W), np.float32)
        shifts.append([int(round(rate[b] * t)) for b in range(n_bands)])
        for b in range(n_bands):
            r0, r1 = b * band_rows, min((b + 1) * band_rows, H)
            s = shifts[-1][b]
            left[r0:r1] = tex[r0:r1, s:s + W]
            right[r0:r1] = tex[r0:r1, s + disps[b]:s + disps[b] + W]
        fb = []
        for i in range(n_movers):
            x = mx0[i]
            y = int(round(np.clip(my0[i] + mdy[i] * t, 1, y_max)))
            left[y:y + msize, x:x + msize] = mtex[i]
            xr = x - mdisp[i]
            right[y:y + msize, xr:xr + msize] = mtex[i]
            fb.append((x, y, msize, mdisp[i]))
        frames.append((left, right))
        boxes.append(fb)
    return ClusterScene(frames=frames, mover_boxes=boxes, cam=cam,
                        band_rows=band_rows, band_disps=list(disps),
                        band_shift=shifts)
