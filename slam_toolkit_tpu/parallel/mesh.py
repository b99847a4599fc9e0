"""Multi-sequence SLAM over a device mesh.

The reference is strictly single-process/single-sequence (SURVEY.md
§2.4); the TPU-native scale axis is data parallelism over independent
sequences (BASELINE.json config 5: "vmap N KITTI sequences across a TPU
mesh"). Every per-sequence program in this engine is pure and
shape-static, so batching is literally vmap + sharding annotations:
each device tracks its own sequences, no collectives on the hot path
(embarrassingly parallel; ICI only pays for parameter broadcast).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.frontend.frame import build_frame
from slam_toolkit_tpu.frontend.tracker import track_pose
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.mapping.ba_adapter import local_ba_step
from slam_toolkit_tpu.mapping.map_state import (MapState, empty_map,
                                                gather_local_landmarks)


def make_mesh(n_devices: int) -> Mesh:
    import numpy as np
    devs = np.asarray(jax.devices()[:n_devices], dtype=object)
    return Mesh(devs.reshape(n_devices), ("seq",))


def batched_empty_map(cfg: SlamConfig, batch: int) -> MapState:
    one = empty_map(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
                        one)


def batched_track_step(cfg: SlamConfig, cam: StereoCamera):
    """Returns f(maps, images, T_preds) -> (T_cw, n_inliers), vmapped over
    the sequence axis. jit/pjit-ready."""

    def one(m: MapState, image: jnp.ndarray, T_pred: jnp.ndarray):
        frame = build_frame(image, cam, cfg)
        Xw, desc, ids, valid = gather_local_landmarks(
            m, cfg.map.track_landmarks, cfg.map.track_recent_kfs)
        res = track_pose(frame, Xw, desc, valid, T_pred, cam, cfg)
        return res.T_cw, res.n_inliers

    return jax.vmap(one)


def batched_map_step(cfg: SlamConfig, cam: StereoCamera):
    """Returns f(maps) -> maps running local BA per sequence."""

    def one(m: MapState) -> MapState:
        return local_ba_step(m, cam, cfg)

    return jax.vmap(one)


def shard_batch(mesh: Mesh, tree):
    """Place a batched pytree with the leading axis sharded over `seq`."""
    sharding = NamedSharding(mesh, P("seq"))

    def put(x):
        return jax.device_put(x, NamedSharding(
            mesh, P(*( ("seq",) + (None,) * (x.ndim - 1) ))))

    return jax.tree.map(put, tree)


def multi_sequence_step(cfg: SlamConfig, cam: StereoCamera, mesh: Mesh):
    """One jitted DP step: track every sequence, then local-BA every map.

    Shardings: all operands batch-sharded over `seq`; XLA partitions the
    whole program with zero cross-device communication.
    """
    track = batched_track_step(cfg, cam)
    ba = batched_map_step(cfg, cam)

    @jax.jit
    def step(maps: MapState, images: jnp.ndarray, T_preds: jnp.ndarray):
        T_new, n_inl = track(maps, images, T_preds)
        maps2 = ba(maps)
        return maps2, T_new, n_inl

    return step
