"""Checkpoint / resume for the whole SLAM state.

The reference designed but disabled a memento pattern (Pipeline::Save is
an #if 0 stub, ref src/pipeline.cpp:231-241; Frame/Mappoint/Map mementos
commented out, src/frame.cpp:77-124, src/mappoint.cpp:28-37,
include/pipeline_map.h:41-47). In the functional design the entire map
is one pytree of arrays, so checkpointing is a single serialization of
that pytree plus the small host-side driver state.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.mapping.map_state import MapState

if TYPE_CHECKING:
    from slam_toolkit_tpu.pipeline.engine import SlamEngine


def save(engine: "SlamEngine", path: str) -> None:
    """Write the full engine state to <path>.npz (+ .json sidecar)."""
    arrays = {f"map_{k}": np.asarray(v)
              for k, v in engine.map._asdict().items()}
    arrays["T_cw"] = np.asarray(engine.T_cw)
    arrays["velocity"] = np.asarray(engine.velocity)
    arrays["trajectory"] = np.stack(engine.trajectory) if engine.trajectory \
        else np.zeros((0, 4, 4), np.float32)
    if engine._traj_anchor:
        arrays["anchor_slots"] = np.asarray(
            [s for s, _ in engine._traj_anchor], np.int32)
        arrays["anchor_rel"] = np.stack(
            [r for _, r in engine._traj_anchor]).astype(np.float32)
    if engine.vocab is not None:
        from slam_toolkit_tpu.loop.vocab import TopWBow
        if isinstance(engine.bow_db, TopWBow):
            arrays["bow_db_words"] = np.asarray(engine.bow_db.words)
            arrays["bow_db_weights"] = np.asarray(engine.bow_db.weights)
        else:
            arrays["bow_db"] = np.asarray(engine.bow_db)
        arrays["closed_i"] = np.asarray(engine.closed_i)
        arrays["closed_j"] = np.asarray(engine.closed_j)
        arrays["closed_T"] = np.asarray(engine.closed_T)
        arrays["closed_valid"] = np.asarray(engine.closed_valid)
        arrays["closed_w"] = np.asarray(engine.closed_w)
    np.savez_compressed(path, **arrays)
    meta = {"frame_id": engine.frame_id,
            "n_keyframes": engine.n_keyframes,
            "n_closed": getattr(engine, "n_closed", 0),
            "last_closure_nkf": getattr(engine, "_last_closure_nkf",
                                        -(10 ** 9)),
            "closed_pairs": getattr(engine, "_closed_pairs", []),
            "inlier_peak": getattr(engine, "_inlier_peak", 0.0),
            "frame_stats": engine.frame_stats,
            "loop_events": engine.loop_events}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load(engine: "SlamEngine", path: str) -> "SlamEngine":
    """Restore state saved by save() into a compatible engine in place."""
    if not path.endswith(".npz"):
        path_npz = path + ".npz" if os.path.exists(path + ".npz") else path
    else:
        path_npz = path
    z = np.load(path_npz, allow_pickle=False)
    fields = {k[len("map_"):]: jnp.asarray(z[k])
              for k in z.files if k.startswith("map_")}
    engine.map = MapState(**fields)
    engine.T_cw = jnp.asarray(z["T_cw"])
    engine.velocity = jnp.asarray(z["velocity"])
    engine.trajectory = [t for t in z["trajectory"]]
    if "anchor_slots" in z.files:
        engine._traj_anchor = [
            (int(s), r) for s, r in zip(z["anchor_slots"], z["anchor_rel"])]
    if engine.vocab is not None and ("bow_db" in z.files
                                     or "bow_db_words" in z.files):
        # the stored representation must match the engine's configured
        # backend: a topw db with a dense query (or vice versa) fails
        # deep inside the jitted score program with an opaque attribute
        # or broadcast error (r3 advisor) — fail fast and name the
        # mismatch instead
        ckpt_sparse = "bow_db_words" in z.files
        if ckpt_sparse != bool(getattr(engine, "_bow_sparse", False)):
            raise ValueError(
                f"checkpoint BoW backend mismatch: checkpoint is "
                f"{'topw-sparse' if ckpt_sparse else 'dense'} but the "
                f"engine is configured "
                f"{'topw-sparse' if engine._bow_sparse else 'dense'} "
                f"(cfg.loop.bow_mode) — load with a matching config")
        if ckpt_sparse:
            from slam_toolkit_tpu.loop.vocab import TopWBow
            engine.bow_db = TopWBow(
                words=jnp.asarray(z["bow_db_words"]),
                weights=jnp.asarray(z["bow_db_weights"]))
        else:
            engine.bow_db = jnp.asarray(z["bow_db"])
        engine.closed_i = jnp.asarray(z["closed_i"])
        engine.closed_j = jnp.asarray(z["closed_j"])
        engine.closed_T = jnp.asarray(z["closed_T"])
        engine.closed_valid = jnp.asarray(z["closed_valid"])
        if "closed_w" in z.files:     # older checkpoints lack it
            engine.closed_w = jnp.asarray(z["closed_w"])
    meta_path = (path_npz[:-4] if path_npz.endswith(".npz") else path_npz) \
        + ".json"
    if not os.path.exists(meta_path):
        meta_path = path_npz + ".json"
    with open(meta_path) as f:
        meta = json.load(f)
    engine.frame_id = meta["frame_id"]
    engine.n_keyframes = meta["n_keyframes"]
    engine._inlier_peak = meta.get("inlier_peak", 0.0)
    engine.frame_stats = meta["frame_stats"]
    engine.loop_events = meta["loop_events"]
    if engine.vocab is not None:
        engine.n_closed = meta.get("n_closed", 0)
        engine._last_closure_nkf = meta.get("last_closure_nkf", -(10 ** 9))
        engine._closed_pairs = [tuple(p)
                                for p in meta.get("closed_pairs", [])]
    if engine.n_keyframes > 0:
        engine._refresh_kf_mirrors()
    return engine
