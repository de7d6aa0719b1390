"""Checkpoint / resume for the streaming odometry pipeline.

The reference has NO solver-state checkpointing (SURVEY.md section 5): its only
persistence is trajectory text files and frame dumps; the GOP lives in memory
(reserve 100k, /root/reference/src/GOP.cpp:125) and a crash loses the run.
This module adds the missing capability: snapshot the full odometry state —
trajectory log, keyframe features, relative pose, frame counters — to one
.npz and resume mid-sequence bit-exactly.

Not serialized: the relocalizer's appearance database (pipeline/relocalize.py)
— a resumed run with relocalize.enabled starts with an empty database that
repopulates from its own keyframes (tracking itself resumes bit-exactly;
only recovery-after-loss coverage of pre-checkpoint keyframes is narrowed).
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry


def save_odometry(odo: "EdgeDvoOdometry", path: str) -> None:
    """Snapshot an EdgeDvoOdometry instance to `path` (.npz)."""
    arrays = {}
    meta = {
        "frame_num": odo._frame_num,
        "last_ref_frame": odo._last_ref_frame,
        "num_levels": odo.cfg.pyramid.num_levels,
        "config": odo.cfg.to_json(),
        "gop": [
            {
                "frame_num": e.frame_num,
                "is_keyframe": e.is_keyframe,
                "reason": e.reason,
                "timestamp": e.timestamp,
            }
            for e in odo.gop.elements
        ],
    }
    arrays["rel_R"] = np.asarray(odo._R)
    arrays["rel_t"] = np.asarray(odo._t)
    # constant-velocity state: previous frame's relative pose (f32 device
    # values, saved exactly) so a resumed run extrapolates identically
    if odo._prevpose_dev is not None:
        arrays["prev_rel_R"] = np.asarray(odo._prevpose_dev[0])
        arrays["prev_rel_t"] = np.asarray(odo._prevpose_dev[1])
    arrays["gop_R"] = (
        np.stack([e.R for e in odo.gop.elements]) if odo.gop.elements else np.zeros((0, 3, 3))
    )
    arrays["gop_t"] = (
        np.stack([e.t for e in odo.gop.elements]) if odo.gop.elements else np.zeros((0, 3))
    )
    arrays["last_key_R"] = odo.gop.last_key_R
    arrays["last_key_t"] = odo.gop.last_key_t
    # keyframe features per level (RefLevel pytrees)
    if odo._ref_feats is not None:
        for lvl, f in enumerate(odo._ref_feats):
            arrays[f"ref{lvl}_pts3d"] = np.asarray(f.pts3d)
            arrays[f"ref{lvl}_uv"] = np.asarray(f.uv)
            arrays[f"ref{lvl}_valid"] = np.asarray(f.valid)
            arrays[f"ref{lvl}_count"] = np.asarray(f.count)
    # previous frame pyramid (needed for a rollback right after resume)
    if odo._prev_pyr is not None:
        for lvl in range(odo.cfg.pyramid.num_levels):
            arrays[f"prev_gray{lvl}"] = np.asarray(odo._prev_pyr.gray[lvl])
            arrays[f"prev_depth{lvl}"] = np.asarray(odo._prev_pyr.depth[lvl])
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_odometry(path: str) -> "EdgeDvoOdometry":
    """Restore an EdgeDvoOdometry snapshot; continue with process_frame()."""
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import PipelineConfig
    from rgbd_odometry_tpu.core.pyramid import FramePyramid
    from rgbd_odometry_tpu.pipeline.gop import GopElement
    from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry
    from rgbd_odometry_tpu.solvers.edge_dvo import RefLevel

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    cfg = PipelineConfig.from_json(meta["config"])
    odo = EdgeDvoOdometry(cfg)
    odo._frame_num = int(meta["frame_num"])
    odo._last_ref_frame = int(meta["last_ref_frame"])
    odo._R = data["rel_R"]
    odo._t = data["rel_t"]
    if "prev_rel_R" in data:
        odo._prevpose_dev = (
            jnp.asarray(data["prev_rel_R"]),
            jnp.asarray(data["prev_rel_t"]),
        )
    odo.gop.last_key_R = data["last_key_R"]
    odo.gop.last_key_t = data["last_key_t"]
    for i, e in enumerate(meta["gop"]):
        odo.gop.elements.append(
            GopElement(
                frame_num=e["frame_num"],
                is_keyframe=e["is_keyframe"],
                reason=e["reason"],
                R=data["gop_R"][i],
                t=data["gop_t"][i],
                timestamp=e["timestamp"],
            )
        )
    # derived, not serialized: element index of the current last keyframe
    # (relocalizer node bookkeeping reads it at registration time)
    kf_idx = [i for i, e in enumerate(odo.gop.elements) if e.is_keyframe]
    odo.gop.last_key_index = kf_idx[-1] if kf_idx else -1
    n_levels = int(meta["num_levels"])
    if f"ref0_pts3d" in data:
        odo._ref_feats = tuple(
            RefLevel(
                pts3d=jnp.asarray(data[f"ref{l}_pts3d"]),
                uv=jnp.asarray(data[f"ref{l}_uv"]),
                valid=jnp.asarray(data[f"ref{l}_valid"]),
                count=jnp.asarray(data[f"ref{l}_count"]),
            )
            for l in range(n_levels)
        )
    if "prev_gray0" in data:
        odo._prev_pyr = FramePyramid(
            gray=tuple(jnp.asarray(data[f"prev_gray{l}"]) for l in range(n_levels)),
            depth=tuple(jnp.asarray(data[f"prev_depth{l}"]) for l in range(n_levels)),
        )
    return odo
