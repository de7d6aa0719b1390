"""Checkpoint / resume for the streaming odometry pipeline.

The reference has NO solver-state checkpointing (SURVEY.md section 5): its only
persistence is trajectory text files and frame dumps; the GOP lives in memory
(reserve 100k, /root/reference/src/GOP.cpp:125) and a crash loses the run.
This module adds the missing capability: snapshot the full odometry state —
trajectory log, keyframe features, relative pose, frame counters, plus the
recovery subsystems (the relocalizer's appearance database and the loop
closer's keyframe store/closure log) — to one .npz and resume mid-sequence
bit-exactly, INCLUDING post-resume recovery behavior: a resumed run can
relocalize against and close loops onto keyframes stored before the
checkpoint, and its RANSAC draws continue from the saved PRNG state.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, List, Optional, Tuple

import numpy as np

if TYPE_CHECKING:
    from rgbd_odometry_tpu.pipeline.loop_closure import LoopCloser
    from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry


# ---------------------------------------------------------------------------
# KeyframeMatcher (shared by relocalizer + loop closer)
# ---------------------------------------------------------------------------
def _matcher_arrays(matcher, p: str) -> dict:
    """Stacked per-slot arrays of a kf_matcher.KeyframeMatcher under prefix
    `p`, plus its PRNG key (so post-resume RANSAC draws are bit-identical).
    Keypoint arrays come straight from the stacked slot buffer (their only
    home since the r5 de-duplication, kf_matcher.StoredPoints)."""
    arrays = {f"{p}_key": np.asarray(matcher._key)}
    n = len(matcher.stored)
    if n:
        kps = matcher._slots  # leading axis = slots; used slots are [:n]
        arrays[f"{p}_uv"] = np.asarray(kps.uv[:n])
        arrays[f"{p}_score"] = np.asarray(kps.score[:n])
        arrays[f"{p}_desc"] = np.asarray(kps.desc[:n])
        arrays[f"{p}_kvalid"] = np.asarray(kps.valid[:n])
        arrays[f"{p}_count"] = np.asarray(kps.count[:n])
        arrays[f"{p}_pts3d"] = np.stack([np.asarray(s.pts3d) for s in matcher.stored])
        arrays[f"{p}_pvalid"] = np.stack([np.asarray(s.pts_valid) for s in matcher.stored])
    return arrays


def _restore_matcher(matcher, data, p: str, n: int) -> None:
    """Re-store `n` keyframes into a fresh matcher (slot buffer rebuilds
    identically: zero-init + per-slot set, doubling as it grows)."""
    import jax.numpy as jnp

    from rgbd_odometry_tpu.ops import features as feat
    from rgbd_odometry_tpu.pipeline.kf_matcher import StoredKeyframe

    for s in range(n):
        kps = feat.Keypoints(
            uv=jnp.asarray(data[f"{p}_uv"][s]),
            score=jnp.asarray(data[f"{p}_score"][s]),
            desc=jnp.asarray(data[f"{p}_desc"][s]),
            valid=jnp.asarray(data[f"{p}_kvalid"][s]),
            count=jnp.asarray(data[f"{p}_count"][s]),
        )
        matcher.store(
            StoredKeyframe(
                kps=kps,
                pts3d=jnp.asarray(data[f"{p}_pts3d"][s]),
                pts_valid=jnp.asarray(data[f"{p}_pvalid"][s]),
            )
        )
    matcher._key = jnp.asarray(data[f"{p}_key"])


def save_odometry(
    odo: "EdgeDvoOdometry",
    path: str,
    closer: Optional["LoopCloser"] = None,
    raw_rels: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None,
) -> None:
    """Snapshot an EdgeDvoOdometry instance (plus, optionally, the CLI's
    LoopCloser and its raw odometry-edge chain) to `path` (.npz)."""
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
    # relocalizer appearance database (pipeline/relocalize.py): stored
    # keyframes + anchor poses + counters, so a resumed run can recover
    # against PRE-checkpoint keyframes
    if odo._reloc is not None:
        meta["reloc"] = {
            "n": len(odo._reloc.poses),
            "nodes": [-1 if x is None else int(x) for x in odo._reloc.nodes],
            "attempts": odo._reloc.attempts,
            "successes": odo._reloc.successes,
        }
        arrays.update(_matcher_arrays(odo._reloc.matcher, "reloc"))
        if odo._reloc.poses:
            arrays["reloc_pose_R"] = np.stack([p[0] for p in odo._reloc.poses])
            arrays["reloc_pose_t"] = np.stack([p[1] for p in odo._reloc.poses])
    # loop closer (the CLI's --loop-close companion): keyframe store,
    # detected closures, and the skipped-candidate counter
    if closer is not None:
        meta["closer"] = {
            "n": len(closer.keyframes),
            "nodes": [int(k.node) for k in closer.keyframes],
            "skipped": closer.skipped_candidates,
            "closures": [
                [int(c[0]), int(c[1]), int(c[4])] for c in closer.closures
            ],
        }
        arrays.update(_matcher_arrays(closer.matcher, "lc"))
        if closer.closures:
            arrays["lc_closure_R"] = np.stack(
                [np.asarray(c[2], np.float64) for c in closer.closures]
            )
            arrays["lc_closure_t"] = np.stack(
                [np.asarray(c[3], np.float64) for c in closer.closures]
            )
    # raw consecutive-frame relative poses (the pristine odometry-edge chain
    # online refinement derives its edges from; cli.py `raw_rels`)
    if raw_rels is not None:
        meta["n_raw_rels"] = len(raw_rels)
        if raw_rels:
            arrays["raw_rel_R"] = np.stack([np.asarray(r, np.float64) for r, _ in raw_rels])
            arrays["raw_rel_t"] = np.stack([np.asarray(t, np.float64) for _, t in raw_rels])
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_odometry(path: str) -> "EdgeDvoOdometry":
    """Restore an EdgeDvoOdometry snapshot; continue with process_frame().

    Restores the relocalizer database too (when the saved config has
    relocalize.enabled): recovery against pre-checkpoint keyframes works
    immediately after resume. The CLI's LoopCloser is restored separately
    (`load_loop_closer`) since it lives outside the odometry object."""
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
    if odo._reloc is not None and "reloc" in meta:
        rm = meta["reloc"]
        _restore_matcher(odo._reloc.matcher, data, "reloc", rm["n"])
        if rm["n"]:
            odo._reloc.poses = [
                (data["reloc_pose_R"][s].copy(), data["reloc_pose_t"][s].copy())
                for s in range(rm["n"])
            ]
        odo._reloc.nodes = [None if x < 0 else x for x in rm["nodes"]]
        odo._reloc.attempts = int(rm["attempts"])
        odo._reloc.successes = int(rm["successes"])
    return odo


def load_loop_closer(path: str, intr, config=None) -> Optional["LoopCloser"]:
    """Restore the LoopCloser saved beside an odometry snapshot (None when
    the checkpoint predates loop-closure support or was saved without
    --loop-close)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if "closer" not in meta:
        return None
    from rgbd_odometry_tpu.pipeline.loop_closure import KeyframeRecord, LoopCloser

    closer = LoopCloser(intr, config)
    cm = meta["closer"]
    _restore_matcher(closer.matcher, data, "lc", cm["n"])
    closer.keyframes = [
        KeyframeRecord(
            node=cm["nodes"][s],
            pts3d=closer.matcher.stored[s].pts3d,
            pts_valid=closer.matcher.stored[s].pts_valid,
        )
        for s in range(cm["n"])
    ]
    closer.skipped_candidates = int(cm["skipped"])
    closer.closures = [
        (ni, nj, data["lc_closure_R"][k], data["lc_closure_t"][k], inl)
        for k, (ni, nj, inl) in enumerate(cm["closures"])
    ]
    return closer


def load_raw_rels(path: str) -> Optional[List[Tuple[np.ndarray, np.ndarray]]]:
    """Restore the raw odometry-edge chain saved beside a snapshot (None
    when the checkpoint was saved without one)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if "n_raw_rels" not in meta:
        return None
    n = int(meta["n_raw_rels"])
    if n == 0:
        return []
    return [(data["raw_rel_R"][i], data["raw_rel_t"][i]) for i in range(n)]
