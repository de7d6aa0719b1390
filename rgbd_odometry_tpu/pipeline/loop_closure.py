"""Loop-closure detection + trajectory refinement.

Goes beyond the reference (whose GOP freezes drift forever,
/root/reference/src/GOP.cpp:138-186): keyframes carry sparse Harris/patch
descriptors (ops/features.py); each new keyframe is matched against all
stored keyframes in one batched MXU pass; epipolar-consistent candidates
(ops/epipolar.py) with enough matches yield a relative pose from
RANSAC PnP (solvers/pnp.py); the resulting loop-closure edges feed the
batched pose-graph Gauss-Newton (solvers/pose_graph.py), which
redistributes accumulated drift over the whole trajectory.

Host drives only candidate selection; detection, matching, geometric
verification and refinement are all jitted/vmapped device code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.ops import features as feat
from rgbd_odometry_tpu.ops.epipolar import ransac_fundamental_filter
from rgbd_odometry_tpu.solvers import pnp
from rgbd_odometry_tpu.solvers.pose_graph import (
    PoseGraphEdges,
    concat_edges,
    odometry_edges,
    refine_pose_graph,
)


@dataclass
class LoopClosureConfig:
    max_keypoints: int = 384
    min_matches: int = 30  # descriptor matches to consider a candidate
    min_inliers: int = 20  # PnP inliers to accept the closure
    min_separation: int = 3  # skip temporally-adjacent keyframes
    # geometric verification (epipolar + RANSAC-PnP, one host-driven dispatch
    # pair per candidate) runs only for the top-N candidates by descriptor
    # match count; the rest are counted in `skipped_candidates` (not silent).
    # Slow-moving dense keyframe streams otherwise verify every overlapping
    # frame — O(T^2) dispatches over a trajectory
    max_candidates_per_keyframe: int = 4
    ransac_hypotheses: int = 64
    epipolar_threshold_px: float = 3.0
    edge_weight: float = 3.0  # closures weigh more than single odometry steps
    min_depth_mm: float = 100.0  # usable-keypoint depth gate (matches FeatureVo)
    # initial keyframe-slot capacity: every new keyframe matches against ALL
    # stored ones in ONE vmapped MXU pass (static shape -> one dispatch; a
    # per-pair host loop costs a dispatch RTT per old keyframe). When the
    # store fills, the slot buffer DOUBLES — one extra compile of the batched
    # matcher per doubling, and every keyframe stays matchable forever (no
    # silent closure loss past a fixed cap)
    slot_capacity: int = 64


@dataclass
class KeyframeRecord:
    node: int  # index into the trajectory being refined
    kps: object  # feat.Keypoints
    pts3d: jnp.ndarray  # (K, 3) backprojected keypoints (camera frame)
    pts_valid: jnp.ndarray  # (K,)


class LoopCloser:
    """Accumulates keyframes, detects closures, refines trajectories."""

    def __init__(self, intr: Intrinsics, config: LoopClosureConfig | None = None, seed: int = 0):
        self.intr = intr
        self.cfg = config or LoopClosureConfig()
        self._key = jax.random.PRNGKey(seed)
        self.keyframes: List[KeyframeRecord] = []
        self.closures: List[Tuple[int, int, np.ndarray, np.ndarray, int]] = []
        self.skipped_candidates: int = 0  # dropped by max_candidates_per_keyframe
        # fixed-capacity stacked keyframe store (device-resident): slot s
        # holds keyframe s's Keypoints; unused slots are all-invalid and
        # fall out of the batched matching naturally
        self._slots: Optional[object] = None  # feat.Keypoints with (S, ...) leaves
        self._detect = jax.jit(
            lambda g: feat.detect_and_describe(g, self.cfg.max_keypoints)
        )
        # ONE dispatch matches the new keyframe against every stored slot
        self._match_all = jax.jit(jax.vmap(feat.match, in_axes=(0, None)))
        self._match = jax.jit(feat.match)
        self._epi = jax.jit(
            lambda k, uv1, uv2, v: ransac_fundamental_filter(
                k, uv1, uv2, v, threshold_px=self.cfg.epipolar_threshold_px
            )
        )

        def _solve(key, obj, imn, valid):
            return pnp.ransac_pnp(
                key, obj, imn, valid, num_hypotheses=self.cfg.ransac_hypotheses
            )

        self._pnp = jax.jit(_solve)

    def _empty_slots(self, kps_like):
        s = self.cfg.slot_capacity
        return jax.tree_util.tree_map(
            lambda x: jnp.zeros((s,) + x.shape, x.dtype), kps_like
        )

    def _num_slots(self) -> int:
        return jax.tree_util.tree_leaves(self._slots)[0].shape[0]

    def _store_slot(self, idx: int, kps):
        if idx == self._num_slots():
            # full: double the buffer (new slots all-invalid). One recompile
            # of the batched matcher per doubling; log2(total/initial) ever.
            self._slots = jax.tree_util.tree_map(
                lambda buf: jnp.concatenate([buf, jnp.zeros_like(buf)], axis=0),
                self._slots,
            )
        self._slots = jax.tree_util.tree_map(
            lambda buf, x: buf.at[idx].set(x), self._slots, kps
        )

    # ------------------------------------------------------------------
    def _backproject(self, kps, depth_mm: jnp.ndarray):
        h, w = depth_mm.shape
        ui = jnp.clip(kps.uv[:, 0].astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(kps.uv[:, 1].astype(jnp.int32), 0, h - 1)
        z_mm = jnp.take(depth_mm.reshape(-1), vi * w + ui)
        valid = kps.valid & (z_mm > self.cfg.min_depth_mm)
        z = z_mm / 1000.0
        x = z * (kps.uv[:, 0] - self.intr.cx) / self.intr.fx
        y = z * (kps.uv[:, 1] - self.intr.cy) / self.intr.fy
        return jnp.stack([x, y, z], -1), valid

    def add_keyframe(self, node: int, gray: np.ndarray, depth_mm: np.ndarray) -> List[int]:
        """Register keyframe at trajectory index `node`; returns the nodes of
        any loop closures detected against previous keyframes."""
        g = jnp.asarray(gray, jnp.float32)
        d = jnp.asarray(depth_mm, jnp.float32)
        kps = self._detect(g)
        pts3d, pvalid = self._backproject(kps, d)
        rec = KeyframeRecord(node=node, kps=kps, pts3d=pts3d, pts_valid=pvalid)

        found = []
        if self.keyframes:
            # one batched dispatch against every stored slot; unused slots
            # are all-invalid -> zero good matches
            all_m = self._match_all(self._slots, kps)
            goods = np.asarray(all_m.num_good)
        # every stored keyframe is a candidate — the slot store grows, so
        # closures onto late keyframes are never silently lost
        candidates = [
            s
            for s, old in enumerate(self.keyframes)
            if abs(node - old.node) >= self.cfg.min_separation
            and int(goods[s]) >= self.cfg.min_matches
        ]
        if len(candidates) > self.cfg.max_candidates_per_keyframe:
            candidates.sort(key=lambda s: -int(goods[s]))
            self.skipped_candidates += (
                len(candidates) - self.cfg.max_candidates_per_keyframe
            )
            candidates = candidates[: self.cfg.max_candidates_per_keyframe]
        for s in candidates:
            old = self.keyframes[s]
            m = jax.tree_util.tree_map(lambda x: x[s], all_m)
            uv_old = jnp.take(old.kps.uv, m.ref_idx, axis=0)
            valid = m.good & kps.valid & jnp.take(old.kps.valid, m.ref_idx, axis=0)
            self._key, ek = jax.random.split(self._key)
            epi = self._epi(ek, kps.uv, uv_old, valid)
            if int(epi.num_inliers) < self.cfg.min_matches:
                continue
            # relative pose: old keyframe's 3D points seen in the NEW frame
            obj = jnp.take(old.pts3d, m.ref_idx, axis=0)
            ov = jnp.take(old.pts_valid, m.ref_idx, axis=0)
            imn = pnp.normalize_image_points(kps.uv, self.intr)
            self._key, pk = jax.random.split(self._key)
            res = self._pnp(pk, obj, imn, epi.inliers & ov)
            if int(res.num_inliers) < self.cfg.min_inliers:
                continue
            # ransac_pnp returns the NEW camera's pose in the OLD keyframe's
            # frame: exactly the old->new relative-pose edge
            self.closures.append(
                (
                    old.node,
                    node,
                    np.asarray(res.R, np.float64),
                    np.asarray(res.t, np.float64),
                    int(res.num_inliers),
                )
            )
            found.append(old.node)
        if self._slots is None:
            self._slots = self._empty_slots(kps)
        self._store_slot(len(self.keyframes), kps)
        self.keyframes.append(rec)
        return found

    # ------------------------------------------------------------------
    def closure_edges(self, dtype=jnp.float32) -> Optional[PoseGraphEdges]:
        if not self.closures:
            return None
        i = jnp.asarray([c[0] for c in self.closures], jnp.int32)
        j = jnp.asarray([c[1] for c in self.closures], jnp.int32)
        R_rel = jnp.asarray(np.stack([c[2] for c in self.closures]), dtype)
        t_rel = jnp.asarray(np.stack([c[3] for c in self.closures]), dtype)
        w = jnp.full((len(self.closures),), self.cfg.edge_weight, dtype)
        return PoseGraphEdges(i=i, j=j, R_rel=R_rel, t_rel=t_rel, weight=w)

    def refine(
        self, R: np.ndarray, t: np.ndarray, iterations: int = 10
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Refine an absolute trajectory with the detected closures."""
        edges = odometry_edges(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
        lc = self.closure_edges()
        if lc is not None:
            edges = concat_edges(edges, lc)
        R_f, t_f, norms = refine_pose_graph(
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), edges,
            iterations=iterations,
        )
        return np.asarray(R_f, np.float64), np.asarray(t_f, np.float64), np.asarray(norms)
