"""Relocalization after tracking loss.

Beyond the reference: `SolveDVO::loop()` has NO recovery path — when frames
degrade (occlusion, blackout, motion blur) its quality triggers just keep
re-seating the reference keyframe on garbage
(/root/reference/src/SolveDVO.cpp:2122-2160), the relative pose integrates
junk, and the trajectory silently walks away; nothing ever snaps it back.

Here every healthy tracking keyframe is also registered, WITH its global
pose, in a device-resident appearance database
(pipeline/kf_matcher.KeyframeMatcher — the same store the loop-closure
detector uses). When the driver declares tracking lost (consecutive frames
with collapsed visibility/reprojection counts or non-finite estimates,
pipeline/odometry.py), the current frame is matched against the WHOLE
database in one batched MXU dispatch; top candidates are geometrically
verified (epipolar RANSAC + RANSAC PnP on the stored keyframe's 3D
points), and the best verified pose re-anchors the trajectory:

    global_new = global_keyframe ∘ rel(PnP)

in the GOP composition convention (pipeline/gop.py `_compose`). The driver
then re-seats the tracking reference on the current frame at that global
pose and continues.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.pipeline.kf_matcher import KeyframeMatcher, MatcherConfig


@dataclass(frozen=True)
class RelocResult:
    R: np.ndarray  # (3,3) recovered GLOBAL rotation (GOP convention)
    t: np.ndarray  # (3,) recovered GLOBAL translation
    keyframe: int  # database index the pose was recovered against
    num_inliers: int


class Relocalizer:
    """Appearance database of (keyframe, global pose); recovery queries."""

    def __init__(self, intr: Intrinsics, config, seed: int = 0):
        # `config` is a config.RelocalizeConfig (kept untyped to avoid an
        # import cycle: config.py must not import pipeline modules)
        self.cfg = config
        self.matcher = KeyframeMatcher(
            intr,
            MatcherConfig(
                max_keypoints=config.max_keypoints,
                epipolar_threshold_px=config.epipolar_threshold_px,
                ransac_hypotheses=config.ransac_hypotheses,
                min_depth_mm=config.min_depth_mm,
                slot_capacity=config.slot_capacity,
                dist_gate_floor=config.dist_gate_floor,
            ),
            seed=seed,
        )
        self.poses: List[Tuple[np.ndarray, np.ndarray]] = []  # global (R, t)
        # trajectory node index of each stored keyframe (None when the
        # caller didn't provide one): lets an online pose-graph refinement
        # refresh the stored global poses (update_poses) instead of leaving
        # the database anchored to pre-refinement drift
        self.nodes: List[Optional[int]] = []
        self.attempts: int = 0
        self.successes: int = 0

    def __len__(self) -> int:
        return len(self.poses)

    # ------------------------------------------------------------------
    def add_keyframe(
        self,
        gray,
        depth_mm,
        R_global: np.ndarray,
        t_global: np.ndarray,
        node: Optional[int] = None,
    ) -> bool:
        """Register a healthy tracking keyframe and its global pose.

        Unverifiable frames are rejected — they could never anchor a
        recovery, and each stored frame can crowd a better candidate out of
        the top-`max_candidates` verification rounds:
          * fewer keypoints than `min_matches` (e.g. a blackout frame that
            slipped through as "healthy" because a blank image yields zero
            residuals) — could never produce enough descriptor matches;
          * fewer depth-valid keypoints than `min_inliers` (e.g. heavy
            structured-light shadow/dropout degradation) — could match in
            2D but can never reach the PnP inlier threshold.
        Returns whether stored."""
        sk = self.matcher.describe(gray, depth_mm)
        if int(sk.kps.count) < self.cfg.min_matches:
            return False
        if int(jnp.sum(sk.pts_valid)) < self.cfg.min_inliers:
            return False
        R_g = np.asarray(R_global, np.float64).copy()
        t_g = np.asarray(t_global, np.float64).copy()
        cap = getattr(self.cfg, "max_keyframes", 0)
        if cap and len(self.poses) >= cap:
            # eviction at the cap: replace the stored entry whose anchor pose
            # is spatially CLOSEST to the incoming one — it is the most
            # redundant for recovery coverage, which is what the database is
            # for. Device cost: one slot overwrite, no growth, no recompile.
            dists = [np.linalg.norm(t_g - ts) for _, ts in self.poses]
            s = int(np.argmin(dists))
            self.matcher.replace(s, sk)
            self.poses[s] = (R_g, t_g)
            self.nodes[s] = None if node is None else int(node)
            return True
        self.matcher.store(sk)
        self.poses.append((R_g, t_g))
        self.nodes.append(None if node is None else int(node))
        return True

    def update_poses(self, gop) -> int:
        """Refresh stored global poses from a (refined) trajectory.

        After an online pose-graph refinement rewrites the live Gop
        (loop_closure.refine_inplace), the database's anchor poses are stale
        — a recovery would re-anchor the trajectory onto pre-refinement
        drift. Every entry stored with a `node` is re-read from the Gop;
        entries without one (legacy callers) are left as stored. Returns the
        number of refreshed entries."""
        n = 0
        for k, node in enumerate(self.nodes):
            if node is not None and node < len(gop):
                R, t = gop.global_pose(node)
                self.poses[k] = (np.asarray(R, np.float64).copy(),
                                 np.asarray(t, np.float64).copy())
                n += 1
        return n

    # ------------------------------------------------------------------
    def relocalize(self, gray) -> Optional[RelocResult]:
        """Try to recover the global pose of `gray` against the database.

        One batched matching dispatch; up to `max_candidates` verification
        rounds. Returns the verified candidate with the most PnP inliers,
        or None (database empty / no candidate matched / none verified)."""
        self.attempts += 1
        if not self.poses:
            return None
        kps = self.matcher.detect(gray)
        all_m, goods = self.matcher.match_all(kps)
        candidates = [
            s for s in range(len(self.poses)) if int(goods[s]) >= self.cfg.min_matches
        ]
        candidates.sort(key=lambda s: -int(goods[s]))
        candidates = candidates[: self.cfg.max_candidates]
        best: Optional[RelocResult] = None
        for s in candidates:
            v = self.matcher.verify(
                s, kps, all_m, self.cfg.min_matches, self.cfg.min_inliers
            )
            if v is None:
                continue
            if best is not None and v.num_inliers <= best.num_inliers:
                continue
            # compose: the PnP pose is the query camera's pose in the stored
            # keyframe's frame — exactly the "relative pose" the GOP composes
            # with (pipeline/gop.py:_compose; same algebra as push_keyframe)
            R_k, t_k = self.poses[s]
            best = RelocResult(
                R=R_k @ v.R,
                t=t_k + R_k @ v.t,
                keyframe=s,
                num_inliers=v.num_inliers,
            )
        if best is not None:
            self.successes += 1
        return best
