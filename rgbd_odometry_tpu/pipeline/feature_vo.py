"""Sparse feature visual odometry — the `PnPOdometry` node rebuilt.

Reference flow (/root/reference/src/PnPOdometry.cpp, SURVEY.md section 3.3):
SURF detect/describe on ref + now, FLANN match, RANSAC filter, back-project
ref keypoints by depth (`evalRef3dPoints`, :412-428), cv::solvePnPRansac with
the previous pose as prior (:571), keyframe switch when good matches < 70
(:89-102), global pose = keyframe ∘ relative (:154-168).

TPU rebuild: Harris + patch descriptors + MXU matching
(rgbd_odometry_tpu.ops.features), vmapped-RANSAC GN PnP
(rgbd_odometry_tpu.solvers.pnp); host drives only the keyframe switch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.config import CameraConfig
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.ops import features as feat
from rgbd_odometry_tpu.pipeline.gop import Gop, REASON_FIRST_FRAME, REASON_TOO_FEW_REPROJECTIONS
from rgbd_odometry_tpu.solvers import pnp

_PREC = jax.lax.Precision.HIGHEST


@dataclass
class FeatureVoConfig:
    max_keypoints: int = 512
    min_good_matches: int = 70  # keyframe-switch threshold (PnPOdometry.cpp:89)
    ransac_hypotheses: int = 64
    inlier_thresh: float = 0.01
    min_depth_mm: float = 100.0
    # epipolar match filter (ransacTest parity, PnPOdometry.cpp:463,500-535):
    # F-matrix RANSAC over the descriptor matches before PnP, distance 3 px
    epipolar_filter: bool = True
    epipolar_threshold_px: float = 3.0
    epipolar_hypotheses: int = 64


@dataclass
class FeatureVo:
    """Streaming sparse VO over (gray, depth) frames."""

    camera: CameraConfig
    config: FeatureVoConfig = field(default_factory=FeatureVoConfig)
    seed: int = 0

    def __post_init__(self):
        self.intr = Intrinsics.from_config(self.camera)
        self.gop = Gop()
        self._key = jax.random.PRNGKey(self.seed)
        self._ref: Optional[feat.Keypoints] = None
        self._ref_pts3d: Optional[jnp.ndarray] = None
        self._ref_pts_valid: Optional[jnp.ndarray] = None
        self._frame = -1
        self._R = np.eye(3)
        self._t = np.zeros(3)
        self.match_counts: List[int] = []

        self._detect = jax.jit(
            lambda g: feat.detect_and_describe(g, self.config.max_keypoints)
        )
        self._match = jax.jit(feat.match)

        def _solve(key, obj, imn, valid, R0, t0):
            return pnp.ransac_pnp(
                key, obj, imn, valid,
                num_hypotheses=self.config.ransac_hypotheses,
                inlier_thresh=self.config.inlier_thresh,
                R0=R0, t0=t0,
            )

        self._solve = jax.jit(_solve)

        def _epi(key, uv_now, uv_ref, valid):
            from rgbd_odometry_tpu.ops.epipolar import ransac_fundamental_filter

            return ransac_fundamental_filter(
                key, uv_now, uv_ref, valid,
                num_hypotheses=self.config.epipolar_hypotheses,
                threshold_px=self.config.epipolar_threshold_px,
            )

        self._epi = jax.jit(_epi)

    # ------------------------------------------------------------------
    def _backproject_ref(self, kps: feat.Keypoints, depth_mm: jnp.ndarray):
        """`evalRef3dPoints` (PnPOdometry.cpp:412-428): depth at each ref
        keypoint -> 3D, invalid when depth < min_depth_mm."""
        h, w = depth_mm.shape
        ui = jnp.clip(kps.uv[:, 0].astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(kps.uv[:, 1].astype(jnp.int32), 0, h - 1)
        z_mm = jnp.take(depth_mm.reshape(-1), vi * w + ui)
        valid = kps.valid & (z_mm > self.config.min_depth_mm)
        z = z_mm / 1000.0
        x = z * (kps.uv[:, 0] - self.intr.cx) / self.intr.fx
        y = z * (kps.uv[:, 1] - self.intr.cy) / self.intr.fy
        return jnp.stack([x, y, z], -1), valid

    def _set_ref(self, gray: jnp.ndarray, depth_mm: jnp.ndarray):
        self._ref = self._detect(gray)
        self._ref_pts3d, self._ref_pts_valid = self._backproject_ref(self._ref, depth_mm)
        self._R = np.eye(3)
        self._t = np.zeros(3)

    # ------------------------------------------------------------------
    def process_frame(self, gray: np.ndarray, depth_mm: np.ndarray, timestamp: float = 0.0):
        """Feed one frame; returns the current global pose (R, t)."""
        self._frame += 1
        g = jnp.asarray(gray, jnp.float32)
        d = jnp.asarray(depth_mm, jnp.float32)
        if self._frame == 0:
            self._set_ref(g, d)
            self.gop.push_keyframe(0, REASON_FIRST_FRAME, np.eye(3), np.zeros(3), timestamp)
            self.match_counts.append(int(self._ref.count))
            return self.gop.global_pose(0)

        now_kps = self._detect(g)
        m = self._match(self._ref, now_kps)
        n_good = int(m.num_good)
        self.match_counts.append(n_good)

        # correspondences: for each good now-kp, the matched ref 3D point and
        # the now-frame normalized image point
        obj = jnp.take(self._ref_pts3d, m.ref_idx, axis=0)
        obj_valid = jnp.take(self._ref_pts_valid, m.ref_idx, axis=0)
        valid = m.good & obj_valid & now_kps.valid
        if self.config.epipolar_filter:
            # geometric gate before PnP: descriptor-similar but epipolar-
            # inconsistent matches are rejected (ransacTest parity)
            uv_ref = jnp.take(self._ref.uv, m.ref_idx, axis=0)
            self._key, ek = jax.random.split(self._key)
            epi = self._epi(ek, now_kps.uv, uv_ref, valid)
            valid = epi.inliers
        imn = pnp.normalize_image_points(now_kps.uv, self.intr)

        self._key, sub = jax.random.split(self._key)
        res = self._solve(
            sub, obj, imn, valid,
            jnp.asarray(self._R, jnp.float32), jnp.asarray(self._t, jnp.float32),
        )
        self._R = np.asarray(res.R, np.float64)
        self._t = np.asarray(res.t, np.float64)
        self.gop.push_ordinary(self._frame, self._R, self._t, timestamp)

        # keyframe switch on match starvation (PnPOdometry.cpp:89-102)
        if n_good < self.config.min_good_matches:
            self.gop.update_most_recent_to_keyframe(REASON_TOO_FEW_REPROJECTIONS)
            self._set_ref(g, d)
        return self.gop.global_pose(-1)

    def trajectory(self):
        return self.gop.poses()
