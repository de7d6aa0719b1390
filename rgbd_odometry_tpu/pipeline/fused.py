"""Fused odometry: IMU-seeded edge-DVO with a sparse-PnP fallback.

BASELINE.json config 5 ("Full pipeline: ImuDeadReckon init + edge DVO +
SolvePnP fallback on a live OpenNI-style stream replay") — the integration
the reference only sketched across separate ROS nodes, wired into one driver:

  * between frames, an IMU sample window dead-reckons an inter-frame motion
    prior (`solvers/imu.py`, reference ImuDeadReckon) that warm-starts the
    edge-DVO solve,
  * each edge solve's quality signals (Laplacian b-hat / visibility / point
    count — the reference's own triggers, /root/reference/src/SolveDVO.cpp:
    2129-2152) gate a sparse fallback: Harris features + vmapped-RANSAC PnP
    against the current keyframe (the PnPOdometry role) replace the edge
    estimate for that frame,
  * the trajectory log and keyframe policy stay those of EdgeDvoOdometry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.config import PipelineConfig
from rgbd_odometry_tpu.ops import features as feat
from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry
from rgbd_odometry_tpu.solvers import imu as imu_mod
from rgbd_odometry_tpu.solvers import pnp


@dataclass
class FusedConfig:
    # fallback triggers (reference constants, src/SolveDVO.cpp:21-23)
    laplacian_b_thresh: float = 3.0
    min_visible_ratio: float = 0.8
    max_keypoints: int = 512
    ransac_hypotheses: int = 64
    min_pnp_matches: int = 12
    use_imu_prior: bool = True


class FusedOdometry:
    """EdgeDvoOdometry + IMU prior + sparse-PnP fallback."""

    def __init__(self, config: PipelineConfig | None = None, fused: FusedConfig | None = None, seed: int = 0):
        self.odo = EdgeDvoOdometry(config)
        self.fcfg = fused or FusedConfig()
        self._key = jax.random.PRNGKey(seed)
        self._imu_state = imu_mod.ImuState.identity()
        self._imu_intr = imu_mod.ImuIntrinsics.from_scalars()
        self._kf_gray: Optional[np.ndarray] = None
        self._kf_depth: Optional[np.ndarray] = None
        self._kf_kps = None
        self._kf_pts3d = None
        self._kf_pts_valid = None
        self._detect = jax.jit(lambda g: feat.detect_and_describe(g, self.fcfg.max_keypoints))
        self._match = jax.jit(feat.match)
        self.fallback_frames: List[int] = []
        self._prev_frame: Optional[Tuple[np.ndarray, np.ndarray]] = None

    # ------------------------------------------------------------------
    def _imu_prior(self, accels, gyros, dt):
        """Integrate an inter-frame IMU window into a relative-motion prior
        (gravity-free: the odometry prior needs only the relative delta)."""
        st = imu_mod.ImuState.identity()
        final, _ = imu_mod.propagate_batch(
            st,
            jnp.asarray(accels, jnp.float32),
            jnp.asarray(gyros, jnp.float32),
            self._imu_intr,
            dt=dt,
            gravity=(0.0, 0.0, 0.0),
        )
        R, t = imu_mod.pose_of(final)
        return np.asarray(R, np.float64), np.asarray(t, np.float64)

    def _refresh_kf_features(self, gray, depth_mm):
        self._kf_gray = gray
        self._kf_depth = depth_mm
        g = jnp.asarray(gray, jnp.float32)
        self._kf_kps = self._detect(g)
        h, w = depth_mm.shape
        uv = np.asarray(self._kf_kps.uv)
        vi = np.clip(uv[:, 1].astype(int), 0, h - 1)
        ui = np.clip(uv[:, 0].astype(int), 0, w - 1)
        z_mm = depth_mm[vi, ui]
        intr = self.odo.intr
        z = z_mm / 1000.0
        self._kf_pts3d = np.stack(
            [
                z * (uv[:, 0] - float(intr.cx)) / float(intr.fx),
                z * (uv[:, 1] - float(intr.cy)) / float(intr.fy),
                z,
            ],
            -1,
        )
        self._kf_pts_valid = np.asarray(self._kf_kps.valid) & (z_mm > 100.0)

    def _pnp_fallback(self, gray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Sparse relative pose vs the current keyframe (PnPOdometry role)."""
        if self._kf_kps is None:
            return None
        kn = self._detect(jnp.asarray(gray, jnp.float32))
        m = self._match(self._kf_kps, kn)
        obj = jnp.asarray(self._kf_pts3d, jnp.float32)[m.ref_idx]
        ov = jnp.asarray(self._kf_pts_valid)[m.ref_idx]
        valid = m.good & ov & kn.valid
        if int(jnp.sum(valid)) < self.fcfg.min_pnp_matches:
            return None
        imn = pnp.normalize_image_points(kn.uv, self.odo.intr)
        self._key, sub = jax.random.split(self._key)
        res = pnp.ransac_pnp(
            sub, obj, imn, valid, num_hypotheses=self.fcfg.ransac_hypotheses
        )
        if int(res.num_inliers) < self.fcfg.min_pnp_matches:
            return None
        return np.asarray(res.R, np.float64), np.asarray(res.t, np.float64)

    # ------------------------------------------------------------------
    def process_frame(
        self,
        gray: np.ndarray,
        depth_mm: np.ndarray,
        timestamp: float = 0.0,
        imu_window: Optional[Tuple[np.ndarray, np.ndarray, float]] = None,
    ):
        """One fused step. `imu_window` = (accels (T,3), gyros (T,3), dt)."""
        prior = None
        if imu_window is not None and self.fcfg.use_imu_prior:
            prior = self._imu_prior(*imu_window)
        frame_is_first = self.odo._frame_num < 0
        last_ref_before = self.odo._last_ref_frame
        pose = self.odo.process_frame(gray, depth_mm, timestamp, pose_prior=prior)
        if frame_is_first:
            self._refresh_kf_features(gray, depth_mm)
            self._prev_frame = (gray, depth_mm)
            return pose
        if self.odo._last_ref_frame != last_ref_before:
            # keyframe switched: with rollback semantics (__NEW__REF_UPDATE)
            # the new reference is frame n-1 -> anchor sparse features to the
            # cached prev frame; with the naive variant (rollback_resolve
            # False, __OLD__REF_UPDATE) the CURRENT frame is the reference
            if self.odo._last_ref_frame == self.odo._frame_num:
                kf_gray, kf_depth = gray, depth_mm
            else:
                kf_gray, kf_depth = (
                    self._prev_frame if self._prev_frame is not None else (gray, depth_mm)
                )
            self._refresh_kf_features(kf_gray, kf_depth)
            self._prev_frame = (gray, depth_mm)
            return pose
        self._prev_frame = (gray, depth_mm)
        m = self.odo.metrics[-1]
        bad = (
            m.b_cap > self.fcfg.laplacian_b_thresh
            or m.visible_ratio < self.fcfg.min_visible_ratio
        )
        if bad:
            fb = self._pnp_fallback(gray)
            if fb is not None:
                R, t = fb
                # overwrite the last trajectory entry with the sparse estimate
                self.odo._R = R
                self.odo._t = t
                el = self.odo.gop.elements[-1]
                g_R = self.odo.gop.last_key_R @ R
                g_t = self.odo.gop.last_key_t + self.odo.gop.last_key_R @ t
                el.R, el.t = g_R, g_t
                self.fallback_frames.append(m.frame_num)
                return self.odo.gop.global_pose(-1)
        return pose

    def trajectory(self):
        return self.odo.trajectory()
