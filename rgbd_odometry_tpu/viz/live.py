"""Live-run visualization sink: the reference's in-loop debug views as PNGs.

The reference shows overlays / residue heat maps / energy plots *during*
`loop()` behind compile-time plugs (/root/reference/src/SolveDVO.cpp:930-989,
2283-2356) and a dense full-frame reprojection composite
(`MentisVisualHandle::debug`, /root/reference/src/MentisVisualHandle.cpp:
188-276). There is no X display on a TPU host, so the equivalents are written
as image files: `cli dvo --viz-dir <dir>` attaches a `LiveViz` to the
streaming driver.

Per sampled frame (every `every` frames):
  overlay_NNNN.png   ref edge points reprojected onto the now frame
  residue_NNNN.png   per-point residual heat map (sOverlay / heatmap parity)
  energy_NNNN.png    energy-per-iteration curve (visualizeEnergyProgress)
  histogram_NNNN.png residue histogram + Laplacian fit (processResidueHistogram)
At the end (`finalize`):
  trajectory.png           top-down path with reason-colored keyframes (RViz GOP view)
  reprojection_debug.png   dense ref->now warp composite (MentisVisualHandle::debug)
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from rgbd_odometry_tpu.viz.overlay import (
    energy_plot,
    overlay_points,
    residue_heatmap,
    residual_histogram_plot,
    trajectory_plot,
)


def _write_png(path: str, img: np.ndarray) -> None:
    import cv2

    ok = cv2.imwrite(path, img[..., ::-1] if img.ndim == 3 else img)
    if not ok:  # pragma: no cover - disk errors
        raise IOError(f"failed to write {path}")


def _reproject_ref_points(odo) -> tuple[np.ndarray, np.ndarray]:
    """Reproject the level-0 reference edge points under the current relative
    pose (host-side numpy; mirrors edge_dvo._project)."""
    ref = odo._ref_feats[0]
    pts = np.asarray(ref.pts3d, np.float64)
    valid = np.asarray(ref.valid)
    R = np.asarray(odo._R, np.float64)
    t = np.asarray(odo._t, np.float64)
    xp = (pts - t) @ R  # R^T (X - t) row-wise
    z = np.where(np.abs(xp[:, 2]) < 1e-12, 1e-12, xp[:, 2])
    intr = odo.intr
    u = float(intr.fx) * xp[:, 0] / z + float(intr.cx)
    v = float(intr.fy) * xp[:, 1] / z + float(intr.cy)
    w, h = odo.cfg.camera.width, odo.cfg.camera.height
    vis = valid & (u >= 0) & (u <= w) & (v >= 0) & (v <= h) & (xp[:, 2] > 0)
    return np.stack([u, v], -1), vis


class LiveViz:
    """Attach to an EdgeDvoOdometry run; writes debug PNGs as frames pass."""

    def __init__(self, out_dir: str, every: int = 5):
        self.out_dir = out_dir
        self.every = max(1, every)
        os.makedirs(out_dir, exist_ok=True)
        self._last_frame: Optional[tuple[np.ndarray, np.ndarray]] = None
        self.written: list[str] = []

    def _put(self, name: str, img: np.ndarray):
        path = os.path.join(self.out_dir, name)
        _write_png(path, img)
        self.written.append(path)

    def on_frame(self, odo, gray: np.ndarray, depth_mm: np.ndarray):
        """Call right after odo.process_frame(gray, depth_mm, ...)."""
        self._last_frame = (gray, depth_mm)
        m = odo.metrics[-1]
        n = m.frame_num
        if n == 0 or (n % self.every) != 0:
            return
        uv, vis = _reproject_ref_points(odo)
        self._put(f"overlay_{n:04d}.png", overlay_points(gray, uv, vis))
        if m.energy_curve is not None:
            e = np.asarray(m.energy_curve)
            self._put(f"energy_{n:04d}.png", energy_plot(e, best_iter=m.best_iter))
        eps = getattr(m, "final_epsilons", None)
        val = getattr(m, "final_valid", None)
        if eps is not None and val is not None:
            self._put(
                f"residue_{n:04d}.png",
                residue_heatmap(gray, uv, np.asarray(eps), np.asarray(val)),
            )
            from rgbd_odometry_tpu.pipeline.odometry import residual_histogram

            hist = residual_histogram(np.asarray(eps), np.asarray(val))
            self._put(
                f"histogram_{n:04d}.png", residual_histogram_plot(hist, m.b_cap)
            )

    def finalize(self, odo, gt_t: Optional[np.ndarray] = None):
        R, t, ts = odo.trajectory()
        kfs = [i for i, e in enumerate(odo.gop.elements) if e.is_keyframe]
        reasons = [odo.gop.elements[i].reason for i in kfs]
        self._put(
            "trajectory.png",
            trajectory_plot(t, gt_t, keyframes=kfs, reasons=reasons),
        )
        if self._last_frame is not None and odo._prev_pyr is not None:
            # dense full-frame reprojection composite: the reference keyframe
            # warped into the current frame under the final relative pose
            # (MentisVisualHandle::debug parity) next to the actual frame
            import jax.numpy as jnp

            from rgbd_odometry_tpu.solvers.photometric import warp_image

            gray, depth = self._last_frame
            # the stored ref features don't retain the image; warp the
            # previous frame's pyramid level 0 (the most recent keyframe
            # candidate) — the composite is a qualitative alignment check
            ref_gray = np.asarray(odo._prev_pyr.gray[0])
            ref_depth = np.asarray(odo._prev_pyr.depth[0])
            warped = np.asarray(
                warp_image(
                    jnp.asarray(ref_gray),
                    jnp.asarray(ref_depth),
                    odo.intr,
                    jnp.asarray(odo._R, jnp.float32),
                    jnp.asarray(odo._t, jnp.float32),
                )
            )
            comp = np.concatenate(
                [warped, np.full((warped.shape[0], 4), 255.0), gray], axis=1
            )
            self._put("reprojection_debug.png", np.clip(comp, 0, 255).astype(np.uint8))
        return self.written
