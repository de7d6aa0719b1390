"""TUM RGB-D dataset ingestion and trajectory file I/O.

Rebuilds the reference's dataset path without ROS:
  * trajectory files in TUM format `timestamp tx ty tz qx qy qz qw` — the
    reference writes est/GT poses for external ATE/RPE tooling
    (/root/reference/include/SolveDVO.h:84-86, src/SolveDVO.cpp:2253-2276;
    note its printPose writes orientation before position, :1341-1354 — we
    write standard TUM order, which the TUM tools expect),
  * groundtruth.txt parsing with the same semantics as `loadGTPath`
    (/root/reference/src/loadGTPath.cpp:58-143: whitespace format, comment
    skipping, optional line-skip, rebase to first pose),
  * rgb/depth frame association by nearest timestamp (the job rosbag replay
    did for the reference, gel.launch:4-10),
  * PNG loading: 16-bit depth at 1/5000 m per unit (TUM convention) converted
    to millimetres with the 0->1 sanitize
    (/root/reference/src/camTopic2PublisherPyD.cpp:72-80).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from rgbd_odometry_tpu.core import geometry as geo


# ----------------------------------------------------------------------
# Trajectory files
# ----------------------------------------------------------------------


def write_trajectory(path: str, R: np.ndarray, t: np.ndarray, timestamps: np.ndarray):
    """Write TUM-format `timestamp tx ty tz qx qy qz qw`."""
    import jax.numpy as jnp

    q = np.asarray(geo.quat_from_rotmat(jnp.asarray(R, jnp.float32)))
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for i in range(len(t)):
            f.write(
                f"{timestamps[i]:.6f} {t[i,0]:.6f} {t[i,1]:.6f} {t[i,2]:.6f} "
                f"{q[i,0]:.6f} {q[i,1]:.6f} {q[i,2]:.6f} {q[i,3]:.6f}\n"
            )


def read_trajectory(
    path: str, skip_lines: int = 0, rebase: bool = False
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read a TUM trajectory -> (R (T,3,3), t (T,3), timestamps (T,)).

    `skip_lines` mirrors loadGTPath's LINES_TO_SKIP (350 for mocap warm-up,
    /root/reference/src/loadGTPath.cpp:101-113); `rebase` re-expresses all
    poses relative to the first kept pose (:125-143).
    """
    import jax.numpy as jnp

    ts_list, t_list, q_list = [], [], []
    kept = 0
    skipped = 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if skipped < skip_lines:
                skipped += 1
                continue
            vals = line.split()
            if len(vals) < 8:
                continue
            ts_list.append(float(vals[0]))
            t_list.append([float(v) for v in vals[1:4]])
            q_list.append([float(v) for v in vals[4:8]])
            kept += 1
    ts = np.asarray(ts_list)
    t = np.asarray(t_list)
    q = np.asarray(q_list)
    R = np.asarray(geo.rotmat_from_quat(jnp.asarray(q, jnp.float32)), np.float64)
    if rebase and len(t):
        from rgbd_odometry_tpu.eval.ate import rebase_to_first

        R, t = rebase_to_first(R, t)
    return R, t, ts


# ----------------------------------------------------------------------
# Dataset association / loading
# ----------------------------------------------------------------------


@dataclass
class TumSequence:
    """An associated TUM RGB-D sequence on disk."""

    root: str
    rgb_files: List[str]
    depth_files: List[str]
    timestamps: np.ndarray

    def __len__(self):
        return len(self.rgb_files)

    def load_frame(self, i: int, half_res: bool = True):
        """Load frame i -> (gray float 0..255, depth_mm float), optionally at
        the reference's half-VGA working resolution
        (/root/reference/src/camTopic2PublisherPyD.cpp:341-345)."""
        import cv2

        rgb = cv2.imread(os.path.join(self.root, self.rgb_files[i]), cv2.IMREAD_GRAYSCALE)
        depth_raw = cv2.imread(os.path.join(self.root, self.depth_files[i]), cv2.IMREAD_UNCHANGED)
        # TUM depth PNGs: uint16, 5000 units per metre -> mm = raw / 5.0
        depth_mm = depth_raw.astype(np.float32) / 5.0
        depth_mm = np.where(depth_mm == 0, 1.0, depth_mm)
        gray = rgb.astype(np.float32)
        if half_res:
            gray = gray[::2, ::2]
            depth_mm = depth_mm[::2, ::2]
        return gray, depth_mm


def _read_file_list(path: str) -> Tuple[np.ndarray, List[str]]:
    ts, files = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = line.split()
            ts.append(float(vals[0]))
            files.append(vals[1])
    return np.asarray(ts), files


def associate(
    ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02
) -> List[Tuple[int, int]]:
    """Greedy nearest-timestamp association (TUM associate.py semantics)."""
    pairs = []
    used_b: set = set()
    j = 0
    for i, ta in enumerate(ts_a):
        j = int(np.searchsorted(ts_b, ta))
        best = None
        for k in (j - 1, j, j + 1):
            if 0 <= k < len(ts_b) and k not in used_b:
                dt = abs(ts_b[k] - ta)
                if dt <= max_dt and (best is None or dt < best[1]):
                    best = (k, dt)
        if best is not None:
            pairs.append((i, best[0]))
            used_b.add(best[0])
    return pairs


def open_sequence(root: str, max_dt: float = 0.02) -> TumSequence:
    """Associate rgb.txt and depth.txt of a TUM sequence directory."""
    ts_rgb, rgb_files = _read_file_list(os.path.join(root, "rgb.txt"))
    ts_depth, depth_files = _read_file_list(os.path.join(root, "depth.txt"))
    pairs = associate(ts_rgb, ts_depth, max_dt)
    return TumSequence(
        root=root,
        rgb_files=[rgb_files[i] for i, _ in pairs],
        depth_files=[depth_files[j] for _, j in pairs],
        timestamps=np.asarray([ts_rgb[i] for i, _ in pairs]),
    )
