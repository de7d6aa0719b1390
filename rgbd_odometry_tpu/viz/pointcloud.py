"""Point-cloud export — `publishCurrentPointCloud`'s role without RViz.

The reference publishes the current frame's back-projected cloud to RViz
(/root/reference/src/MentisVisualHandle.cpp:101-144; the accumulated
full-cloud variant is commented out :392-476). Here: back-project a frame
(optionally transformed by a global pose), and write standard ASCII PLY for
any viewer.
"""

from __future__ import annotations

import numpy as np


def frame_to_cloud(
    gray: np.ndarray,
    depth_mm: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    R: np.ndarray | None = None,
    t: np.ndarray | None = None,
    stride: int = 1,
    min_depth_mm: float = 100.0,
    max_depth_mm: float = 10000.0,
):
    """(points (N,3) metres in the world frame, intensities (N,))."""
    g = np.asarray(gray)[::stride, ::stride]
    d = np.asarray(depth_mm)[::stride, ::stride]
    h, w = d.shape
    ys, xs = np.meshgrid(np.arange(h) * stride, np.arange(w) * stride, indexing="ij")
    valid = (d > min_depth_mm) & (d < max_depth_mm)
    z = d[valid] / 1000.0
    x = z * (xs[valid] - cx) / fx
    y = z * (ys[valid] - cy) / fy
    pts = np.stack([x, y, z], -1)
    if R is not None:
        pts = pts @ np.asarray(R).T + (np.zeros(3) if t is None else np.asarray(t))
    return pts, g[valid]


def write_ply(path: str, points: np.ndarray, intensities: np.ndarray | None = None):
    """ASCII PLY writer (positions + optional gray color)."""
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if intensities is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if intensities is not None:
            c = np.clip(np.asarray(intensities), 0, 255).astype(int)
            for p, ci in zip(points, c):
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {ci} {ci} {ci}\n")
        else:
            for p in points:
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
