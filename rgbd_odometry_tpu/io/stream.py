"""Frame sources and stream manipulation: the ingest layer without ROS.

Replaces the reference's sensor/ingest constellation (SURVEY.md L0-L1):
  * `PrimeSenseCam` (/root/reference/src/PrimeSenseCam.cpp): a 640x480@30
    RGB-D source with start()/retrieve semantics -> the `FrameSource`
    protocol here, with a `SyntheticCamera` standing in for live hardware
    (no OpenNI device exists in a TPU pod) and `TumSource` replaying
    datasets (the rosbag path, gel.launch:4-10),
  * the publisher nodes' preprocessing (undistort, half-res, gray,
    /root/reference/src/publisher.cpp:64-170, publisherPyD.cpp:122-291) ->
    `preprocess_vga`,
  * `bagManip`'s frame-skip robustness harness (every SKIP=5th frame
    republished, /root/reference/src/bagManip.cpp:17-69) -> `skip_frames`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Protocol, Tuple

import numpy as np

from rgbd_odometry_tpu.config import CameraConfig


class FrameSource(Protocol):
    """A stream of (gray level-0, depth_mm level-0, timestamp) frames."""

    def frames(self) -> Iterator[Tuple[np.ndarray, np.ndarray, float]]: ...


@dataclass
class SyntheticCamera:
    """Deterministic synthetic RGB-D stream along a smooth trajectory —
    the `PrimeSenseCam` role for environments without a sensor.

    `degrade` applies texture / sensor-noise / illumination-drift
    manipulations (io.synthetic.Degradations — the bagManip robustness
    harness's envisioned fixtures, /root/reference/src/bagManip.cpp:1)."""

    camera: CameraConfig
    num_frames: int = 30
    fps: float = 30.0
    seed: int = 0
    step: float = 0.003
    degrade: object = None  # Optional[io.synthetic.Degradations]

    def frames(self):
        from rgbd_odometry_tpu.io.synthetic import render_sequence

        ts = np.arange(self.num_frames)
        psis = np.stack(
            [
                0.8 * self.step * ts,
                -0.5 * self.step * ts,
                0.3 * self.step * ts,
                0.15 * self.step * ts,
                -0.2 * self.step * ts,
                0.1 * self.step * ts,
            ],
            axis=-1,
        ).astype(np.float32)
        frames, _ = render_sequence(
            self.camera, psis, seed=self.seed, degrade=self.degrade
        )
        for i, (gray, depth) in enumerate(frames):
            yield gray, depth, i / self.fps

    def ground_truth(self):
        from rgbd_odometry_tpu.core import geometry as geo
        import jax.numpy as jnp

        ts = np.arange(self.num_frames)
        psis = np.stack(
            [
                0.8 * self.step * ts,
                -0.5 * self.step * ts,
                0.3 * self.step * ts,
                0.15 * self.step * ts,
                -0.2 * self.step * ts,
                0.1 * self.step * ts,
            ],
            axis=-1,
        ).astype(np.float32)
        R, t = geo.se3_exp(jnp.asarray(psis))
        return np.asarray(R, np.float64), np.asarray(t, np.float64)


@dataclass
class TumSource:
    """Replay a TUM RGB-D sequence directory (the rosbag + converter path).

    With `native=True` (default) PNG decode runs in the C++ worker pool
    (rgbd_odometry_tpu.io.native_loader) off the GIL; falls back to cv2.
    """

    root: str
    half_res: bool = True
    start: int = 0
    end: Optional[int] = None
    native: bool = True
    vga_size: Tuple[int, int] = (640, 480)

    def frames(self):
        import os

        from rgbd_odometry_tpu.io.tum import open_sequence

        seq = open_sequence(self.root)
        end = len(seq) if self.end is None else min(self.end, len(seq))
        if self.native:
            from rgbd_odometry_tpu.io import native_loader as nl

            if nl.available():
                entries = [
                    (
                        float(seq.timestamps[i]),
                        os.path.join(self.root, seq.rgb_files[i]),
                        os.path.join(self.root, seq.depth_files[i]),
                    )
                    for i in range(self.start, end)
                ]
                w, h = self.vga_size
                loader = nl.NativeTumLoader(entries, w, h)
                try:
                    for gray, depth, ts in loader.frames():
                        if self.half_res:
                            gray, depth = gray[::2, ::2], depth[::2, ::2]
                        yield gray, depth, ts
                finally:
                    loader.close()
                return
        for i in range(self.start, end):
            gray, depth = seq.load_frame(i, half_res=self.half_res)
            yield gray, depth, float(seq.timestamps[i])


def skip_frames(source_iter, skip: int = 5):
    """Keep every `skip`-th frame — `bagManip`'s robustness fixture
    (/root/reference/src/bagManip.cpp:17-53, SKIP=5)."""
    for i, item in enumerate(source_iter):
        if i % skip == 0:
            yield item


def preprocess_vga(rgb_vga: np.ndarray, depth_vga_m: np.ndarray, cam_vga: CameraConfig):
    """The converter-node preprocessing chain
    (/root/reference/src/camTopic2PublisherPyD.cpp:45-117,:339-347):
    float-metres depth -> uint16-like mm with 0->1, optional undistortion,
    gray conversion, half-res base level. Returns (gray0, depth0_mm)."""
    import jax.numpy as jnp

    from rgbd_odometry_tpu.core.camera import remap_bilinear, undistort_map
    from rgbd_odometry_tpu.core.pyramid import downsample_nearest, rgb_to_gray, sanitize_depth

    depth_mm = np.where(depth_vga_m > 0, depth_vga_m * 1000.0, 0.0).astype(np.float32)
    gray = rgb_to_gray(jnp.asarray(rgb_vga, jnp.float32)) if rgb_vga.ndim == 3 else jnp.asarray(
        rgb_vga, jnp.float32
    )
    depth = sanitize_depth(jnp.asarray(depth_mm))
    if any(abs(d) > 0 for d in cam_vga.distortion):
        grid = undistort_map(cam_vga)
        gray = remap_bilinear(gray, grid)
        depth = remap_bilinear(depth, grid)
    return (
        np.asarray(downsample_nearest(gray, 2)),
        np.asarray(downsample_nearest(depth, 2)),
    )
