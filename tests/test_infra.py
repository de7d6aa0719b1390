"""Tests for viz, stream sources, feeder, checkpoint/resume, tracing."""

import numpy as np
import pytest

from rgbd_odometry_tpu.config import (
    CameraConfig,
    KeyframeConfig,
    PipelineConfig,
    PyramidConfig,
    SolverConfig,
)

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0, cx=79.5, cy=59.5)


def _config():
    return PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, max_points=(2048, 1024, 512)),
        solver=SolverConfig(method="gauss_newton", iterations=(20, 6, 4)),
        keyframe=KeyframeConfig(force_every=5),
    )


def test_colormaps():
    from rgbd_odometry_tpu.viz.colormap import apply_colormap, depth_false_color, jet

    t = jet(64)
    assert t.shape == (64, 3) and t.min() >= 0 and t.max() <= 255
    img = apply_colormap(np.random.rand(10, 12))
    assert img.shape == (10, 12, 3) and img.dtype == np.uint8
    d = depth_false_color(np.random.rand(10, 12) * 4000)
    assert d.shape == (10, 12, 3)


def test_overlays_and_plots():
    from rgbd_odometry_tpu.viz.overlay import (
        energy_plot,
        overlay_mask,
        overlay_points,
        residue_heatmap,
        trajectory_plot,
    )

    gray = np.random.rand(40, 60) * 255
    mask = np.zeros((40, 60), bool)
    mask[10:12, 20:30] = True
    img = overlay_mask(gray, mask, (255, 0, 0))
    assert (img[11, 25] == [255, 0, 0]).all()
    uv = np.array([[5.0, 7.0], [30.0, 20.0]])
    img = overlay_points(gray, uv)
    assert (img[7, 5] == [0, 255, 0]).all()
    img = residue_heatmap(gray, uv, np.array([1.0, 5.0]))
    assert img.shape == (40, 60, 3)
    e = np.concatenate([np.linspace(100, 10, 30), np.zeros(20)])
    img = energy_plot(e, best_iter=29)
    assert img.shape == (200, 400, 3)
    t_est = np.cumsum(np.random.randn(20, 3) * 0.01, 0)
    img = trajectory_plot(t_est, t_est + 0.005, keyframes=[0, 10], reasons=[1, 5])
    assert img.shape == (400, 400, 3)


def test_synthetic_camera_and_skip():
    from rgbd_odometry_tpu.io.stream import SyntheticCamera, skip_frames

    cam = SyntheticCamera(CAM, num_frames=8)
    frames = list(cam.frames())
    assert len(frames) == 8
    g, d, ts = frames[3]
    assert g.shape == (120, 160) and d.shape == (120, 160)
    assert ts == pytest.approx(0.1)
    skipped = list(skip_frames(iter(frames), skip=3))
    assert len(skipped) == 3  # frames 0, 3, 6


def test_preprocess_vga():
    from rgbd_odometry_tpu.io.stream import preprocess_vga

    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
    depth_m = rng.uniform(0.5, 3.0, (240, 320)).astype(np.float32)
    depth_m[0, 0] = 0.0
    cam_vga = CameraConfig(width=320, height=240, fx=260, fy=260, cx=159.5, cy=119.5)
    g, d = preprocess_vga(rgb, depth_m, cam_vga)
    assert g.shape == (120, 160) and d.shape == (120, 160)
    assert d[0, 0] == 1.0  # zero-depth sanitized
    assert d.max() <= 3000.0 + 1


def test_feeder_prefetches_in_order():
    from rgbd_odometry_tpu.io.stream import SyntheticCamera
    from rgbd_odometry_tpu.pipeline.feeder import FrameFeeder

    cam = SyntheticCamera(CAM, num_frames=5)
    feeder = FrameFeeder(cam.frames(), num_levels=3, depth=2)
    items = list(feeder)
    assert len(items) == 5
    ts = [t for _, t in items]
    assert ts == sorted(ts)
    pyr, _ = items[0]
    assert pyr.gray[0].shape == (120, 160) and pyr.gray[2].shape == (30, 40)


def test_feeder_propagates_errors():
    from rgbd_odometry_tpu.pipeline.feeder import FrameFeeder

    def bad_source():
        yield np.zeros((120, 160), np.float32), np.ones((120, 160), np.float32), 0.0
        raise RuntimeError("sensor died")

    feeder = FrameFeeder(bad_source(), num_levels=2)
    next(feeder)
    with pytest.raises(RuntimeError, match="sensor died"):
        next(feeder)


def test_checkpoint_resume_bitexact(tmp_path):
    from rgbd_odometry_tpu.io.stream import SyntheticCamera
    from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry
    from rgbd_odometry_tpu.utils.checkpoint import load_odometry, save_odometry

    cam = SyntheticCamera(CAM, num_frames=8)
    frames = list(cam.frames())

    # run A: all 8 frames straight through
    odo_a = EdgeDvoOdometry(_config())
    for g, d, ts in frames:
        odo_a.process_frame(g, d, ts)

    # run B: 4 frames, checkpoint, resume, 4 more
    odo_b = EdgeDvoOdometry(_config())
    for g, d, ts in frames[:4]:
        odo_b.process_frame(g, d, ts)
    p = str(tmp_path / "snap.npz")
    save_odometry(odo_b, p)
    odo_c = load_odometry(p)
    for g, d, ts in frames[4:]:
        odo_c.process_frame(g, d, ts)

    Ra, ta, _ = odo_a.trajectory()
    Rc, tc, _ = odo_c.trajectory()
    assert len(ta) == len(tc) == 8
    np.testing.assert_allclose(tc, ta, atol=1e-6)
    np.testing.assert_allclose(Rc, Ra, atol=1e-6)
    assert odo_c.gop.keyframe_indices() == odo_a.gop.keyframe_indices()


def test_tracer():
    import jax.numpy as jnp

    from rgbd_odometry_tpu.utils.tracing import Tracer

    tr = Tracer()
    with tr.stage("warm"):
        x = jnp.ones((64, 64)) * 2

    @tr.timed("matmul")
    def mm():
        return jnp.ones((32, 32)) @ jnp.ones((32, 32))

    mm()
    mm()
    rep = tr.report()
    assert rep["matmul"]["count"] == 2
    assert rep["warm"]["mean_ms"] >= 0
    assert "matmul" in tr.dump()


def test_pointcloud_export(tmp_path):
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.viz.pointcloud import frame_to_cloud, write_ply

    (g, d), _, _ = render_pair(CAM, np.zeros(6, np.float32))
    pts, inten = frame_to_cloud(g, d, CAM.fx, CAM.fy, CAM.cx, CAM.cy, stride=4)
    assert pts.shape[1] == 3 and len(pts) == len(inten) and len(pts) > 100
    assert pts[:, 2].min() > 0.1  # all in front of the camera
    p = str(tmp_path / "cloud.ply")
    write_ply(p, pts, inten)
    head = open(p).read(200)
    assert "element vertex" in head


def test_tum_source_roundtrip(tmp_path):
    """On-disk TUM directory: association + loading through both the native
    C++ loader and the cv2 fallback give the same frames."""
    import cv2

    rng = np.random.default_rng(0)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, depth_lines = [], []
    for i in range(4):
        t = 100.0 + i / 30.0
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        d16 = rng.integers(100, 20000, (480, 640), dtype=np.uint16)
        cv2.imwrite(str(tmp_path / "rgb" / f"{t:.6f}.png"), img)
        cv2.imwrite(str(tmp_path / "depth" / f"{t:.6f}.png"), d16)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines))
    (tmp_path / "depth.txt").write_text("\n".join(depth_lines))

    from rgbd_odometry_tpu.io.stream import TumSource

    native = list(TumSource(str(tmp_path), native=True).frames())
    fallback = list(TumSource(str(tmp_path), native=False).frames())
    assert len(native) == len(fallback) == 4
    for (g1, d1, t1), (g2, d2, t2) in zip(native, fallback):
        assert t1 == pytest.approx(t2)
        assert g1.shape == g2.shape == (240, 320)
        # BT.601 gray conversions may differ by 1 rounding level
        assert np.abs(g1 - g2).max() <= 1.0
        np.testing.assert_allclose(d1, d2, atol=1e-3)


def test_residual_histogram_plot():
    from rgbd_odometry_tpu.pipeline.odometry import residual_histogram
    from rgbd_odometry_tpu.viz.overlay import residual_histogram_plot

    rng = np.random.default_rng(0)
    eps = np.abs(rng.laplace(0, 3.0, 2000)).astype(np.float32)
    h = residual_histogram(eps, np.ones(2000, bool))
    assert h.shape == (260,) and h.sum() == pytest.approx(1.0)
    img = residual_histogram_plot(h, b_cap=float(np.mean(eps)))
    assert img.shape == (250, 520, 3)
