"""Native C++ frame loader: decode parity vs OpenCV + threaded streaming."""

import os

import cv2
import numpy as np
import pytest

from rgbd_odometry_tpu.io import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(), reason="native lib build failed")


def _write_tum_pair(tmp_path, i, rng, w=64, h=48):
    rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    depth16 = rng.integers(0, 20000, (h, w), dtype=np.uint16)
    depth16[0, 0] = 0  # invalid-depth pixel for the sanitize check
    gp = str(tmp_path / f"rgb_{i}.png")
    dp = str(tmp_path / f"depth_{i}.png")
    cv2.imwrite(gp, rgb[:, :, ::-1])  # imwrite takes BGR
    cv2.imwrite(dp, depth16)
    return rgb, depth16, gp, dp


def test_decode_gray_matches_opencv(tmp_path, rng):
    rgb, _, gp, _ = _write_tum_pair(tmp_path, 0, rng)
    out = nl.decode_png_gray(open(gp, "rb").read(), 64, 48)
    ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    # both use BT.601 with round-half; allow 1-level rounding skew
    assert np.abs(out - ref).max() <= 1.0
    assert (np.abs(out - ref) > 0.51).mean() < 0.01


def test_decode_depth_matches_convention(tmp_path, rng):
    _, depth16, _, dp = _write_tum_pair(tmp_path, 0, rng)
    out = nl.decode_png_depth16(open(dp, "rb").read(), 64, 48)
    expected = depth16.astype(np.float32) / 5.0
    expected[depth16 == 0] = 1.0
    np.testing.assert_allclose(out, expected, atol=1e-3)


def test_threaded_loader_in_order(tmp_path, rng):
    entries = []
    expected = []
    for i in range(7):
        rgb, depth16, gp, dp = _write_tum_pair(tmp_path, i, rng)
        entries.append((float(i) * 0.1, gp, dp))
        expected.append((rgb, depth16))
    loader = nl.NativeTumLoader(entries, 64, 48, queue_depth=2, workers=3)
    assert len(loader) == 7
    frames = list(loader.frames())
    loader.close()
    assert len(frames) == 7
    for i, (gray, depth, ts) in enumerate(frames):
        assert ts == pytest.approx(i * 0.1)
        ref_gray = cv2.cvtColor(expected[i][0], cv2.COLOR_RGB2GRAY).astype(np.float32)
        assert np.abs(gray - ref_gray).max() <= 1.0
        ref_d = expected[i][1].astype(np.float32) / 5.0
        ref_d[expected[i][1] == 0] = 1.0
        np.testing.assert_allclose(depth, ref_d, atol=1e-3)
