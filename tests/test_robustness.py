"""Robustness validation on degraded scenes — the manipulations the
reference's bagManip harness envisions ("add noise, tinker with illumination
etc.", /root/reference/src/bagManip.cpp:1): procedural texture, sensor noise,
and illumination drift, all with exact ground-truth poses."""

import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import build_pyramid
from rgbd_odometry_tpu.io.synthetic import Degradations, degrade_frame, render_pair
from rgbd_odometry_tpu.solvers import edge_dvo

CAM = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)
PSI = np.array([0.012, -0.008, 0.006, 0.004, -0.005, 0.003], np.float32)


def _align(degrade, seed=0, levels=2, method="gauss_newton"):
    (rg, rd), (ng, nd), (R_gt, t_gt) = render_pair(CAM, PSI, seed=seed, degrade=degrade)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), levels)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), levels)
    intr = Intrinsics.from_config(CAM)
    cfg = SolverConfig(method=method, iterations=(15, 8))
    R, t, diags = edge_dvo.align_pair(
        ref.gray, ref.depth, now.gray, intr, cfg, max_points=(4096, 1024)
    )
    return (
        float(jnp.linalg.norm(t - jnp.asarray(t_gt, t.dtype))),
        float(jnp.linalg.norm(R - jnp.asarray(R_gt, R.dtype))),
    )


def test_degradations_change_the_images():
    clean = render_pair(CAM, PSI, seed=0)
    deg = Degradations(texture_amp=25.0, noise_sigma=2.0, illum_gain_per_frame=0.01)
    dirty = render_pair(CAM, PSI, seed=0, degrade=deg)
    assert not np.array_equal(clean[0][0], dirty[0][0])
    # texture is world-anchored: both frames carry it
    assert np.std(dirty[0][0] - clean[0][0]) > 1.0
    # noise is per-frame independent
    d0 = dirty[0][0] - clean[0][0]
    d1 = dirty[1][0] - clean[1][0]
    assert not np.array_equal(d0, d1)


def test_illumination_drift_accumulates():
    g = np.full((40, 50), 100.0, np.float32)
    d = np.full((40, 50), 1000.0, np.float32)
    deg = Degradations(illum_gain_per_frame=0.02, illum_bias_per_frame=1.0)
    g5, _ = degrade_frame(g, d, 5, deg)
    assert abs(float(np.median(g5)) - (100 * 1.1 + 5)) < 1.0


@pytest.mark.parametrize(
    "name,deg,tol_t",
    [
        ("clean", None, 0.01),
        ("texture", Degradations(texture_amp=25.0), 0.015),
        ("noise", Degradations(noise_sigma=2.0), 0.015),
        ("illum", Degradations(illum_gain_per_frame=0.05), 0.015),
        (
            "all",
            Degradations(
                texture_amp=20.0, noise_sigma=1.5, illum_gain_per_frame=0.03
            ),
            0.02,
        ),
    ],
)
def test_edge_dvo_recovers_pose_under_degradation(name, deg, tol_t):
    """Edge alignment is intensity-threshold based, so moderate noise and
    illumination drift must not break pose recovery (Canny gradients scale
    with gain; the DT geometry is unchanged)."""
    t_err, r_err = _align(deg)
    assert t_err < tol_t, f"{name}: t_err {t_err}"
    assert r_err < 2 * tol_t, f"{name}: r_err {r_err}"


def test_depth_noise_degrades_gracefully():
    t_err, r_err = _align(Degradations(depth_noise_mm=10.0))
    assert t_err < 0.03
    assert r_err < 0.03


# ---------------------------------------------------------------------------
# Round-3 TUM/PrimeSense-shaped sensor modeling
# ---------------------------------------------------------------------------


def test_tum_depth_quantization_is_faithful_and_harmless():
    """TUM PNGs store uint16 at 1/5000 m: every depth becomes a 0.2 mm
    multiple, and the 0.1 mm worst-case rounding must not move the pose."""
    (rg, rd), _, _ = render_pair(CAM, PSI, seed=0)
    deg = Degradations(depth_quantize_tum=True)
    _, dq = degrade_frame(rg, rd, 0, deg)
    steps = dq * 5.0
    np.testing.assert_allclose(steps, np.round(steps), atol=1e-3)
    assert np.abs(dq - rd).max() <= 0.1 + 1e-6
    t_err, r_err = _align(deg)
    assert t_err < 0.01 and r_err < 0.02


def test_shadow_holes_and_dropout_blobs_lose_points_not_accuracy():
    """Structured-light shadow bands + dropout blobs zero depth; those pixels
    must flow the real missing-data path (0 -> 1 mm -> rejected by the
    >100 mm gate) and moderate loss must not break pose recovery."""
    deg = Degradations(depth_shadow_px=2, depth_dropout_blobs=6)
    (rg, rd), _, _ = render_pair(CAM, PSI, seed=0, degrade=deg)
    assert (rd == 0).sum() > 100  # holes actually appeared
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 2)
    clean = render_pair(CAM, PSI, seed=0)
    ref_clean = build_pyramid(jnp.asarray(clean[0][0]), jnp.asarray(clean[0][1]), 2)
    intr = Intrinsics.from_config(CAM)
    cfg = SolverConfig(method="gauss_newton", iterations=(15, 8))
    feats = edge_dvo.extract_ref_features(ref.gray, ref.depth, intr, cfg, (4096, 1024))
    feats_clean = edge_dvo.extract_ref_features(
        ref_clean.gray, ref_clean.depth, intr, cfg, (4096, 1024)
    )
    assert int(feats[0].count) < int(feats_clean[0].count)  # points were lost
    t_err, r_err = _align(deg)
    assert t_err < 0.02 and r_err < 0.03


def test_motion_blur_mild_ok():
    t_err, r_err = _align(Degradations(motion_blur_px=3.0))
    assert t_err < 0.02 and r_err < 0.03


def test_combined_tum_sensor_model():
    """The full TUM-shaped stack at once: quantization + shadow holes +
    dropout + noise + mild blur + illumination drift."""
    deg = Degradations(
        depth_quantize_tum=True,
        depth_shadow_px=2,
        depth_dropout_blobs=4,
        noise_sigma=1.5,
        motion_blur_px=2.0,
        illum_gain_per_frame=0.02,
        depth_noise_mm=5.0,
    )
    t_err, r_err = _align(deg)
    assert t_err < 0.025 and r_err < 0.035


def test_failure_triggers_fire_on_catastrophic_depth_loss():
    """The keyframe quality triggers must FIRE when the sensor model turns
    pathological: blanket dropout leaves too few usable edge points, which
    the min_reprojected_pts / visibility triggers exist to catch
    (/root/reference/src/SolveDVO.cpp:2129-2152)."""
    deg = Degradations(
        depth_dropout_blobs=160, depth_dropout_radius_px=14.0, seed=17
    )
    (rg, rd), _, _ = render_pair(CAM, PSI, seed=0, degrade=deg)
    assert (rd == 0).mean() > 0.5  # most depth gone
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 2)
    intr = Intrinsics.from_config(CAM)
    cfg = SolverConfig(method="gauss_newton", iterations=(15, 8))
    feats = edge_dvo.extract_ref_features(ref.gray, ref.depth, intr, cfg, (4096, 1024))
    from rgbd_odometry_tpu.config import KeyframeConfig

    kf = KeyframeConfig()
    assert int(feats[0].count) < 4 * kf.min_reprojected_pts  # starved ref set
    # drive the streaming driver over the degraded pair: the quality
    # triggers must promote a keyframe for a non-periodic reason
    from rgbd_odometry_tpu.config import PipelineConfig, PyramidConfig
    from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry
    from rgbd_odometry_tpu.pipeline.gop import REASON_PERIODIC, REASON_FIRST_FRAME

    pcfg = PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=2, max_points=(4096, 1024)),
        solver=cfg,
        keyframe=KeyframeConfig(
            force_every=50, enable_quality_triggers=True, rollback_resolve=False
        ),
    )
    drv = EdgeDvoOdometry(pcfg)
    frames, _ = _degraded_sequence(deg, n=6)
    for i, (g, d) in enumerate(frames):
        drv.process_frame(g, d, timestamp=i / 30.0)
    reasons = {m.keyframe_reason for m in drv.metrics}
    assert reasons - {0, REASON_FIRST_FRAME, REASON_PERIODIC}, (
        f"no quality trigger fired under catastrophic depth loss: {reasons}"
    )


def _degraded_sequence(deg, n=6):
    from rgbd_odometry_tpu.io.synthetic import render_sequence

    ts = np.arange(n)
    phase = np.sin(np.pi * ts / (n - 1))
    psis = np.stack(
        [0.03 * phase, -0.015 * phase, 0.01 * phase,
         0.008 * phase, -0.006 * phase, 0.004 * phase], -1
    ).astype(np.float32)
    return render_sequence(CAM, psis, seed=0, degrade=deg)
