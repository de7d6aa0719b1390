"""End-to-end streaming odometry tests on a synthetic trajectory.

The integration test the reference only had as a manual launch-file smoke run
(gel.launch + RViz inspection, SURVEY.md section 4): run the full pipeline over
a rendered sequence with exact GT and assert trajectory quality + keyframe
mechanics.
"""

import numpy as np
import pytest

from rgbd_odometry_tpu.config import (
    CameraConfig,
    KeyframeConfig,
    PipelineConfig,
    PyramidConfig,
    SolverConfig,
)
from rgbd_odometry_tpu.eval.ate import ate_rmse, drift_stats, rebase_to_first, rpe
from rgbd_odometry_tpu.io.synthetic import render_sequence
from rgbd_odometry_tpu.pipeline.gop import Gop, REASON_PERIODIC
from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0, cx=79.5, cy=59.5)


def _config(**kw):
    return PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, max_points=(2048, 1024, 512)),
        solver=SolverConfig(method="gauss_newton", iterations=(50, 8, 5)),
        keyframe=KeyframeConfig(**kw),
    )


def _trajectory(n=8, step=0.004):
    """Smooth small-motion camera path (absolute twists)."""
    ts = np.arange(n)
    psis = np.stack(
        [
            0.8 * step * ts,
            -0.5 * step * ts,
            0.3 * step * ts,
            0.15 * step * ts,
            -0.2 * step * ts,
            0.1 * step * ts,
        ],
        axis=-1,
    ).astype(np.float32)
    return psis


def test_gop_composition():
    g = Gop()
    g.push_keyframe(0, 1, np.eye(3), np.zeros(3))
    rel_t = np.array([0.1, 0.0, 0.0])
    g.push_ordinary(1, np.eye(3), rel_t)
    R, t = g.global_pose(1)
    np.testing.assert_allclose(t, rel_t, atol=1e-12)
    # promote frame 1 to keyframe; next relative poses compose from it
    g.update_most_recent_to_keyframe(5)
    g.push_ordinary(2, np.eye(3), rel_t)
    _, t2 = g.global_pose(2)
    np.testing.assert_allclose(t2, 2 * rel_t, atol=1e-12)
    assert g.keyframe_indices() == [0, 1]


def test_streaming_odometry_tracks_gt():
    psis = _trajectory(n=8)
    frames, poses = render_sequence(CAM, psis, seed=0)
    odo = EdgeDvoOdometry(_config())
    for i, (gray, depth) in enumerate(frames):
        odo.process_frame(gray, depth, timestamp=float(i))
    R_est, t_est, ts = odo.trajectory()
    gt_R = np.stack([p[0] for p in poses])
    gt_t = np.stack([p[1] for p in poses])
    err = ate_rmse(t_est, gt_t, align=False)
    # total motion over the sequence:
    motion = np.linalg.norm(gt_t[-1])
    # single-pair pose ambiguity along the scene's weak directions (see
    # test_edge_dvo.py docstring) accumulates into the trajectory; the bound
    # reflects that, not solver sloppiness (reprojection stays sub-pixel).
    # Measured 6.2 mm on this scene (r2); 8 mm leaves ~30% margin.
    assert err < 0.008, f"ATE {err:.4f} vs motion {motion:.4f}"
    # drift stats are finite and sane
    ds = drift_stats(t_est, gt_t)
    assert np.isfinite(ds.mean) and np.isfinite(ds.rms)


def test_keyframe_every_n_and_rollback():
    psis = _trajectory(n=12)
    frames, _ = render_sequence(CAM, psis, seed=1)
    cfg = _config(force_every=5, rollback_resolve=True)
    odo = EdgeDvoOdometry(cfg)
    for i, (gray, depth) in enumerate(frames):
        odo.process_frame(gray, depth, timestamp=float(i))
    # keyframes: frame 0 + promotions at the every-5 cadence
    kf = odo.gop.keyframe_indices()
    assert kf[0] == 0
    assert len(kf) >= 2, f"expected periodic keyframe promotions, got {kf}"
    # rollback happened (promoted frame n-1, reason periodic)
    promoted = [odo.gop.elements[i] for i in kf[1:]]
    assert all(e.reason == REASON_PERIODIC for e in promoted)
    rolled = [m for m in odo.metrics if m.rolled_back]
    assert len(rolled) >= 1


def test_metrics_recorded():
    psis = _trajectory(n=4)
    frames, _ = render_sequence(CAM, psis, seed=2)
    odo = EdgeDvoOdometry(_config())
    for i, (gray, depth) in enumerate(frames):
        odo.process_frame(gray, depth, timestamp=float(i))
    assert len(odo.metrics) == 4
    m = odo.metrics[2]
    assert m.solve_ms > 0 and m.num_points > 50
    assert np.isfinite(m.b_cap) and 0.0 <= m.visible_ratio <= 1.0
    assert m.energy_curve is not None and len(m.energy_curve) == 50
    assert odo.average_solve_ms() > 0


def test_trajectory_io_roundtrip(tmp_path):
    from rgbd_odometry_tpu.io.tum import read_trajectory, write_trajectory

    rng = np.random.default_rng(0)
    from rgbd_odometry_tpu.core import geometry as geo
    import jax.numpy as jnp

    psi = rng.standard_normal((6, 6)).astype(np.float32) * 0.3
    R, t = geo.se3_exp(jnp.asarray(psi))
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    ts = np.arange(6, dtype=np.float64) + 1000.0
    p = str(tmp_path / "traj.txt")
    write_trajectory(p, R, t, ts)
    R2, t2, ts2 = read_trajectory(p)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-5)
    np.testing.assert_allclose(R2, R, atol=1e-4)
    # skip_lines + rebase behave like loadGTPath
    R3, t3, _ = read_trajectory(p, skip_lines=2, rebase=True)
    assert len(t3) == 4
    np.testing.assert_allclose(R3[0], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(t3[0], 0.0, atol=1e-6)


def test_rpe_and_umeyama():
    rng = np.random.default_rng(3)
    from rgbd_odometry_tpu.core import geometry as geo
    import jax.numpy as jnp

    psi = np.cumsum(rng.standard_normal((20, 6)).astype(np.float32) * 0.02, axis=0)
    R, t = geo.se3_exp(jnp.asarray(psi))
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    # a rigidly transformed copy of the same trajectory: ATE(aligned) ~ 0
    R_off, t_off = geo.se3_exp(jnp.asarray(np.array([0.3, -0.2, 0.5, 0.4, 0.1, -0.3], np.float32)))
    t_moved = (np.asarray(R_off, np.float64) @ t.T).T + np.asarray(t_off, np.float64)
    assert ate_rmse(t, t_moved, align=True) < 1e-5
    assert ate_rmse(t, t_moved, align=False) > 0.1
    # RPE of identical trajectories is 0
    tr, rr = rpe(R, t, R, t)
    # rotational RPE of identical f32 rotations: arccos near 1 is sqrt(eps)-
    # conditioned, so ~1e-3 is the float32 floor, not an error
    assert tr < 1e-9 and rr < 5e-3


def test_quality_triggers_fire_on_scene_cut():
    """The reference's disabled-but-present quality triggers
    (/root/reference/src/SolveDVO.cpp:2129-2152) are switchable here: a hard
    scene cut must trip them and promote a keyframe."""
    from rgbd_odometry_tpu.io.synthetic import render_pair

    cfg = PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, max_points=(2048, 1024, 512)),
        solver=SolverConfig(method="gauss_newton", iterations=(15, 5, 3)),
        keyframe=KeyframeConfig(
            force_every=50, enable_quality_triggers=True, laplacian_b_thresh=3.0
        ),
    )
    odo = EdgeDvoOdometry(cfg)
    (g0, d0), (g1, d1), _ = render_pair(
        CAM, np.array([0.004, -0.002, 0.001, 0.001, -0.001, 0.0005], np.float32), seed=0
    )
    odo.process_frame(g0, d0, 0.0)
    odo.process_frame(g1, d1, 1.0)
    # scene cut: a completely different scene -> residuals blow up
    (g_cut, d_cut), _, _ = render_pair(CAM, np.zeros(6, np.float32), seed=9)
    odo.process_frame(g_cut, d_cut, 2.0)
    reasons = [m.keyframe_reason for m in odo.metrics]
    assert any(r in (2, 3, 4) for r in reasons), reasons


def test_fused_pipeline_imu_prior_and_fallback():
    """BASELINE config 5: IMU prior seeds each solve; a scene cut triggers
    the sparse-PnP fallback path."""
    from rgbd_odometry_tpu.io.synthetic import render_sequence
    from rgbd_odometry_tpu.pipeline.fused import FusedConfig, FusedOdometry

    psis = _trajectory(n=6)
    frames, poses = render_sequence(CAM, psis, seed=0)
    cfg = _config()
    fused = FusedOdometry(cfg, FusedConfig(min_pnp_matches=6))
    # constant-rate gyro window consistent with the trajectory step
    for i, (g, d) in enumerate(frames):
        imu_win = (np.zeros((10, 3), np.float32), np.zeros((10, 3), np.float32), 0.01)
        fused.process_frame(g, d, float(i), imu_window=imu_win)
    R_est, t_est, _ = fused.trajectory()
    gt_t = np.stack([p[1] for p in poses])
    err = np.linalg.norm(t_est - gt_t, axis=-1)
    # measured 5.5 mm final error on this scene (r2); 8 mm ~ 45% margin
    assert err[-1] < 0.008, err
    assert len(fused.fallback_frames) == 0  # clean sequence: no fallback


def test_fused_fallback_fires():
    """Force the quality gate (b-hat threshold 0) so every frame falls back
    to the sparse-PnP path; the trajectory must stay sane."""
    from rgbd_odometry_tpu.io.synthetic import render_sequence
    from rgbd_odometry_tpu.pipeline.fused import FusedConfig, FusedOdometry

    psis = _trajectory(n=4)
    frames, poses = render_sequence(CAM, psis, seed=0)
    fused = FusedOdometry(
        _config(),
        FusedConfig(laplacian_b_thresh=0.0, min_pnp_matches=5),
    )
    for i, (g, d) in enumerate(frames):
        fused.process_frame(g, d, float(i))
    assert len(fused.fallback_frames) >= 1, "fallback never fired"
    _, t_est, _ = fused.trajectory()
    gt_t = np.stack([p[1] for p in poses])
    err = np.linalg.norm(t_est - gt_t, axis=-1)
    assert err[-1] < 0.12, err  # sparse path is coarse but not divergent


def test_divergence_guard_rejects_nonfinite():
    """A degenerate frame (all-zero depth -> empty edge set) must not poison
    the trajectory with NaNs; the guard keeps the previous pose and flags."""
    psis = _trajectory(n=3)
    frames, _ = render_sequence(CAM, psis, seed=0)
    odo = EdgeDvoOdometry(_config())
    odo.process_frame(*frames[0], timestamp=0.0)
    odo.process_frame(*frames[1], timestamp=1.0)
    # degenerate frame: constant image, zero depth
    g_bad = np.zeros((120, 160), np.float32)
    d_bad = np.zeros((120, 160), np.float32)
    R, t = odo.process_frame(g_bad, d_bad, timestamp=2.0)
    assert np.isfinite(R).all() and np.isfinite(t).all()
    _, t_all, _ = odo.trajectory()
    assert np.isfinite(t_all).all()


def test_long_sequence_endurance():
    """20-frame run with keyframe churn + mid-run checkpoint/resume: the
    trajectory stays finite and consistent (the gel.launch smoke test with
    assertions, SURVEY.md section 4)."""
    from rgbd_odometry_tpu.utils.checkpoint import load_odometry, save_odometry

    psis = _trajectory(n=20, step=0.002)
    frames, poses = render_sequence(CAM, psis, seed=3)
    cfg = PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, max_points=(2048, 1024, 512)),
        solver=SolverConfig(method="gauss_newton", iterations=(15, 5, 3)),
        keyframe=KeyframeConfig(force_every=4),
    )
    odo = EdgeDvoOdometry(cfg)
    for i, (g, d) in enumerate(frames[:10]):
        odo.process_frame(g, d, float(i))
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "snap.npz")
        save_odometry(odo, p)
        odo = load_odometry(p)
    for i, (g, d) in enumerate(frames[10:], start=10):
        odo.process_frame(g, d, float(i))
    _, t_est, _ = odo.trajectory()
    gt_t = np.stack([p_[1] for p_ in poses])
    assert len(t_est) == 20
    assert np.isfinite(t_est).all()
    err = np.linalg.norm(t_est - gt_t, axis=-1)
    # bounded drift over 20 frames and several keyframe promotions
    # (measured 16.4 mm final / ~11 mm mean on this scene, r2; bounds carry
    # ~50% margin rather than the old 0.5x-of-path-length allowance)
    assert err[-1] < 0.025, err
    assert err.mean() < 0.017, err
    assert len(odo.gop.keyframe_indices()) >= 4


def test_pipelined_stream_matches_sequential_exactly():
    """process_stream (speculative dispatch chained off in-flight device
    outputs, discarded on chain breaks) must produce the IDENTICAL
    trajectory and metrics to the sequential loop — including across the
    periodic keyframe switches + rollback re-solves it speculates through."""
    import jax.numpy as jnp
    from rgbd_odometry_tpu.core.pyramid import build_pyramid

    psis = _trajectory(n=12)
    frames, _ = render_sequence(CAM, psis, seed=0)
    cfg = _config()

    odo_seq = EdgeDvoOdometry(cfg)
    for i, (g, d) in enumerate(frames):
        odo_seq.process_frame(g, d, float(i))

    odo_pipe = EdgeDvoOdometry(cfg)
    pyrs = (
        (build_pyramid(jnp.asarray(g), jnp.asarray(d), cfg.pyramid.num_levels), float(i))
        for i, (g, d) in enumerate(frames)
    )
    poses = list(odo_pipe.process_stream(pyrs))
    assert len(poses) == len(frames)

    R1, t1, _ = odo_seq.trajectory()
    R2, t2, _ = odo_pipe.trajectory()
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(R1, R2)
    # keyframe structure identical (speculation through switches discarded)
    assert odo_seq.gop.keyframe_indices() == odo_pipe.gop.keyframe_indices()
    assert [m.keyframe_reason for m in odo_seq.metrics] == [
        m.keyframe_reason for m in odo_pipe.metrics
    ]
    assert [m.rolled_back for m in odo_seq.metrics] == [
        m.rolled_back for m in odo_pipe.metrics
    ]
    assert [m.frame_num for m in odo_pipe.metrics] == list(range(len(frames)))


def test_old_ref_update_variant():
    """rollback_resolve=False reproduces __OLD__REF_UPDATE
    (/root/reference/src/SolveDVO.cpp:2166-2191): the CURRENT frame becomes
    the keyframe with its estimate kept (no promotion of frame n-1)."""
    psis = _trajectory(n=8)
    frames, _ = render_sequence(CAM, psis, seed=1)
    odo = EdgeDvoOdometry(_config(force_every=3, rollback_resolve=False))
    for i, (g, d) in enumerate(frames):
        odo.process_frame(g, d, float(i))
    kf = odo.gop.keyframe_indices()
    # old variant: keyframes at the trigger frames themselves (3, 6), not n-1
    assert kf[0] == 0 and 3 in kf and 6 in kf, kf
    assert not any(m.rolled_back for m in odo.metrics)
    _, t_est, _ = odo.trajectory()
    assert np.isfinite(t_est).all()
