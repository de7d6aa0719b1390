"""Constant-velocity warm-start motion model.

The reference's loop() implicitly uses a "hold" model: cR/cT persist across
iterations and the next frame warm-starts from the previous frame's solved
relative pose (/root/reference/src/SolveDVO.cpp:2117-2120). For fast or
accelerating motion a constant-velocity extrapolation D*T0 (D = last
inter-frame motion) is a strictly better prior. These tests pin:

  * the extrapolation algebra in the solver's p_now = R (p_ref - t)
    parameterization against brute-force homogeneous-matrix composition;
  * end-to-end tracking with motion_model="constant_velocity";
  * an accuracy A/B on a large-step constant-velocity path where "hold"
    warm starts are one full inter-frame motion behind;
  * bit-exactness invariants: process_stream == process, and
    checkpoint/resume continuation == uninterrupted run.
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
from rgbd_odometry_tpu.eval.ate import ate_rmse
from rgbd_odometry_tpu.io.synthetic import render_sequence
from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry, cv_extrapolate

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0, cx=79.5, cy=59.5)


def _config(motion_model="constant_velocity", **kw):
    return PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, max_points=(2048, 1024, 512)),
        solver=SolverConfig(method="gauss_newton", iterations=(50, 8, 5)),
        keyframe=KeyframeConfig(**kw),
        motion_model=motion_model,
    )


def _cv_trajectory(n, step):
    """Absolute twists growing linearly -> constant inter-frame velocity."""
    ts = np.arange(n)
    return np.stack(
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


def _hom(R, t):
    """Solver parameterization p_now = R (p_ref - t) as a 4x4 matrix."""
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = -R @ t
    return M


def _rand_pose(rng, scale=0.3):
    # float64 rotation via sign-fixed QR (jax se3_exp would truncate to f32)
    Q, r = np.linalg.qr(rng.standard_normal((3, 3)))
    Q = Q @ np.diag(np.sign(np.diag(r)))
    if np.linalg.det(Q) < 0:
        Q[:, 2] = -Q[:, 2]
    return Q, scale * rng.standard_normal(3)


def test_cv_extrapolate_matches_homogeneous_composition():
    """Rw, tw must equal T0 Tp^-1 T0 computed by brute-force 4x4 algebra."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        R0, t0 = _rand_pose(rng)
        Rp, tp = _rand_pose(rng)
        Rw, tw = cv_extrapolate(R0, t0, Rp, tp)
        M = _hom(R0, t0) @ np.linalg.inv(_hom(Rp, tp)) @ _hom(R0, t0)
        np.testing.assert_allclose(_hom(np.asarray(Rw), np.asarray(tw)), M, atol=1e-10)


def test_cv_extrapolate_degenerates_to_hold():
    """With zero velocity evidence (Tp == T0) the warm start is T0 itself."""
    rng = np.random.default_rng(11)
    R0, t0 = _rand_pose(rng)
    Rw, tw = cv_extrapolate(R0, t0, R0, t0)
    np.testing.assert_allclose(np.asarray(Rw), R0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(tw), t0, atol=1e-12)


def test_constant_velocity_tracks_gt_and_routes():
    """Full pipeline in CV mode: tracks GT within the hold-mode bound and the
    CV step graph actually executes (velocity state is populated)."""
    psis = _cv_trajectory(n=8, step=0.004)
    frames, poses = render_sequence(CAM, psis, seed=0)
    odo = EdgeDvoOdometry(_config())
    n_cv_calls = 0
    inner = odo._step_cv

    def counting(*a):
        nonlocal n_cv_calls
        n_cv_calls += 1
        return inner(*a)

    odo._step_cv = counting
    for i, (gray, depth) in enumerate(frames):
        odo.process_frame(gray, depth, timestamp=float(i))
    _, t_est, _ = odo.trajectory()
    gt_t = np.stack([p[1] for p in poses])
    err = ate_rmse(t_est, gt_t, align=False)
    assert err < 0.008, f"ATE {err:.4f}"
    # every non-bootstrap frame routed through the CV graph
    assert n_cv_calls == len(frames) - 1
    assert odo._prevpose_dev is not None


def test_cv_beats_hold_on_fast_motion():
    """On a large-step constant-velocity path the hold warm start is one full
    inter-frame motion behind; extrapolation must not be less accurate."""
    psis = _cv_trajectory(n=8, step=0.012)
    frames, poses = render_sequence(CAM, psis, seed=3)
    gt_t = np.stack([p[1] for p in poses])
    errs = {}
    for mode in ("hold", "constant_velocity"):
        odo = EdgeDvoOdometry(_config(motion_model=mode))
        for i, (gray, depth) in enumerate(frames):
            odo.process_frame(gray, depth, timestamp=float(i))
        _, t_est, _ = odo.trajectory()
        errs[mode] = ate_rmse(t_est, gt_t, align=False)
    assert np.isfinite(errs["constant_velocity"])
    # equal-or-better with 10% numerical slack (both should converge here;
    # the CV prior starts each solve much closer to the optimum)
    assert errs["constant_velocity"] <= errs["hold"] * 1.10 + 1e-6, errs


def test_cv_streaming_matches_sequential_exactly():
    """process_stream in CV mode is bit-identical to the sequential loop,
    including across the periodic-keyframe chain breaks."""
    import jax.numpy as jnp
    from rgbd_odometry_tpu.core.pyramid import build_pyramid

    psis = _cv_trajectory(n=12, step=0.004)
    frames, _ = render_sequence(CAM, psis, seed=1)
    cfg = _config(force_every=5, rollback_resolve=True)

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
    assert odo_seq.gop.keyframe_indices() == odo_pipe.gop.keyframe_indices()
    assert [m.rolled_back for m in odo_seq.metrics] == [
        m.rolled_back for m in odo_pipe.metrics
    ]


def test_cv_checkpoint_resume_bit_exact(tmp_path):
    """Mid-run save/load in CV mode continues bit-exactly: the velocity state
    (previous relative pose) is saved as exact f32 values."""
    from rgbd_odometry_tpu.utils.checkpoint import load_odometry, save_odometry

    psis = _cv_trajectory(n=10, step=0.004)
    frames, _ = render_sequence(CAM, psis, seed=2)
    cfg = _config(force_every=4, rollback_resolve=True)

    ref = EdgeDvoOdometry(cfg)
    for i, (gray, depth) in enumerate(frames):
        ref.process_frame(gray, depth, timestamp=float(i))

    odo = EdgeDvoOdometry(cfg)
    for i, (gray, depth) in enumerate(frames[:5]):
        odo.process_frame(gray, depth, timestamp=float(i))
    ck = str(tmp_path / "cv.npz")
    save_odometry(odo, ck)
    odo2 = load_odometry(ck)
    assert odo2.cfg.motion_model == "constant_velocity"
    assert odo2._prevpose_dev is not None
    for i, (gray, depth) in enumerate(frames[5:], start=5):
        odo2.process_frame(gray, depth, timestamp=float(i))

    _, t_ref, _ = ref.trajectory()
    _, t_res, _ = odo2.trajectory()
    np.testing.assert_array_equal(t_ref, t_res)


def test_motion_model_validation():
    with pytest.raises(ValueError):
        PipelineConfig(camera=CAM, motion_model="nope")
