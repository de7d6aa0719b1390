"""Host-memory bounds for endurance runs (round-5, VERDICT task 9).

Unbounded host growth sources identified in round 4: the per-frame
FrameMetrics list (each record carries an energy curve) and the
relocalizer's keyframe database (slot store doubles forever). Both are now
bounded: `PipelineConfig.metrics_max` turns the metrics log into a ring,
and `RelocalizeConfig.max_keyframes` caps the database with nearest-pose
eviction (coverage-preserving). The reference's own bound is a hard 100k
reserve (/root/reference/src/GOP.cpp:125) with no eviction at all.
"""

import numpy as np

from rgbd_odometry_tpu.config import (
    CameraConfig,
    KeyframeConfig,
    PipelineConfig,
    PyramidConfig,
    RelocalizeConfig,
    SolverConfig,
)
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.io.synthetic import render_sequence
from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry
from rgbd_odometry_tpu.pipeline.relocalize import Relocalizer

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0, cx=79.5, cy=59.5)


def _smooth_psis(n, step=0.004):
    ts = np.arange(n)
    return np.stack(
        [0.8 * step * ts, -0.5 * step * ts, 0.3 * step * ts,
         0.15 * step * ts, -0.2 * step * ts, 0.1 * step * ts], -1
    ).astype(np.float32)


def test_metrics_ring_bounds_host_memory():
    cfg = PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, max_points=(1024, 512, 512)),
        solver=SolverConfig(method="gauss_newton", iterations=(6, 4, 3)),
        keyframe=KeyframeConfig(force_every=4),
        metrics_max=5,
    )
    frames, _ = render_sequence(CAM, _smooth_psis(8), seed=0)
    odo = EdgeDvoOdometry(cfg)
    for i, (g, d) in enumerate(frames):
        odo.process_frame(g, d, float(i))
    assert len(odo.metrics) == 5
    assert odo.metrics[-1].frame_num == 7  # newest retained
    assert odo.metrics[0].frame_num == 3  # oldest aged out
    # the running average keeps working on the window
    assert odo.average_solve_ms() > 0.0
    # round-trip: the knob survives config serialization
    assert PipelineConfig.from_json(cfg.to_json()).metrics_max == 5


def test_per_frame_cost_stays_flat():
    """Steady-state per-frame solve cost must not grow with stream length
    (the endurance criterion; generous 2.5x bound to stay robust to shared
    CI hosts — real growth from accumulating state would be monotonic and
    large). 40 frames, one warm keyframe cycle excluded."""
    cfg = PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, max_points=(1024, 512, 512)),
        solver=SolverConfig(method="gauss_newton", iterations=(6, 4, 3)),
        keyframe=KeyframeConfig(force_every=5),
        relocalize=RelocalizeConfig(
            enabled=True, min_matches=10, min_inliers=8, max_keyframes=4
        ),
    )
    frames, _ = render_sequence(CAM, _smooth_psis(40, step=0.002), seed=1)
    odo = EdgeDvoOdometry(cfg)
    for i, (g, d) in enumerate(frames):
        odo.process_frame(g, d, float(i))
    ms = np.array([m.solve_ms for m in odo.metrics])
    early, late = ms[10:20].mean(), ms[-10:].mean()
    assert late < 2.5 * early, (early, late)
    assert len(odo._reloc) <= 4  # cap held while streaming


def test_reloc_db_cap_evicts_nearest_pose():
    frames, poses = render_sequence(CAM, _smooth_psis(8, step=0.005), seed=0)
    cfg = RelocalizeConfig(
        enabled=True, min_matches=10, min_inliers=8, max_keyframes=2
    )
    reloc = Relocalizer(Intrinsics.from_config(CAM), cfg)
    # frames 0 and 6 are far apart; frame 1 is near frame 0
    for k in (0, 6):
        assert reloc.add_keyframe(frames[k][0], frames[k][1], *poses[k], node=k)
    assert len(reloc) == 2
    assert reloc.add_keyframe(frames[1][0], frames[1][1], *poses[1], node=1)
    # still capped; the entry closest to frame 1 (= frame 0) was evicted,
    # the far keyframe (node 6) survives for coverage
    assert len(reloc) == 2
    assert sorted(n for n in reloc.nodes) == [1, 6]
    assert len(reloc.matcher.stored) == 2  # slot store did not grow
    # recovery still works against the capped database
    res = reloc.relocalize(frames[5][0])
    assert res is not None
    err_mm = 1000 * np.linalg.norm(res.t - poses[5][1])
    assert err_mm < 25.0, err_mm
