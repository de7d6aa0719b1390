"""Fused semi-dense map export (viz/pointcloud.compose_map +
EdgeDvoOdometry.keyframe_cloud + `dvo --map-out`).

The reference sketched an accumulated full-cloud map and commented it out
(/root/reference/src/MentisVisualHandle.cpp:392-476). Here the map is built
from each keyframe's already-extracted edge cloud composed through the
global trajectory; since those clouds are exact geometry in keyframe
coordinates (straight from the rendered depth), ALL map error is pose
error — `map_consistency_error` measures exactly that.
"""

import numpy as np

from rgbd_odometry_tpu.config import (
    CameraConfig,
    KeyframeConfig,
    PipelineConfig,
    PyramidConfig,
    SolverConfig,
)
from rgbd_odometry_tpu.io.synthetic import render_sequence
from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry
from rgbd_odometry_tpu.viz.pointcloud import (
    compose_map,
    map_consistency_error,
    write_ply,
)

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0, cx=79.5, cy=59.5)


def _config(**kw):
    return PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, max_points=(2048, 1024, 512)),
        solver=SolverConfig(method="gauss_newton", iterations=(50, 8, 5)),
        keyframe=KeyframeConfig(**kw),
    )


def _trajectory(n=10, step=0.004):
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


def test_map_consistency_tracks_pose_error(tmp_path):
    psis = _trajectory(n=10)
    frames, poses = render_sequence(CAM, psis, seed=0)
    odo = EdgeDvoOdometry(_config(force_every=4))
    clouds = []
    for i, (gray, depth) in enumerate(frames):
        odo.process_frame(gray, depth, timestamp=float(i))
        if odo.metrics[-1].keyframe_reason != 0:
            clouds.append(odo.keyframe_cloud())

    assert len(clouds) >= 2  # frame 0 + periodic promotions
    nodes = [n for _, n in clouds]
    assert nodes[0] == 0 and nodes == sorted(nodes)
    assert all(len(p) > 100 and p.shape[1] == 3 for p, _ in clouds)

    R_est, t_est, _ = odo.trajectory()
    gt_R = np.stack([p[0] for p in poses])
    gt_t = np.stack([p[1] for p in poses])

    # estimated-pose map vs GT-pose map: bounded by trajectory accuracy
    # (test_pipeline.py pins ATE < 8 mm on this scene/config)
    err = map_consistency_error(clouds, R_est, t_est, gt_R, gt_t)
    assert err < 0.010, f"map consistency {err*1000:.2f} mm"

    # the metric has teeth: a corrupted trajectory shows up at its own scale
    t_bad = t_est.copy()
    t_bad[len(t_bad) // 2 :] += np.array([0.05, 0.0, 0.0])
    err_bad = map_consistency_error(clouds, R_est, t_bad, gt_R, gt_t)
    assert err_bad > 5 * err

    # compose + PLY roundtrip sanity
    pts, ids = compose_map(clouds, R_est, t_est)
    assert len(pts) == sum(len(p) for p, _ in clouds)
    assert set(np.unique(ids)) == set(nodes)
    # map points live on the synthetic scene's depth range (plane at 2.5 m,
    # billboards >= 1.1 m), expressed in the world (= frame-0 camera) frame
    assert pts[:, 2].min() > 0.9 and pts[:, 2].max() < 3.0
    ply = tmp_path / "map.ply"
    write_ply(str(ply), pts)
    head = ply.read_text().splitlines()
    assert head[0] == "ply" and f"element vertex {len(pts)}" in head[2]
