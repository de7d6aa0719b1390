"""Loop-trajectory showdown: the compiled upstream binary vs this framework
with loop closure + information-weighted pose-graph refinement, on IDENTICAL
frames.

Scenario: a 40-frame out-and-back trajectory (sine phase 0 -> 1 -> 0,
~120 mm out, ending exactly at the start pose). Frame-to-frame odometry
accumulates drift on the way back; the reference has no mechanism to spend
the revisit — its GOP only composes relative poses forward
(/root/reference/src/GOP.cpp:138-186), so whatever drift exists at the end
IS the answer. Ours detects the revisit between periodic keyframes
(pipeline/loop_closure.py), measures the closure with RANSAC-PnP, and
redistributes the drift with the pose-graph refinement — optionally
whitening every odometry edge by the solver's own 6x6 information
(--weighted-refine).

Metrics vs exact GT (no alignment): full-trajectory ATE and the
return-to-start endpoint error — the loop-closure money metric: the
trajectory ends where it started, so endpoint error IS the accumulated
drift a closure can remove.

Usage: python loop_sweep.py [workdir]
Requires the binary to be buildable (validation/refbuild/build.sh).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

N_FRAMES = 40
AMP = 0.12


def _phase(kind: str) -> "np.ndarray":
    ts = np.arange(N_FRAMES)
    if kind == "outback":
        return np.sin(np.pi * ts / (N_FRAMES - 1))  # 0 -> 1 -> 0: out and back
    # multi-revisit: passes through the start pose three times
    return np.abs(np.sin(3 * np.pi * ts / (N_FRAMES - 1)))


def main(work: str, kind: str = "outback") -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/rgbd_odometry_tpu_test_cache")

    from rgbd_odometry_tpu.cli import main as cli
    from rgbd_odometry_tpu.config import CameraConfig
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.eval.ate import ate_rmse
    from rgbd_odometry_tpu.io.calib import write_freiburg_pair
    from rgbd_odometry_tpu.io.synthetic import render_sequence
    from rgbd_odometry_tpu.io.tum import read_trajectory
    from rgbd_odometry_tpu.io.xml_dump import write_frame_dump
    import jax.numpy as jnp

    cam = CameraConfig()
    xml = os.path.join(work, "xml")
    rundir = os.path.join(work, "run")
    os.makedirs(os.path.join(rundir, "poses"), exist_ok=True)
    os.makedirs(xml, exist_ok=True)

    phase = _phase(kind)
    psis = np.stack(
        [AMP * phase, -0.5 * AMP * phase, 0.3 * AMP * phase,
         0.2 * AMP * phase, -0.2 * AMP * phase, 0.1 * AMP * phase], -1
    ).astype(np.float32)
    frames, poses = render_sequence(cam, psis, seed=0)
    t_gt = np.stack([p[1] for p in poses])

    calib = write_freiburg_pair(xml, CameraConfig(
        width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5))[1]
    for i, (g, d) in enumerate(frames):
        pyr = build_pyramid(jnp.asarray(g), jnp.asarray(d), 4)
        write_frame_dump(xml, i, [np.asarray(x) for x in pyr.gray],
                         [np.asarray(x) for x in pyr.depth])

    r = subprocess.run(
        [os.path.join(HERE, "build.sh"), xml, "0", str(N_FRAMES - 1), "1", work],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    res = subprocess.run([os.path.join(work, "ref_dvo"), calib], cwd=rundir,
                         capture_output=True, text=True, timeout=600)
    row = {"kind": kind, "n_frames": N_FRAMES, "path_out_mm": round(
        1000 * float(np.linalg.norm(t_gt, axis=-1).max()), 1)}
    if res.returncode != 0:
        row["binary_crash"] = (f"exit {res.returncode}: " + (
            res.stderr.strip().splitlines() or ["?"])[-1][:160])
    est_path = os.path.join(rundir, "poses", "estPoses.txt")
    ts_est = {}
    if os.path.exists(est_path) and os.path.getsize(est_path) > 0:
        t_ref = np.loadtxt(est_path, ndmin=2)[:, 4:]
        ts_est["reference_binary"] = np.vstack([np.zeros((1, 3)), t_ref])

    runs = {
        "mine_parity": ["--method", "subgradient", "--iterations", "50,50,50,50"],
        "mine_lm": ["--method", "gauss_newton", "--iterations", "18,6,4,3"],
        # the DEFAULT --loop-close path: rigid re-anchoring (r5)
        "mine_lm_loop": ["--method", "gauss_newton", "--iterations", "18,6,4,3",
                         "--loop-close"],
        # the r3/r4 behavior, kept for the record: pose-graph smearing
        "mine_lm_loop_graph": ["--method", "gauss_newton", "--iterations",
                               "18,6,4,3", "--loop-close", "--refine-mode", "graph"],
        "mine_lm_loop_weighted": ["--method", "gauss_newton", "--iterations",
                                  "18,6,4,3", "--loop-close", "--weighted-refine"],
    }
    closures = {}
    for name, extra in runs.items():
        out = os.path.join(rundir, name + ".txt")
        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            cli(["dvo", "--source", f"xml:{xml}", "--out", out] + extra)
        m = re.search(r"loop closures: (\d+)", err.getvalue())
        if m:
            closures[name] = int(m.group(1))
        ts_est[name] = read_trajectory(out)[1]

    for name, t in ts_est.items():
        k = min(len(t), N_FRAMES)
        ent = {
            "full_ate_mm": round(1000 * float(
                ate_rmse(t[:k], t_gt[:k], align=False)), 2),
            "endpoint_err_mm": round(1000 * float(
                np.linalg.norm(t[k - 1] - t_gt[k - 1])), 2),
        }
        if name in closures:
            ent["loop_closures"] = closures[name]
        row[name] = ent

    # ---- map consistency (library-level, same frames): does the refined
    # trajectory place the fused keyframe edge clouds closer to where exact
    # GT places them? (viz/pointcloud.map_consistency_error: the clouds are
    # exact geometry in keyframe coordinates, so all map error is pose error)
    from rgbd_odometry_tpu.config import PipelineConfig, SolverConfig
    from rgbd_odometry_tpu.pipeline.loop_closure import LoopCloser
    from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry
    from rgbd_odometry_tpu.viz.pointcloud import map_consistency_error

    odo = EdgeDvoOdometry(PipelineConfig(
        camera=cam,
        solver=SolverConfig(method="gauss_newton", iterations=(18, 6, 4, 3)),
    ))
    lc = LoopCloser(odo.intr)
    clouds = []
    for i, (g, d) in enumerate(frames):
        odo.process_frame(g, d, timestamp=float(i))
        if odo.metrics[-1].keyframe_reason != 0:
            clouds.append(odo.keyframe_cloud())
            lc.add_keyframe(odo.metrics[-1].frame_num, g, d)
    R_o, t_o, _ = odo.trajectory()
    gt_R = np.stack([p[0] for p in poses])
    R_f, t_f, _ = lc.refine(R_o, t_o)
    row["map_consistency_mm"] = {
        "keyframes": len(clouds),
        "points": int(sum(len(p) for p, _ in clouds)),
        "odometry": round(1000 * map_consistency_error(
            clouds, R_o, t_o, gt_R, t_gt), 2),
        "loop_refined": round(1000 * map_consistency_error(
            clouds, R_f, t_f, gt_R, t_gt), 2),
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/loop_sweep"
    kinds = sys.argv[2].split(",") if len(sys.argv) > 2 else ["outback", "revisit3"]
    for k in kinds:
        main(os.path.join(wd, k), kind=k)
