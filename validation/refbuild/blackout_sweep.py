"""Blackout + teleport recovery race: the compiled upstream binary vs our
parity mode vs production LM vs production LM with --relocalize, on
IDENTICAL frames.

Scenario: 12 tracked frames, 3 blank frames (sensor blackout — NOTE a blank
frame min-max normalizes to an all-zero distance transform, so BOTH
implementations see zero-residual "perfect" tracking during the blackout
itself; that is reference-faithful behavior), then 8 frames teleported back
near the start of the path. The reference has NO recovery path
(/root/reference/src/SolveDVO.cpp:2122-2160 keeps re-seating keyframes,
nothing ever re-anchors the pose); ours re-anchors against the keyframe
appearance database (pipeline/relocalize.py).

Metrics: unaligned ATE vs exact GT over the POST-TELEPORT tail (the frames
a recovery can fix) and over the full sequence. If the binary crashes on
the degenerate blank frames (empty edge set -> 0-size Eigen reductions),
the crash and any partial trajectory are recorded honestly.

Usage: python blackout_sweep.py [workdir]
Requires the binary to be buildable (validation/refbuild/build.sh).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

N_TRACK = 12
N_BLANK = 3
N_POST = 8


def main(work: str) -> dict:
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

    def lin_psis(n, step, t0=0):
        ts = np.arange(t0, t0 + n, dtype=np.float32)
        return (step * np.stack(
            [0.8 * ts, -0.5 * ts, 0.3 * ts, 0.15 * ts, -0.2 * ts, 0.1 * ts], -1
        )).astype(np.float32)

    psis_a = lin_psis(N_TRACK, 0.006)          # walks ~65 mm out
    psis_b = lin_psis(N_POST, 0.002)           # teleported back near origin
    frames_a, poses_a = render_sequence(cam, psis_a, seed=0)
    frames_b, poses_b = render_sequence(cam, psis_b, seed=0)
    blank = (np.zeros((cam.height, cam.width), np.float32),
             np.zeros((cam.height, cam.width), np.float32))
    seq = list(frames_a) + [blank] * N_BLANK + list(frames_b)
    n_frames = len(seq)
    t_gt_post = np.stack([p[1] for p in poses_b])

    calib = write_freiburg_pair(xml, CameraConfig(
        width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5))[1]
    for i, (g, d) in enumerate(seq):
        pyr = build_pyramid(jnp.asarray(g), jnp.asarray(d), 4)
        write_frame_dump(xml, i, [np.asarray(x) for x in pyr.gray],
                         [np.asarray(x) for x in pyr.depth])

    def run_binary(env_extra=None):
        env = dict(os.environ, **(env_extra or {}))
        r = subprocess.run(
            [os.path.join(HERE, "build.sh"), xml, "0", str(n_frames - 1),
             "1", work], capture_output=True, text=True, timeout=300, env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        return subprocess.run([os.path.join(work, "ref_dvo"), calib],
                              cwd=rundir, capture_output=True, text=True,
                              timeout=600)

    binary_note = None
    res = run_binary()
    if res.returncode != 0:
        binary_note = ("assertion build crashed: "
                       + (res.stderr.strip().splitlines()
                          or [f"exit {res.returncode}"])[-1][:160]
                       + " -- retried NDEBUG")
        res = run_binary({"NDEBUG": "1"})
    est_path = os.path.join(rundir, "poses", "estPoses.txt")
    t_ref, ref_crash = None, None
    if res.returncode != 0:
        ref_crash = (f"exit {res.returncode}: "
                     + (res.stderr.strip().splitlines() or ["?"])[-1][:160])
    if os.path.exists(est_path) and os.path.getsize(est_path) > 0:
        t_ref = np.loadtxt(est_path, ndmin=2)[:, 4:]

    outs = {
        "mine_parity": ["--method", "subgradient", "--iterations", "50,50,50,50"],
        "mine_lm": ["--method", "gauss_newton", "--iterations", "18,6,4,3"],
        "mine_lm_reloc": ["--method", "gauss_newton", "--iterations",
                          "18,6,4,3", "--relocalize"],
    }
    ts_est = {}
    for name, extra in outs.items():
        out = os.path.join(rundir, name + ".txt")
        cli(["dvo", "--source", f"xml:{xml}", "--out", out] + extra)
        ts_est[name] = read_trajectory(out)[1]
    if t_ref is not None:
        ts_est["reference_binary"] = np.vstack([np.zeros((1, 3)), t_ref])

    row = {"n_frames": n_frames, "blank_frames": [N_TRACK, N_TRACK + N_BLANK - 1]}
    if binary_note:
        row["binary_note"] = binary_note
    if ref_crash:
        row["binary_crash"] = ref_crash
    for name, t in ts_est.items():
        ent = {"frames_written": int(len(t))}
        # post-teleport tail: the frames a recovery can fix. Skip the first
        # 3 post frames (loss only becomes detectable once texture returns;
        # default trigger_consecutive=3) and judge the remaining 5.
        if len(t) == n_frames:
            tail = t[-(N_POST - 3):]
            gt_tail = t_gt_post[-(N_POST - 3):]
            ent["post_teleport_ate_mm"] = round(
                1000 * float(ate_rmse(tail, gt_tail, align=False)), 2)
        ent["full_ate_mm"] = round(1000 * float(ate_rmse(
            t[: min(len(t), N_TRACK)],
            np.stack([p[1] for p in poses_a])[: min(len(t), N_TRACK)],
            align=False)), 2)
        row[name] = ent
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/blackout"
    main(wd)
