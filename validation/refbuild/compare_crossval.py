"""Compare the upstream reference binary's trajectory against this
framework's parity-mode trajectory on identical XML frames.

Inputs: the reference's poses/estPoses.txt (`qx qy qz qw tx ty tz` per
processed frame, frames 1..N — /root/reference/src/SolveDVO.cpp:2242-2260
printPose protocol) and this framework's TUM-format trajectory over the
same frames (frame 0 = identity). Prints one JSON object with absolute and
relative agreement statistics.

Usage: python compare_crossval.py <estPoses.txt> <mine.txt>
"""

from __future__ import annotations

import json
import sys

import numpy as np


def quat_to_R(q):
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 2.0 / n
    return np.array(
        [
            [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
            [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
            [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
        ]
    )


def relative_steps(R, t):
    out = []
    for k in range(len(t) - 1):
        out.append((R[k].T @ R[k + 1], R[k].T @ (t[k + 1] - t[k])))
    return out


def main(ref_path: str, mine_path: str) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rgbd_odometry_tpu.eval.ate import ate_rmse
    from rgbd_odometry_tpu.io.tum import read_trajectory

    ref = np.loadtxt(ref_path)
    R_ref = np.stack([quat_to_R(q) for q in ref[:, :4]])
    t_ref = ref[:, 4:]

    R_m, t_m, _ = read_trajectory(mine_path)
    # reference rows are frames 1..N (frame 0 only seeds the ref frame);
    # our trajectory includes frame 0 at identity
    n = min(len(t_ref), len(t_m) - 1)
    R_mine, t_mine = R_m[1 : 1 + n], t_m[1 : 1 + n]
    R_ref, t_ref = R_ref[:n], t_ref[:n]

    d_abs = np.linalg.norm(t_mine - t_ref, axis=1)
    rr = relative_steps(R_ref, t_ref)
    rm = relative_steps(R_mine, t_mine)
    d_rel = [np.linalg.norm(a[1] - b[1]) for a, b in zip(rr, rm)]
    ang = [
        float(
            np.degrees(
                np.arccos(np.clip((np.trace(a[0].T @ b[0]) - 1) / 2, -1, 1))
            )
        )
        for a, b in zip(rr, rm)
    ]
    path_len = float(np.sum([np.linalg.norm(t) for _, t in rr]))
    out = {
        "frames_compared": int(n),
        "trajectory_path_len_mm": round(1000 * path_len, 2),
        "ate_mine_vs_ref_mm": round(1000 * float(ate_rmse(t_mine, t_ref)), 3),
        "abs_dt_mm": {
            "mean": round(1000 * float(d_abs.mean()), 3),
            "max": round(1000 * float(d_abs.max()), 3),
        },
        "rel_step_dt_mm": {
            "mean": round(1000 * float(np.mean(d_rel)), 3),
            "max": round(1000 * float(np.max(d_rel)), 3),
        },
        "rel_step_dR_deg": {
            "mean": round(float(np.mean(ang)), 4),
            "max": round(float(np.max(ang)), 4),
        },
    }
    return out


if __name__ == "__main__":
    print(json.dumps(main(sys.argv[1], sys.argv[2])))
