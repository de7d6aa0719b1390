"""Three-way trajectory accuracy vs exact synthetic ground truth: the
upstream reference binary, this framework's parity mode, and this
framework's production LM profile — all on IDENTICAL frames.

Usage: python accuracy_vs_gt.py <estPoses.txt> <mine_parity.txt> <mine_lm.txt> <n_frames>
"""

import json
import sys

import numpy as np


def main(ref_path, parity_path, lm_path, n_frames):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rgbd_odometry_tpu.config import CameraConfig
    from rgbd_odometry_tpu.eval.ate import ate_rmse
    from rgbd_odometry_tpu.io.stream import SyntheticCamera
    from rgbd_odometry_tpu.io.tum import read_trajectory

    gt = SyntheticCamera(CameraConfig(), num_frames=n_frames).ground_truth()
    t_gt = np.asarray(gt[1])[1:]

    t_ref = np.loadtxt(ref_path)[:, 4:]
    _, t_p, _ = read_trajectory(parity_path)
    _, t_l, _ = read_trajectory(lm_path)

    out = {}
    for name, t in (
        ("reference_binary_50x4", t_ref),
        ("mine_parity_50x4", t_p[1:]),
        ("mine_production_lm", t_l[1:]),
    ):
        n = min(len(t), len(t_gt))
        d = np.linalg.norm(t[:n] - t_gt[:n], axis=1)
        out[name] = {
            "ate_unaligned_mm": round(1000 * float(ate_rmse(t[:n], t_gt[:n], align=False)), 2),
            "ate_aligned_mm": round(1000 * float(ate_rmse(t[:n], t_gt[:n])), 2),
            "final_err_mm": round(1000 * float(d[-1]), 2),
        }
    return out


if __name__ == "__main__":
    print(json.dumps(main(sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))))
