"""Worker process for the executed multi-process multihost test.

Each process (a stand-in for one host of a pod) runs the standard
jax.distributed recipe from parallel.multihost: initialize, take its own
sequence window, align the window's consecutive frame pairs on its LOCAL
devices, reduce drift statistics globally across processes, and emit its
window trajectory for stitching by the launcher.

Invoked: python multihost_worker.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/rgbd_odometry_tpu_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    from rgbd_odometry_tpu.parallel import multihost as mh

    # shutdown_timeout_seconds=560: the exit barrier must tolerate the full
    # skew between these two workers on the 1-core host — under a contended
    # suite run one worker can trail the other by minutes of compile time
    # (observed flake: "reached the barrier: 1/2" at the default 300 s).
    mh.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
        shutdown_timeout_seconds=560,
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * 2  # 2 local CPU devices per "host"

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.core import geometry as geo
    from rgbd_odometry_tpu.io.synthetic import render_sequence
    from rgbd_odometry_tpu.solvers import edge_dvo

    # the long sequence: every host could render/load ANY frame, but only
    # reads its own window (the point of the sweep)
    num_frames, window, overlap = 7, 4, 1
    windows = mh.shard_sequence_windows(num_frames, window, overlap)
    assert len(windows) == nproc, windows
    lo, hi = mh.local_window(windows)

    cam = CameraConfig(width=64, height=48, fx=70.0, fy=70.0, cx=31.5, cy=23.5)
    ts_all = np.arange(num_frames)
    psis = np.stack(
        [0.004 * ts_all, -0.002 * ts_all, 0.001 * ts_all,
         0.001 * ts_all, -0.001 * ts_all, 0.0005 * ts_all], -1
    ).astype(np.float32)
    frames, poses = render_sequence(cam, psis[lo:hi], seed=0)

    intr = Intrinsics.from_config(cam)
    cfg = SolverConfig(method="gauss_newton", iterations=(4, 3))
    max_pts = (512, 256)

    # window-local odometry: consecutive-pair alignment, composed locally
    R_acc, t_acc = np.eye(3), np.zeros(3)
    Rs, ts = [np.eye(3)], [np.zeros(3)]
    for i in range(1, len(frames)):
        rp = build_pyramid(jnp.asarray(frames[i - 1][0]), jnp.asarray(frames[i - 1][1]), 2)
        np_ = build_pyramid(jnp.asarray(frames[i][0]), jnp.asarray(frames[i][1]), 2)
        R, t, _ = edge_dvo.align_pair(rp.gray, rp.depth, np_.gray, intr, cfg, max_pts)
        R, t = np.asarray(R, np.float64), np.asarray(t, np.float64)
        t_acc = t_acc + R_acc @ t
        R_acc = R_acc @ R
        Rs.append(R_acc.copy())
        ts.append(t_acc.copy())

    # global drift statistic across processes: one psum over the global mesh
    # (DCN in a real pod; Gloo between these localhost processes)
    mesh = mh.global_mesh()
    local_err = np.zeros((2, 1), np.float32)  # per local device row
    gt_R, gt_t = poses[-1]
    gt_rel_t = gt_t - poses[0][1]
    local_err[:, 0] = np.linalg.norm(ts[-1] - (np.asarray(poses[0][0]).T @ gt_rel_t))
    arr = multihost_utils.host_local_array_to_global_array(local_err, mesh, P("data"))
    total = jax.jit(
        lambda a: jnp.sum(a) / a.shape[0], out_shardings=NamedSharding(mesh, P())
    )(arr)
    # fully-replicated output: every process holds the reduced value locally
    total = float(np.asarray(total.addressable_data(0)))

    np.savez(out_path, R=np.stack(Rs), t=np.stack(ts), mean_window_err=total,
             lo=lo, hi=hi)
    print(f"proc {pid}: window [{lo},{hi}) frames={len(frames)} "
          f"mean_window_err={total:.5f}", flush=True)


if __name__ == "__main__":
    main()
