"""Multi-host scaling over DCN — initialization + sequence-sharding helpers.

The reference's "distribution" is ROS pub/sub on localhost (SURVEY.md
section 2.6); the TPU-native story for going beyond one host is
`jax.distributed` over DCN: each host feeds its shard of a long sequence
sweep (many TUM sequences, or disjoint windows of one long sequence), the
global mesh carries the batch axis across all chips, and only tiny
trajectory statistics cross hosts.

The multi-process path is EXECUTED by the test suite: two local processes
(each one "host" with 2 virtual CPU devices) initialize through the
coordinator, align disjoint overlapping windows of one sequence, reduce a
statistic across the process boundary (Gloo here, DCN on a pod), and stitch
their window trajectories (tests/test_multihost_process.py +
tests/multihost_worker.py). The same recipe runs unchanged on a real
multi-host pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from rgbd_odometry_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    shutdown_timeout_seconds: int = 300,
):
    """Bring up jax.distributed when running multi-process; no-op for one
    process (so the same entry point works on a laptop, one TPU VM, or a
    pod slice).

    shutdown_timeout_seconds bounds the exit barrier: every process must
    reach shutdown within this window of the first arriver. Raise it when
    per-process work is badly skewed (e.g. one host paying cold XLA
    compiles the others have cached)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        shutdown_timeout_seconds=shutdown_timeout_seconds,
    )


def global_mesh():
    """1-D data mesh over every chip of every host (ICI within hosts, DCN
    across; the batch axis only ever reduces tiny statistics, so DCN hops
    are negligible)."""
    return make_mesh(jax.devices())


def shard_sequence_windows(
    num_frames: int, window: int, overlap: int = 1
) -> Sequence[Tuple[int, int]]:
    """Split a long sequence into per-host windows with `overlap` shared
    frames so window-local trajectories can be stitched by composing at the
    shared frames (the host-side analog of the GOP chain)."""
    step = window - overlap
    starts = list(range(0, max(num_frames - overlap, 1), step))
    return [(s, min(s + window, num_frames)) for s in starts]


def local_window(windows, process_id: Optional[int] = None):
    """The window this host should load (hosts only read their own frames —
    the point of multi-host sweeps is that no host holds the whole sequence)."""
    pid = jax.process_index() if process_id is None else process_id
    return windows[pid % len(windows)]


def stitch_windows(results: Sequence[Tuple[np.ndarray, np.ndarray]], overlap: int = 1):
    """Compose per-window trajectories (R_w (T,3,3), t_w (T,3)) into one
    global trajectory by anchoring each window at the previous window's
    matching overlap frame."""
    R_all = [results[0][0]]
    t_all = [results[0][1]]
    for R_w, t_w in results[1:]:
        R_anchor = R_all[-1][-1]
        t_anchor = t_all[-1][-1]
        # window poses are relative to their own frame 0 == previous window's
        # last overlap frame
        R_g = np.einsum("ij,tjk->tik", R_anchor, R_w[overlap:])
        t_g = t_anchor + np.einsum("ij,tj->ti", R_anchor, t_w[overlap:])
        R_all.append(R_g)
        t_all.append(t_g)
    return np.concatenate(R_all), np.concatenate(t_all)
