"""Batched sequence alignment: whole trajectories in one device call.

The capability the streaming reference fundamentally cannot express
(SURVEY.md section 2.6 "batch parallelism — absent in reference"): given a
sequence of T frames, align ALL consecutive (or keyframe-anchored) pairs as
one vmapped batch — optionally sharded across a chip mesh — then compose the
relative poses into a trajectory on the host. This is BASELINE.json config 4
("256 frame-pairs per step per chip, keyframe-graph refinement") and the
multi-host sequence-sweep story: a 30 s TUM sequence (~900 pairs) is a single
sub-second device step instead of 30 s of streaming.

Two modes:
  * consecutive: pair (i, i+1) — odometry refinement / offline processing,
  * keyframe-anchored: pair (keyframe(i), i) — re-solve every frame of a
    keyframe group against its keyframe in parallel (the batched analog of
    the reference's per-frame `runIterations` against the current ref).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.config import SolverConfig
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import build_pyramid
from rgbd_odometry_tpu.solvers import edge_dvo


def _stack_pyramids(grays, depths, num_levels):
    pyrs = [
        build_pyramid(jnp.asarray(g, jnp.float32), jnp.asarray(d, jnp.float32), num_levels)
        for g, d in zip(grays, depths)
    ]
    gray_b = tuple(jnp.stack([p.gray[l] for p in pyrs]) for l in range(num_levels))
    depth_b = tuple(jnp.stack([p.depth[l] for p in pyrs]) for l in range(num_levels))
    return gray_b, depth_b


def build_pair_aligner(
    intr: Intrinsics,
    cfg: SolverConfig,
    max_points: Tuple[int, ...],
    mesh=None,
):
    """A jitted batched pair aligner; with `mesh`, the batch axis shards
    across chips (parallel.mesh)."""
    if mesh is not None:
        from rgbd_odometry_tpu.parallel.mesh import build_sharded_aligner

        return build_sharded_aligner(mesh, intr, cfg, max_points)
    return jax.jit(
        jax.vmap(lambda rg, rd, ng: edge_dvo.align_pair(rg, rd, ng, intr, cfg, max_points)[:2])
    )


def align_sequence(
    grays: Sequence[np.ndarray],
    depths: Sequence[np.ndarray],
    intr: Intrinsics,
    cfg: SolverConfig,
    max_points: Tuple[int, ...] = (4096, 2048, 1024, 512),
    num_levels: int = 4,
    keyframe_every: Optional[int] = None,
    mesh=None,
):
    """Align a whole frame sequence in one batched device call.

    Returns (R_global (T,3,3), t_global (T,3), rel_R (T-1,...), rel_t).

    keyframe_every=None pairs consecutive frames; otherwise frames pair
    against their group keyframe (reference keyframe cadence = 5,
    /root/reference/src/SolveDVO.cpp:2155-2160) and relative poses chain
    through keyframes exactly like GOP composition (src/GOP.cpp:138-186).
    """
    t_frames = len(grays)
    assert t_frames >= 2
    gray_b, depth_b = _stack_pyramids(grays, depths, num_levels)

    if keyframe_every is None:
        ref_idx = np.arange(t_frames - 1)
        now_idx = np.arange(1, t_frames)
    else:
        now_idx = np.arange(1, t_frames)
        # frame i anchors to the last keyframe STRICTLY before it, so keyframe
        # frames align against the previous keyframe (never themselves)
        ref_idx = ((now_idx - 1) // keyframe_every) * keyframe_every

    n_pairs = len(now_idx)
    if mesh is not None:
        # pad the pair batch to a multiple of the mesh size (NamedSharding
        # requires even division); padded pairs repeat the last one
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = (-n_pairs) % n_dev
        if pad:
            ref_idx = np.concatenate([ref_idx, np.repeat(ref_idx[-1], pad)])
            now_idx = np.concatenate([now_idx, np.repeat(now_idx[-1], pad)])

    take = lambda pyr, idx: tuple(g[jnp.asarray(idx)] for g in pyr)
    aligner = build_pair_aligner(intr, cfg, max_points, mesh)
    args = (take(gray_b, ref_idx), take(depth_b, ref_idx), take(gray_b, now_idx))
    if mesh is not None:
        from rgbd_odometry_tpu.parallel.mesh import shard_batch

        args = shard_batch(mesh, args)
    rel_R, rel_t = aligner(*args)
    rel_R = np.asarray(rel_R, np.float64)[:n_pairs]
    rel_t = np.asarray(rel_t, np.float64)[:n_pairs]
    ref_idx = ref_idx[:n_pairs]

    # host-side composition (float64, like the GOP)
    R_out = np.zeros((t_frames, 3, 3))
    t_out = np.zeros((t_frames, 3))
    R_out[0] = np.eye(3)
    for i in range(1, t_frames):
        anchor = ref_idx[i - 1]
        R_out[i] = R_out[anchor] @ rel_R[i - 1]
        t_out[i] = t_out[anchor] + R_out[anchor] @ rel_t[i - 1]
    return R_out, t_out, rel_R, rel_t
