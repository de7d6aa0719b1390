"""Multi-chip streaming: N independent odometry streams in lockstep.

`parallel/mesh.py` scales OFFLINE batches of frame-pairs across chips;
the streaming driver (`pipeline/odometry.EdgeDvoOdometry`) was single-
device. This module is the pod-ready production loop between them: one
odometry stream per batch slot, the stream axis sharded over the device
mesh (`jax.sharding.NamedSharding`), ONE fused dispatch advancing every
stream by one frame — N cameras tracked in lockstep with the per-frame
dispatch economy of the single-stream driver (1 jit call + 1 device_get
per step; +1 batched extract on keyframe steps).

Keyframe semantics: the PERIODIC refresh policy with the __OLD__REF_UPDATE
variant (/root/reference/src/SolveDVO.cpp:2155-2160 + :2166-2191) — every
stream refreshes its reference keyframe on the same step, so the refresh
work is itself one batched dispatch. The data-dependent per-stream policies
(quality triggers :2129-2152, rollback re-solve :2194-2233) are rejected at
construction: they desynchronize streams, which on a lockstep SPMD driver
would force per-stream masked re-solves; use the single-stream driver when
those are required.

Per-stream warm-start poses stay device-resident between steps (the same
RTT discipline as the single-stream driver); per-stream trajectories/GOP
bookkeeping live on host, fed by one batched device_get per step.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rgbd_odometry_tpu.config import PipelineConfig
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import build_pyramid
from rgbd_odometry_tpu.parallel.mesh import DATA_AXIS
from rgbd_odometry_tpu.pipeline.gop import (
    Gop,
    REASON_FIRST_FRAME,
    REASON_PERIODIC,
)
from rgbd_odometry_tpu.solvers import edge_dvo


class MultiStreamOdometry:
    """N lockstep odometry streams, stream axis sharded over `mesh`.

    `n_streams` must be a multiple of the mesh size (XLA splits the leading
    axis evenly). Each stream is an independent camera/sequence; streams
    never exchange data — the mesh only spreads them over chips, so scaling
    is embarrassingly parallel and collective-free on the hot path.
    """

    def __init__(
        self,
        mesh: Mesh,
        n_streams: int,
        config: Optional[PipelineConfig] = None,
    ):
        self.cfg = config or PipelineConfig()
        kf = self.cfg.keyframe
        if kf.enable_quality_triggers or kf.rollback_resolve:
            raise ValueError(
                "MultiStreamOdometry implements the synchronized PERIODIC "
                "keyframe policy only (quality triggers / rollback_resolve "
                "desynchronize streams); configure "
                "KeyframeConfig(enable_quality_triggers=False, "
                "rollback_resolve=False) or use EdgeDvoOdometry per stream."
            )
        n_dev = mesh.devices.size
        if n_streams % n_dev:
            raise ValueError(f"n_streams={n_streams} not a multiple of mesh size {n_dev}")
        self.mesh = mesh
        self.n = n_streams
        self.intr = Intrinsics.from_config(self.cfg.camera)
        self.gops: List[Gop] = [Gop() for _ in range(n_streams)]
        self._frame_num = -1
        self._last_ref_frame = -1
        self._ref_feats = None
        self._warm = None  # device (N,3,3),(N,3), sharded
        # host mirror of each stream's current relative pose (for the
        # divergence guard; kept in float64 like the single-stream driver)
        self._R = np.tile(np.eye(3), (n_streams, 1, 1))
        self._t = np.zeros((n_streams, 3))
        self.diverged_frames: List[Tuple[int, int]] = []  # (frame, stream)

        scfg = self.cfg.solver
        max_pts = self.cfg.pyramid.max_points[: self.cfg.pyramid.num_levels]
        self._shard = NamedSharding(mesh, P(DATA_AXIS))
        self._repl = NamedSharding(mesh, P())

        self._extract = jax.jit(
            jax.vmap(
                lambda g, d: edge_dvo.extract_ref_features(
                    g, d, self.intr, scfg, max_pts
                )
            ),
            in_shardings=(self._shard, self._shard),
            out_shardings=self._shard,
        )

        def _one(feats, gray_pyr, R0, t0):
            tgts = edge_dvo.prepare_now_targets(gray_pyr, scfg)
            R, t, diags = edge_dvo.solve_pyramid(feats, tgts, self.intr, scfg, R0, t0)
            return R, t, diags[0]

        self._step = jax.jit(
            jax.vmap(_one),
            in_shardings=(self._shard, self._shard, self._shard, self._shard),
            out_shardings=self._shard,
        )

    # ------------------------------------------------------------------
    def _put(self, pytree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._shard), pytree
        )

    def _identity_warm(self):
        R0 = jnp.tile(jnp.eye(3, dtype=jnp.float32), (self.n, 1, 1))
        t0 = jnp.zeros((self.n, 3), jnp.float32)
        return self._put((R0, t0))

    def process_batch(
        self,
        gray0_b: np.ndarray,  # (N, H, W) level-0 gray, one frame per stream
        depth0_b: np.ndarray,  # (N, H, W) depth mm
        timestamp: float = 0.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Advance every stream by one frame; returns the global poses
        (R (N,3,3), t (N,3)) after this frame."""
        self._frame_num += 1
        pyr = build_pyramid(
            jnp.asarray(gray0_b, jnp.float32),
            jnp.asarray(depth0_b, jnp.float32),
            self.cfg.pyramid.num_levels,
        )
        pyr = self._put(pyr)

        if self._frame_num == 0:
            self._ref_feats = self._extract(pyr.gray, pyr.depth)
            self._last_ref_frame = 0
            self._warm = self._identity_warm()
            for s in range(self.n):
                self.gops[s].push_keyframe(
                    0, REASON_FIRST_FRAME, np.eye(3), np.zeros(3), timestamp
                )
            return self._global_poses()

        R_d, t_d, finest_d = self._step(
            self._ref_feats, pyr.gray, self._warm[0], self._warm[1]
        )
        # ONE batched device->host pull for all streams' control decisions
        R, t = jax.device_get((R_d, t_d))
        R = np.asarray(R, np.float64)
        t = np.asarray(t, np.float64)
        finite = np.isfinite(R).all(axis=(1, 2)) & np.isfinite(t).all(axis=1)
        for s in np.nonzero(~finite)[0]:
            # failure containment per stream: keep the previous relative pose
            R[s], t[s] = self._R[s], self._t[s]
            self.diverged_frames.append((self._frame_num, int(s)))
        self._R, self._t = R, t

        periodic = (
            self._frame_num - self._last_ref_frame
        ) == self.cfg.keyframe.force_every
        if periodic:
            # synchronized __OLD__REF_UPDATE: every stream keeps its solved
            # pose as the keyframe edge and re-references the current frame
            for s in range(self.n):
                self.gops[s].push_keyframe(
                    self._frame_num, REASON_PERIODIC, R[s], t[s], timestamp
                )
            self._ref_feats = self._extract(pyr.gray, pyr.depth)
            self._last_ref_frame = self._frame_num
            self._R = np.tile(np.eye(3), (self.n, 1, 1))
            self._t = np.zeros((self.n, 3))
            self._warm = self._identity_warm()
        else:
            for s in range(self.n):
                self.gops[s].push_ordinary(self._frame_num, R[s], t[s], timestamp)
            if finite.all():
                self._warm = (R_d, t_d)  # device-resident, no re-upload
            else:
                self._warm = self._put(
                    (jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
                )
        return self._global_poses()

    def _global_poses(self) -> Tuple[np.ndarray, np.ndarray]:
        Rs, ts = [], []
        for g in self.gops:
            R, t = g.global_pose(-1)
            Rs.append(R)
            ts.append(t)
        return np.stack(Rs), np.stack(ts)

    def trajectories(self) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Per-stream (R (T,3,3), t (T,3), timestamps) absolute trajectories."""
        return [g.poses() for g in self.gops]
