"""Multi-chip streaming: N independent odometry streams in lockstep.

`parallel/mesh.py` scales OFFLINE batches of frame-pairs across chips;
the streaming driver (`pipeline/odometry.EdgeDvoOdometry`) was single-
device. This module is the pod-ready production loop between them: one
odometry stream per batch slot, the stream axis sharded over the device
mesh (`jax.sharding.NamedSharding`), ONE fused dispatch advancing every
stream by one frame — N cameras tracked in lockstep with the per-frame
dispatch economy of the single-stream driver (1 jit call + 1 device_get
per step; +1 batched extract on keyframe steps).

Keyframe semantics: the __OLD__REF_UPDATE variant
(/root/reference/src/SolveDVO.cpp:2166-2191) with both the PERIODIC refresh
(:2155-2160) and the per-stream QUALITY TRIGGERS (Laplacian b-hat /
visibility / reprojected-point count, :2129-2152). Data-dependent per-stream
refresh stays lockstep-compatible because __OLD__REF_UPDATE re-references
the CURRENT frame: when any stream triggers, ONE batched re-extraction runs
and a masked select swaps new reference features into exactly the flagged
streams (everyone else's features pass through untouched). Only the
rollback re-solve (__NEW__REF_UPDATE, :2194-2233 — promote frame n-1 and
re-run the solve) is rejected at construction: it needs per-stream retained
pyramids and a second divergent solve; use the single-stream driver for it.

Per-stream warm-start poses stay device-resident between steps (the same
RTT discipline as the single-stream driver); per-stream trajectories/GOP
bookkeeping live on host, fed by one batched device_get per step.

Both warm-start motion models of the single-stream driver are supported:
"hold" (the reference's implicit behavior) and "constant_velocity"
(per-stream device-composed extrapolation by the last inter-frame motion;
streams whose pose basis changes at a keyframe refresh drop their velocity
evidence for one frame via a masked select — same semantics as
EdgeDvoOdometry._set_ref).
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
    REASON_LAPLACIAN_THRESH,
    REASON_LOW_VISIBILITY,
    REASON_PERIODIC,
    REASON_TOO_FEW_REPROJECTIONS,
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
        if kf.rollback_resolve:
            raise ValueError(
                "MultiStreamOdometry implements the __OLD__REF_UPDATE "
                "keyframe variant (current frame becomes the reference, "
                "synchronized PERIODIC refresh + per-stream quality triggers "
                "via masked batched re-extraction). rollback_resolve "
                "(__NEW__REF_UPDATE, promote frame n-1 + re-solve) "
                "desynchronizes the lockstep; use EdgeDvoOdometry per "
                "stream when it is required."
            )
        if self.cfg.relocalize.enabled:
            raise ValueError(
                "MultiStreamOdometry does not support relocalization: a "
                "recovery re-anchor is a per-stream divergent control path "
                "(host-driven candidate verification) that desynchronizes "
                "the lockstep. Use EdgeDvoOdometry per stream when "
                "relocalization is required."
            )
        n_dev = mesh.devices.size
        if n_streams % n_dev:
            raise ValueError(f"n_streams={n_streams} not a multiple of mesh size {n_dev}")
        self.mesh = mesh
        self.n = n_streams
        self.intr = Intrinsics.from_config(self.cfg.camera)
        self.gops: List[Gop] = [Gop() for _ in range(n_streams)]
        self._frame_num = -1
        # per-stream last reference frame (quality triggers desynchronize it)
        self._last_ref = np.zeros(n_streams, np.int64)
        self._ref_feats = None
        self._warm = None  # device (N,3,3),(N,3), sharded
        # constant-velocity state: previous frame's per-stream relative pose
        # (same layout as _warm). None = no velocity evidence -> hold.
        self._cv = self.cfg.motion_model == "constant_velocity"
        self._prev = None
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
        # refresh path: the step already ran Canny for its targets; reuse
        # those edge maps (bit-identical features, extraction skips Canny)
        self._extract_e = jax.jit(
            jax.vmap(
                lambda g, d, e: edge_dvo.extract_ref_features(
                    g, d, self.intr, scfg, max_pts, edges_pyr=e
                )
            ),
            in_shardings=(self._shard, self._shard, self._shard),
            out_shardings=self._shard,
        )

        def _one(feats, gray_pyr, R0, t0):
            tgts = edge_dvo.prepare_now_targets(gray_pyr, scfg)
            R, t, diags = edge_dvo.solve_pyramid(feats, tgts, self.intr, scfg, R0, t0)
            return R, t, diags[0], tuple(t_.edges for t_ in tgts)

        self._step = jax.jit(
            jax.vmap(_one),
            in_shardings=(self._shard, self._shard, self._shard, self._shard),
            out_shardings=self._shard,
        )

        if self._cv:
            # constant-velocity variant: extrapolate each stream's warm start
            # by its last inter-frame motion ON DEVICE (pure 3x3 algebra,
            # vmapped — no extra dispatches or transfers on the hot path)
            from rgbd_odometry_tpu.pipeline.odometry import cv_extrapolate

            def _one_cv(feats, gray_pyr, R0, t0, Rp, tp):
                Rw, tw = cv_extrapolate(R0, t0, Rp, tp)
                return _one(feats, gray_pyr, Rw, tw)

            self._step_cv = jax.jit(
                jax.vmap(_one_cv),
                in_shardings=(self._shard,) * 6,
                out_shardings=self._shard,
            )

        def _merge(old_feats, new_feats, mask):
            # per-stream select: flagged streams take the freshly-extracted
            # reference features, others keep theirs (one tiny fused op)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    mask.reshape((mask.shape[0],) + (1,) * (a.ndim - 1)), b, a
                ),
                old_feats,
                new_feats,
            )

        self._merge = jax.jit(_merge, out_shardings=self._shard)

        def _select_warm(R_d, t_d, mask):
            eye = jnp.broadcast_to(jnp.eye(3, dtype=R_d.dtype), R_d.shape)
            R0 = jnp.where(mask[:, None, None], eye, R_d)
            t0 = jnp.where(mask[:, None], jnp.zeros_like(t_d), t_d)
            return R0, t0

        self._select_warm = jax.jit(_select_warm, out_shardings=self._shard)

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
            self._last_ref[:] = 0
            self._warm = self._identity_warm()
            for s in range(self.n):
                self.gops[s].push_keyframe(
                    0, REASON_FIRST_FRAME, np.eye(3), np.zeros(3), timestamp
                )
            return self._global_poses()

        dispatch_warm = self._warm
        if self._cv:
            prev = self._prev if self._prev is not None else self._warm
            R_d, t_d, finest_d, edges_d = self._step_cv(
                self._ref_feats, pyr.gray,
                self._warm[0], self._warm[1], prev[0], prev[1],
            )
        else:
            R_d, t_d, finest_d, edges_d = self._step(
                self._ref_feats, pyr.gray, self._warm[0], self._warm[1]
            )
        kf = self.cfg.keyframe
        # ONE batched device->host pull for all streams' control decisions
        if kf.enable_quality_triggers:
            R, t, finest = jax.device_get((R_d, t_d, finest_d))
        else:
            R, t = jax.device_get((R_d, t_d))
            finest = None
        R = np.asarray(R, np.float64)
        t = np.asarray(t, np.float64)
        finite = np.isfinite(R).all(axis=(1, 2)) & np.isfinite(t).all(axis=1)
        for s in np.nonzero(~finite)[0]:
            # failure containment per stream: keep the previous relative pose
            R[s], t[s] = self._R[s], self._t[s]
            self.diverged_frames.append((self._frame_num, int(s)))
        self._R, self._t = R, t

        # per-stream keyframe decision, same predicate order as the
        # single-stream driver (EdgeDvoOdometry._resolve)
        reasons = np.zeros(self.n, np.int64)
        if kf.enable_quality_triggers:
            from rgbd_odometry_tpu.pipeline.odometry import residual_b_cap

            for s in range(self.n):
                b_cap = residual_b_cap(
                    finest.final_epsilons[s], int(finest.num_points[s])
                )
                if b_cap > kf.laplacian_b_thresh:
                    reasons[s] = REASON_LAPLACIAN_THRESH
                if float(finest.visible_ratio[s]) < kf.min_visible_ratio:
                    reasons[s] = REASON_LOW_VISIBILITY
                if int(finest.final_valid[s].sum()) < kf.min_reprojected_pts:
                    reasons[s] = REASON_TOO_FEW_REPROJECTIONS
        reasons[(self._frame_num - self._last_ref) == kf.force_every] = (
            REASON_PERIODIC
        )

        refresh = reasons != 0
        for s in range(self.n):
            if refresh[s]:
                # __OLD__REF_UPDATE per stream: solved pose becomes the
                # keyframe edge; the current frame becomes its reference
                self.gops[s].push_keyframe(
                    self._frame_num, int(reasons[s]), R[s], t[s], timestamp
                )
                self._last_ref[s] = self._frame_num
                self._R[s] = np.eye(3)
                self._t[s] = np.zeros(3)
            else:
                self.gops[s].push_ordinary(self._frame_num, R[s], t[s], timestamp)

        if refresh.any():
            # ONE batched re-extraction; flagged streams swap their reference
            # features in a masked select, the rest keep theirs untouched
            new_feats = self._extract_e(pyr.gray, pyr.depth, edges_d)
            mask = self._put(jnp.asarray(refresh))
            self._ref_feats = self._merge(self._ref_feats, new_feats, mask)
            if finite.all():
                self._warm = self._select_warm(R_d, t_d, mask)
            else:
                self._warm = self._put(
                    (
                        jnp.asarray(self._R, jnp.float32),
                        jnp.asarray(self._t, jnp.float32),
                    )
                )
        elif finite.all():
            self._warm = (R_d, t_d)  # device-resident, no re-upload
        else:
            self._warm = self._put(
                (jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
            )
        if self._cv:
            # next step's velocity source is the warm pair THIS step
            # dispatched from (frame n-1's pose). Streams whose pose basis
            # changed (keyframe refresh) or that diverged drop their
            # evidence: prev := warm -> extrapolation degenerates to hold
            # for exactly one frame (same semantics as the single-stream
            # driver's _set_ref / divergence reset).
            drop = refresh | ~finite
            if drop.any():
                self._prev = self._merge(
                    dispatch_warm, self._warm, self._put(jnp.asarray(drop))
                )
            else:
                self._prev = dispatch_warm
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
