"""Streaming edge-DVO odometry driver: the `dvo` node rebuilt in-process.

Replaces `SolveDVO::loop()` (/root/reference/src/SolveDVO.cpp:1896-2373):
frame ingestion, reference-keyframe management with the every-N refresh and
the quality triggers (Laplacian b-hat / visibility / point count,
:2122-2160), the `__NEW__REF_UPDATE` rollback re-solve (:2194-2233), GOP
trajectory composition, and per-frame metrics.

Design: the device does everything statically-shaped (feature extraction, DT
targets, coarse-to-fine solve) through two jitted entry points; the host
holds only control flow that is inherently data-dependent across frames
(keyframe switching / rollback), mirroring the two-phase structure the
reference's event loop has anyway. The previous frame's pyramid is retained
on device so a rollback re-solve costs one extra solve, no transfers.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.config import PipelineConfig
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import FramePyramid, build_pyramid
from rgbd_odometry_tpu.pipeline.gop import (
    Gop,
    REASON_FIRST_FRAME,
    REASON_LAPLACIAN_THRESH,
    REASON_LOW_VISIBILITY,
    REASON_PERIODIC,
    REASON_RELOCALIZED,
    REASON_TOO_FEW_REPROJECTIONS,
)
from rgbd_odometry_tpu.solvers import edge_dvo


@dataclass
class FrameMetrics:
    """Per-frame observability record — the structured replacement for the
    reference's scattered ROS_INFO prints and energy plots (SURVEY.md §5)."""

    frame_num: int
    solve_ms: float
    best_energy: float
    best_iter: int
    visible_ratio: float
    b_cap: float  # Laplacian-MLE scale of the residual histogram
    num_points: int
    keyframe_reason: int  # 0 = ordinary frame
    rolled_back: bool = False
    energy_curve: Optional[np.ndarray] = None
    diverged: bool = False  # NaN/non-finite estimate was rejected
    # populated only when EdgeDvoOdometry.keep_residuals is True (viz sinks)
    final_epsilons: Optional[np.ndarray] = None
    final_valid: Optional[np.ndarray] = None


def residual_b_cap(epsilons: np.ndarray, count: int) -> float:
    """Laplace-MLE scale b-hat = mean(|residual|) over the level's points
    (`processResidueHistogram`, /root/reference/src/SolveDVO.cpp:1455-1463:
    b_cap = sum(residi)/N; invisible points contribute 0 exactly as there)."""
    n = max(int(count), 1)
    return float(np.sum(epsilons) / n)


def residual_histogram(epsilons: np.ndarray, valid: np.ndarray, bins: int = 260) -> np.ndarray:
    """Normalized 260-bin histogram of int residues
    (/root/reference/src/SolveDVO.cpp:1403-1411)."""
    e = np.clip(epsilons[valid].astype(np.int32) + 1, 0, bins - 1)
    h = np.bincount(e, minlength=bins).astype(np.float64)
    return h / max(len(e), 1)


def cv_extrapolate(R0, t0, Rp, tp):
    """Constant-velocity warm-start extrapolation, in the solver's pose
    parameterization p_now = R (p_ref - t).

    Given the current relative pose T0 = (R0, t0) and the PREVIOUS frame's
    relative pose Tp = (Rp, tp) (both w.r.t. the same reference keyframe),
    the last inter-frame motion is D = T0 Tp^-1 and the extrapolated warm
    start is D T0, which in (R, t) form is

        R_warm = R0 Rp^T R0,   t_warm = t0 + R0^T Rp (t0 - tp).

    With Tp == T0 this degenerates to (R0, t0) numerically-but-not-bitwise;
    the driver therefore keeps the plain "hold" step as a separate graph and
    only routes through this one when motion_model="constant_velocity".
    """
    Rw = R0 @ (Rp.T @ R0)
    tw = t0 + R0.T @ (Rp @ (t0 - tp))
    return Rw, tw


def _build_entry_points(camera_cfg, scfg, max_pts):
    """Build the driver's jitted callables for one camera/solver config.

    Deliberately NOT memoized across driver instances: a process-wide
    `lru_cache` of these jit wrappers was tried (2026-08, round 3) to avoid
    re-tracing per instance, and it deterministically SEGFAULTED XLA:CPU
    later in the process — three different crash sites inside
    compile/persistent-cache serialization of *unrelated* executables, all
    at the same downstream test, reproduced solo, gone the moment the cache
    was removed (full bisect in the round-3 log). Keeping long-lived shared
    jit wrappers + their executables alive appears to tickle a jaxlib
    lifetime bug; per-instance wrappers re-trace (seconds) but are safe.
    """
    intr = Intrinsics.from_config(camera_cfg)

    extract_ref = jax.jit(
        lambda g, d: edge_dvo.extract_ref_features(g, d, intr, scfg, max_pts)
    )
    # keyframe promotion path: the frame's targets (and thus its Canny edge
    # maps) were already computed by the step — reuse them, skip Canny
    extract_ref_from_edges = jax.jit(
        lambda g, d, e: edge_dvo.extract_ref_features(
            g, d, intr, scfg, max_pts, edges_pyr=e
        )
    )
    prepare_now = jax.jit(lambda g: edge_dvo.prepare_now_targets(g, scfg))
    solve = jax.jit(
        lambda feats, tgts, R0, t0: edge_dvo.solve_pyramid(
            feats, tgts, intr, scfg, R0, t0
        )
    )

    # fused per-frame step: targets + coarse-to-fine solve in ONE jit
    # call. On a tunneled device every dispatch+sync costs a full RTT
    # (~28 ms here) and the streaming loop is sequential, so calls per
    # frame bound the frame rate. The targets are returned (device-
    # resident) so a rollback re-solve can reuse them without recompute.
    def _step(feats, gray_pyr, R0, t0):
        tgts = edge_dvo.prepare_now_targets(gray_pyr, scfg)
        R, t, diags = edge_dvo.solve_pyramid(feats, tgts, intr, scfg, R0, t0)
        return R, t, diags[0], tgts

    # constant-velocity variant: the warm start is extrapolated ON DEVICE
    # from the previous two relative poses — the steady-state loop still
    # performs one dispatch and zero host->device uploads per frame
    def _step_cv(feats, gray_pyr, R0, t0, Rp, tp):
        Rw, tw = cv_extrapolate(R0, t0, Rp, tp)
        return _step(feats, gray_pyr, Rw, tw)

    return (
        extract_ref,
        extract_ref_from_edges,
        prepare_now,
        solve,
        jax.jit(_step),
        jax.jit(_step_cv),
    )


class EdgeDvoOdometry:
    """Streaming odometry over a sequence of RGB-D frames."""

    def __init__(self, config: PipelineConfig | None = None):
        self.cfg = config or PipelineConfig()
        self.intr = Intrinsics.from_config(self.cfg.camera)
        self.gop = Gop()
        # bounded observability ring: FrameMetrics carries an energy curve
        # per frame, so an unbounded list grows without limit on endurance
        # runs. 100k frames (~an hour at 30 Hz, the same horizon the
        # reference reserves for its GOP, /root/reference/src/GOP.cpp:125)
        # of recent metrics stay indexable ([-1], slices via list()); older
        # records age out. Set cfg.metrics_max=0 for an unbounded list.
        from collections import deque

        self.metrics: "deque[FrameMetrics]" = deque(
            maxlen=self.cfg.metrics_max or None
        )
        self._ref_feats = None
        self._prev_pyr: Optional[FramePyramid] = None
        self._prev_targets = None
        self._frame_num = -1
        self._last_ref_frame = -1
        self._R = np.eye(3, dtype=np.float64)
        self._t = np.zeros(3, dtype=np.float64)
        # retain per-frame residual vectors in FrameMetrics (viz sinks need
        # them; off by default to keep long runs light)
        self.keep_residuals = False
        # device-resident warm-start pose mirroring (_R, _t): on a tunneled
        # device every host->device put is a synchronous ~30 ms RTT, so the
        # steady-state loop must never re-upload the pose it just computed.
        # None = out of sync; the next step pays one upload.
        self._warm_dev = None
        # constant-velocity state: device copy of the PREVIOUS frame's
        # relative pose (w.r.t. the current ref), and the warm pair the
        # in-flight dispatch used (becomes _prevpose_dev once it resolves).
        # None = no velocity evidence yet; the step falls back to "hold".
        self._cv = self.cfg.motion_model == "constant_velocity"
        self._prevpose_dev = None
        self._dispatch_warm = None
        # relocalization after tracking loss (beyond-reference,
        # pipeline/relocalize.py): healthy keyframes feed an appearance
        # database; `trigger_consecutive` lost frames trigger a recovery
        # query that re-anchors the trajectory. The database IS part of
        # checkpoints (utils/checkpoint.py, r5): a resumed run recovers
        # against pre-checkpoint keyframes with the saved PRNG continuation.
        self._reloc = None
        self._bad_streak = 0
        if self.cfg.relocalize.enabled:
            from rgbd_odometry_tpu.pipeline.relocalize import Relocalizer

            self._reloc = Relocalizer(self.intr, self.cfg.relocalize)
        # lazily-jitted pose-uncertainty entry (see pose_information below)
        self._info_fn = None

        pyr = self.cfg.pyramid
        max_pts = pyr.max_points[: pyr.num_levels]
        (
            self._extract_ref,
            self._extract_ref_from_edges,
            self._prepare_now,
            self._solve,
            self._step,
            self._step_cv,
        ) = _build_entry_points(self.cfg.camera, self.cfg.solver, max_pts)

    # ------------------------------------------------------------------
    def process_frame(
        self,
        gray0: np.ndarray,
        depth0_mm: np.ndarray,
        timestamp: float = 0.0,
        pose_prior: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Feed one frame (level-0 gray + depth, as from the ingest node);
        returns the current global pose (R, t).

        Mirrors one iteration of `loop()`'s steady state
        (/root/reference/src/SolveDVO.cpp:2032-2371). `pose_prior`, if given,
        is a delta (R, t) to compose onto the warm start — e.g. an
        IMU-dead-reckoned inter-frame motion (BASELINE.json config 5).
        """
        pyr = build_pyramid(
            jnp.asarray(gray0, jnp.float32),
            jnp.asarray(depth0_mm, jnp.float32),
            self.cfg.pyramid.num_levels,
        )
        return self.process_pyramid(pyr, timestamp, pose_prior)

    def process_pyramid(
        self,
        pyr: FramePyramid,
        timestamp: float = 0.0,
        pose_prior: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Feed one already-built (possibly device-resident) frame pyramid —
        the entry the async `FrameFeeder` uses so host decode/transfer hides
        behind device compute (the ROS pub/sub decoupling, SURVEY.md §2.6)."""
        self._frame_num += 1
        if pose_prior is not None:
            dR, dt = pose_prior
            # warm start: previous relative pose composed with the prior delta
            self._t = self._t + self._R @ np.asarray(dt, np.float64)
            self._R = self._R @ np.asarray(dR, np.float64)
            self._warm_dev = None  # host-side compose -> re-upload once
            self._prevpose_dev = None  # the prior IS the velocity source

        if self._frame_num == 0:
            return self._bootstrap(pyr, timestamp)

        t_start = time.perf_counter()
        if self._warm_dev is None:
            self._warm_dev = (
                jnp.asarray(self._R, jnp.float32),
                jnp.asarray(self._t, jnp.float32),
            )
        self._dispatch_warm = self._warm_dev
        if self._cv:
            prev = self._prevpose_dev or self._warm_dev
            R_d, t_d, finest_d, targets = self._step_cv(
                self._ref_feats,
                pyr.gray,
                self._warm_dev[0],
                self._warm_dev[1],
                prev[0],
                prev[1],
            )
        else:
            R_d, t_d, finest_d, targets = self._step(
                self._ref_feats,
                pyr.gray,
                self._warm_dev[0],
                self._warm_dev[1],
            )
        return self._resolve(
            pyr, timestamp, self._frame_num, R_d, t_d, finest_d, targets, t_start
        )

    def _bootstrap(self, pyr: FramePyramid, timestamp: float):
        """First frame becomes the reference keyframe (:1950-2027)."""
        self._set_ref(pyr)
        self._last_ref_frame = 0
        self.gop.push_keyframe(0, REASON_FIRST_FRAME, np.eye(3), np.zeros(3), timestamp)
        self.metrics.append(
            FrameMetrics(0, 0.0, 0.0, -1, 1.0, 0.0, int(self._ref_feats[0].count), REASON_FIRST_FRAME)
        )
        if self._reloc is not None:
            self._reloc.add_keyframe(
                pyr.gray[0], pyr.depth[0], self.gop.last_key_R,
                self.gop.last_key_t, node=self.gop.last_key_index,
            )
        self._prev_pyr = pyr
        return self.gop.global_pose(0)

    def _resolve(
        self, pyr, timestamp, frame_num, R_d, t_d, finest_d, targets, t_start
    ):
        """Host-side bookkeeping for one dispatched step: pull results, decide
        keyframes, maybe rollback-resolve, log trajectory + metrics."""
        # ONE device->host transfer for everything the control flow reads:
        # over a tunneled device each separate scalar pull costs a full RTT
        # (~30 ms here), which would cap the streaming loop at a few Hz
        R, t, finest = jax.device_get((R_d, t_d, finest_d))
        solve_ms = (time.perf_counter() - t_start) * 1000.0

        eps = finest.final_epsilons
        b_cap = residual_b_cap(eps, int(finest.num_points))
        vis = float(finest.visible_ratio)
        n_reproj = int(finest.final_valid.sum())

        # ---- tracking-loss detection + relocalization (beyond-reference,
        # pipeline/relocalize.py) ---------------------------------------
        if self._reloc is not None:
            rcfg = self.cfg.relocalize
            est_finite = bool(np.isfinite(R).all() and np.isfinite(t).all())
            lost = (
                (vis < rcfg.lost_visible_ratio)
                or (n_reproj < rcfg.lost_min_points)
                or (b_cap > rcfg.lost_b_cap)
                or not est_finite
            )
            self._bad_streak = self._bad_streak + 1 if lost else 0
            if self._bad_streak >= rcfg.trigger_consecutive:
                res = self._reloc.relocalize(pyr.gray[0])
                if res is not None:
                    return self._relocalized(
                        pyr, targets, timestamp, frame_num, res, finest,
                        b_cap, vis, t_start,
                    )

        # ---- keyframe decision (:2122-2160) --------------------------
        kf_cfg = self.cfg.keyframe
        reason = 0
        if kf_cfg.enable_quality_triggers:
            if b_cap > kf_cfg.laplacian_b_thresh:
                reason = REASON_LAPLACIAN_THRESH
            if vis < kf_cfg.min_visible_ratio:
                reason = REASON_LOW_VISIBILITY
            if n_reproj < kf_cfg.min_reprojected_pts:
                reason = REASON_TOO_FEW_REPROJECTIONS
        if (frame_num - self._last_ref_frame) == kf_cfg.force_every:
            reason = REASON_PERIODIC

        rolled_back = False
        if (
            reason != 0
            and kf_cfg.rollback_resolve
            and self._last_ref_frame != (frame_num - 1)
            and self._prev_pyr is not None
        ):
            # __NEW__REF_UPDATE (:2194-2233): the current estimate is
            # distrusted; promote frame n-1 to the reference keyframe, reset
            # the relative pose, and re-run the full pyramid solve.
            self._last_ref_frame = frame_num - 1
            self._set_ref(self._prev_pyr, targets=self._prev_targets)
            self.gop.update_most_recent_to_keyframe(reason)
            R_d, t_d, diags = self._solve(
                self._ref_feats,
                targets,
                jnp.eye(3, dtype=jnp.float32),
                jnp.zeros(3, dtype=jnp.float32),
            )
            R, t, finest = jax.device_get((R_d, t_d, diags[0]))
            rolled_back = True
            eps = finest.final_epsilons
            b_cap = residual_b_cap(eps, int(finest.num_points))
            vis = float(finest.visible_ratio)
            # the new ref IS frame n-1, whose relative pose is identity — the
            # inter-frame velocity estimate survives the rollback
            self._dispatch_warm = (
                jnp.eye(3, dtype=jnp.float32),
                jnp.zeros(3, jnp.float32),
            )
            if self._reloc is not None and self._bad_streak == 0:
                # frame n-1 was promoted to keyframe at gop.last_key_* —
                # register it (healthy frames only: a lost streak must not
                # poison the appearance database with garbage poses)
                self._reloc.add_keyframe(
                    self._prev_pyr.gray[0], self._prev_pyr.depth[0],
                    self.gop.last_key_R, self.gop.last_key_t,
                    node=self.gop.last_key_index,
                )
        elif reason != 0 and not kf_cfg.rollback_resolve:
            # __OLD__REF_UPDATE naive variant (:2166-2191): current frame
            # becomes the keyframe with the (possibly bad) estimate kept.
            self.gop.push_keyframe(frame_num, reason, np.asarray(R), np.asarray(t), timestamp)
            self._last_ref_frame = frame_num
            self._set_ref(pyr, targets=targets)
            self._R = np.eye(3)
            self._t = np.zeros(3)
            if self._reloc is not None and self._bad_streak == 0:
                self._reloc.add_keyframe(
                    pyr.gray[0], pyr.depth[0],
                    self.gop.last_key_R, self.gop.last_key_t,
                    node=self.gop.last_key_index,
                )
            self._record(frame_num, solve_ms, finest, b_cap, vis, reason, False)
            self._prev_pyr = pyr
            self._prev_targets = targets
            return self.gop.global_pose(-1)

        R_np = np.asarray(R, np.float64)
        t_np = np.asarray(t, np.float64)
        # failure detection: a non-finite estimate (degenerate frame, empty
        # edge set) must never poison the trajectory — keep the previous
        # relative pose and flag the frame (the reference force-enables
        # asserts instead, /root/reference/include/SolveDVO.h:124-125)
        diverged = not (np.isfinite(R_np).all() and np.isfinite(t_np).all())
        if not diverged:
            self._R = R_np
            self._t = t_np
            # next frame warm-starts from the device copy we already hold;
            # the warm pair this frame dispatched FROM is its predecessor's
            # resolved pose — exactly the constant-velocity "previous pose"
            self._prevpose_dev = self._dispatch_warm
            self._warm_dev = (R_d, t_d)
        else:
            self._warm_dev = None
            self._prevpose_dev = None
        self.gop.push_ordinary(frame_num, self._R, self._t, timestamp)
        self._record(frame_num, solve_ms, finest, b_cap, vis, reason, rolled_back, diverged)
        self._prev_pyr = pyr
        self._prev_targets = targets
        return self.gop.global_pose(-1)

    # ------------------------------------------------------------------
    def _relocalized(
        self, pyr, targets, timestamp, frame_num, res, finest, b_cap, vis, t_start
    ):
        """Re-anchor the trajectory at a recovered global pose: the current
        frame becomes the reference keyframe (REASON_RELOCALIZED) at the
        pose PnP verified against the appearance database; tracking resumes
        from identity relative pose. The discarded solve's diagnostics are
        still recorded for observability."""
        solve_ms = (time.perf_counter() - t_start) * 1000.0
        self._last_ref_frame = frame_num
        self._set_ref(pyr, targets=targets)  # also resets _R/_t + warm start
        self.gop.push_keyframe_absolute(
            frame_num, REASON_RELOCALIZED, res.R, res.t, timestamp
        )
        self._bad_streak = 0
        # the recovered frame is itself a healthy keyframe with a verified
        # global pose — future losses can re-anchor against it
        self._reloc.add_keyframe(
            pyr.gray[0], pyr.depth[0], self.gop.last_key_R,
            self.gop.last_key_t, node=self.gop.last_key_index,
        )
        self._record(
            frame_num, solve_ms, finest, b_cap, vis, REASON_RELOCALIZED, False
        )
        self._prev_pyr = pyr
        self._prev_targets = targets
        return self.gop.global_pose(-1)

    # ------------------------------------------------------------------
    def process_stream(self, pyramids):
        """Latency-hiding pipelined streaming over (pyramid, timestamp) items.

        Sequential streaming pays (dispatch RTT + device compute + readback
        RTT) per frame because each step's warm start is the previous frame's
        RESOLVED pose. Here frame n+1's step dispatches with frame n's
        still-in-flight device outputs as the warm start (pure device
        chaining, no host sync), and frame n's bookkeeping resolves while
        n+1 computes — one readback latency per frame is hidden.

        Bit-identical to the sequential loop: the speculation is only valid
        while the resolved state keeps the chain intact (no keyframe switch,
        rollback, or divergence). When resolution breaks the chain, the
        speculative dispatch is DISCARDED and re-issued from the corrected
        state, exactly reproducing sequential behaviour
        (tests/test_pipeline.py pins trajectory + metrics equality).

        Measured caveat (BASELINE.md): this container's tunneled device makes
        DISPATCH ITSELF a synchronous RTT, so there is nothing left to hide
        and speculation's keyframe re-dispatches make it slightly slower
        (12.7 vs 17.6 Hz). The mode targets runtimes with asynchronous
        dispatch, where the readback->dispatch serialization it removes is
        the streaming bottleneck.

        Yields the global pose (R, t) per frame, in order.
        """
        pend = None  # (pyr, ts, fnum, R_d, t_d, finest_d, targets, t0, warm)

        def _dispatch(pyr, warm, prev):
            # `prev` is the warm pair of the frame BEFORE the one warm-
            # starting this dispatch — the constant-velocity "previous pose".
            if self._cv:
                p = prev if prev is not None else warm
                return self._step_cv(
                    self._ref_feats, pyr.gray, warm[0], warm[1], p[0], p[1]
                )
            return self._step(self._ref_feats, pyr.gray, warm[0], warm[1])

        for pyr, ts in pyramids:
            self._frame_num += 1
            fnum = self._frame_num
            if fnum == 0:
                yield self._bootstrap(pyr, ts)
                continue
            if pend is None:
                # warm start from resolved state (first steady-state frame
                # or just after a chain break)
                if self._warm_dev is None:
                    self._warm_dev = (
                        jnp.asarray(self._R, jnp.float32),
                        jnp.asarray(self._t, jnp.float32),
                    )
                warm = self._warm_dev
                t0 = time.perf_counter()
                handles = _dispatch(pyr, warm, self._prevpose_dev)
                pend = (pyr, ts, fnum, *handles, t0, warm)
                continue
            # speculative dispatch for THIS frame chained off the pending
            # frame's un-resolved device outputs; its "previous pose" is the
            # warm pair the pending frame itself dispatched from — the same
            # value the sequential loop would use once that frame resolves
            spec_warm = (pend[3], pend[4])
            t0 = time.perf_counter()
            handles = _dispatch(pyr, spec_warm, pend[8])
            # resolve the pending frame (overlaps the speculative compute)
            p_pyr, p_ts, p_fnum, p_R, p_t, p_fin, p_tg, p_t0, p_warm = pend
            self._dispatch_warm = p_warm
            pose = self._resolve(p_pyr, p_ts, p_fnum, p_R, p_t, p_fin, p_tg, p_t0)
            chain_intact = (
                self._warm_dev is not None and self._warm_dev[0] is p_R
            )
            if not chain_intact:
                # keyframe switch / rollback / divergence: the speculation
                # used a stale ref or warm start — re-issue from truth
                if self._warm_dev is None:
                    self._warm_dev = (
                        jnp.asarray(self._R, jnp.float32),
                        jnp.asarray(self._t, jnp.float32),
                    )
                t0 = time.perf_counter()
                handles = _dispatch(pyr, self._warm_dev, self._prevpose_dev)
                spec_warm = self._warm_dev
            pend = (pyr, ts, fnum, *handles, t0, spec_warm)
            yield pose
        if pend is not None:
            p_pyr, p_ts, p_fnum, p_R, p_t, p_fin, p_tg, p_t0, p_warm = pend
            self._dispatch_warm = p_warm
            yield self._resolve(p_pyr, p_ts, p_fnum, p_R, p_t, p_fin, p_tg, p_t0)

    # ------------------------------------------------------------------
    def _set_ref(self, pyr: FramePyramid, targets=None):
        """setRcvdFrameAsRefFrame / setPrevFrameAsRefFrame + preProcessRefFrame
        (/root/reference/src/SolveDVO.cpp:537-586, :269-303). When the
        frame's now-targets are at hand their edge maps feed extraction
        directly (bit-identical, Canny skipped)."""
        if targets is not None:
            edges = tuple(t.edges for t in targets)
            self._ref_feats = self._extract_ref_from_edges(
                pyr.gray, pyr.depth, edges
            )
        else:
            self._ref_feats = self._extract_ref(pyr.gray, pyr.depth)
        self._R = np.eye(3)
        self._t = np.zeros(3)
        # identity is built on-device (no host transfer)
        self._warm_dev = (jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        # a ref switch re-bases the relative poses; velocity evidence in the
        # old basis is dropped (one-frame "hold" hiccup). The rollback path
        # restores it right after via _dispatch_warm = identity.
        self._prevpose_dev = None

    def _record(self, frame_num, solve_ms, finest, b_cap, vis, reason, rolled_back, diverged=False):
        self.metrics.append(
            FrameMetrics(
                frame_num=frame_num,
                solve_ms=solve_ms,
                best_energy=float(finest.best_energy),
                best_iter=int(finest.best_iter),
                visible_ratio=vis,
                b_cap=b_cap,
                num_points=int(finest.num_points),
                keyframe_reason=reason,
                rolled_back=rolled_back,
                energy_curve=np.asarray(finest.energy),
                diverged=diverged,
                final_epsilons=(
                    np.asarray(finest.final_epsilons) if self.keep_residuals else None
                ),
                final_valid=(
                    np.asarray(finest.final_valid) if self.keep_residuals else None
                ),
            )
        )

    # ------------------------------------------------------------------
    def keyframe_cloud(self):
        """(points (M,3) float64 metres in the keyframe's camera frame,
        trajectory node index) of the CURRENT reference keyframe's edge
        points — the semi-dense map primitive.

        The points are the finest-level edge set the solver already extracted
        (`RefLevel.pts3d`); composing them through the (optionally
        loop-refined) global trajectory yields the accumulated map the
        reference sketched and commented out
        (/root/reference/src/MentisVisualHandle.cpp:392-476); see
        viz/pointcloud.compose_map. One device_get, paid only when called
        (opt-in per keyframe, not per frame)."""
        f = self._ref_feats[0]
        pts, valid = jax.device_get((f.pts3d, f.valid))
        node = self.gop.keyframe_indices()[-1]
        return np.asarray(pts, np.float64)[np.asarray(valid)], node

    def sync_reloc_db(self) -> int:
        """Refresh the relocalizer database's stored global poses from the
        current trajectory — call after an online pose-graph refinement
        rewrites the Gop (loop_closure.refine_inplace), so a later recovery
        re-anchors onto refined poses instead of pre-refinement drift.
        Returns the number of refreshed entries (0 when --relocalize off)."""
        if self._reloc is None:
            return 0
        return self._reloc.update_poses(self.gop)

    def pose_information(self):
        """On-demand pose-uncertainty query for the LAST resolved frame:
        (info (6,6) float64, sigma2, n_eff) from edge_dvo.pose_information
        at the current relative pose vs the current reference keyframe,
        evaluated on the finest level over all points.

        Beyond the reference (which never quantifies uncertainty).
        Deliberately NOT part of the per-frame hot path: one extra device
        dispatch, paid only when called. `edge_dvo.pose_covariance` turns
        the result into a 6x6 covariance in the solver's twist coordinates.
        Returns None before the second frame (no targets solved yet)."""
        if self._prev_targets is None:
            return None
        if self._info_fn is None:
            scfg = self.cfg.solver
            intr0 = self.intr.at_level(0)
            self._info_fn = jax.jit(
                lambda ref0, now0, R, t: edge_dvo.pose_information(
                    ref0, now0, intr0, scfg, R, t
                )
            )
        info, sigma2, n_eff = self._info_fn(
            self._ref_feats[0],
            self._prev_targets[0],
            jnp.asarray(self._R, jnp.float32),
            jnp.asarray(self._t, jnp.float32),
        )
        return np.asarray(info, np.float64), float(sigma2), float(n_eff)

    # ------------------------------------------------------------------
    def trajectory(self):
        """(T,3,3) R, (T,3) t, (T,) timestamps of the estimated global path."""
        return self.gop.poses()

    def average_solve_ms(self) -> float:
        """Reference prints the running average at exit (:2351)."""
        ms = [m.solve_ms for m in self.metrics if m.frame_num > 0]
        return float(np.mean(ms)) if ms else 0.0
