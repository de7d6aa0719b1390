"""Loop-closure detection + trajectory refinement.

Goes beyond the reference (whose GOP freezes drift forever,
/root/reference/src/GOP.cpp:138-186): keyframes carry sparse Harris/patch
descriptors (ops/features.py); each new keyframe is matched against all
stored keyframes in one batched MXU pass; epipolar-consistent candidates
(ops/epipolar.py) with enough matches yield a relative pose from
RANSAC PnP (solvers/pnp.py); the resulting loop-closure edges feed the
batched pose-graph Gauss-Newton (solvers/pose_graph.py), which
redistributes accumulated drift over the whole trajectory.

The keyframe store / batched matching / geometric verification live in
pipeline/kf_matcher.KeyframeMatcher (shared with the relocalizer); this
module adds candidate policy, closure-edge bookkeeping and the pose-graph
refinement entry point.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.pipeline.kf_matcher import (
    KeyframeMatcher,
    MatcherConfig,
    StoredKeyframe,
)
from rgbd_odometry_tpu.solvers.pose_graph import (
    PoseGraphEdges,
    concat_edges,
    odometry_edges,
    refine_pose_graph,
)


@dataclass
class LoopClosureConfig:
    max_keypoints: int = 384
    min_matches: int = 30  # descriptor matches to consider a candidate
    min_inliers: int = 20  # PnP inliers to accept the closure
    min_separation: int = 3  # skip temporally-adjacent keyframes
    # geometric verification (epipolar + RANSAC-PnP, one host-driven dispatch
    # pair per candidate) runs only for the top-N candidates by descriptor
    # match count; the rest are counted in `skipped_candidates` (not silent).
    # Slow-moving dense keyframe streams otherwise verify every overlapping
    # frame — O(T^2) dispatches over a trajectory
    max_candidates_per_keyframe: int = 4
    ransac_hypotheses: int = 64
    epipolar_threshold_px: float = 3.0
    edge_weight: float = 3.0  # closures weigh more than single odometry steps
    min_depth_mm: float = 100.0  # usable-keypoint depth gate (matches FeatureVo)
    # initial keyframe-slot capacity (doubles when full; see KeyframeMatcher)
    slot_capacity: int = 64
    # re-anchoring correction gate: only closures spanning at least this many
    # trajectory nodes are APPLIED (all closures are still detected/recorded).
    # A short-baseline closure carries ~one keyframe-step of drift signal but
    # full PnP measurement noise, so applying it moves the whole downstream
    # trajectory by what is mostly noise; measured on the r5 loop sweeps
    # (validation/refbuild/loop_sweep.py) the separation gate rejects exactly
    # the closures whose measurement error exceeded the drift they corrected
    min_loop_separation: int = 8


@dataclass
class KeyframeRecord:
    node: int  # index into the trajectory being refined
    pts3d: jnp.ndarray  # (K, 3) backprojected keypoints (camera frame)
    pts_valid: jnp.ndarray  # (K,)
    # keypoint arrays live ONLY in the matcher's stacked slot buffer
    # (kf_matcher.slot_kps) — per-record copies doubled endurance memory


class LoopCloser:
    """Accumulates keyframes, detects closures, refines trajectories."""

    def __init__(self, intr: Intrinsics, config: LoopClosureConfig | None = None, seed: int = 0):
        self.intr = intr
        self.cfg = config or LoopClosureConfig()
        self.matcher = KeyframeMatcher(
            intr,
            MatcherConfig(
                max_keypoints=self.cfg.max_keypoints,
                epipolar_threshold_px=self.cfg.epipolar_threshold_px,
                ransac_hypotheses=self.cfg.ransac_hypotheses,
                min_depth_mm=self.cfg.min_depth_mm,
                slot_capacity=self.cfg.slot_capacity,
            ),
            seed=seed,
        )
        # public per-keyframe records. NOTE: pts3d/pts_valid are the SAME
        # array references the matcher's stored list holds (no copies);
        # matcher.stored is the canonical slot index — the two lists grow in
        # lockstep inside add_keyframe and must never be mutated elsewhere
        self.keyframes: List[KeyframeRecord] = []
        self.closures: List[Tuple[int, int, np.ndarray, np.ndarray, int]] = []
        self.skipped_candidates: int = 0  # dropped by max_candidates_per_keyframe

    def _num_slots(self) -> int:
        return self.matcher.num_slots()

    # ------------------------------------------------------------------
    def add_keyframe(self, node: int, gray: np.ndarray, depth_mm: np.ndarray) -> List[int]:
        """Register keyframe at trajectory index `node`; returns the nodes of
        any loop closures detected against previous keyframes."""
        sk = self.matcher.describe(gray, depth_mm)

        found = []
        # one batched dispatch against every stored slot; unused slots are
        # all-invalid -> zero good matches. Every stored keyframe is a
        # candidate — the slot store grows, so closures onto late keyframes
        # are never silently lost
        all_m, goods = self.matcher.match_all(sk.kps)
        candidates = [
            s
            for s, old in enumerate(self.keyframes)
            if abs(node - old.node) >= self.cfg.min_separation
            and int(goods[s]) >= self.cfg.min_matches
        ]
        if len(candidates) > self.cfg.max_candidates_per_keyframe:
            candidates.sort(key=lambda s: -int(goods[s]))
            self.skipped_candidates += (
                len(candidates) - self.cfg.max_candidates_per_keyframe
            )
            candidates = candidates[: self.cfg.max_candidates_per_keyframe]
        for s in candidates:
            v = self.matcher.verify(
                s, sk.kps, all_m, self.cfg.min_matches, self.cfg.min_inliers
            )
            if v is None:
                continue
            # the verification pose is the NEW camera's pose in the OLD
            # keyframe's frame: exactly the old->new relative-pose edge
            old = self.keyframes[s]
            self.closures.append((old.node, node, v.R, v.t, v.num_inliers))
            found.append(old.node)
        self.matcher.store(sk)
        self.keyframes.append(
            KeyframeRecord(node=node, pts3d=sk.pts3d, pts_valid=sk.pts_valid)
        )
        return found

    # ------------------------------------------------------------------
    def closure_edges(self, dtype=jnp.float32) -> Optional[PoseGraphEdges]:
        if not self.closures:
            return None
        i = jnp.asarray([c[0] for c in self.closures], jnp.int32)
        j = jnp.asarray([c[1] for c in self.closures], jnp.int32)
        R_rel = jnp.asarray(np.stack([c[2] for c in self.closures]), dtype)
        t_rel = jnp.asarray(np.stack([c[3] for c in self.closures]), dtype)
        w = jnp.full((len(self.closures),), self.cfg.edge_weight, dtype)
        return PoseGraphEdges(i=i, j=j, R_rel=R_rel, t_rel=t_rel, weight=w)

    def reanchor(
        self, R: np.ndarray, t: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Rigid segment re-anchoring: concentrate each closure's correction
        at its target node instead of smearing it along the chain.

        For each applied closure (i -> j), the SE(3) discrepancy between the
        trajectory's pose of node j and the closure-implied pose T_i * rel is
        applied RIGIDLY to every node >= j (a pose jump at the revisit, the
        standard online-SLAM behavior). Nodes before j — in particular the
        unrevisited middle of the trajectory — are left untouched.

        Why this is the default over pose-graph smearing: edge-DVO odometry
        drift is SYSTEMATIC (motion-correlated, partially self-cancelling on
        return legs), not the white per-edge noise a pose graph models.
        Measured on the r5 loop sweeps, graph refinement improves the
        endpoint but WORSENS full-trajectory ATE by moving unconstrained
        interior nodes (16.9 -> 21.0 mm) — and no edge weighting can fix
        that (an oracle given the TRUE per-edge error magnitudes still
        lands at 20.1 mm), because closures carry no information about
        segments they do not span. Re-anchoring improves BOTH metrics on
        both sweep families (out-and-back and multi-revisit); see
        validation/refbuild/loop_sweep.py.

        Closures shorter than ``min_loop_separation`` nodes are recorded but
        not applied (their measurement noise exceeds the drift they span);
        when several applied closures share a target node the one with the
        most PnP inliers wins. Idempotent: re-running after new frames only
        applies corrections where new drift has accumulated.

        Returns (R, t, applied_norms): corrected trajectory plus the
        translation magnitude (metres) of each applied correction, in
        target-node order.
        """
        R = np.array(R, np.float64, copy=True)
        t = np.array(t, np.float64, copy=True)
        n = len(t)
        best: dict[int, Tuple[int, int, np.ndarray, np.ndarray, int]] = {}
        for c in self.closures:
            ni, nj, _, _, inl = c
            if nj - ni < self.cfg.min_loop_separation or nj >= n or ni < 0:
                continue
            if nj not in best or inl > best[nj][4]:
                best[nj] = c
        applied = []
        for nj in sorted(best):
            ni, _, Rc, tc, _ = best[nj]
            # closure-implied pose of node j: T_i * (Rc, tc)
            Rd = R[ni] @ np.asarray(Rc, np.float64)
            td = t[ni] + R[ni] @ np.asarray(tc, np.float64)
            # rigid delta pivoting at node j: maps T_j onto (Rd, td)
            dR = Rd @ R[nj].T
            dt = td - dR @ t[nj]
            applied.append(float(np.linalg.norm(td - t[nj])))
            t[nj:] = t[nj:] @ dR.T + dt
            R[nj:] = np.einsum("ij,njk->nik", dR, R[nj:])
        return R, t, np.asarray(applied)

    def refine(
        self,
        R: np.ndarray,
        t: np.ndarray,
        iterations: int = 10,
        odo_sqrt_info: Optional[np.ndarray] = None,
        robust: Optional[str] = None,
        robust_delta: float = 1.0,
        edge_traj: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        mode: str = "reanchor",
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Refine an absolute trajectory with the detected closures.

        ``mode``: ``"reanchor"`` (default) — rigid segment re-anchoring, see
        `reanchor` for the measurement-driven rationale; the returned norms
        are the applied correction magnitudes. ``"graph"`` — pose-graph
        Gauss-Newton over odometry + closure edges (all remaining arguments
        apply); improves global closure consistency but can worsen interior
        ATE when drift is systematic.

        ``edge_traj``: optional (R_raw, t_raw) trajectory from which the
        odometry edges are derived, when it differs from the INITIAL guess
        (R, t). Required for repeated ONLINE refinement: deriving odometry
        edges from an already-refined trajectory would make the refined
        poses a zero-residual odometry solution, so each further refinement
        pulls only toward the closures and the odometry measurements are
        progressively forgotten. Passing the raw odometry chain keeps the
        measurements pristine no matter how many times refinement runs.

        ``odo_sqrt_info``: optional (N-1, 6, 6) whitening factors for the
        odometry edges (see pose_graph.normalized_information_sqrt) — built
        from the solver's per-frame `pose_information`, so confidently
        tracked segments resist deformation and weakly-observed ones absorb
        the loop-closure correction.

        ``robust``: optional IRLS kernel ("huber" | "geman") guarding the
        graph against FALSE loop closures (perceptual aliasing passes the
        PnP gate with a geometrically wrong pose); see
        pose_graph.refine_pose_graph."""
        if mode == "reanchor":
            return self.reanchor(R, t)
        if mode != "graph":
            raise ValueError(f"unknown refine mode {mode!r} (reanchor|graph)")
        R_e, t_e = edge_traj if edge_traj is not None else (R, t)
        edges = odometry_edges(
            jnp.asarray(R_e, jnp.float32),
            jnp.asarray(t_e, jnp.float32),
            sqrt_info=(
                None if odo_sqrt_info is None
                else jnp.asarray(odo_sqrt_info, jnp.float32)
            ),
        )
        lc = self.closure_edges()
        if lc is not None:
            edges = concat_edges(edges, lc)
        R_f, t_f, norms = refine_pose_graph(
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), edges,
            iterations=iterations, robust=robust, robust_delta=robust_delta,
        )
        return np.asarray(R_f, np.float64), np.asarray(t_f, np.float64), np.asarray(norms)

    def refine_inplace(self, gop, **kw) -> Optional[np.ndarray]:
        """ONLINE refinement: refine the trajectory logged so far and write
        the corrected poses back into the live Gop — including its
        last-keyframe composition state — so every SUBSEQUENT frame composes
        from the refined anchor (Gop.set_poses). The solver's device-side
        relative pose is untouched: a keyframe's local geometry does not
        change, only its global placement.

        Returns the refinement residual norms, or None when there is nothing
        to refine (no closures yet, or a trivial trajectory). Call this every
        few keyframes for incremental drift correction during streaming; the
        end-of-run `refine` remains the final polish."""
        if not self.closures or len(gop) < 2:
            return None
        R, t, _ = gop.poses()
        R_f, t_f, norms = self.refine(R, t, **kw)
        gop.set_poses(R_f, t_f)
        return norms
