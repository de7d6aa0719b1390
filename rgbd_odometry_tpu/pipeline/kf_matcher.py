"""Device-resident keyframe appearance store + match/verify machinery.

The shared core of loop-closure detection (pipeline/loop_closure.py) and
relocalization after tracking loss (pipeline/relocalize.py): sparse
Harris/patch keypoints per keyframe (ops/features.py) held in a growable
stacked slot store, one batched MXU dispatch matching a query frame against
EVERY stored keyframe at once, and per-candidate geometric verification —
epipolar RANSAC filter (ops/epipolar.py) followed by RANSAC PnP
(solvers/pnp.py) against the stored keyframe's backprojected 3D points.

This is capability the reference does not have (its GOP composes drift
forever and its loop() has no recovery path, /root/reference/src/GOP.cpp:
138-186, src/SolveDVO.cpp:2122-2160); the machinery reuses the reference's
own feature-VO building blocks (src/PnPOdometry.cpp:472-492 matching
semantics) batched the TPU way.

Host drives only candidate selection; detection, matching and verification
are jitted/vmapped device code.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.ops import features as feat
from rgbd_odometry_tpu.ops.epipolar import ransac_fundamental_filter
from rgbd_odometry_tpu.solvers import pnp


@dataclass(frozen=True)
class MatcherConfig:
    """Geometry/appearance knobs shared by both matcher consumers."""

    max_keypoints: int = 384
    epipolar_threshold_px: float = 3.0
    ransac_hypotheses: int = 64
    min_depth_mm: float = 100.0  # usable-keypoint depth gate (matches FeatureVo)
    # lower bound on the match distance gate (ops/features.match): the
    # reference-parity 1e-3 for loop closure; relocalization uses ~0.2
    # because its success case is a near-duplicate frame, where the relative
    # 3*min_d gate degenerates (see the match docstring)
    dist_gate_floor: float = 1e-3
    # initial keyframe-slot capacity: every query matches against ALL stored
    # keyframes in ONE vmapped MXU pass (static shape -> one dispatch; a
    # per-pair host loop costs a dispatch RTT per stored keyframe). When the
    # store fills, the slot buffer DOUBLES — one extra compile of the batched
    # matcher per doubling, and every keyframe stays matchable forever (no
    # silent loss past a fixed cap)
    slot_capacity: int = 64


class StoredKeyframe(NamedTuple):
    kps: feat.Keypoints
    pts3d: jnp.ndarray  # (K, 3) backprojected keypoints (camera frame, m)
    pts_valid: jnp.ndarray  # (K,)


class StoredPoints(NamedTuple):
    """What the store retains per keyframe BESIDES the slot buffer: the
    backprojected 3D points verification's PnP stage needs. The keypoint
    arrays themselves live ONLY in the stacked slot buffer (`slot_kps`
    slices them back out) — keeping each keyframe's Keypoints separately
    doubled the database's live-array count, the dominant host growth of
    endurance runs (tools/endurance.py)."""

    pts3d: jnp.ndarray  # (K, 3)
    pts_valid: jnp.ndarray  # (K,)


class Verification(NamedTuple):
    R: np.ndarray  # (3,3) stored->query relative pose (solver convention)
    t: np.ndarray  # (3,)
    num_inliers: int


class KeyframeMatcher:
    """Growable device keypoint store with batched query + verification."""

    def __init__(self, intr: Intrinsics, config: MatcherConfig | None = None, seed: int = 0):
        self.intr = intr
        self.cfg = config or MatcherConfig()
        self._key = jax.random.PRNGKey(seed)
        self.stored: List[StoredPoints] = []
        # fixed-capacity stacked keypoint store (device-resident): slot s
        # holds keyframe s's Keypoints; unused slots are all-invalid and
        # fall out of the batched matching naturally
        self._slots: Optional[feat.Keypoints] = None

        self._detect = jax.jit(
            lambda g: feat.detect_and_describe(g, self.cfg.max_keypoints)
        )
        # detection + backprojection fused into one dispatch (the tunnel
        # charges a full RTT per call)
        self._detect_bp = jax.jit(self._detect_backproject)
        # ONE dispatch matches the query against every stored slot
        floor = self.cfg.dist_gate_floor
        self._match_all = jax.jit(
            jax.vmap(
                lambda r, n: feat.match(r, n, dist_gate_floor=floor),
                in_axes=(0, None),
            )
        )
        self._epi = jax.jit(
            lambda k, uv1, uv2, v: ransac_fundamental_filter(
                k, uv1, uv2, v, threshold_px=self.cfg.epipolar_threshold_px
            )
        )

        def _solve(key, obj, imn, valid):
            return pnp.ransac_pnp(
                key, obj, imn, valid, num_hypotheses=self.cfg.ransac_hypotheses
            )

        self._pnp = jax.jit(_solve)

    # ---- store -----------------------------------------------------------
    def _detect_backproject(self, gray: jnp.ndarray, depth_mm: jnp.ndarray):
        kps = feat.detect_and_describe(gray, self.cfg.max_keypoints)
        h, w = depth_mm.shape
        ui = jnp.clip(kps.uv[:, 0].astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(kps.uv[:, 1].astype(jnp.int32), 0, h - 1)
        z_mm = jnp.take(depth_mm.reshape(-1), vi * w + ui)
        valid = kps.valid & (z_mm > self.cfg.min_depth_mm)
        z = z_mm / 1000.0
        x = z * (kps.uv[:, 0] - self.intr.cx) / self.intr.fx
        y = z * (kps.uv[:, 1] - self.intr.cy) / self.intr.fy
        return kps, jnp.stack([x, y, z], -1), valid

    def describe(self, gray, depth_mm) -> StoredKeyframe:
        """Keypoints + descriptors + backprojected 3D points for one frame
        (not stored yet — callers may query before/without storing)."""
        kps, pts3d, pvalid = self._detect_bp(
            jnp.asarray(gray, jnp.float32), jnp.asarray(depth_mm, jnp.float32)
        )
        return StoredKeyframe(kps=kps, pts3d=pts3d, pts_valid=pvalid)

    def detect(self, gray) -> feat.Keypoints:
        """Query-side keypoints only (no depth needed: verification uses the
        STORED keyframe's 3D points seen in the query image)."""
        return self._detect(jnp.asarray(gray, jnp.float32))

    def _empty_slots(self, kps_like):
        s = self.cfg.slot_capacity
        return jax.tree_util.tree_map(
            lambda x: jnp.zeros((s,) + x.shape, x.dtype), kps_like
        )

    def num_slots(self) -> int:
        if self._slots is None:
            return 0
        return jax.tree_util.tree_leaves(self._slots)[0].shape[0]

    def store(self, sk: StoredKeyframe) -> int:
        """Append to the slot store (doubling when full); returns the slot."""
        idx = len(self.stored)
        if self._slots is None:
            self._slots = self._empty_slots(sk.kps)
        if idx == self.num_slots():
            # full: double the buffer (new slots all-invalid). One recompile
            # of the batched matcher per doubling; log2(total/initial) ever.
            self._slots = jax.tree_util.tree_map(
                lambda buf: jnp.concatenate([buf, jnp.zeros_like(buf)], axis=0),
                self._slots,
            )
        self._slots = jax.tree_util.tree_map(
            lambda buf, x: buf.at[idx].set(x), self._slots, sk.kps
        )
        self.stored.append(StoredPoints(pts3d=sk.pts3d, pts_valid=sk.pts_valid))
        return idx

    def replace(self, slot: int, sk: StoredKeyframe) -> None:
        """Overwrite an existing slot in place (eviction policies live in the
        consumers — e.g. Relocalizer's nearest-pose eviction at its
        max_keyframes cap); the slot buffer neither grows nor recompiles."""
        if not 0 <= slot < len(self.stored):
            raise IndexError(f"slot {slot} not in use (0..{len(self.stored)-1})")
        self._slots = jax.tree_util.tree_map(
            lambda buf, x: buf.at[slot].set(x), self._slots, sk.kps
        )
        self.stored[slot] = StoredPoints(pts3d=sk.pts3d, pts_valid=sk.pts_valid)

    def slot_kps(self, slot: int) -> feat.Keypoints:
        """Keypoints of stored keyframe `slot`, sliced from the slot buffer
        (the only place they live)."""
        return jax.tree_util.tree_map(lambda buf: buf[slot], self._slots)

    # ---- query -----------------------------------------------------------
    def match_all(self, kps: feat.Keypoints):
        """Match `kps` against every stored slot in one batched dispatch.

        Returns (all_matches, goods) where all_matches has a leading slot
        axis and goods is the per-slot good-match count on host; (None,
        empty) when nothing is stored."""
        if not self.stored:
            return None, np.zeros((0,), np.int64)
        all_m = self._match_all(self._slots, kps)
        return all_m, np.asarray(all_m.num_good)

    def verify(
        self,
        slot: int,
        kps: feat.Keypoints,
        all_m,
        min_epi_inliers: int,
        min_pnp_inliers: int,
    ) -> Optional[Verification]:
        """Geometrically verify candidate `slot`: epipolar RANSAC filter on
        the matched pixel pairs, then RANSAC PnP of the stored keyframe's 3D
        points against the query image. Returns the stored->query relative
        pose (the solver's p_query = R (p_stored - t) convention — PnP
        returns the query camera's pose in the stored keyframe's frame) or
        None if either stage falls short."""
        old = self.stored[slot]
        old_kps = self.slot_kps(slot)
        m = jax.tree_util.tree_map(lambda x: x[slot], all_m)
        uv_old = jnp.take(old_kps.uv, m.ref_idx, axis=0)
        valid = m.good & kps.valid & jnp.take(old_kps.valid, m.ref_idx, axis=0)
        self._key, ek = jax.random.split(self._key)
        epi = self._epi(ek, kps.uv, uv_old, valid)
        if int(epi.num_inliers) < min_epi_inliers:
            return None
        obj = jnp.take(old.pts3d, m.ref_idx, axis=0)
        ov = jnp.take(old.pts_valid, m.ref_idx, axis=0)
        imn = pnp.normalize_image_points(kps.uv, self.intr)
        self._key, pk = jax.random.split(self._key)
        res = self._pnp(pk, obj, imn, epi.inliers & ov)
        if int(res.num_inliers) < min_pnp_inliers:
            return None
        return Verification(
            R=np.asarray(res.R, np.float64),
            t=np.asarray(res.t, np.float64),
            num_inliers=int(res.num_inliers),
        )
