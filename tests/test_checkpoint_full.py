"""Full-pipeline checkpoint/resume: recovery state survives the snapshot.

The round-4 gap (utils/checkpoint.py then excluded the relocalizer database
and had no LoopCloser persistence): a resumed run could not re-anchor
against pre-checkpoint keyframes, while the docstring claimed "bit-exact
resume". These tests pin the closed gap:

  * kill-and-resume with relocalization enabled, blackout+teleport placed
    AFTER the resume point: the resumed run recovers against keyframes
    stored BEFORE the checkpoint and reproduces the uninterrupted run's
    trajectory AND recovery behavior exactly (same PRNG continuation).
  * LoopCloser roundtrip: restored keyframe store + closure log produce
    identical refinement output, and post-resume keyframes close loops
    onto pre-checkpoint keyframes.
  * raw odometry-edge chain roundtrip (online --refine-every across resume).

The reference has nothing comparable: its GOP lives in memory and a crash
loses the run (/root/reference/src/GOP.cpp:125).
"""

import os
import tempfile

import numpy as np

from rgbd_odometry_tpu.config import (
    CameraConfig,
    KeyframeConfig,
    PipelineConfig,
    PyramidConfig,
    RelocalizeConfig,
    SolverConfig,
)
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.io.synthetic import render_sequence
from rgbd_odometry_tpu.pipeline.gop import REASON_RELOCALIZED
from rgbd_odometry_tpu.pipeline.loop_closure import LoopCloser, LoopClosureConfig
from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry
from rgbd_odometry_tpu.utils.checkpoint import (
    load_loop_closer,
    load_odometry,
    load_raw_rels,
    save_odometry,
)

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0, cx=79.5, cy=59.5)

RELOC = RelocalizeConfig(
    enabled=True,
    trigger_consecutive=1,
    min_matches=20,
    min_inliers=12,
)


def _config():
    return PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, max_points=(2048, 1024, 512)),
        solver=SolverConfig(method="gauss_newton", iterations=(50, 8, 5)),
        keyframe=KeyframeConfig(
            force_every=5, enable_quality_triggers=True, rollback_resolve=True
        ),
        relocalize=RELOC,
    )


def _smooth_psis(n, step=0.004):
    ts = np.arange(n)
    return np.stack(
        [0.8 * step * ts, -0.5 * step * ts, 0.3 * step * ts,
         0.15 * step * ts, -0.2 * step * ts, 0.1 * step * ts], -1
    ).astype(np.float32)


def _blackout_teleport_seq():
    """6 tracked frames, then 3 blanks, then 4 frames teleported back near
    the origin — recovery must re-anchor against an EARLY keyframe, which
    only works after resume if the database survived the checkpoint."""
    frames_a, _ = render_sequence(CAM, _smooth_psis(6, step=0.012), seed=0)
    frames_b, poses_b = render_sequence(CAM, _smooth_psis(4, step=0.002), seed=0)
    blank = (np.zeros((120, 160), np.float32), np.zeros((120, 160), np.float32))
    return list(frames_a) + [blank] * 3 + list(frames_b), poses_b


def test_resume_preserves_relocalizer_recovery():
    """Checkpoint placed BEFORE the blackout: the resumed run must (a) still
    recover — possible only because the appearance DB was persisted — and
    (b) reproduce the uninterrupted run's trajectory bit-exactly (the
    matcher PRNG key is saved, so RANSAC draws continue identically)."""
    seq, _ = _blackout_teleport_seq()
    cut = 6  # checkpoint after the healthy frames, before the blackout

    odo_full = EdgeDvoOdometry(_config())
    for i, (g, d) in enumerate(seq):
        odo_full.process_frame(g, d, timestamp=float(i))

    odo_a = EdgeDvoOdometry(_config())
    for i, (g, d) in enumerate(seq[:cut]):
        odo_a.process_frame(g, d, timestamp=float(i))
    assert len(odo_a._reloc) >= 1  # pre-checkpoint keyframes in the DB
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "snap.npz")
        save_odometry(odo_a, p)
        odo_b = load_odometry(p)
    # the database came back: same size, same anchor poses, same counters
    assert len(odo_b._reloc) == len(odo_a._reloc)
    for (Ra, ta), (Rb, tb) in zip(odo_a._reloc.poses, odo_b._reloc.poses):
        np.testing.assert_array_equal(Ra, Rb)
        np.testing.assert_array_equal(ta, tb)
    assert odo_b._reloc.nodes == odo_a._reloc.nodes

    for i, (g, d) in enumerate(seq[cut:], start=cut):
        odo_b.process_frame(g, d, timestamp=float(i))

    # recovery happened post-resume, anchored on a pre-checkpoint keyframe
    reasons = [e.reason for e in odo_b.gop.elements]
    assert REASON_RELOCALIZED in reasons, reasons
    assert odo_b._reloc.successes >= 1

    # and the resumed trajectory equals the uninterrupted one exactly
    R1, t1, _ = odo_full.trajectory()
    R2, t2, _ = odo_b.trajectory()
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(R1, R2)
    assert [e.reason for e in odo_full.gop.elements] == reasons


def test_loop_closer_roundtrip_and_post_resume_closures():
    """Restored LoopCloser: identical store/closures/refinement, and NEW
    keyframes close loops onto pre-checkpoint keyframes."""
    from tests.test_loop_closure import _out_and_back

    cam = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)
    psis = _out_and_back()
    frames, poses = render_sequence(cam, psis, seed=0)
    intr = Intrinsics.from_config(cam)

    lc_full = LoopCloser(intr, LoopClosureConfig(min_separation=4))
    for i, (g, d) in enumerate(frames):
        lc_full.add_keyframe(i, g, d)
    assert lc_full.closures

    cut = 6
    lc_a = LoopCloser(intr, LoopClosureConfig(min_separation=4))
    for i, (g, d) in enumerate(frames[:cut]):
        lc_a.add_keyframe(i, g, d)
    # piggyback on an odometry snapshot, as the CLI does
    odo = EdgeDvoOdometry(_config())
    odo.process_frame(*frames[0], timestamp=0.0)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "snap.npz")
        save_odometry(odo, p, closer=lc_a, raw_rels=[])
        lc_b = load_loop_closer(p, intr, LoopClosureConfig(min_separation=4))
        assert load_raw_rels(p) == []
        # a checkpoint saved WITHOUT a closer restores None
        p2 = os.path.join(td, "noclose.npz")
        save_odometry(odo, p2)
        assert load_loop_closer(p2, intr) is None
        assert load_raw_rels(p2) is None

    assert len(lc_b.keyframes) == len(lc_a.keyframes)
    assert [k.node for k in lc_b.keyframes] == [k.node for k in lc_a.keyframes]
    for s, (sa, sb) in enumerate(zip(lc_a.matcher.stored, lc_b.matcher.stored)):
        np.testing.assert_array_equal(
            np.asarray(lc_a.matcher.slot_kps(s).desc),
            np.asarray(lc_b.matcher.slot_kps(s).desc),
        )
        np.testing.assert_array_equal(np.asarray(sa.pts3d), np.asarray(sb.pts3d))
    np.testing.assert_array_equal(
        np.asarray(lc_a.matcher._key), np.asarray(lc_b.matcher._key)
    )

    # post-resume keyframes close loops onto the restored (pre-checkpoint)
    # store, reproducing the uninterrupted closer's results exactly
    for i, (g, d) in enumerate(frames[cut:], start=cut):
        lc_b.add_keyframe(i, g, d)
    assert [(c[0], c[1], c[4]) for c in lc_b.closures] == [
        (c[0], c[1], c[4]) for c in lc_full.closures
    ]
    for cb, cf in zip(lc_b.closures, lc_full.closures):
        np.testing.assert_array_equal(cb[2], cf[2])
        np.testing.assert_array_equal(cb[3], cf[3])

    # refinement from the restored state matches the uninterrupted one
    R0 = np.stack([p_[0] for p_ in poses])
    t0 = np.stack([p_[1] for p_ in poses])
    Rb, tb, _ = lc_b.reanchor(R0, t0)
    Rf, tf, _ = lc_full.reanchor(R0, t0)
    np.testing.assert_array_equal(tb, tf)
    np.testing.assert_array_equal(Rb, Rf)


def test_raw_rels_roundtrip():
    rng = np.random.default_rng(0)
    rels = []
    for _ in range(5):
        w = 0.01 * rng.standard_normal(3)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]) / max(th, 1e-12)
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        rels.append((R, 0.01 * rng.standard_normal(3)))
    odo = EdgeDvoOdometry(_config())
    g = 40.0 + 10.0 * rng.standard_normal((120, 160)).astype(np.float32)
    d = 2000.0 + np.zeros((120, 160), np.float32)
    odo.process_frame(g, d, timestamp=0.0)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "snap.npz")
        save_odometry(odo, p, raw_rels=rels)
        back = load_raw_rels(p)
    assert len(back) == 5
    for (Ra, ta), (Rb, tb) in zip(rels, back):
        np.testing.assert_array_equal(np.asarray(Ra, np.float64), Rb)
        np.testing.assert_array_equal(np.asarray(ta, np.float64), tb)
