"""Loop-closure detection + refinement (pipeline/loop_closure.py)."""

import numpy as np
import jax.numpy as jnp

from rgbd_odometry_tpu.config import CameraConfig
from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.io.synthetic import render_sequence
from rgbd_odometry_tpu.pipeline.loop_closure import LoopCloser, LoopClosureConfig

CAM = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)


def _out_and_back(n=8, amp=0.04):
    """Absolute pose twists going out and returning to the start."""
    ts = np.arange(n)
    phase = np.sin(np.pi * ts / (n - 1))  # 0 -> 1 -> 0
    psis = np.stack(
        [amp * phase, -0.5 * amp * phase, 0.3 * amp * phase,
         0.2 * amp * phase, -0.2 * amp * phase, 0.1 * amp * phase], -1
    ).astype(np.float32)
    return psis


def test_detects_closures_and_measures_accurate_relative_pose():
    psis = _out_and_back()
    frames, poses = render_sequence(CAM, psis, seed=0)
    intr = Intrinsics.from_config(CAM)
    lc = LoopCloser(intr, LoopClosureConfig(min_separation=4))
    for i, (g, d) in enumerate(frames):
        lc.add_keyframe(i, g, d)
    assert len(lc.closures), "no loop closures found on an out-and-back path"
    # every accepted closure's measured relative pose matches ground truth
    for i, j, R_rel, t_rel, n_inl in lc.closures:
        R_i, t_i = poses[i]
        R_j, t_j = poses[j]
        R_gt = R_i.T @ R_j
        t_gt = R_i.T @ (t_j - t_i)
        assert np.linalg.norm(t_rel - t_gt) < 0.02, (i, j)
        assert np.linalg.norm(R_rel - R_gt) < 0.02, (i, j)
        assert n_inl >= 20


def test_cli_dvo_loop_close(tmp_path, capsys):
    """End-to-end plumbing: dvo --loop-close detects closures between the
    periodic keyframes and the refined trajectory stays accurate."""
    import json

    from rgbd_odometry_tpu.cli import main

    est = str(tmp_path / "est.txt")
    ply = str(tmp_path / "map.ply")
    main(
        [
            "dvo", "--frames", "12", "--cam-scale", "0.5", "--iterations", "10,5,3,2",
            "--keyframe-every", "3", "--loop-close", "--out", est,
            "--map-out", ply,
        ]
    )
    out = capsys.readouterr()
    assert "loop closures:" in out.err
    stats = json.loads(out.out.strip().splitlines()[-1])
    assert stats["ate_rmse"] < 0.02
    # the map composed through the LOOP-REFINED trajectory (the R,t handed to
    # compose_map are post-refine)
    assert "map:" in out.err
    with open(ply) as f:
        assert next(f).strip() == "ply"


def test_slot_store_grows_past_initial_capacity():
    """128 keyframes on an out-back-out path: the slot store doubles at the
    64-keyframe boundary and closures are still detected ONTO keyframes
    stored after the old fixed cap (which round 2 silently dropped).

    The third leg revisits the second leg's positions, so loop closures must
    target keyframes with indices >= 64; their measured relative poses are
    checked against exact ground truth."""
    n, amp = 128, 0.05
    ts = np.arange(n)
    phase = np.abs(np.sin(1.5 * np.pi * ts / (n - 1)))  # 0 -> 1 -> 0 -> 1
    psis = np.stack(
        [amp * phase, -0.5 * amp * phase, 0.3 * amp * phase,
         0.2 * amp * phase, -0.2 * amp * phase, 0.1 * amp * phase], -1
    ).astype(np.float32)
    frames, poses = render_sequence(CAM, psis, seed=0)
    intr = Intrinsics.from_config(CAM)
    # max_keypoints=128 (not the 384 default): the per-keyframe batched
    # matmul against all slots scales as K^2 and dominates this test's wall
    # time on the 1-core host; 128 keypoints still yields closures onto
    # both sides of the growth boundary (verified: same late/early-target
    # coverage, 3x faster)
    lc = LoopCloser(
        intr,
        LoopClosureConfig(
            min_separation=20, max_candidates_per_keyframe=2, max_keypoints=128
        ),
    )
    for i, (g, d) in enumerate(frames):
        lc.add_keyframe(i, g, d)
    assert lc._num_slots() >= 128  # the store actually grew (64 -> 128)
    assert lc.skipped_candidates > 0  # the verification bound engaged (counted)
    late_targets = [c for c in lc.closures if c[0] >= 64]
    assert late_targets, "no closures onto keyframes beyond the old 64 cap"
    early_targets = [c for c in lc.closures if c[0] < 64]
    assert early_targets
    for i, j, R_rel, t_rel, n_inl in late_targets:
        R_i, t_i = poses[i]
        R_j, t_j = poses[j]
        R_gt = R_i.T @ R_j
        t_gt = R_i.T @ (t_j - t_i)
        assert np.linalg.norm(t_rel - t_gt) < 0.02, (i, j)
        assert np.linalg.norm(R_rel - R_gt) < 0.02, (i, j)


def test_refinement_pulls_drifted_trajectory_back():
    psis = _out_and_back()
    frames, poses = render_sequence(CAM, psis, seed=0)
    R_gt = np.stack([p[0] for p in poses])
    t_gt = np.stack([p[1] for p in poses])
    # drifted odometry estimate: integrate noisy relatives
    rng = np.random.default_rng(3)
    Rs, ts = [R_gt[0]], [t_gt[0]]
    for k in range(len(poses) - 1):
        dR = R_gt[k].T @ R_gt[k + 1]
        dt = R_gt[k].T @ (t_gt[k + 1] - t_gt[k])
        noise = np.concatenate(
            [rng.normal(0, 0.004, 3), rng.normal(0, 0.004, 3)]
        ).astype(np.float32)
        nR, nt = geo.se3_exp(jnp.asarray(noise))
        dR = dR @ np.asarray(nR, np.float64)
        dt = dt + np.asarray(nt, np.float64)
        ts.append(ts[-1] + Rs[-1] @ dt)
        Rs.append(Rs[-1] @ dR)
    R_d, t_d = np.stack(Rs), np.stack(ts)

    intr = Intrinsics.from_config(CAM)
    lc = LoopCloser(intr, LoopClosureConfig(min_separation=4))
    for i, (g, d) in enumerate(frames):
        lc.add_keyframe(i, g, d)
    assert len(lc.closures)
    R_f, t_f, norms = lc.refine(R_d, t_d, mode="graph")
    assert norms[-1] < norms[0]
    err_before = np.linalg.norm(t_d - t_gt, axis=-1).mean()
    err_after = np.linalg.norm(t_f - t_gt, axis=-1).mean()
    assert err_after < err_before
    # the revisit point is where closures act: strong improvement there
    end_before = np.linalg.norm(t_d[-1] - t_gt[-1])
    end_after = np.linalg.norm(t_f[-1] - t_gt[-1])
    assert end_after < max(0.6 * end_before, 2e-3)


def test_refine_with_information_weighted_odometry_edges():
    """Heterogeneous confidence: half the chain's edges are accurate, half
    noisy. Whitening odometry edges by per-edge information (accurate edges
    stiff, noisy edges soft) must steer the loop-closure correction into the
    noisy half — strictly better trajectory than the isotropic refine."""
    rng = np.random.default_rng(7)
    n = 12
    # GT: straight line along x, identity rotations
    t_gt = np.stack([np.array([0.1 * k, 0.0, 0.0]) for k in range(n)])
    R_gt = np.stack([np.eye(3)] * n)
    sig = np.array([0.0005] * 6 + [0.02] * (n - 1 - 6))  # per-edge noise level
    Rs, ts = [R_gt[0]], [t_gt[0]]
    for k in range(n - 1):
        dt = t_gt[k + 1] - t_gt[k] + rng.normal(0, sig[k], 3)
        nR, _ = geo.se3_exp(jnp.asarray(
            np.concatenate([np.zeros(3), rng.normal(0, sig[k], 3)]), jnp.float32))
        ts.append(ts[-1] + Rs[-1] @ dt)
        Rs.append(Rs[-1] @ np.asarray(nR, np.float64))
    R_d, t_d = np.stack(Rs), np.stack(ts)

    intr = Intrinsics.from_config(CAM)
    lc = LoopCloser(intr)
    # exact closure last -> first, injected directly (detection tested above)
    dR = R_gt[-1].T @ R_gt[0]
    dt = R_gt[-1].T @ (t_gt[0] - t_gt[-1])
    lc.closures.append((n - 1, 0, dR, dt, 30))

    R_iso, t_iso, _ = lc.refine(R_d, t_d, mode="graph")
    from rgbd_odometry_tpu.solvers.pose_graph import normalized_information_sqrt

    info = np.stack([(1.0 / s**2) * np.eye(6) for s in sig]).astype(np.float32)
    si = np.asarray(normalized_information_sqrt(jnp.asarray(info)))
    R_w, t_w, norms = lc.refine(R_d, t_d, odo_sqrt_info=si, mode="graph")
    err_iso = np.linalg.norm(t_iso - t_gt, axis=-1).mean()
    err_w = np.linalg.norm(t_w - t_gt, axis=-1).mean()
    assert err_w < 0.8 * err_iso, (err_w, err_iso)
    # identity whitening reproduces the isotropic refine exactly
    eye = np.broadcast_to(np.eye(6, dtype=np.float32), (n - 1, 6, 6))
    _, t_eye, _ = lc.refine(R_d, t_d, odo_sqrt_info=eye, mode="graph")
    np.testing.assert_allclose(t_eye, t_iso, atol=1e-5)


def test_cli_dvo_weighted_refine(tmp_path, capsys):
    """dvo --loop-close --weighted-refine: per-frame information collection,
    scale normalization, and the whitened refinement all wire through the
    public CLI; accuracy stays in the loop-closed envelope."""
    import json

    from rgbd_odometry_tpu.cli import main

    est = str(tmp_path / "est.txt")
    main(
        [
            "dvo", "--frames", "12", "--cam-scale", "0.5", "--iterations", "10,5,3,2",
            "--keyframe-every", "3", "--loop-close", "--weighted-refine", "--out", est,
        ]
    )
    out = capsys.readouterr()
    assert "information-weighted odometry edges" in out.err
    stats = json.loads(out.out.strip().splitlines()[-1])
    assert stats["ate_rmse"] < 0.02


def _drifted_chain(poses, sigma=0.004, seed=3):
    """Integrate GT relatives with noise -> (R_d, t_d, raw rel list)."""
    R_gt = np.stack([p[0] for p in poses])
    t_gt = np.stack([p[1] for p in poses])
    rng = np.random.default_rng(seed)
    Rs, ts, rels = [R_gt[0]], [t_gt[0]], []
    for k in range(len(poses) - 1):
        dR = R_gt[k].T @ R_gt[k + 1]
        dt = R_gt[k].T @ (t_gt[k + 1] - t_gt[k])
        noise = np.concatenate(
            [rng.normal(0, sigma, 3), rng.normal(0, sigma, 3)]
        ).astype(np.float32)
        nR, nt = geo.se3_exp(jnp.asarray(noise))
        dR = dR @ np.asarray(nR, np.float64)
        dt = dt + np.asarray(nt, np.float64)
        rels.append((dR, dt))
        ts.append(ts[-1] + Rs[-1] @ dt)
        Rs.append(Rs[-1] @ dR)
    return np.stack(Rs), np.stack(ts), rels


def test_online_refine_inplace_rewrites_live_gop():
    """ONLINE refinement: refine_inplace writes corrected poses back into the
    live Gop (incl. the last-keyframe composition state) so subsequent frames
    compose from the refined anchor; odometry edges from the raw chain
    (edge_traj) make repeated refinement a fixed point instead of
    progressively forgetting the odometry measurements."""
    from rgbd_odometry_tpu.pipeline.gop import Gop

    psis = _out_and_back()
    frames, poses = render_sequence(CAM, psis, seed=0)
    t_gt = np.stack([p[1] for p in poses])
    R_d, t_d, rels = _drifted_chain(poses)

    intr = Intrinsics.from_config(CAM)
    lc = LoopCloser(intr, LoopClosureConfig(min_separation=4))
    for i, (g, d) in enumerate(frames):
        lc.add_keyframe(i, g, d)
    assert len(lc.closures)

    # replicate the drifted trajectory in a live Gop (keyframe every 4)
    gop = Gop()
    gop.push_keyframe(0, 1, np.eye(3), np.zeros(3))
    rel_R, rel_t = np.eye(3), np.zeros(3)
    for k, (dR, dt) in enumerate(rels):
        rel_t = rel_t + rel_R @ dt
        rel_R = rel_R @ dR
        if (k + 1) % 4 == 0:
            gop.push_keyframe(k + 1, 5, rel_R, rel_t)
            rel_R, rel_t = np.eye(3), np.zeros(3)
        else:
            gop.push_ordinary(k + 1, rel_R, rel_t)
    R0, t0, _ = gop.poses()
    np.testing.assert_allclose(t0, t_d, atol=1e-9)

    norms = lc.refine_inplace(gop, edge_traj=(R_d, t_d), mode="graph")
    assert norms is not None and norms[-1] < norms[0]
    R1, t1, _ = gop.poses()
    # write-back equals the pure refine on the same inputs
    R_f, t_f, _ = lc.refine(R_d, t_d, edge_traj=(R_d, t_d), mode="graph")
    np.testing.assert_allclose(t1, t_f, atol=1e-9)
    # last-keyframe composition state re-anchored to the refined keyframe
    kf_last = gop.keyframe_indices()[-1]
    np.testing.assert_allclose(gop.last_key_t, t1[kf_last], atol=1e-12)
    # trajectory improved vs GT
    assert np.linalg.norm(t1 - t_gt, axis=-1).mean() < np.linalg.norm(
        t0 - t_gt, axis=-1
    ).mean()

    # SUBSEQUENT frames compose from the refined anchor: pushing the same
    # relative pose lands nearer GT than composing on the unrefined chain
    future_rel_t = np.array([0.001, 0.0, 0.0])
    gop.push_ordinary(len(t1), np.eye(3), future_rel_t)
    t_next = gop.global_pose(-1)[1]
    t_next_unrefined = t_d[kf_last] + R_d[kf_last] @ future_rel_t
    gt_next = t_gt[kf_last] + np.stack([p[0] for p in poses])[kf_last] @ future_rel_t
    assert np.linalg.norm(t_next - gt_next) < np.linalg.norm(
        t_next_unrefined - gt_next
    )

    # fixed point with raw edges vs odometry forgetting without: a second
    # refinement with raw edge_traj barely moves; rederiving edges from the
    # refined poses (edge_traj=None) pulls further toward the closures
    gop.elements.pop()  # drop the probe frame
    R_before = [e.t.copy() for e in gop.elements]
    lc.refine_inplace(gop, edge_traj=(R_d, t_d), mode="graph")
    _, t2, _ = gop.poses()
    move_raw = float(np.linalg.norm(t2 - np.stack(R_before), axis=-1).max())
    lc.refine_inplace(gop, mode="graph")  # edges rederived from refined poses
    _, t3, _ = gop.poses()
    move_forget = float(np.linalg.norm(t3 - t2, axis=-1).max())
    assert move_raw < 2e-3, move_raw
    assert move_forget > 3 * move_raw or move_forget > 1e-3


def test_cli_dvo_online_refine(tmp_path, capsys):
    import json

    from rgbd_odometry_tpu.cli import main

    est = str(tmp_path / "est.txt")
    main(
        [
            "dvo", "--frames", "12", "--cam-scale", "0.5", "--iterations",
            "10,5,3,2", "--keyframe-every", "3", "--loop-close",
            "--refine-every", "1", "--out", est,
        ]
    )
    out = capsys.readouterr()
    assert "online refine @frame" in out.err
    assert "loop closures:" in out.err  # final polish still runs
    stats = json.loads(out.out.strip().splitlines()[-1])
    assert stats["ate_rmse"] < 0.02


def _systematic_drift_chain(R_gt, t_gt, scale_err=1.04, white_mm=0.5, seed=11):
    """Integrate odometry rels with MOTION-CORRELATED systematic error (a
    translation scale factor) plus small white noise — the drift structure
    the real solver exhibits (per-edge errors ~3 mm that partially cancel on
    return legs), which a white-noise pose graph cannot represent."""
    rng = np.random.default_rng(seed)
    Rs, ts = [R_gt[0]], [t_gt[0]]
    for k in range(len(t_gt) - 1):
        dR = R_gt[k].T @ R_gt[k + 1]
        dt = R_gt[k].T @ (t_gt[k + 1] - t_gt[k])
        dt = scale_err * dt + rng.normal(0, white_mm * 1e-3, 3)
        ts.append(ts[-1] + Rs[-1] @ dt)
        Rs.append(Rs[-1] @ dR)
    return np.stack(Rs), np.stack(ts)


def _inject_revisit_closures(lc, R_gt, t_gt, min_sep, noise_mm=1.0, seed=4):
    """Fabricate GT-accurate closures between spatially-revisiting nodes."""
    rng = np.random.default_rng(seed)
    n = len(t_gt)
    for j in range(n):
        for i in range(j - min_sep, -1, -1):
            if np.linalg.norm(t_gt[j] - t_gt[i]) < 0.01:
                dR = R_gt[i].T @ R_gt[j]
                dt = R_gt[i].T @ (t_gt[j] - t_gt[i]) + rng.normal(0, noise_mm * 1e-3, 3)
                lc.closures.append((i, j, dR, dt, 30))
                break


def test_default_refine_improves_both_full_ate_and_endpoint():
    """The round-5 done-bar (VERDICT.md #1), pinned: the DEFAULT --loop-close
    refinement must improve BOTH full-trajectory ATE and endpoint error vs
    odometry-only, on an out-and-back AND a multi-revisit trajectory with
    systematic (motion-correlated) odometry drift.

    This is exactly the regime where pose-graph smearing fails (measured in
    validation/refbuild/loop_sweep.py: graph refinement 16.9 -> 21.0 mm full
    ATE even with ORACLE per-edge sigmas): closures carry no information
    about unrevisited interior segments, so corrections must concentrate at
    the revisit (rigid re-anchoring), not spread along the chain."""
    from rgbd_odometry_tpu.eval.ate import ate_rmse

    intr = Intrinsics.from_config(CAM)
    for kind in ("outback", "revisit3"):
        n = 40
        ts_idx = np.arange(n)
        if kind == "outback":
            phase = np.sin(np.pi * ts_idx / (n - 1))
        else:
            phase = np.abs(np.sin(3 * np.pi * ts_idx / (n - 1)))
        amp = 0.12
        psis = np.stack(
            [amp * phase, -0.5 * amp * phase, 0.3 * amp * phase,
             0.2 * amp * phase, -0.2 * amp * phase, 0.1 * amp * phase], -1
        ).astype(np.float32)
        Rg, tg = [], []
        for p in psis:
            R_, t_ = geo.se3_exp(jnp.asarray(p))
            Rg.append(np.asarray(R_, np.float64))
            tg.append(np.asarray(t_, np.float64))
        R_gt, t_gt = np.stack(Rg), np.stack(tg)
        R_d, t_d = _systematic_drift_chain(R_gt, t_gt)

        lc = LoopCloser(intr)
        _inject_revisit_closures(lc, R_gt, t_gt, lc.cfg.min_loop_separation)
        assert lc.closures, kind

        R_f, t_f, norms = lc.refine(R_d, t_d)  # DEFAULT mode
        ate_o = ate_rmse(t_d, t_gt, align=False)
        ate_f = ate_rmse(t_f, t_gt, align=False)
        end_o = np.linalg.norm(t_d[-1] - t_gt[-1])
        end_f = np.linalg.norm(t_f[-1] - t_gt[-1])
        assert len(norms) > 0, kind
        assert ate_f < ate_o, (kind, ate_f, ate_o)
        assert end_f < end_o, (kind, end_f, end_o)
        # unrevisited interior nodes are untouched (the anti-smearing pin):
        # nodes before the first applied closure target keep their poses
        first_tgt = min(j for (_i, j, *_s) in lc.closures
                        if j - _i >= lc.cfg.min_loop_separation)
        np.testing.assert_allclose(t_f[:first_tgt], t_d[:first_tgt], atol=1e-12)
