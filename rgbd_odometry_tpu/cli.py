"""Command-line interface: the reference's 12 catkin executables as one CLI.

Reference executables (/root/reference/CMakeLists.txt:135-221) and their
subcommands here:

  dvo (src/dvo.cpp)                  -> `dvo`          edge-DVO odometry run
  dvo dry loop (loopDry)             -> `dvo --dry`    ingest + GT only
  rgbdSubsc (src/rgbdSubscriber.cpp) -> `photometric`  legacy dense DVO run
  pnp (src/pnp.cpp)                  -> `pnp`          chessboard GN-PnP demo
  opencvpnp (src/opencvpnp.cpp)      -> `feature-vo`   sparse feature VO run
  imuDR (src/imuDRMain.cpp)          -> `imu`          dead-reckoning over a csv
  publisher/publisherPyd (ingest)    -> `--source synthetic|tum:<dir>` flags
  camTopic2PublisherPyD (converter)  -> built into the TUM source + `calib`
  bagManip (frame skipper)           -> `--skip N` flag
  loadGTPath (GT file publisher)     -> `eval` (ATE/RPE/drift vs GT file)
  cuda_node (JtJ experiment)         -> `bench` (the real batched kernel)
  imuTest/tfPlay scratch mains       -> covered by tests/test_geometry.py

Run `python -m rgbd_odometry_tpu.cli <subcommand> --help`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def _make_source(args):
    import itertools

    from rgbd_odometry_tpu.io.stream import SyntheticCamera, TumSource, skip_frames

    start = args.start or 0
    if args.source.startswith("tum:"):
        src = TumSource(args.source[4:], start=start, end=args.end)
        cam = None
        if args.calib:
            from rgbd_odometry_tpu.io.calib import read_calib_xml

            cam = read_calib_xml(args.calib)
        frames = src.frames()
        gt = None
    elif args.source.startswith("xml:"):
        from rgbd_odometry_tpu.io.xml_dump import XmlDumpSource

        src = XmlDumpSource(args.source[4:], start=start, end=args.end)
        cam = None
        if args.calib:
            from rgbd_odometry_tpu.io.calib import read_calib_xml

            cam = read_calib_xml(args.calib)
        frames = src.frames()
        gt = None
    else:
        from rgbd_odometry_tpu.config import CameraConfig

        cam = CameraConfig()
        if args.cam_scale != 1.0:
            cam = cam.scaled(args.cam_scale)
        degrade = None
        if (
            args.noise > 0
            or args.texture > 0
            or args.illum_drift != 0
            or args.depth_quantize
            or args.depth_holes > 0
            or args.dropout_blobs > 0
            or args.motion_blur > 0
        ):
            from rgbd_odometry_tpu.io.synthetic import Degradations

            degrade = Degradations(
                texture_amp=args.texture,
                noise_sigma=args.noise,
                illum_gain_per_frame=args.illum_drift,
                depth_quantize_tum=args.depth_quantize,
                depth_shadow_px=args.depth_holes,
                depth_dropout_blobs=args.dropout_blobs,
                motion_blur_px=args.motion_blur,
            )
        synth = SyntheticCamera(cam, num_frames=args.frames, degrade=degrade)
        frames = synth.frames()
        if start:
            frames = itertools.islice(frames, start, None)
        gt = synth.ground_truth()
    if args.skip > 1:
        frames = skip_frames(frames, args.skip)
    return frames, cam, gt


def _add_source_args(p):
    p.add_argument(
        "--source", default="synthetic", help="'synthetic', 'tum:<dir>' or 'xml:<dir>'"
    )
    p.add_argument("--frames", type=int, default=30, help="synthetic frame count")
    p.add_argument(
        "--cam-scale",
        type=float,
        default=1.0,
        help="resolution scale for the synthetic camera (0.5 renders 160x120 "
        "with matching intrinsics; data sources keep their native size)",
    )
    p.add_argument("--start", type=int, default=None)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--skip", type=int, default=1, help="keep every Nth frame (bagManip harness)")
    p.add_argument("--noise", type=float, default=0.0, help="synthetic sensor noise sigma (bagManip fixtures)")
    p.add_argument("--texture", type=float, default=0.0, help="synthetic scene texture amplitude")
    p.add_argument("--illum-drift", type=float, default=0.0, help="synthetic illumination gain drift per frame")
    p.add_argument("--depth-quantize", action="store_true", help="TUM uint16 1/5000m depth quantization")
    p.add_argument("--depth-holes", type=int, default=0, help="structured-light shadow band width (px)")
    p.add_argument("--dropout-blobs", type=int, default=0, help="random depth dropout blobs per frame")
    p.add_argument("--motion-blur", type=float, default=0.0, help="motion blur kernel length (px)")
    p.add_argument("--calib", default=None, help="OpenCV-XML calibration file")
    p.add_argument("--out", default=None, help="TUM-format trajectory output path")


def cmd_dvo(args):
    from rgbd_odometry_tpu.config import (
        CameraConfig,
        KeyframeConfig,
        PipelineConfig,
        SolverConfig,
    )
    from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry

    if args.resume:
        import itertools

        from rgbd_odometry_tpu.utils.checkpoint import load_odometry

        odo = load_odometry(args.resume)
        # already-processed frames must not be re-fed against the restored
        # keyframe. The checkpoint counts PROCESSED frames, so the offset is
        # applied after the source's own --start/--skip transforms: re-run
        # with the SAME source flags as the original run plus --resume, and
        # the stream continues at the first unprocessed frame.
        resume_next = odo._frame_num + 1
        frames, cam, gt = _make_source(args)
        frames = itertools.islice(frames, resume_next, None)
        print(
            f"resumed at frame {odo._frame_num} from {args.resume}; "
            f"skipping {resume_next} already-processed frames of the source",
            file=sys.stderr,
        )
    else:
        frames, cam, gt = _make_source(args)
        cfg = PipelineConfig(
            camera=cam or CameraConfig(),
            solver=SolverConfig(
                method=args.method,
                iterations=tuple(int(x) for x in args.iterations.split(",")),
            ),
            keyframe=KeyframeConfig(force_every=args.keyframe_every),
            motion_model=args.motion_model,
        )
        if args.relocalize:
            from rgbd_odometry_tpu.config import RelocalizeConfig

            cfg = dataclasses.replace(
                cfg, relocalize=RelocalizeConfig(enabled=True)
            )
        odo = EdgeDvoOdometry(cfg)
    viz = None
    if args.viz_dir:
        from rgbd_odometry_tpu.viz.live import LiveViz

        viz = LiveViz(args.viz_dir, every=args.viz_every)
        odo.keep_residuals = True
    closer = None
    if args.loop_close:
        from rgbd_odometry_tpu.pipeline.loop_closure import LoopCloser

        if args.resume:
            # restore the keyframe store + closure log saved beside the
            # odometry snapshot: post-resume frames can close loops onto
            # PRE-checkpoint keyframes (None when the checkpoint was saved
            # without --loop-close — start fresh then)
            from rgbd_odometry_tpu.utils.checkpoint import load_loop_closer

            closer = load_loop_closer(args.resume, odo.intr)
            if closer is not None:
                print(
                    f"loop closer restored: {len(closer.keyframes)} keyframes, "
                    f"{len(closer.closures)} closures",
                    file=sys.stderr,
                )
        if closer is None:
            closer = LoopCloser(odo.intr)
    info_recs = None
    # --weighted-refine weights odometry EDGES, which only exist in graph
    # mode — it implies the pose-graph path (reanchor has no odometry edges)
    refine_mode = getattr(args, "refine_mode", "reanchor")
    if getattr(args, "weighted_refine", False):
        if not args.loop_close:
            sys.exit("--weighted-refine requires --loop-close")
        refine_mode = "graph"
        info_recs = []

    def _refine_report(norms) -> str:
        if refine_mode == "reanchor":
            if len(norms) == 0:
                return "no closure passed the re-anchor separation gate"
            return (
                f"{len(norms)} re-anchor corrections applied, "
                f"{1000.0 * float(np.sum(norms)):.1f} mm total"
            )
        return f"graph residual {norms[0]:.4f} -> {norms[-1]:.4f}"

    def _maybe_collect_info():
        # per-frame J^T W J / sigma^2 for information-weighted refinement
        # (one extra on-demand dispatch; only when --weighted-refine)
        if info_recs is not None:
            pi = odo.pose_information()
            info_recs.append(
                None if pi is None else np.asarray(pi[0]) / max(pi[1], 1e-12)
            )

    map_clouds = [] if getattr(args, "map_out", None) else None
    refine_every = int(getattr(args, "refine_every", 0) or 0)
    if refine_every and not args.loop_close:
        sys.exit("--refine-every requires --loop-close")
    # raw consecutive-frame relative poses, captured BEFORE any online
    # refinement can rewrite trajectory history: the pristine odometry
    # measurements every (re-)refinement derives its odometry edges from
    # (see LoopCloser.refine edge_traj)
    raw_rels: list = []
    if args.resume:
        from rgbd_odometry_tpu.utils.checkpoint import load_raw_rels

        raw_rels = load_raw_rels(args.resume) or []
    refine_state = {
        "kf": 0,
        "closures": 0 if closer is None else len(closer.closures),
    }

    def _capture_raw_rel():
        els = odo.gop.elements
        if len(els) >= 2:
            a, b = els[-2], els[-1]
            raw_rels.append((a.R.T @ b.R, a.R.T @ (b.t - a.t)))

    def _raw_traj():
        Rs, ts_ = [np.eye(3)], [np.zeros(3)]
        for Rr, tr in raw_rels:
            ts_.append(ts_[-1] + Rs[-1] @ tr)
            Rs.append(Rs[-1] @ Rr)
        return np.stack(Rs), np.stack(ts_)

    def _maybe_register_keyframe(gray_np=None, depth_np=None):
        # known cost when --loop-close AND --relocalize are both on: each
        # keyframe is detected/described twice (two independent
        # KeyframeMatcher stores with different match-gate configs — the
        # loop closer needs the reference-parity 1e-3 gate floor, the
        # relocalizer 0.2). One extra ~RTT per KEYFRAME (not per frame);
        # fold into one shared store only if that combo becomes hot.
        m = odo.metrics[-1]
        if m.keyframe_reason == 0:
            return
        if closer is not None:
            closer.add_keyframe(m.frame_num, gray_np, depth_np)
        if map_clouds is not None:
            # semi-dense map: the keyframe's already-extracted edge cloud
            map_clouds.append(odo.keyframe_cloud())
        if refine_every and closer is not None:
            # ONLINE drift correction: refine the graph so far and write the
            # corrected poses back into the live trajectory, so subsequent
            # frames compose from the refined anchor. Odometry edges always
            # come from the raw chain (edge_traj), never from already-
            # refined poses (LoopCloser.refine docstring).
            refine_state["kf"] += 1
            if (
                refine_state["kf"] >= refine_every
                and len(closer.closures) > refine_state["closures"]
                # online refinement needs the FULL raw chain: resumed runs
                # restore it from the checkpoint (utils/checkpoint.py
                # load_raw_rels); a checkpoint saved without --refine-every
                # has none, and this guard keeps such resumes odometry-only
                and len(raw_rels) + 1 == len(odo.gop)
            ):
                norms = closer.refine_inplace(
                    odo.gop, edge_traj=_raw_traj(), mode=refine_mode
                )
                if norms is not None:
                    refine_state["kf"] = 0
                    refine_state["closures"] = len(closer.closures)
                    odo.sync_reloc_db()  # keep recovery anchors refined
                    print(
                        f"online refine @frame {m.frame_num}: "
                        f"{len(closer.closures)} closures, "
                        + _refine_report(norms),
                        file=sys.stderr,
                    )

    trace_cm = None
    if args.trace_dir:
        # deep-dive device trace (TensorBoard format) + stage stats — the
        # reference's printf timing (/root/reference/src/SolveDVO.cpp:
        # 2092-2109) made first-class
        from rgbd_odometry_tpu.utils.tracing import profiler_trace

        trace_cm = profiler_trace(args.trace_dir)
        trace_cm.__enter__()
    n = 0

    def _after(m):
        print(
            f"frame {m.frame_num:4d}  {m.solve_ms:7.1f} ms  E={m.best_energy:9.2f} "
            f"vis={m.visible_ratio:.2f} b^={m.b_cap:6.2f} kf={m.keyframe_reason}",
            file=sys.stderr,
        )

    if args.pipelined and not args.dry:
        # latency-hiding pipelined streaming: frame n+1's step dispatches
        # chained off frame n's in-flight device outputs; bit-identical to
        # the sequential loop (speculation discarded on keyframe switches)
        if args.viz_dir or args.loop_close or map_clouds is not None:
            sys.exit("--pipelined is incompatible with --viz-dir/--loop-close/"
                     "--map-out (they need per-frame host access)")
        from rgbd_odometry_tpu.pipeline.feeder import FrameFeeder

        feeder = FrameFeeder(frames, num_levels=odo.cfg.pyramid.num_levels)
        for _pose in odo.process_stream(feeder):
            n += 1
            _after(odo.metrics[-1])
    elif args.feeder and not args.dry:
        # async prefetch: host decode + device_put of frame n+1 overlaps the
        # device solve of frame n (the ROS pub/sub decoupling, SURVEY §2.6)
        from rgbd_odometry_tpu.pipeline.feeder import FrameFeeder

        for pyr, ts in FrameFeeder(frames, num_levels=odo.cfg.pyramid.num_levels):
            odo.process_pyramid(pyr, ts)
            if refine_every:
                _capture_raw_rel()
            if viz is not None:
                viz.on_frame(odo, np.asarray(pyr.gray[0]), np.asarray(pyr.depth[0]))
            if closer is not None:
                _maybe_register_keyframe(np.asarray(pyr.gray[0]), np.asarray(pyr.depth[0]))
            elif map_clouds is not None:
                _maybe_register_keyframe()
            _maybe_collect_info()
            n += 1
            _after(odo.metrics[-1])
    else:
        for gray, depth, ts in frames:
            if args.dry:
                n += 1
                continue
            odo.process_frame(gray, depth, ts)
            if refine_every:
                _capture_raw_rel()
            if viz is not None:
                viz.on_frame(odo, gray, depth)
            if closer is not None:
                _maybe_register_keyframe(gray, depth)
            elif map_clouds is not None:
                _maybe_register_keyframe()
            _maybe_collect_info()
            n += 1
            _after(odo.metrics[-1])
    if trace_cm is not None:
        trace_cm.__exit__(None, None, None)
        print(f"jax.profiler trace -> {args.trace_dir}", file=sys.stderr)
    if args.dry:
        print(f"dry loop: ingested {n} frames", file=sys.stderr)
        return
    if args.checkpoint:
        from rgbd_odometry_tpu.utils.checkpoint import save_odometry

        save_odometry(
            odo,
            args.checkpoint,
            closer=closer,
            raw_rels=raw_rels if refine_every else None,
        )
        print(f"checkpoint -> {args.checkpoint}", file=sys.stderr)
    print(f"avg solve: {odo.average_solve_ms():.2f} ms over {n} frames", file=sys.stderr)
    if odo._reloc is not None:
        print(
            f"relocalizer: {len(odo._reloc)} keyframes in database, "
            f"{odo._reloc.successes}/{odo._reloc.attempts} recoveries",
            file=sys.stderr,
        )
    R, t, ts = odo.trajectory()
    if closer is not None and len(t) > 1:
        odo_si = None
        if info_recs is not None:
            # edge k connects frames k -> k+1; weight it by frame k+1's solve
            # information. Frames with no measurement (frame 0) fall back to
            # the batch mean — neutral after scale normalization
            import jax.numpy as jnp

            from rgbd_odometry_tpu.solvers.pose_graph import (
                normalized_information_sqrt,
            )

            infos = info_recs[1:len(t)]
            if len(infos) != len(t) - 1:
                # e.g. --resume: trajectory nodes predate this run's
                # measurements — fall back to isotropic edges, loudly
                print(
                    "weighted-refine: trajectory has nodes without collected "
                    "information (resumed run?) — using isotropic edges",
                    file=sys.stderr,
                )
                infos = []
            have = [x for x in infos if x is not None]
            if have:
                fill = np.mean(np.stack(have), axis=0)
                arr = np.stack([x if x is not None else fill for x in infos])
                odo_si = np.asarray(
                    normalized_information_sqrt(jnp.asarray(arr, jnp.float32))
                )
        # drift-correcting refinement over the detected loop closures; with
        # --refine-every the trajectory was already partially refined online,
        # so the odometry edges come from the raw captured chain
        R, t, norms = closer.refine(
            R, t, odo_sqrt_info=odo_si, mode=refine_mode,
            edge_traj=(
                _raw_traj()
                if (refine_every and len(raw_rels) + 1 == len(t))
                else None
            ),
        )
        print(
            f"loop closures: {len(closer.closures)}; " + _refine_report(norms)
            + (" (information-weighted odometry edges)" if odo_si is not None else ""),
            file=sys.stderr,
        )
    if map_clouds is not None and map_clouds:
        # world-frame fused map through the (loop-refined, when --loop-close)
        # global trajectory — the accumulated cloud the reference sketched
        # (/root/reference/src/MentisVisualHandle.cpp:392-476)
        from rgbd_odometry_tpu.viz.pointcloud import compose_map, write_ply

        pts, _ids = compose_map(map_clouds, R, t)
        write_ply(args.map_out, pts)
        print(
            f"map: {len(pts)} edge points from {len(map_clouds)} keyframes "
            f"-> {args.map_out}",
            file=sys.stderr,
        )
    if viz is not None and n > 0:
        written = viz.finalize(odo, gt_t=gt[1][: len(t)] if gt is not None else None)
        print(f"viz: {len(written)} images -> {args.viz_dir}", file=sys.stderr)
    if args.out:
        from rgbd_odometry_tpu.io.tum import write_trajectory

        write_trajectory(args.out, R, t, ts)
        print(f"trajectory -> {args.out}", file=sys.stderr)
    if args.gt:
        # live GT comparison, the __TF_GT__ path
        # (/root/reference/src/SolveDVO.cpp:1983-2014, 1371-1390): GT files
        # are ~100 Hz mocap vs ~30 Hz frames, so pair poses by nearest
        # timestamp (TUM associate semantics), rebase both matched
        # sub-trajectories to their first pose, and normalize drift by the
        # actual elapsed time
        from rgbd_odometry_tpu.eval.ate import (
            associate_trajectories,
            ate_rmse,
            drift_stats,
        )
        from rgbd_odometry_tpu.io.tum import read_trajectory

        gt_R, gt_t, gt_ts = read_trajectory(args.gt)
        assoc = associate_trajectories(
            R, t, ts, gt_R, gt_t, gt_ts, max_dt=args.gt_max_dt
        )
        if assoc is None:
            print(json.dumps({"error": f"no est/GT pairs within {args.gt_max_dt}s"}))
        else:
            R_e, t_e, R_g, t_g, dur = assoc
            ds = drift_stats(t_e, t_g, duration_s=dur if dur > 0 else None)
            print(
                json.dumps(
                    {
                        "ate_rmse_vs_gt_file": ate_rmse(t_e, t_g, align=True),
                        "drift_mean_per_s": ds.mean,
                        "drift_rms_per_s": ds.rms,
                        "frames_compared": len(t_e),
                    }
                )
            )
    if gt is not None:
        from rgbd_odometry_tpu.eval.ate import ate_rmse, drift_stats, rebase_to_first

        gt_R, gt_t = gt
        start = args.start or 0
        if start and not args.resume:
            # a fresh run offset into the synthetic stream: its trajectory is
            # relative to the first PROCESSED frame
            gt_R, gt_t = rebase_to_first(gt_R[start:], gt_t[start:])
        n2 = min(len(t), len(gt_t))
        ds = drift_stats(t[:n2], gt_t[:n2])
        print(
            json.dumps(
                {
                    "ate_rmse": ate_rmse(t[:n2], gt_t[:n2], align=False),
                    "drift_mean_per_s": ds.mean,
                    "drift_rms_per_s": ds.rms,
                }
            )
        )


def cmd_photometric(args):
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import CameraConfig, PhotometricConfig
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.pipeline.gop import Gop, REASON_FIRST_FRAME
    from rgbd_odometry_tpu.solvers import photometric

    frames, cam, gt = _make_source(args)
    cam = cam or CameraConfig()
    intr = Intrinsics.from_config(cam)
    cfg = PhotometricConfig(use_huber=args.huber)
    gop = Gop()
    refs = None
    n_levels = 4
    for i, (gray, depth, ts) in enumerate(frames):
        pyr = build_pyramid(jnp.asarray(gray), jnp.asarray(depth), n_levels)
        if i % cfg.ref_refresh_every == 0:
            refs = photometric.extract_photo_ref(pyr.gray, pyr.depth, intr, cfg, cfg.max_points)
            gop.push_keyframe(i, REASON_FIRST_FRAME, np.eye(3), np.zeros(3), ts)
            continue
        R, t, hist = photometric.solve_pyramid(refs, pyr.gray, intr, cfg)
        gop.push_ordinary(i, np.asarray(R), np.asarray(t), ts)
        print(f"frame {i:4d}  |eps| {float(list(hist.values())[-1][-1]):9.1f}", file=sys.stderr)
    R, t, ts = gop.poses()
    if args.out:
        from rgbd_odometry_tpu.io.tum import write_trajectory

        write_trajectory(args.out, R, t, ts)


def cmd_feature_vo(args):
    from rgbd_odometry_tpu.config import CameraConfig
    from rgbd_odometry_tpu.pipeline.feature_vo import FeatureVo, FeatureVoConfig

    frames, cam, gt = _make_source(args)
    vo = FeatureVo(cam or CameraConfig(), FeatureVoConfig(min_good_matches=args.min_matches))
    for i, (gray, depth, ts) in enumerate(frames):
        vo.process_frame(gray, depth, ts)
        print(f"frame {i:4d}  good matches {vo.match_counts[-1]}", file=sys.stderr)
    R, t, ts = vo.trajectory()
    if args.out:
        from rgbd_odometry_tpu.io.tum import write_trajectory

        write_trajectory(args.out, R, t, ts)


def cmd_pnp(args):
    """Chessboard GN-PnP demo on a synthetic board (the `pnp` node's role)."""
    import jax
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import CameraConfig
    from rgbd_odometry_tpu.core import geometry as geo
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.solvers import pnp

    cam = CameraConfig()
    intr = Intrinsics.from_config(cam)
    obj = jnp.asarray(pnp.chessboard_object_points(6, 9, 0.05))
    obj = obj + jnp.asarray([0.0, 0.0, 1.5])
    psi_gt = np.array([0.08, -0.05, 0.03, 0.05, -0.06, 0.04], np.float32)
    R_gt, t_gt = geo.se3_exp(jnp.asarray(psi_gt))
    pb = jnp.einsum("kj,nk->nj", R_gt, obj - t_gt)
    imn_gt = pb[:, :2] / pb[:, 2:3]
    R, t, rnorms = pnp.gn_pnp(obj, imn_gt, jnp.ones(obj.shape[0], bool), iterations=5)
    print(
        json.dumps(
            {
                "residual_norms": [round(float(x), 6) for x in np.asarray(rnorms)],
                "t_err": float(np.linalg.norm(np.asarray(t) - np.asarray(t_gt))),
            }
        )
    )


def cmd_imu(args):
    import jax.numpy as jnp

    from rgbd_odometry_tpu.solvers import imu

    if args.csv:
        data = np.loadtxt(args.csv, delimiter=",")  # t, ax..az, wx..wz
        accels, gyros = data[:, 1:4], data[:, 4:7]
    else:
        t = np.arange(args.steps)
        accels = np.zeros((args.steps, 3))
        gyros = np.tile([0.0, 0.0, 0.1], (args.steps, 1))
    intr = imu.ImuIntrinsics.from_scalars(
        accel_bias=args.accel_bias, gyro_bias=args.gyro_bias
    )
    final, traj = imu.propagate_batch(
        imu.ImuState.identity(), jnp.asarray(accels, jnp.float32), jnp.asarray(gyros, jnp.float32), intr
    )
    print(
        json.dumps(
            {
                "final_p": [float(x) for x in np.asarray(final.p)],
                "final_q": [float(x) for x in np.asarray(final.q)],
                "steps": int(accels.shape[0]),
            }
        )
    )


def cmd_eval(args):
    from rgbd_odometry_tpu.eval.ate import (
        associate_trajectories,
        ate_rmse,
        drift_stats,
        rpe,
    )
    from rgbd_odometry_tpu.io.tum import read_trajectory

    R_e, t_e, ts_e = read_trajectory(args.est)
    R_g, t_g, ts_g = read_trajectory(args.gt, skip_lines=args.gt_skip)
    # pair est/GT by nearest timestamp (TUM associate semantics) — GT files
    # sample at ~100 Hz vs ~30 Hz frames, so index-by-index pairing is wrong
    assoc = associate_trajectories(
        R_e, t_e, ts_e, R_g, t_g, ts_g, max_dt=args.max_dt, rebase=args.rebase
    )
    if assoc is None:
        sys.exit(f"no est/GT timestamp pairs within {args.max_dt}s")
    R_e, t_e, R_g, t_g, dur = assoc
    n = len(t_e)
    tr, rr = rpe(R_e, t_e, R_g, t_g)
    ds = drift_stats(t_e, t_g, duration_s=dur if dur > 0 else None)
    print(
        json.dumps(
            {
                "ate_rmse_aligned": ate_rmse(t_e, t_g, align=True),
                "ate_rmse_raw": ate_rmse(t_e, t_g, align=False),
                "rpe_trans_rmse": tr,
                "rpe_rot_rmse": rr,
                "drift_mean_per_s": ds.mean,
                "drift_median_per_s": ds.median,
                "drift_rms_per_s": ds.rms,
                "frames": n,
            }
        )
    )


def cmd_calib(args):
    from rgbd_odometry_tpu.config import CameraConfig
    from rgbd_odometry_tpu.io.calib import read_calib_xml, write_freiburg_pair

    if args.write_freiburg:
        cam = CameraConfig(width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5)
        paths = write_freiburg_pair(args.write_freiburg, cam)
        print(json.dumps({"written": list(paths)}))
    else:
        cam = read_calib_xml(args.file)
        print(json.dumps(dataclasses.asdict(cam)))


def cmd_probe(args):
    """Two-frame convergence probe — `casualTestFunction` parity
    (/root/reference/src/SolveDVO.cpp:2377-2442): align one frame pair at one
    level for N iterations and print the energy-per-iteration curve."""
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.solvers import edge_dvo

    cam = CameraConfig()
    intr = Intrinsics.from_config(cam)
    psi = np.array([0.012, -0.008, 0.006, 0.004, -0.005, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=args.seed)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), args.level + 1)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), args.level + 1)
    cfg = SolverConfig(method=args.method)
    max_pts = (4096, 2048, 1024, 512)[: args.level + 1]
    feats = edge_dvo.extract_ref_features(ref.gray, ref.depth, intr, cfg, max_pts)
    tgts = edge_dvo.prepare_now_targets(now.gray, cfg)
    R0 = jnp.eye(3)
    t0 = jnp.zeros(3)
    _, _, diag = edge_dvo.run_level(
        feats[args.level], tgts[args.level], intr.at_level(args.level),
        R0, t0, cfg, args.iterations,
    )
    e = np.asarray(diag.energy)
    print(
        json.dumps(
            {
                "level": args.level,
                "energy": [round(float(x), 3) for x in e],
                "best_iter": int(diag.best_iter),
                "best_energy": round(float(diag.best_energy), 3),
                "visible_ratio": round(float(diag.visible_ratio), 4),
            }
        )
    )


def cmd_fused(args):
    """Full-pipeline run (BASELINE.json config 5): IMU-prior warm starts +
    edge DVO + quality-gated sparse-PnP fallback over a stream replay.
    With the synthetic source, per-frame IMU windows are derived from the
    ground-truth inter-frame twists (plus optional gyro/accel noise) — the
    ImuDeadReckon node's role (/root/reference/src/ImuDeadReckon.cpp)."""
    from rgbd_odometry_tpu.config import (
        CameraConfig,
        KeyframeConfig,
        PipelineConfig,
        SolverConfig,
    )
    from rgbd_odometry_tpu.core import geometry as geo
    from rgbd_odometry_tpu.pipeline.fused import FusedConfig, FusedOdometry

    import jax.numpy as jnp

    frames, cam, gt = _make_source(args)
    cfg = PipelineConfig(
        camera=cam or CameraConfig(),
        solver=SolverConfig(
            method=args.method,
            iterations=tuple(int(x) for x in args.iterations.split(",")),
        ),
        keyframe=KeyframeConfig(
            force_every=args.keyframe_every, enable_quality_triggers=True
        ),
    )
    from rgbd_odometry_tpu.solvers import imu as imu_mod

    # sensor noise model: drives per-edge information weights in
    # --imu-refine (zero-noise windows degenerate to uniform weighting)
    imu_intr = imu_mod.ImuIntrinsics.from_scalars(
        gyro_var=args.imu_noise**2, accel_var=(10.0 * args.imu_noise) ** 2
    )
    fused = FusedOdometry(
        cfg, FusedConfig(use_imu_prior=not args.no_imu), imu_intrinsics=imu_intr
    )
    rng = np.random.default_rng(0)
    dt = 1.0 / 30.0
    prev_R = prev_t = None
    n = 0
    for gray, depth, ts in frames:
        imu_window = None
        if gt is not None and not args.no_imu and n > 0:
            # inter-frame delta from GT absolute poses -> a 1-sample IMU
            # window reproducing it under dead reckoning from rest
            gt_R, gt_t = gt
            i = min(n, len(gt_t) - 1)
            dR = prev_R.T @ gt_R[i]
            dtr = prev_R.T @ (gt_t[i] - prev_t)
            w = np.asarray(geo.so3_log(jnp.asarray(dR, jnp.float32))) / dt
            a = 2.0 * dtr / (dt * dt)
            w = w + rng.normal(0, args.imu_noise, 3)
            a = a + rng.normal(0, args.imu_noise * 10, 3)
            imu_window = (a[None, :], w[None, :], dt)
        if gt is not None:
            gt_R, gt_t = gt
            i = min(n, len(gt_t) - 1)
            prev_R, prev_t = gt_R[i], gt_t[i]
        fused.process_frame(gray, depth, ts, imu_window=imu_window)
        m = fused.odo.metrics[-1]
        print(
            f"frame {m.frame_num:4d}  E={m.best_energy:9.2f} vis={m.visible_ratio:.2f} "
            f"b^={m.b_cap:6.2f} kf={m.keyframe_reason}"
            + (" [PnP fallback]" if m.frame_num in fused.fallback_frames else ""),
            file=sys.stderr,
        )
        n += 1
    R, t, ts_arr = fused.trajectory()
    if args.imu_refine:
        # the synthetic windows are gravity-free / from-rest (see above):
        # gravity and velocities are exactly zero for them, stated explicitly
        # (real-IMU callers pass imu.DEFAULT_GRAVITY and let velocities
        # default to the trajectory-derived estimate)
        R0, t0, _ = fused.trajectory()
        R, t, ts_arr = fused.refine_with_imu(
            gravity=(0.0, 0.0, 0.0), velocities=np.zeros_like(t0),
            imu_weight=args.imu_weight)
    if args.out:
        from rgbd_odometry_tpu.io.tum import write_trajectory

        write_trajectory(args.out, R, t, ts_arr)
    summary = {"frames": n, "fallback_frames": fused.fallback_frames}
    if gt is not None:
        from rgbd_odometry_tpu.eval.ate import ate_rmse

        gt_R, gt_t = gt
        n2 = min(len(t), len(gt_t))
        summary["ate_rmse"] = ate_rmse(t[:n2], gt_t[:n2], align=False)
        if args.imu_refine:
            R0, t0, _ = fused.trajectory()
            summary["ate_rmse_unrefined"] = ate_rmse(t0[:n2], gt_t[:n2], align=False)
    print(json.dumps(summary))


def cmd_refine(args):
    """Keyframe pose-graph refinement: jointly adjust a trajectory's poses
    to satisfy odometry + loop-closure constraints (the capability the
    reference's compose-only GOP lacks; BASELINE.json's 'keyframe-graph
    refinement' workload). Constraints file lines:
    `i j tx ty tz qx qy qz qw weight` (relative pose of j in i's frame)."""
    import jax.numpy as jnp

    from rgbd_odometry_tpu.core import geometry as geo
    from rgbd_odometry_tpu.io.tum import read_trajectory, write_trajectory
    from rgbd_odometry_tpu.solvers.pose_graph import (
        PoseGraphEdges,
        concat_edges,
        odometry_edges,
        refine_pose_graph,
    )

    R, t, ts = read_trajectory(args.est)
    edges = odometry_edges(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
    n_lc = 0
    if args.constraints:
        rows = np.loadtxt(args.constraints, comments="#", ndmin=2)
        i_idx = rows[:, 0].astype(np.int32)
        j_idx = rows[:, 1].astype(np.int32)
        t_rel = rows[:, 2:5].astype(np.float32)
        R_rel = np.asarray(
            geo.rotmat_from_quat(jnp.asarray(rows[:, 5:9], jnp.float32)), np.float32
        )
        w = rows[:, 9].astype(np.float32) if rows.shape[1] > 9 else np.ones(len(rows), np.float32)
        lc = PoseGraphEdges(
            i=jnp.asarray(i_idx), j=jnp.asarray(j_idx),
            R_rel=jnp.asarray(R_rel), t_rel=jnp.asarray(t_rel), weight=jnp.asarray(w),
        )
        edges = concat_edges(edges, lc)
        n_lc = len(rows)
    R_f, t_f, norms = refine_pose_graph(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), edges,
        iterations=args.iterations,
        robust=args.robust, robust_delta=args.robust_delta,
    )
    write_trajectory(args.out, np.asarray(R_f, np.float64), np.asarray(t_f, np.float64), ts)
    summary = {
        "nodes": len(t),
        "loop_closures": n_lc,
        "residual_norms": [round(float(x), 6) for x in np.asarray(norms)],
        "out": args.out,
    }
    if args.robust and n_lc:
        # which constraints the robust kernel actually trusts at the solution
        from rgbd_odometry_tpu.solvers.pose_graph import edge_robust_weights

        w_all = np.asarray(edge_robust_weights(
            R_f, t_f, edges, args.robust, args.robust_delta
        ))
        summary["closure_robust_weights"] = [
            round(float(x), 4) for x in w_all[-n_lc:]
        ]
    if args.covariance_out:
        # anchor-relative 6x6 marginal covariance per node at the refined
        # solution; robust weights frozen so rejected closures add no
        # phantom confidence
        from rgbd_odometry_tpu.solvers.pose_graph import marginal_covariance

        cov = np.asarray(marginal_covariance(
            R_f, t_f, edges, robust=args.robust, robust_delta=args.robust_delta,
        ), np.float64)
        np.save(args.covariance_out, cov)
        summary["covariance_out"] = args.covariance_out
        summary["covariance_trace_max"] = round(
            float(np.trace(cov, axis1=-2, axis2=-1).max()), 6
        )
    print(json.dumps(summary))


def cmd_dump(args):
    """Write a source as reference-format XML pyramid dumps — the
    `__ENABLE_IM_WRITE__` writer (/root/reference/src/publisherPyD.cpp:
    216-256): one framemono_NNNN.xml per frame with mono_0..3/depth_0..3.
    Frames dumped here replay in the reference's __DATA_FROM_XML_FILES__
    offline mode and vice versa."""
    import os

    import jax.numpy as jnp

    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.xml_dump import write_frame_dump

    frames, cam, gt = _make_source(args)
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for i, (gray, depth, ts) in enumerate(frames):
        pyr = build_pyramid(jnp.asarray(gray), jnp.asarray(depth), args.levels)
        write_frame_dump(
            args.out_dir,
            i,
            [np.asarray(g) for g in pyr.gray],
            [np.asarray(d) for d in pyr.depth],
        )
        n += 1
    print(json.dumps({"frames_written": n, "dir": args.out_dir}))


def cmd_multistream(args):
    """N synthetic cameras tracked in lockstep over the device mesh.

    The pod-ready N-camera production loop (`parallel/streams.py`): the
    stream axis is sharded over every visible device, one fused dispatch
    advances all streams per frame. Each stream runs an independent
    synthetic trajectory; the command reports per-stream ATE against exact
    ground truth plus the aggregate frame rate as one JSON line.
    """
    import json
    import time

    import numpy as np

    from rgbd_odometry_tpu.config import (
        CameraConfig,
        KeyframeConfig,
        PipelineConfig,
        PyramidConfig,
        SolverConfig,
    )
    from rgbd_odometry_tpu.eval.ate import ate_rmse
    from rgbd_odometry_tpu.io.synthetic import render_sequence
    from rgbd_odometry_tpu.parallel.mesh import make_mesh
    from rgbd_odometry_tpu.parallel.streams import MultiStreamOdometry

    mesh = make_mesh()
    n_dev = mesh.devices.size
    n_streams = args.streams or max(n_dev, 2)
    if n_streams % n_dev != 0:
        raise SystemExit(
            f"--streams {n_streams} must be a multiple of the device count "
            f"({n_dev}): XLA splits the stream axis evenly over the mesh"
        )
    cam = CameraConfig()
    if args.cam_scale != 1.0:
        cam = cam.scaled(args.cam_scale)
    iters = tuple(int(x) for x in args.iterations.split(","))
    levels = len(iters)
    pcfg = PipelineConfig(
        camera=cam,
        pyramid=PyramidConfig(
            num_levels=levels, max_points=(2048, 1024, 512, 512)[:levels]
        ),
        solver=SolverConfig(method="gauss_newton", iterations=iters),
        keyframe=KeyframeConfig(
            force_every=args.keyframe_every,
            enable_quality_triggers=args.quality_triggers,
            rollback_resolve=False,
        ),
        motion_model=args.motion_model,
    )

    # distinct smooth out-and-back trajectory per stream
    seqs, gts = [], []
    ts = np.arange(args.frames)
    phase = np.sin(np.pi * ts / max(args.frames - 1, 1))
    for s in range(n_streams):
        amp = 0.02 + 0.004 * s
        psis = np.stack(
            [amp * phase, -0.5 * amp * phase, 0.3 * amp * phase,
             0.2 * amp * phase, -0.15 * amp * phase, 0.1 * amp * phase], -1
        ).astype(np.float32)
        frames, poses = render_sequence(cam, psis, seed=s)
        seqs.append(frames)
        gts.append(np.stack([p[1] for p in poses]))

    ms = MultiStreamOdometry(mesh, n_streams, pcfg)
    t0 = time.perf_counter()
    for f in range(args.frames):
        gray_b = np.stack([seqs[s][f][0] for s in range(n_streams)])
        depth_b = np.stack([seqs[s][f][1] for s in range(n_streams)])
        ms.process_batch(gray_b, depth_b, timestamp=f / 30.0)
    wall = time.perf_counter() - t0

    ates = []
    for s, (R_est, t_est, stamps) in enumerate(ms.trajectories()):
        ates.append(ate_rmse(np.asarray(t_est), gts[s]))
        if args.out_dir:
            import os

            from rgbd_odometry_tpu.io.tum import write_trajectory

            os.makedirs(args.out_dir, exist_ok=True)
            path = os.path.join(args.out_dir, f"stream{s:02d}.txt")
            write_trajectory(path, R_est, t_est, stamps)
    print(
        json.dumps(
            {
                "streams": n_streams,
                "devices": n_dev,
                "frames": args.frames,
                "aggregate_frames_per_s": round(n_streams * args.frames / wall, 2),
                "ate_rmse_per_stream": [round(float(a), 6) for a in ates],
                "ate_rmse_max": round(float(max(ates)), 6),
            }
        )
    )


def cmd_bench(args):
    import bench

    sys.argv = ["bench.py", str(args.batch)]
    bench.main()


def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeat CLI invocations skip the
    20-40 s first-compile (the reference's C++ binaries had no such cost;
    this removes ours)."""
    try:
        import jax

        # TPU-class backends only: CPU compiles are fast, and XLA:CPU AOT
        # artifacts reloaded across processes emit machine-feature-mismatch
        # warnings on this host
        backend = jax.default_backend()
        if backend != "cpu":
            jax.config.update(
                "jax_compilation_cache_dir", f"/tmp/rgbd_odometry_tpu_jax_cache_{backend}"
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    _enable_compilation_cache()
    ap = argparse.ArgumentParser(prog="rgbd-odometry-tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("dvo", help="edge-DVO odometry (the reference's dvo node)")
    _add_source_args(p)
    p.add_argument("--method", default="gauss_newton", choices=["gauss_newton", "subgradient"])
    p.add_argument("--iterations", default="18,6,4,3")
    p.add_argument("--keyframe-every", type=int, default=5)
    p.add_argument("--dry", action="store_true", help="ingest-only (loopDry)")
    p.add_argument("--gt", default=None, help="GT trajectory file for live drift comparison (__TF_GT__)")
    p.add_argument("--gt-max-dt", type=float, default=0.02, help="max timestamp gap for est/GT association")
    p.add_argument("--checkpoint", default=None, help="save odometry state snapshot at end")
    p.add_argument("--resume", default=None, help="resume from a state snapshot")
    p.add_argument("--viz-dir", default=None, help="write live debug PNGs (overlay/residue/energy/trajectory/reprojection)")
    p.add_argument("--viz-every", type=int, default=5, help="sample every Nth frame for viz")
    p.add_argument(
        "--feeder",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="async prefetch thread overlapping host decode with device solve",
    )
    p.add_argument("--trace-dir", default=None, help="capture a jax.profiler device trace here")
    p.add_argument("--loop-close", action="store_true", help="detect loop closures between keyframes and refine the trajectory (rigid re-anchoring by default, see --refine-mode)")
    p.add_argument("--refine-mode", default="reanchor", choices=["reanchor", "graph"], help="with --loop-close: 'reanchor' (default) concentrates each closure's correction at its revisit node, leaving unrevisited segments untouched — measured to improve BOTH full ATE and endpoint error, where pose-graph smearing trades interior accuracy for the endpoint; 'graph' runs the pose-graph GN over odometry+closure edges")
    p.add_argument("--map-out", help="write the fused semi-dense edge-point map (PLY): every keyframe's extracted edge cloud composed through the final (loop-refined with --loop-close) global trajectory")
    p.add_argument("--refine-every", type=int, default=0, metavar="K", help="with --loop-close: ONLINE pose-graph refinement — every K keyframes (when new closures exist) refine the trajectory so far and write the corrected poses back into the live GOP, so subsequent tracking composes from the refined anchor; odometry edges always derive from the raw captured chain")
    p.add_argument("--weighted-refine", action="store_true", help="with --loop-close: weight odometry edges by the solver's per-frame 6x6 information matrix (one extra on-demand dispatch per frame), so confidently tracked segments resist deformation and weakly-observed directions absorb the closure correction")
    p.add_argument("--pipelined", action="store_true", help="speculative streaming: next frame dispatches off in-flight device outputs (bit-identical trajectory; helps when dispatch is asynchronous — see BASELINE.md)")
    p.add_argument("--motion-model", default="hold", choices=["hold", "constant_velocity"], help="streaming warm-start model: hold the previous relative pose (reference behavior) or extrapolate it by the last inter-frame motion (device-composed, zero extra transfers)")
    p.add_argument("--relocalize", action="store_true", help="recover from tracking loss: healthy keyframes feed a device-resident appearance database; after consecutive lost frames the trajectory re-anchors at the best PnP-verified database pose (beyond-reference)")
    p.set_defaults(fn=cmd_dvo)

    p = sub.add_parser("photometric", help="legacy dense DVO (rgbdSubsc node)")
    _add_source_args(p)
    p.add_argument("--huber", action="store_true")
    p.set_defaults(fn=cmd_photometric)

    p = sub.add_parser("feature-vo", help="sparse feature VO (opencvpnp node)")
    _add_source_args(p)
    p.add_argument("--min-matches", type=int, default=40)
    p.set_defaults(fn=cmd_feature_vo)

    p = sub.add_parser("pnp", help="chessboard GN-PnP demo (pnp node)")
    p.set_defaults(fn=cmd_pnp)

    p = sub.add_parser("imu", help="IMU dead reckoning (imuDR node)")
    p.add_argument("--csv", default=None, help="csv with t,ax,ay,az,wx,wy,wz rows")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--accel-bias", type=float, default=0.0)
    p.add_argument("--gyro-bias", type=float, default=0.0)
    p.set_defaults(fn=cmd_imu)

    p = sub.add_parser("eval", help="ATE/RPE/drift vs a GT trajectory (loadGTPath role)")
    p.add_argument("est")
    p.add_argument("gt")
    p.add_argument("--gt-skip", type=int, default=0)
    p.add_argument("--rebase", action="store_true")
    p.add_argument("--max-dt", type=float, default=0.02, help="max timestamp gap for association")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("calib", help="read/write OpenCV-XML calibration files")
    p.add_argument("--file", default=None)
    p.add_argument("--write-freiburg", default=None, metavar="DIR")
    p.set_defaults(fn=cmd_calib)

    p = sub.add_parser("probe", help="two-frame energy-curve probe (casualTestFunction)")
    p.add_argument("--level", type=int, default=0)
    p.add_argument("--iterations", type=int, default=100)
    p.add_argument("--method", default="subgradient", choices=["subgradient", "gauss_newton"])
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_probe)

    p = sub.add_parser("refine", help="pose-graph refinement of a trajectory (+ loop closures)")
    p.add_argument("est", help="TUM-format trajectory to refine")
    p.add_argument("--constraints", default=None, help="file: i j tx ty tz qx qy qz qw [weight]")
    p.add_argument("--out", required=True)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--robust", default=None, choices=["huber", "geman"], help="IRLS kernel on edge residuals: huber bounds an outlier edge's pull, geman (redescending) switches false loop closures off entirely")
    p.add_argument("--robust-delta", type=float, default=1.0, help="robust kernel scale in whitened-residual units")
    p.add_argument("--covariance-out", default=None, help="save per-node anchor-relative 6x6 marginal covariance blocks (N,6,6 .npy) at the refined solution; honors --robust so rejected closures add no phantom confidence")
    p.set_defaults(fn=cmd_refine)

    p = sub.add_parser("fused", help="IMU prior + edge DVO + sparse-PnP fallback (BASELINE config 5)")
    _add_source_args(p)
    p.add_argument("--method", default="gauss_newton", choices=["gauss_newton", "subgradient"])
    p.add_argument("--iterations", default="18,6,4,3")
    p.add_argument("--keyframe-every", type=int, default=5)
    p.add_argument("--no-imu", action="store_true")
    p.add_argument("--imu-noise", type=float, default=0.0, help="gyro noise sigma (rad/s); accel gets 10x")
    p.add_argument("--imu-refine", action="store_true", help="post-run visual-inertial polish: preintegrated IMU edges + visual odometry chain in one pose graph")
    p.add_argument("--imu-weight", type=float, default=3.0, help="IMU edge weight relative to weight-1 visual edges (--imu-refine)")
    p.set_defaults(fn=cmd_fused)

    p = sub.add_parser("dump", help="write reference-format XML pyramid dumps (__ENABLE_IM_WRITE__)")
    _add_source_args(p)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--levels", type=int, default=4)
    p.set_defaults(fn=cmd_dump)

    p = sub.add_parser(
        "multistream",
        help="N lockstep odometry streams sharded over the device mesh "
        "(pod-ready N-camera loop, parallel/streams.py)",
    )
    p.add_argument("--streams", type=int, default=0,
                   help="stream count (default: device count, min 2); must "
                   "be a multiple of the device count")
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--cam-scale", type=float, default=1.0)
    p.add_argument("--iterations", default="18,6,4,3")
    p.add_argument("--keyframe-every", type=int, default=5)
    p.add_argument("--quality-triggers", action="store_true",
                   help="enable per-stream Laplacian/visibility keyframe triggers")
    p.add_argument("--out-dir", default=None,
                   help="write per-stream TUM trajectories here")
    p.add_argument("--motion-model", default="hold",
                   choices=["hold", "constant_velocity"],
                   help="per-stream warm-start model (see dvo --motion-model)")
    p.set_defaults(fn=cmd_multistream)

    p = sub.add_parser("bench", help="batched-alignment throughput benchmark")
    p.add_argument("--batch", type=int, default=32)
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
