"""Long-run endurance: 2000+ frame streaming with relocalization + loop
closure + online refinement on the real chip, with latency percentiles and
host-memory bounds.

    python tools/endurance.py [--frames 2000] [--blackout-every 500]
                              [--refine-every 10] [--assert-flat]

The stream revisits its own path (sinusoidal loop, period --period frames)
so loop closures fire continuously, and inserts 3-frame blackouts every
--blackout-every frames so the relocalizer recovers mid-run. Per-frame
solve latency (the driver's own solve_ms), wall time, and RSS are recorded;
the report asserts the per-frame cost and host memory stay flat (the
round-4 gap: GOP lists, FrameMetrics energy curves and reloc DB slots grew
without bound — now bounded by PipelineConfig.metrics_max and
RelocalizeConfig.max_keyframes; the reference's own horizon is a hard 100k
reserve, /root/reference/src/GOP.cpp:125).

Prints one JSON line; also appended rows land in BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--period", type=int, default=120)
    ap.add_argument("--blackout-every", type=int, default=500)
    ap.add_argument("--refine-every", type=int, default=10,
                    help="online refine_inplace every N keyframes")
    ap.add_argument("--metrics-max", type=int, default=100_000)
    ap.add_argument("--reloc-max-keyframes", type=int, default=256)
    ap.add_argument("--assert-flat", action="store_true",
                    help="exit 1 if per-frame cost or RSS is not flat")
    args = ap.parse_args()

    import dataclasses

    from rgbd_odometry_tpu.config import (
        KeyframeConfig,
        PipelineConfig,
        PyramidConfig,
        RelocalizeConfig,
    )
    from rgbd_odometry_tpu.core.geometry import se3_exp
    from rgbd_odometry_tpu.io.synthetic import SyntheticScene
    from rgbd_odometry_tpu.pipeline.loop_closure import LoopCloser
    from rgbd_odometry_tpu.pipeline.odometry import EdgeDvoOdometry
    from rgbd_odometry_tpu.profiles import production_320

    prof = production_320()
    cfg = PipelineConfig(
        camera=prof.camera,
        pyramid=PyramidConfig(
            num_levels=prof.num_levels, max_points=prof.max_points
        ),
        solver=prof.solver,
        keyframe=KeyframeConfig(force_every=5),
        relocalize=RelocalizeConfig(
            enabled=True,
            min_matches=20,
            min_inliers=12,
            max_keyframes=args.reloc_max_keyframes,
        ),
        metrics_max=args.metrics_max,
    )
    odo = EdgeDvoOdometry(cfg)
    closer = LoopCloser(odo.intr)

    scene = SyntheticScene(seed=7)
    amp = np.array([0.035, -0.02, 0.012, 0.01, -0.012, 0.006], np.float64)

    def _frame(i: int):
        if (
            args.blackout_every
            and i >= args.blackout_every
            and i % args.blackout_every in (0, 1, 2)
        ):
            z = np.zeros((cfg.camera.height, cfg.camera.width), np.float32)
            return z, z, None
        phase = np.sin(2.0 * np.pi * i / args.period)
        psi = (amp * phase).astype(np.float32)
        import jax.numpy as jnp

        R, t = se3_exp(jnp.asarray(psi))
        g, d = scene.render(
            cfg.camera, np.asarray(R, np.float64), np.asarray(t, np.float64), 1
        )
        return g.astype(np.float32), d.astype(np.float32), (np.asarray(R), np.asarray(t))

    raw_rels: list = []
    refine_state = {"kf": 0, "closures": 0}
    rss0 = _rss_mb()
    rss_samples = []
    render_s = 0.0
    gts = []
    t_loop = time.perf_counter()
    for i in range(args.frames):
        t0 = time.perf_counter()
        g, d, gt = _frame(i)
        render_s += time.perf_counter() - t0
        gts.append(gt)
        odo.process_frame(g, d, timestamp=i / 30.0)
        els = odo.gop.elements
        if len(els) >= 2:
            a, b = els[-2], els[-1]
            raw_rels.append((a.R.T @ b.R, a.R.T @ (b.t - a.t)))
        m = odo.metrics[-1]
        if m.keyframe_reason != 0 and np.count_nonzero(g) > 0:
            closer.add_keyframe(m.frame_num, g, d)
            refine_state["kf"] += 1
            if (
                args.refine_every
                and refine_state["kf"] >= args.refine_every
                and len(closer.closures) > refine_state["closures"]
                and len(raw_rels) + 1 == len(odo.gop)
            ):
                # online correction, same protocol as cli --refine-every
                closer.refine_inplace(odo.gop)
                odo.sync_reloc_db()
                refine_state["kf"] = 0
                refine_state["closures"] = len(closer.closures)
        if i % 50 == 0:
            rss_samples.append(_rss_mb())
        if i % 200 == 0:
            import jax

            print(
                f"frame {i}: solve {m.solve_ms:.1f} ms, rss {_rss_mb():.0f} MB, "
                f"live_arrays {len(jax.live_arrays())}, "
                f"closures {len(closer.closures)}, reloc db {len(odo._reloc)}, "
                f"recoveries {odo._reloc.successes}",
                file=sys.stderr, flush=True,
            )
    wall_s = time.perf_counter() - t_loop

    solve_ms = np.array([m.solve_ms for m in odo.metrics if m.frame_num > 5])
    n = len(solve_ms)
    q2 = solve_ms[n // 4 : n // 2]
    q4 = solve_ms[3 * n // 4 :]
    flat_ratio = float(np.mean(q4) / np.mean(q2))
    rss_end = _rss_mb()
    rss_peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    # trajectory error vs exact GT on non-blackout frames (absolute poses)
    R_est, t_est, _ = odo.trajectory()
    errs = [
        1e3 * np.linalg.norm(t_est[i] - gts[i][1])
        for i in range(len(gts))
        if gts[i] is not None
    ]
    report = {
        "frames": args.frames,
        "wall_s": round(wall_s, 1),
        "render_s": round(render_s, 1),
        "frames_per_s_incl_render": round(args.frames / wall_s, 2),
        "solve_ms_p50": round(float(np.percentile(solve_ms, 50)), 2),
        "solve_ms_p90": round(float(np.percentile(solve_ms, 90)), 2),
        "solve_ms_p99": round(float(np.percentile(solve_ms, 99)), 2),
        "flat_ratio_q4_over_q2": round(flat_ratio, 3),
        "rss_mb_start": round(rss0, 1),
        "rss_mb_end": round(rss_end, 1),
        "rss_mb_peak": round(rss_peak, 1),
        "gop_len": len(odo.gop),
        "metrics_len": len(odo.metrics),
        "reloc_db": len(odo._reloc),
        "reloc_recoveries": odo._reloc.successes,
        "loop_closures": len(closer.closures),
        "closer_keyframes": len(closer.keyframes),
        "ate_mm_mean": round(float(np.mean(errs)), 2),
        "ate_mm_max": round(float(np.max(errs)), 2),
    }
    print(json.dumps(report))
    if args.assert_flat:
        ok = flat_ratio < 1.5 and (rss_end - rss0) < 1500.0
        if not ok:
            print("ENDURANCE NOT FLAT", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
