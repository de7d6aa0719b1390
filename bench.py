"""Benchmark: batched edge-DVO frame alignments per second per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.json north star): >= 1000 VGA frame-pair alignments/s/chip
on TPU v5e at the reference's 320x240 working resolution, 4-level pyramid.
vs_baseline = value / 1000.

Workload semantics mirror the reference's steady-state loop (SURVEY.md
section 3.1): per frame it computes the now-frame targets (Canny + exact-L2
distance transform + DT gradients at 4 levels) and runs the coarse-to-fine
solve against the current keyframe's features; keyframe features are
re-extracted every `KEYFRAME_EVERY`=5 frames
(/root/reference/src/SolveDVO.cpp:2155-2160) and that cost is amortized in.
Timing uses distinct input batches per rep (this backend can elide repeated
work) and blocks on all retained outputs.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

KEYFRAME_EVERY = 5


def _backend_reachable(attempts: int = 3, timeout_s: float = 180.0) -> bool:
    """Probe device-backend init in a SUBPROCESS with a hard timeout.

    On this environment the TPU arrives through a tunnel; when the tunnel is
    down, `jax.devices()` blocks indefinitely (observed 2026-08-18: probes
    hang past 180 s for hours) and would hang the driver's bench run with
    it. A subprocess probe can be killed; the main process only initializes
    the backend after a probe succeeds. Retries cover transient outages."""
    import subprocess

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            time.sleep(60)
    return False


def main() -> None:
    if not _backend_reachable():
        # value/vs_baseline are null, NOT 0: a zero would be recorded as a
        # catastrophic perf regression by anything that keys on "value";
        # null + error is unambiguous "no measurement taken"
        print(
            json.dumps(
                {
                    "metric": "edge-DVO frame alignments/sec/chip",
                    "value": None,
                    "unit": "frames/s/chip",
                    "vs_baseline": None,
                    "error": (
                        "device backend unreachable (3 probes timed out at "
                        "180 s — tunnel down); no measurement taken"
                    ),
                }
            )
        )
        return
    import jax
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.solvers import edge_dvo

    # r3 B-sweep on v5e: 64 -> 3.95k, 128 -> 4.23k, 256 -> 4.54k, 512 -> 3.45k
    # f/s (same code): 256 amortizes the ~1.8 ms fixed dispatch cost best and
    # matches BASELINE.json's batch config
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = CameraConfig()  # reference base: 320x240, Freiburg-1 intrinsics
    num_levels = 4
    # capacity 2048 at level 0: stride-8 solves use max 512 points either way
    # (jstride = min(stride, cap//512)); the smaller top-k is cheaper and the
    # family accuracy sweep measured equal-or-better errors at this capacity
    max_pts = (2048, 1024, 512, 512)
    # production LM profile: accuracy measured equal to the reference's
    # 50-iteration schedule on the synthetic suite (0.1-0.5px reprojection);
    # lm_jacobian_stride=8 verified at equal pose error on 3 scenes
    # (tools/profile_variants.py + 3-scene align_pair check, r2)
    # edt_window=16 + unnormalized (pixel-unit) DT: exact distances <= 16 px,
    # ~10x cheaper row phase than the full min-plus; the robust weight
    # 6/(6+r^2) makes residuals beyond ~10 px negligible, and the 6-family
    # accuracy sweep (r3) measured equal-or-BETTER errors than window 32 on
    # every family x magnitude combo (step time 46.5 -> 37.6 ms at batch 256)
    cfg = SolverConfig(
        method="gauss_newton",
        iterations=(18, 6, 4, 3),
        lm_jacobian_stride=8,
        edt_window=16,
        normalize_dt=False,
        # deferred-accept LM: the next iteration's gather doubles as the
        # accept verdict (identical recovery on the accuracy suite)
        lm_deferred_accept=True,
        extract_selection="segmented",
    )
    intr = Intrinsics.from_config(cam)

    # three distinct input batches so no stage can be elided across reps
    psis = [
        np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32),
        np.array([-0.012, 0.006, 0.002, -0.003, 0.005, 0.002], np.float32),
        np.array([0.006, 0.004, -0.008, 0.002, 0.003, -0.004], np.float32),
    ]
    sets = []
    for s in range(3):
        (rg, rd), (ng, nd), _ = render_pair(cam, psis[s], seed=s)
        ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), num_levels)
        now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), num_levels)
        sets.append(
            (
                tuple(jnp.stack([g] * batch) for g in ref.gray),
                tuple(jnp.stack([d] * batch) for d in ref.depth),
                tuple(jnp.stack([g] * batch) for g in now.gray),
            )
        )
    jax.block_until_ready(sets)

    # production keyframe path: a keyframe is always a frame whose targets
    # (incl. Canny edge maps) the step just computed — extraction reuses
    # them and skips its own Canny (bit-identical features). The edges are
    # prepared untimed here because in the loop they are a step byproduct.
    f_tgt = jax.jit(jax.vmap(lambda g: edge_dvo.prepare_now_targets(g, cfg)))
    f_ref_e = jax.jit(
        jax.vmap(
            lambda g, d, e: edge_dvo.extract_ref_features(
                g, d, intr, cfg, max_pts, edges_pyr=e
            )
        )
    )
    ref_edges = [
        tuple(t.edges for t in f_tgt(s_[0])) for s_ in sets
    ]
    jax.block_until_ready(ref_edges)
    f_step = jax.jit(
        jax.vmap(
            lambda feats, ng: edge_dvo.solve_pyramid(
                feats, edge_dvo.prepare_now_targets(ng, cfg), intr, cfg
            )[:2]
        )
    )
    featsets = [f_ref_e(s_[0], s_[1], ref_edges[i]) for i, s_ in enumerate(sets)]
    jax.block_until_ready(featsets)
    outs = [f_step(featsets[i], sets[i][2]) for i in range(3)]
    jax.block_until_ready(outs)  # warm both executables

    reps = 6
    t0 = time.perf_counter()
    rs = [f_step(featsets[i % 3], sets[i % 3][2]) for i in range(reps)]
    jax.block_until_ready(rs)
    step_s = (time.perf_counter() - t0) / reps

    rs = [f_ref_e(sets[i][0], sets[i][1], ref_edges[i]) for i in range(3)]
    jax.block_until_ready(rs)  # warm
    t0 = time.perf_counter()
    rs = [f_ref_e(sets[i % 3][0], sets[i % 3][1], ref_edges[i % 3]) for i in range(reps)]
    jax.block_until_ready(rs)
    ref_s = (time.perf_counter() - t0) / reps

    per_frame = step_s + ref_s / KEYFRAME_EVERY
    pairs_per_s = batch / per_frame

    # ---- secondary recordings (same chip, same run) -----------------------
    # never allowed to endanger the headline metric: wrapped so any
    # compile/runtime failure degrades to extras=<error> instead
    try:
        extras = _extras(jax, jnp, edge_dvo, intr, featsets, sets, cfg, ref_s, batch)
    except Exception as e:  # noqa: BLE001
        extras = {"error": str(e)[:200], "batch": batch}

    print(
        json.dumps(
            {
                "metric": (
                    "edge-DVO frame alignments/sec/chip (320x240, 4-level Canny+EDT+solve "
                    f"per frame, keyframe features re-extracted every {KEYFRAME_EVERY} frames)"
                ),
                "value": round(pairs_per_s, 2),
                "unit": "frames/s",
                "vs_baseline": round(pairs_per_s / 1000.0, 4),
                "extras": extras,
            }
        )
    )


def _extras(jax, jnp, edge_dvo, intr, featsets, sets, cfg, ref_s, batch):
    from rgbd_odometry_tpu.config import SolverConfig

    # (a) reference-parity sub-gradient mode (50 itr x 4 levels, float32
    #     floor gathers) — the mode whose schedule is oracle-verified
    sub_cfg = SolverConfig(method="subgradient")
    f_sub = jax.jit(
        jax.vmap(
            lambda feats, ng: edge_dvo.solve_pyramid(
                feats, edge_dvo.prepare_now_targets(ng, sub_cfg), intr, sub_cfg
            )[:2]
        )
    )
    sub_out = [f_sub(featsets[i], sets[i][2]) for i in range(2)]
    jax.block_until_ready(sub_out)
    t0 = time.perf_counter()
    rs = [f_sub(featsets[i % 3], sets[i % 3][2]) for i in range(3)]
    jax.block_until_ready(rs)
    sub_per_frame = (time.perf_counter() - t0) / 3 + ref_s / KEYFRAME_EVERY
    subgradient_fps = batch / sub_per_frame

    # (b) streaming mode: ONE pair in flight (the reference's own operating
    #     regime — its loop targets 35 Hz, /root/reference/src/SolveDVO.cpp:1945)
    f_step1 = jax.jit(
        lambda feats, ng: edge_dvo.solve_pyramid(
            feats, edge_dvo.prepare_now_targets(ng, cfg), intr, cfg
        )[:2]
    )
    feats1 = jax.tree_util.tree_map(lambda x: x[0], featsets[0])
    nows1 = [tuple(g[0] for g in s[2]) for s in sets]
    out = [f_step1(feats1, n) for n in nows1]
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n_stream = 30
    for i in range(n_stream):
        out = f_step1(feats1, nows1[i % 3])
        # block every iteration: ONE pair in flight is the point of this
        # metric (async dispatch would otherwise pipeline all 30 solves)
        jax.block_until_ready(out)
    streaming_hz = n_stream / (time.perf_counter() - t0)

    # (c) lockstep multi-stream driver: 8 live cameras on one chip through
    #     the production streaming path (parallel/streams.py) — per-frame
    #     Hz of the whole 8-stream front (1 dispatch + 1 device_get/frame).
    #     Opt-in (BENCH_MULTISTREAM=1): its fresh 8-stream 4-level compiles
    #     add ~15 min through the remote compile server (measured 2026-08-17:
    #     60.3 frames/s aggregate over the tunnel, ~7.5 Hz/stream — pure
    #     RTT, like streaming_single_pair_hz; recorded in BASELINE.md)
    import os

    if os.environ.get("BENCH_MULTISTREAM", "") != "1":
        return {
            "subgradient_parity_frames_per_s": round(subgradient_fps, 2),
            "streaming_single_pair_hz": round(streaming_hz, 2),
            "batch": batch,
        }
    import numpy as np

    from rgbd_odometry_tpu.config import (
        KeyframeConfig,
        PipelineConfig,
        PyramidConfig,
    )
    from rgbd_odometry_tpu.parallel.mesh import make_mesh
    from rgbd_odometry_tpu.parallel.streams import MultiStreamOdometry

    n_streams = 8
    pcfg = PipelineConfig(
        solver=cfg,
        pyramid=PyramidConfig(num_levels=4, max_points=(2048, 1024, 512, 512)),
        keyframe=KeyframeConfig(
            force_every=KEYFRAME_EVERY,
            enable_quality_triggers=False,
            rollback_resolve=False,
        ),
    )
    ms = MultiStreamOdometry(make_mesh(), n_streams, pcfg)
    g_b = [
        np.stack([np.asarray(s[2][0][i % batch]) for i in range(n_streams)])
        for s in sets
    ]
    d_b = np.stack([np.asarray(sets[0][1][0][i % batch]) for i in range(n_streams)])
    for i in range(8):  # warm both executables incl. a keyframe step
        ms.process_batch(g_b[i % 3], d_b, timestamp=i / 30.0)
    t0 = time.perf_counter()
    n_ms = 30
    for i in range(n_ms):
        ms.process_batch(g_b[i % 3], d_b, timestamp=(8 + i) / 30.0)
    multistream_hz = n_ms / (time.perf_counter() - t0)

    return {
        "subgradient_parity_frames_per_s": round(subgradient_fps, 2),
        "streaming_single_pair_hz": round(streaming_hz, 2),
        "multistream_8cam_frames_per_s": round(multistream_hz * n_streams, 2),
        "batch": batch,
    }


if __name__ == "__main__":
    main()
