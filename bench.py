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

Batches are HETEROGENEOUS: every batch element is a distinct rendered
frame-pair (its own relative pose; scenes cycle over `N_SCENES` seeds), so
no cross-element redundancy exists for the compiler or caches to exploit.
Timing uses distinct input batches per rep and blocks on all retained
outputs.

Wall-clock budget: the whole script self-limits to `BENCH_BUDGET_S` seconds
(default 270) and ALWAYS prints a parseable JSON line within it. The
measurement runs in a child process that checkpoints its best-so-far record
to a file after every milestone; the parent enforces the deadline and prints
the latest record (marked `"degraded": true` if the child had to be cut off
or trimmed its protocol to fit). Lost-round prevention: round 4's driver run
was killed by an external `timeout` before the old script printed anything
(BENCH_r04.json rc=124, parsed=null).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

KEYFRAME_EVERY = 5
DEFAULT_BUDGET_S = 270.0
N_SCENES = 16  # distinct synthetic scenes cycled across the batch
METRIC = (
    "edge-DVO frame alignments/sec/chip (320x240, 4-level Canny+EDT+solve "
    f"per frame, keyframe features re-extracted every {KEYFRAME_EVERY} frames)"
)


def _write_record(rec: dict) -> None:
    """Checkpoint the best-so-far record for the parent to print."""
    path = os.environ.get("_BENCH_RESULT_FILE")
    if not path:
        print(json.dumps(rec))
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(rec) + "\n")
    os.replace(tmp, path)


def _parent() -> None:
    budget = float(os.environ.get("BENCH_BUDGET_S", DEFAULT_BUDGET_S))
    fd, result_path = tempfile.mkstemp(prefix="bench_result_", suffix=".json")
    os.close(fd)
    env = dict(
        os.environ,
        _BENCH_INNER="1",
        _BENCH_RESULT_FILE=result_path,
        # leave the parent a margin to collect + print inside the budget
        _BENCH_DEADLINE=str(time.time() + budget - 8.0),
    )
    import subprocess

    timed_out = False
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
            env=env,
            timeout=max(budget - 5.0, 10.0),
            stdout=subprocess.DEVNULL,  # the parent owns stdout: ONE JSON line
        )
    except subprocess.TimeoutExpired:
        timed_out = True
    except Exception:  # noqa: BLE001 — never let the parent die silently
        timed_out = True
    text = ""
    try:
        with open(result_path) as f:
            text = f.read().strip()
    except OSError:
        pass
    try:
        os.unlink(result_path)
    except OSError:
        pass
    if text:
        rec = json.loads(text.splitlines()[-1])
        if timed_out:
            rec["degraded"] = True
            rec["note"] = (
                str(rec.get("note", ""))
                + f" child cut off at the {budget:.0f}s budget"
            ).strip()
    else:
        rec = {
            "metric": METRIC,
            "value": None,
            "unit": "frames/s",
            "vs_baseline": None,
            "degraded": True,
            "error": f"no milestone completed within the {budget:.0f}s budget",
        }
    print(json.dumps(rec))


def _backend_reachable(remaining_s: float) -> bool:
    """Probe device-backend init in a SUBPROCESS with a hard timeout.

    On this environment the TPU arrives through a tunnel; when the tunnel is
    down, `jax.devices()` blocks indefinitely (observed 2026-08-18: probes
    hang past 180 s for hours). A subprocess probe can be killed; the main
    process only initializes the backend after a probe succeeds."""
    import subprocess

    attempts = 3
    while attempts > 0 and remaining_s > 12.0:
        per_probe = min(150.0, max(8.0, remaining_s - 8.0))
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=per_probe,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        attempts -= 1
        remaining_s -= time.time() - t0
        if attempts > 0 and remaining_s > 45.0:
            time.sleep(15)
            remaining_s -= 15.0
    return False


def _render_batch(cam, batch: int, set_idx: int):
    """Render `batch` DISTINCT frame pairs: per-element relative poses around
    a set-specific base twist, scenes cycling over N_SCENES seeds.

    supersample=1 keeps the host-side ray casting within the bench budget
    (~0.03 s/frame); edge structure and density match the ss=3 renders the
    accuracy suites use, which is what drives the timed work."""
    import numpy as np

    from rgbd_odometry_tpu.io.synthetic import SyntheticScene

    base_psis = [
        np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32),
        np.array([-0.012, 0.006, 0.002, -0.003, 0.005, 0.002], np.float32),
    ]
    base = base_psis[set_idx % len(base_psis)]
    rng = np.random.default_rng(97 + set_idx)
    # distinct per-element twists: +-30% per-component scale + small offset,
    # all well inside the solver's convergence basin
    psis = base[None, :] * (1.0 + 0.3 * rng.uniform(-1, 1, (batch, 6))) + (
        0.002 * rng.uniform(-1, 1, (batch, 6))
    )
    psis = psis.astype(np.float32)

    from rgbd_odometry_tpu.core import geometry as geo
    import jax.numpy as jnp

    scenes = [
        SyntheticScene(seed=1000 * set_idx + s) for s in range(N_SCENES)
    ]
    ref_renders = [
        sc.render(cam, np.eye(3), np.zeros(3), supersample=1) for sc in scenes
    ]
    rg = np.stack([ref_renders[i % N_SCENES][0] for i in range(batch)])
    rd = np.stack([ref_renders[i % N_SCENES][1] for i in range(batch)])
    ng = np.empty_like(rg)
    nd = np.empty_like(rd)
    for i in range(batch):
        R, t = geo.se3_exp(jnp.asarray(psis[i]))
        g, d = scenes[i % N_SCENES].render(
            cam, np.asarray(R, np.float64), np.asarray(t, np.float64), 1
        )
        ng[i] = g
        nd[i] = d
    return rg, rd, ng, nd


def _inner() -> None:
    deadline = float(os.environ["_BENCH_DEADLINE"])

    def remaining() -> float:
        return deadline - time.time()

    rec: dict = {
        "metric": METRIC,
        "value": None,
        "unit": "frames/s",
        "vs_baseline": None,
        "stage": "backend-probe",
    }
    _write_record(rec)

    if not _backend_reachable(remaining()):
        # value/vs_baseline are null, NOT 0: a zero would be recorded as a
        # catastrophic perf regression by anything that keys on "value";
        # null + error is unambiguous "no measurement taken"
        rec["error"] = (
            "device backend unreachable (probes timed out — tunnel down); "
            "no measurement taken"
        )
        rec.pop("stage", None)
        _write_record(rec)
        return

    import jax

    # persistent compile cache: repeat bench runs on this host skip the
    # ~20-40 s jit compiles entirely (keyed on computation hash)
    jax.config.update("jax_compilation_cache_dir", "/tmp/rgbd_odometry_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.profiles import production_320
    from rgbd_odometry_tpu.solvers import edge_dvo

    # r3 B-sweep on v5e: 64 -> 3.95k, 128 -> 4.23k, 256 -> 4.54k, 512 -> 3.45k
    # f/s (same code): 256 amortizes the ~1.8 ms fixed dispatch cost best and
    # matches BASELINE.json's batch config
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    # the canonical tuned profile (rgbd_odometry_tpu/profiles.py): every knob
    # adopted via an A/B on the real chip + an accuracy sweep at equal-or-
    # better pose error (BASELINE.md r2/r3 kernel tables)
    prof = production_320()
    cam = prof.camera  # reference base: 320x240, Freiburg-1 intrinsics
    num_levels = prof.num_levels
    max_pts = prof.max_points
    cfg = prof.solver
    intr = Intrinsics.from_config(cam)

    rec["stage"] = "render"
    _write_record(rec)

    # two distinct heterogeneous batches so no stage can be elided across reps
    n_sets = 2
    sets = []
    for s in range(n_sets):
        rg, rd, ng, nd = _render_batch(cam, batch, s)
        ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), num_levels)
        now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), num_levels)
        sets.append((ref.gray, ref.depth, now.gray))
    jax.block_until_ready(sets)

    rec["stage"] = "compile-headline"
    _write_record(rec)

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
    ref_edges = [tuple(t.edges for t in f_tgt(s_[0])) for s_ in sets]
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
    outs = [f_step(featsets[i], sets[i][2]) for i in range(n_sets)]
    jax.block_until_ready(outs)  # warm both executables

    rec["stage"] = "measure-headline"
    _write_record(rec)

    reps = 6 if remaining() > 40.0 else 2
    t0 = time.perf_counter()
    rs = [f_step(featsets[i % n_sets], sets[i % n_sets][2]) for i in range(reps)]
    jax.block_until_ready(rs)
    step_s = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    rs = [
        f_ref_e(sets[i % n_sets][0], sets[i % n_sets][1], ref_edges[i % n_sets])
        for i in range(reps)
    ]
    jax.block_until_ready(rs)
    ref_s = (time.perf_counter() - t0) / reps

    per_frame = step_s + ref_s / KEYFRAME_EVERY
    pairs_per_s = batch / per_frame

    rec.update(
        value=round(pairs_per_s, 2),
        vs_baseline=round(pairs_per_s / 1000.0, 4),
        extras={
            "batch": batch,
            "distinct_pairs_per_batch": batch,
            "distinct_scenes": N_SCENES,
            "reps": reps,
        },
    )
    if reps < 6:
        rec["degraded"] = True
        rec["note"] = "reps trimmed to fit the wall-clock budget"
    rec.pop("stage", None)
    _write_record(rec)  # the headline is now safe whatever happens below

    # ---- secondary recordings (same chip, same run) -----------------------
    # never allowed to endanger the headline metric: wrapped so any
    # compile/runtime failure degrades to an extras error field instead
    if remaining() > 50.0:
        try:
            rec["extras"].update(
                _extras(jax, edge_dvo, intr, featsets, sets, ref_s, batch, remaining)
            )
        except Exception as e:  # noqa: BLE001
            rec["extras"]["extras_error"] = str(e)[:200]
    else:
        rec["extras"]["extras_skipped"] = "budget"
    _write_record(rec)


def _extras(jax, edge_dvo, intr, featsets, sets, ref_s, batch, remaining):
    import jax.numpy as jnp

    from rgbd_odometry_tpu.profiles import parity_320, production_320

    n_sets = len(sets)
    out: dict = {}

    # (a) reference-parity sub-gradient mode (50 itr x 4 levels, float32
    #     floor gathers) — the mode whose schedule is oracle-verified
    sub_cfg = parity_320().solver
    f_sub = jax.jit(
        jax.vmap(
            lambda feats, ng: edge_dvo.solve_pyramid(
                feats, edge_dvo.prepare_now_targets(ng, sub_cfg), intr, sub_cfg
            )[:2]
        )
    )
    sub_out = [f_sub(featsets[i % n_sets], sets[i % n_sets][2]) for i in range(2)]
    jax.block_until_ready(sub_out)
    t0 = time.perf_counter()
    rs = [f_sub(featsets[i % n_sets], sets[i % n_sets][2]) for i in range(3)]
    jax.block_until_ready(rs)
    sub_per_frame = (time.perf_counter() - t0) / 3 + ref_s / KEYFRAME_EVERY
    out["subgradient_parity_frames_per_s"] = round(batch / sub_per_frame, 2)

    if remaining() < 40.0:
        out["extras_skipped"] = "budget (after subgradient row)"
        return out

    # (b) streaming mode: ONE pair in flight (the reference's own operating
    #     regime — its loop targets 35 Hz, /root/reference/src/SolveDVO.cpp:1945)
    cfg = production_320().solver
    f_step1 = jax.jit(
        lambda feats, ng: edge_dvo.solve_pyramid(
            feats, edge_dvo.prepare_now_targets(ng, cfg), intr, cfg
        )[:2]
    )
    feats1 = jax.tree_util.tree_map(lambda x: x[0], featsets[0])
    nows1 = [tuple(g[i] for g in sets[i % n_sets][2]) for i in range(3)]
    o = [f_step1(feats1, n) for n in nows1]
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    n_stream = 30
    for i in range(n_stream):
        o = f_step1(feats1, nows1[i % 3])
        # block every iteration: ONE pair in flight is the point of this
        # metric (async dispatch would otherwise pipeline all 30 solves)
        jax.block_until_ready(o)
    out["streaming_single_pair_hz"] = round(n_stream / (time.perf_counter() - t0), 2)

    # (c) true-VGA production profile (BASELINE.json config 2 reads VGA
    #     frame-pairs/s): 640x480 base, 5 levels — the resolution the
    #     reference explicitly skipped as too expensive
    #     (/root/reference/src/camTopic2PublisherPyD.cpp:341-345). Opt-in
    #     (BENCH_VGA=1): fresh 5-level VGA shapes compile through the remote
    #     compile server (~minutes cold; cached after).
    if os.environ.get("BENCH_VGA", "") == "1" and remaining() > 90.0:
        out.update(_vga_extras(jax, edge_dvo, remaining))
    if os.environ.get("BENCH_MULTISTREAM", "") != "1" or remaining() < 60.0:
        return out
    # (d) lockstep multi-stream driver: 8 live cameras on one chip through
    #     the production streaming path (parallel/streams.py). Opt-in
    #     (BENCH_MULTISTREAM=1): its fresh 8-stream 4-level compiles add
    #     ~15 min through the remote compile server (measured 2026-08-17:
    #     60.3 frames/s aggregate over the tunnel — pure RTT-bound;
    #     recorded in BASELINE.md)
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
    d_b = np.stack(
        [np.asarray(sets[0][1][0][i % batch]) for i in range(n_streams)]
    )
    for i in range(8):  # warm both executables incl. a keyframe step
        ms.process_batch(g_b[i % n_sets], d_b, timestamp=i / 30.0)
    t0 = time.perf_counter()
    n_ms = 30
    for i in range(n_ms):
        ms.process_batch(g_b[i % n_sets], d_b, timestamp=(8 + i) / 30.0)
    multistream_hz = n_ms / (time.perf_counter() - t0)
    out["multistream_8cam_frames_per_s"] = round(multistream_hz * n_streams, 2)

    # (d2) device-loop counterpart: same 8-stream lockstep work with
    # device-resident frames and NO per-step host sync — the solve chain
    # (warm poses feed the next step; batched __OLD__REF_UPDATE re-extraction
    # every KEYFRAME_EVERY steps) is dispatched back-to-back and blocked once,
    # isolating what a locally-attached chip sustains from the tunnel's
    # ~28 ms/dispatch RTT (the single-pair analogue of the 478 Hz row).
    # Own try: a failure here must not void the rows already measured above.
    try:
        from rgbd_odometry_tpu.core.pyramid import build_pyramid as _bp

        pyrs = [
            ms._put(_bp(jnp.asarray(g, jnp.float32), jnp.asarray(d_b, jnp.float32), 4))
            for g in g_b
        ]
        feats0 = ms._extract(pyrs[0].gray, pyrs[0].depth)
        warm0 = ms._identity_warm()
        all_on = ms._put(jnp.ones((n_streams,), bool))

        def _chain(n_steps):
            feats, (R_d, t_d) = feats0, warm0
            last = None
            for i in range(n_steps):
                pyr = pyrs[i % n_sets]
                R_d, t_d, _, edges_d = ms._step(feats, pyr.gray, R_d, t_d)
                # the LIVE step outputs must be what the caller blocks on: a
                # keyframe reset replaces (R_d, t_d) with constants, and
                # blocking on constants would time dispatch, not the device
                last = (R_d, t_d)
                if (i + 1) % KEYFRAME_EVERY == 0:
                    new_feats = ms._extract_e(pyr.gray, pyr.depth, edges_d)
                    feats = ms._merge(feats, new_feats, all_on)
                    R_d, t_d = warm0
            return last, feats

        jax.block_until_ready(_chain(KEYFRAME_EVERY))  # warm every executable
        n_dev = 30
        t0 = time.perf_counter()
        jax.block_until_ready(_chain(n_dev))
        dev_hz = n_dev / (time.perf_counter() - t0)
        out["multistream_8cam_device_frames_per_s"] = round(dev_hz * n_streams, 2)
    except Exception as e:  # noqa: BLE001
        out["multistream_device_error"] = str(e)[:200]
    return out


def _vga_extras(jax, edge_dvo, remaining):
    """True-VGA throughput row: production_vga profile, its own rendered
    640x480 batch, same per-frame semantics as the headline (step +
    keyframe extraction amortized over KEYFRAME_EVERY)."""
    import jax.numpy as jnp

    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.profiles import production_vga

    prof = production_vga()
    vbatch = int(os.environ.get("BENCH_VGA_BATCH", "64"))
    intr_v = Intrinsics.from_config(prof.camera)
    cfg_v = prof.solver
    nlv = prof.num_levels

    rg, rd, ng, nd = _render_batch(prof.camera, vbatch, 0)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), nlv)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), nlv)
    jax.block_until_ready((ref, now))

    f_tgt = jax.jit(jax.vmap(lambda g: edge_dvo.prepare_now_targets(g, cfg_v)))
    f_ref = jax.jit(
        jax.vmap(
            lambda g, d, e: edge_dvo.extract_ref_features(
                g, d, intr_v, cfg_v, prof.max_points, edges_pyr=e
            )
        )
    )
    f_step = jax.jit(
        jax.vmap(
            lambda feats, g: edge_dvo.solve_pyramid(
                feats, edge_dvo.prepare_now_targets(g, cfg_v), intr_v, cfg_v
            )[:2]
        )
    )
    edges = tuple(t.edges for t in f_tgt(ref.gray))
    feats = f_ref(ref.gray, ref.depth, edges)
    outs = f_step(feats, now.gray)
    jax.block_until_ready(outs)

    reps = 4 if remaining() > 60.0 else 2
    t0 = time.perf_counter()
    rs = [f_step(feats, now.gray) for _ in range(reps)]
    jax.block_until_ready(rs)
    step_s = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    rs = [f_ref(ref.gray, ref.depth, edges) for _ in range(reps)]
    jax.block_until_ready(rs)
    ref_s = (time.perf_counter() - t0) / reps
    per_frame = step_s + ref_s / KEYFRAME_EVERY
    return {
        "vga_frames_per_s": round(vbatch / per_frame, 2),
        "vga_batch": vbatch,
        "vga_levels": nlv,
    }


def main() -> None:
    if os.environ.get("_BENCH_INNER") == "1":
        _inner()
    else:
        _parent()


if __name__ == "__main__":
    main()
