"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import build_pyramid
from rgbd_odometry_tpu.io.synthetic import render_pair
from rgbd_odometry_tpu.parallel import mesh as pmesh


def _batched_pairs(batch, width=64, height=48, num_levels=2):
    cam = CameraConfig(
        width=width, height=height, fx=1.1 * width, fy=1.1 * width,
        cx=(width - 1) / 2.0, cy=(height - 1) / 2.0,
    )
    psi = np.array([0.008, -0.006, 0.004, 0.003, -0.004, 0.002], np.float32)
    (rg, rd), (ng, nd), gt = render_pair(cam, psi, seed=0)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), num_levels)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), num_levels)
    rg_b = tuple(jnp.stack([g] * batch) for g in ref.gray)
    rd_b = tuple(jnp.stack([d] * batch) for d in ref.depth)
    ng_b = tuple(jnp.stack([g] * batch) for g in now.gray)
    return cam, rg_b, rd_b, ng_b, gt


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8
    m = pmesh.make_mesh()
    assert m.shape[pmesh.DATA_AXIS] == 8


def test_sharded_aligner_matches_single_device():
    cam, rg_b, rd_b, ng_b, (R_gt, t_gt) = _batched_pairs(batch=8)
    intr = Intrinsics.from_config(cam)
    cfg = SolverConfig(method="gauss_newton", iterations=(4, 3))
    max_pts = (512, 256)
    m = pmesh.make_mesh()
    aligner = pmesh.build_sharded_aligner(m, intr, cfg, max_pts)
    batch_on_mesh = pmesh.shard_batch(m, (rg_b, rd_b, ng_b))
    R, t = aligner(*batch_on_mesh)
    assert len(R.sharding.device_set) == 8
    from rgbd_odometry_tpu.solvers import edge_dvo

    # the data-parallel invariant: the 8-device sharded solve equals the same
    # vmapped computation on one device. Agreement is to f32 tolerance, not
    # bitwise: the per-device partition (batch 1/device) and the single-device
    # batch-8 executable compile different-but-equally-valid f32 reduction
    # orders for the gather/reduce chains (XLA fusion depends on the local
    # shapes). The solved pose is ~1e-3 rad/m scale; 5e-5 is ~30 f32 ulps.
    R_v, t_v, _ = jax.jit(
        jax.vmap(lambda a, b, c: edge_dvo.align_pair(a, b, c, intr, cfg, max_pts))
    )(rg_b, rd_b, ng_b)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_v), atol=5e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_v), atol=5e-5)
    # every batch entry is the identical input pair -> identical outputs
    # WITHIN the sharded executable (per-device determinism)
    np.testing.assert_array_equal(np.asarray(R)[1], np.asarray(R)[2])
    # the non-vmapped single solve compiles to a different (but equally
    # valid) f32 reduction order; agreement is to float tolerance only
    R1, t1, _ = jax.jit(
        lambda a, b, c: edge_dvo.align_pair(a, b, c, intr, cfg, max_pts)
    )(tuple(g[0] for g in rg_b), tuple(d[0] for d in rd_b), tuple(g[0] for g in ng_b))
    np.testing.assert_allclose(np.asarray(R)[0], np.asarray(R1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(t)[3], np.asarray(t1), atol=5e-5)


def test_shardmap_step_matches_auto_sharded():
    """The explicit shard_map + lax.psum step equals the NamedSharding step
    (whose collectives XLA inserts) — poses exactly, stats to f32 tolerance."""
    cam, rg_b, rd_b, ng_b, _ = _batched_pairs(batch=16)
    intr = Intrinsics.from_config(cam)
    cfg = SolverConfig(method="gauss_newton", iterations=(3, 2))
    m = pmesh.make_mesh()
    auto = pmesh.build_sharded_train_step(m, intr, cfg, (512, 256))
    expl = pmesh.build_shardmap_train_step(m, intr, cfg, (512, 256))
    batch = pmesh.shard_batch(m, (rg_b, rd_b, ng_b))
    (R_a, t_a), s_a = auto(*batch)
    (R_e, t_e), s_e = expl(*batch)
    np.testing.assert_array_equal(np.asarray(R_a), np.asarray(R_e))
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_e))
    np.testing.assert_allclose(
        float(s_a["mean_energy"]), float(s_e["mean_energy"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(s_a["mean_visible_ratio"]), float(s_e["mean_visible_ratio"]), rtol=1e-6
    )
    assert int(s_a["total_points"]) == int(s_e["total_points"])
    assert s_e["mean_energy"].sharding.is_fully_replicated


def test_sharded_train_step_stats_replicated():
    cam, rg_b, rd_b, ng_b, _ = _batched_pairs(batch=16)
    intr = Intrinsics.from_config(cam)
    cfg = SolverConfig(method="gauss_newton", iterations=(3, 2))
    m = pmesh.make_mesh()
    step = pmesh.build_sharded_train_step(m, intr, cfg, (512, 256))
    (R, t), stats = step(*pmesh.shard_batch(m, (rg_b, rd_b, ng_b)))
    assert R.shape == (16, 3, 3)
    assert np.isfinite(float(stats["mean_energy"]))
    assert 0.0 <= float(stats["mean_visible_ratio"]) <= 1.0
    # stats are replicated (global reduction happened across the mesh)
    assert stats["mean_energy"].sharding.is_fully_replicated


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    R, t = jax.jit(fn)(*args)
    assert R.shape == (3, 3) and t.shape == (3,)
    ge.dryrun_multichip(8)


def test_batched_sequence_alignment():
    """Whole-sequence batched alignment (BASELINE config 4) on the CPU mesh."""
    import numpy as np
    from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.io.synthetic import render_sequence
    from rgbd_odometry_tpu.parallel import sequence as pseq

    cam = CameraConfig(width=96, height=64, fx=100.0, fy=100.0, cx=47.5, cy=31.5)
    ts = np.arange(6)
    psis = np.stack(
        [0.004 * ts, -0.003 * ts, 0.002 * ts, 0.001 * ts, -0.001 * ts, 0.0005 * ts], -1
    ).astype(np.float32)
    frames, poses = render_sequence(cam, psis, seed=0)
    grays = [f[0] for f in frames]
    depths = [f[1] for f in frames]
    intr = Intrinsics.from_config(cam)
    cfg = SolverConfig(method="gauss_newton", iterations=(10, 4))
    for kf in [None, 3]:
        R, t, rel_R, rel_t = pseq.align_sequence(
            grays, depths, intr, cfg, max_points=(1024, 512), num_levels=2,
            keyframe_every=kf, mesh=pmesh.make_mesh(),
        )
        gt_t = np.stack([p[1] for p in poses])
        err = np.linalg.norm(t - gt_t, axis=-1)
        motion = np.linalg.norm(gt_t[-1])
        assert err[-1] < max(0.5 * motion, 0.02), (kf, err)


def test_multihost_window_stitching():
    """Window split + trajectory stitching (multi-host sequence sweep,
    single-process degenerate form)."""
    import numpy as np
    from rgbd_odometry_tpu.parallel import multihost as mh
    from rgbd_odometry_tpu.core import geometry as geo
    import jax.numpy as jnp

    mh.initialize()  # no-op single process
    wins = mh.shard_sequence_windows(20, window=8, overlap=1)
    assert wins[0] == (0, 8) and wins[1][0] == 7
    assert wins[-1][1] == 20
    # fabricate a global trajectory, cut into windows, stitch back
    psis = np.cumsum(np.random.default_rng(0).standard_normal((20, 6)) * 0.01, 0).astype(np.float32)
    R_g, t_g = geo.se3_exp(jnp.asarray(psis))
    R_g = np.asarray(R_g, np.float64)
    t_g = np.asarray(t_g, np.float64)
    results = []
    for s, e in wins:
        # window-relative: rebase to the window's first pose
        R0, t0 = R_g[s], t_g[s]
        R_w = np.einsum("ij,tjk->tik", R0.T, R_g[s:e])
        t_w = np.einsum("ij,tj->ti", R0.T, t_g[s:e] - t0)
        results.append((R_w, t_w))
    R_st, t_st = mh.stitch_windows(results, overlap=1)
    # stitched should reproduce the rebased-global trajectory
    R_ref = np.einsum("ij,tjk->tik", R_g[0].T, R_g)
    t_ref = np.einsum("ij,tj->ti", R_g[0].T, t_g - t_g[0])
    assert len(t_st) == 20
    np.testing.assert_allclose(t_st, t_ref, atol=1e-5)
    np.testing.assert_allclose(R_st, R_ref, atol=1e-5)
