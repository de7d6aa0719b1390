"""Keyframe pose-graph refinement (solvers/pose_graph.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.solvers.pose_graph import (
    PoseGraphEdges,
    concat_edges,
    odometry_edges,
    refine_pose_graph,
)


def _circle_trajectory(n=20, radius=1.0):
    """Ground-truth poses around a circle (returns (N,3,3), (N,3))."""
    Rs, ts = [], []
    for k in range(n):
        a = 2 * np.pi * k / n
        psi = np.array([0, a, 0, radius * np.cos(a), 0.0, radius * np.sin(a)], np.float32)
        # rotation about y by a; translation on the circle
        R, _ = geo.se3_exp(jnp.asarray([0, 0, 0, 0, a, 0], jnp.float32))
        Rs.append(np.asarray(R))
        ts.append(np.array([radius * np.cos(a), 0.0, radius * np.sin(a)], np.float64))
    return np.stack(Rs), np.stack(ts)


def _noisy_chain(R_gt, t_gt, sigma_rot=0.01, sigma_t=0.01, seed=0):
    """Integrate noisy consecutive relative measurements -> drifted absolute
    trajectory + the noisy edge list (what an odometry front-end hands us)."""
    rng = np.random.default_rng(seed)
    n = len(t_gt)
    i = np.arange(n - 1)
    R_rel, t_rel = [], []
    for k in range(n - 1):
        dR = R_gt[k].T @ R_gt[k + 1]
        dt = R_gt[k].T @ (t_gt[k + 1] - t_gt[k])
        noise = np.concatenate(
            [rng.normal(0, sigma_t, 3), rng.normal(0, sigma_rot, 3)]
        ).astype(np.float32)
        nR, nt = geo.se3_exp(jnp.asarray(noise))
        R_rel.append(dR @ np.asarray(nR, np.float64))
        t_rel.append(dt + dR @ np.asarray(nt, np.float64))
    # integrate the noisy chain
    Rs, ts = [R_gt[0]], [t_gt[0]]
    for k in range(n - 1):
        ts.append(ts[-1] + Rs[-1] @ t_rel[k])
        Rs.append(Rs[-1] @ R_rel[k])
    edges = PoseGraphEdges(
        i=jnp.asarray(i, jnp.int32),
        j=jnp.asarray(i + 1, jnp.int32),
        R_rel=jnp.asarray(np.stack(R_rel), jnp.float32),
        t_rel=jnp.asarray(np.stack(t_rel), jnp.float32),
        weight=jnp.ones((n - 1,), jnp.float32),
    )
    return np.stack(Rs), np.stack(ts), edges


def test_residuals_zero_on_consistent_graph():
    R_gt, t_gt = _circle_trajectory(10)
    edges = odometry_edges(jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32))
    R_f, t_f, norms = refine_pose_graph(
        jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32), edges, iterations=3
    )
    assert float(norms[0]) < 1e-4  # already consistent
    np.testing.assert_allclose(np.asarray(t_f), t_gt, atol=1e-4)


def test_loop_closure_fixes_drift():
    """A drifted odometry chain + one loop-closure edge back to node 0: the
    refinement redistributes the error and the endpoint snaps back."""
    R_gt, t_gt = _circle_trajectory(16)
    R_d, t_d, odo_e = _noisy_chain(R_gt, t_gt, sigma_rot=0.02, sigma_t=0.02)
    drift_before = np.linalg.norm(t_d[-1] - t_gt[-1])
    assert drift_before > 0.05  # the chain really drifted

    # loop closure: an (exact) measurement from the last node to the first
    dR = R_gt[-1].T @ R_gt[0]
    dt = R_gt[-1].T @ (t_gt[0] - t_gt[-1])
    lc = PoseGraphEdges(
        i=jnp.asarray([15], jnp.int32),
        j=jnp.asarray([0], jnp.int32),
        R_rel=jnp.asarray(dR, jnp.float32)[None],
        t_rel=jnp.asarray(dt, jnp.float32)[None],
        weight=jnp.asarray([5.0], jnp.float32),
    )
    edges = concat_edges(odo_e, lc)
    R_f, t_f, norms = refine_pose_graph(
        jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32), edges, iterations=10
    )
    # residual decreased and the whole trajectory moved closer to GT (the
    # mean can only improve so much — interior nodes remain pinned by their
    # noisy odometry edges — but the endpoint, where the loop closure acts,
    # must snap back hard)
    assert float(norms[-1]) < 0.5 * float(norms[0])
    err_before = np.linalg.norm(t_d - t_gt, axis=-1).mean()
    err_after = np.linalg.norm(np.asarray(t_f, np.float64) - t_gt, axis=-1).mean()
    assert err_after < 0.8 * err_before
    end_after = np.linalg.norm(np.asarray(t_f, np.float64)[-1] - t_gt[-1])
    assert end_after < 0.35 * drift_before
    # gauge: node 0 anchored
    np.testing.assert_allclose(np.asarray(t_f)[0], t_d[0], atol=1e-5)


def test_cli_refine_roundtrip(tmp_path, capsys):
    import json

    from rgbd_odometry_tpu.cli import main
    from rgbd_odometry_tpu.io.tum import read_trajectory, write_trajectory

    R_gt, t_gt = _circle_trajectory(10)
    R_d, t_d, _ = _noisy_chain(R_gt, t_gt, sigma_rot=0.02, sigma_t=0.02)
    est = str(tmp_path / "est.txt")
    out = str(tmp_path / "refined.txt")
    write_trajectory(est, R_d, t_d, np.arange(10) / 30.0)
    # loop closure 9 -> 0 in the constraints format
    dR = R_gt[-1].T @ R_gt[0]
    dt = R_gt[-1].T @ (t_gt[0] - t_gt[-1])
    q = np.asarray(geo.quat_from_rotmat(jnp.asarray(dR, jnp.float32)))
    lc = str(tmp_path / "lc.txt")
    with open(lc, "w") as f:
        f.write(f"9 0 {dt[0]} {dt[1]} {dt[2]} {q[0]} {q[1]} {q[2]} {q[3]} 5.0\n")
    main(["refine", est, "--constraints", lc, "--out", out])
    summary = json.loads(capsys.readouterr().out)
    assert summary["loop_closures"] == 1
    assert summary["residual_norms"][-1] < summary["residual_norms"][0]
    R_f, t_f, _ = read_trajectory(out)
    end_before = np.linalg.norm(t_d[-1] - t_gt[-1])
    end_after = np.linalg.norm(t_f[-1] - t_gt[-1])
    assert end_after < 0.5 * end_before


def test_cg_solver_matches_dense():
    """The matrix-free PCG path solves the same normal equations as the dense
    factorization: identical refinement on a loop-closed noisy chain."""
    R_gt, t_gt = _circle_trajectory(16)
    R_d, t_d, odo_e = _noisy_chain(R_gt, t_gt, sigma_rot=0.02, sigma_t=0.02)
    dR = R_gt[-1].T @ R_gt[0]
    dt = R_gt[-1].T @ (t_gt[0] - t_gt[-1])
    lc = PoseGraphEdges(
        i=jnp.asarray([15], jnp.int32),
        j=jnp.asarray([0], jnp.int32),
        R_rel=jnp.asarray(dR, jnp.float32)[None],
        t_rel=jnp.asarray(dt, jnp.float32)[None],
        weight=jnp.asarray([5.0], jnp.float32),
    )
    edges = concat_edges(odo_e, lc)
    args = (jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32), edges)
    R_a, t_a, norms_a = refine_pose_graph(*args, iterations=8, solver="dense")
    R_b, t_b, norms_b = refine_pose_graph(*args, iterations=8, solver="cg")
    np.testing.assert_allclose(np.asarray(norms_b), np.asarray(norms_a), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_a), atol=2e-4)
    np.testing.assert_allclose(np.asarray(R_b), np.asarray(R_a), atol=2e-4)


def test_cg_500_node_graph():
    """The scale the dense path cannot touch: a 500-node drifted chain with
    loop closures refines via the sparse-block PCG path (O(E) Jacobian work,
    matrix-free solve) — the 'hundreds of nodes' the module docstring
    promises, now exercised."""
    n = 500
    R_gt, t_gt = _circle_trajectory(n)
    R_d, t_d, odo_e = _noisy_chain(R_gt, t_gt, sigma_rot=0.004, sigma_t=0.004)
    drift_before = np.linalg.norm(t_d[-1] - t_gt[-1])
    assert drift_before > 0.05
    # closures: end->start and the two half-loop meeting points
    lcs = [(n - 1, 0), (n // 2, 0), (3 * n // 4, n // 4)]
    li, lj, lR, lt = [], [], [], []
    for a, b in lcs:
        li.append(a)
        lj.append(b)
        lR.append(R_gt[a].T @ R_gt[b])
        lt.append(R_gt[a].T @ (t_gt[b] - t_gt[a]))
    lc = PoseGraphEdges(
        i=jnp.asarray(li, jnp.int32),
        j=jnp.asarray(lj, jnp.int32),
        R_rel=jnp.asarray(np.stack(lR), jnp.float32),
        t_rel=jnp.asarray(np.stack(lt), jnp.float32),
        weight=jnp.full((len(lcs),), 5.0, jnp.float32),
    )
    edges = concat_edges(odo_e, lc)
    R_f, t_f, norms = refine_pose_graph(
        jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32), edges,
        iterations=6,  # solver="auto" -> cg at this size
    )
    assert float(norms[-1]) < 0.7 * float(norms[0])
    err_before = np.linalg.norm(t_d - t_gt, axis=-1).mean()
    err_after = np.linalg.norm(np.asarray(t_f, np.float64) - t_gt, axis=-1).mean()
    assert err_after < 0.5 * err_before
    end_after = np.linalg.norm(np.asarray(t_f, np.float64)[-1] - t_gt[-1])
    assert end_after < 0.35 * drift_before
    np.testing.assert_allclose(np.asarray(t_f)[0], t_d[0], atol=1e-5)


def test_jit_and_vmap_over_graphs():
    """The refinement is one jittable function; a batch of graphs vmaps."""
    R_gt, t_gt = _circle_trajectory(8)
    R_d, t_d, edges = _noisy_chain(R_gt, t_gt, seed=1)
    f = jax.jit(lambda R, t: refine_pose_graph(R, t, edges, iterations=4)[:2])
    R1, t1 = f(jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32))
    Rb = jnp.stack([jnp.asarray(R_d, jnp.float32)] * 3)
    tb = jnp.stack([jnp.asarray(t_d, jnp.float32)] * 3)
    Rv, tv = jax.jit(jax.vmap(lambda R, t: refine_pose_graph(R, t, edges, iterations=4)[:2]))(Rb, tb)
    np.testing.assert_allclose(np.asarray(tv[0]), np.asarray(t1), atol=1e-5)
