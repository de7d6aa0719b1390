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


# ---------------------------------------------------------------------------
# information-weighted (anisotropic) edges


def test_information_sqrt_recovers_information():
    from rgbd_odometry_tpu.solvers.pose_graph import information_sqrt

    rng = np.random.default_rng(3)
    A = rng.normal(size=(5, 6, 6)).astype(np.float32)
    info = np.einsum("eab,ecb->eac", A, A) + 0.5 * np.eye(6, dtype=np.float32)
    L = np.asarray(information_sqrt(jnp.asarray(info)))
    np.testing.assert_allclose(np.einsum("eab,ecb->eac", L, L), info, rtol=2e-4, atol=2e-4)


def test_identity_sqrt_info_matches_scalar_weight():
    """sqrt_info = w*I with weight 1 must refine identically to weight=w with
    no sqrt_info — the whitening generalizes, never changes, the scalar path."""
    R_gt, t_gt = _circle_trajectory(12)
    R_d, t_d, odo_e = _noisy_chain(R_gt, t_gt, sigma_rot=0.02, sigma_t=0.02)
    w = 1.7
    scalar = PoseGraphEdges(
        i=odo_e.i, j=odo_e.j, R_rel=odo_e.R_rel, t_rel=odo_e.t_rel,
        weight=jnp.full_like(odo_e.weight, w),
    )
    eye = jnp.broadcast_to(w * jnp.eye(6, dtype=jnp.float32), (odo_e.i.shape[0], 6, 6))
    whitened = PoseGraphEdges(
        i=odo_e.i, j=odo_e.j, R_rel=odo_e.R_rel, t_rel=odo_e.t_rel,
        weight=odo_e.weight, sqrt_info=eye,
    )
    args = (jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32))
    for solver in ("dense", "cg"):
        R_a, t_a, n_a = refine_pose_graph(*args, scalar, iterations=5, solver=solver)
        R_b, t_b, n_b = refine_pose_graph(*args, whitened, iterations=5, solver=solver)
        np.testing.assert_allclose(np.asarray(n_b), np.asarray(n_a), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_a), atol=1e-5)


def test_anisotropic_information_weights_directions_independently():
    """Two conflicting 0->1 edges with orthogonal confidence: the refined pose
    must take x from the x-confident edge and y from the y-confident edge —
    exactly what a scalar weight cannot express."""
    R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (2, 3, 3))
    t0 = jnp.asarray([[0, 0, 0], [1.1, 0.15, 0]], jnp.float32)  # init between the two
    eA = np.array([1.0, 0.0, 0.0], np.float32)   # x-confident measurement
    eB = np.array([1.2, 0.3, 0.0], np.float32)   # y-confident measurement
    LA = np.diag([10.0, 0.1, 1, 1, 1, 1]).astype(np.float32)
    LB = np.diag([0.1, 10.0, 1, 1, 1, 1]).astype(np.float32)
    edges = PoseGraphEdges(
        i=jnp.zeros((2,), jnp.int32),
        j=jnp.ones((2,), jnp.int32),
        R_rel=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (2, 3, 3)),
        t_rel=jnp.asarray(np.stack([eA, eB])),
        weight=jnp.ones((2,), jnp.float32),
        sqrt_info=jnp.asarray(np.stack([LA, LB])),
    )
    for solver in ("dense", "cg"):
        _, t_f, _ = refine_pose_graph(R0, t0, edges, iterations=10, solver=solver)
        t1 = np.asarray(t_f, np.float64)[1]
        # information-weighted optimum: x ~= 1.0 (edge A), y ~= 0.3 (edge B)
        assert abs(t1[0] - 1.0) < 0.01, (solver, t1)
        assert abs(t1[1] - 0.3) < 0.01, (solver, t1)
    # the isotropic solve CANNOT separate them: both coords at the midpoint
    iso = edges._replace(sqrt_info=None)
    _, t_i, _ = refine_pose_graph(R0, t0, iso, iterations=10, solver="dense")
    t1i = np.asarray(t_i, np.float64)[1]
    assert abs(t1i[0] - 1.1) < 0.01 and abs(t1i[1] - 0.15) < 0.01


def test_concat_mixes_isotropic_and_weighted_edges():
    """concat_edges(isotropic odometry, sqrt_info closures) inserts identity
    whitening for the isotropic side — bit-identical to spelling the
    identities out, and the loop closure still fixes the drift."""
    R_gt, t_gt = _circle_trajectory(16)
    R_d, t_d, odo_e = _noisy_chain(R_gt, t_gt, sigma_rot=0.02, sigma_t=0.02)
    dR = R_gt[-1].T @ R_gt[0]
    dt = R_gt[-1].T @ (t_gt[0] - t_gt[-1])
    L = 5.0 * jnp.eye(6, dtype=jnp.float32)[None]
    lc = PoseGraphEdges(
        i=jnp.asarray([15], jnp.int32),
        j=jnp.asarray([0], jnp.int32),
        R_rel=jnp.asarray(dR, jnp.float32)[None],
        t_rel=jnp.asarray(dt, jnp.float32)[None],
        weight=jnp.ones((1,), jnp.float32),
        sqrt_info=L,
    )
    edges = concat_edges(odo_e, lc)
    assert edges.sqrt_info is not None and edges.sqrt_info.shape == (16, 6, 6)
    np.testing.assert_allclose(np.asarray(edges.sqrt_info[0]), np.eye(6), atol=0)
    explicit = edges._replace()  # same content, just exercise the path below
    args = (jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32))
    R_f, t_f, norms = refine_pose_graph(*args, edges, iterations=10, solver="dense")
    drift_before = np.linalg.norm(t_d[-1] - t_gt[-1])
    end_after = np.linalg.norm(np.asarray(t_f, np.float64)[-1] - t_gt[-1])
    assert end_after < 0.35 * drift_before
    # cg agrees on the mixed graph
    R_c, t_c, norms_c = refine_pose_graph(*args, explicit, iterations=10, solver="cg")
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_f), atol=5e-4)


# ---------------------------------------------------------------------------
# robust (IRLS) kernels: false-loop-closure resistance


def _drifted_loop_graph(seed=0):
    """16-node drifted chain + one TRUE closure (15->0, exact) + one FALSE
    closure (15->8 claiming identity motion — perceptual aliasing)."""
    R_gt, t_gt = _circle_trajectory(16)
    R_d, t_d, odo_e = _noisy_chain(R_gt, t_gt, sigma_rot=0.02, sigma_t=0.02, seed=seed)
    dR = R_gt[-1].T @ R_gt[0]
    dt = R_gt[-1].T @ (t_gt[0] - t_gt[-1])
    true_lc = PoseGraphEdges(
        i=jnp.asarray([15], jnp.int32), j=jnp.asarray([0], jnp.int32),
        R_rel=jnp.asarray(dR, jnp.float32)[None],
        t_rel=jnp.asarray(dt, jnp.float32)[None],
        weight=jnp.asarray([5.0], jnp.float32),
    )
    false_lc = PoseGraphEdges(
        i=jnp.asarray([15], jnp.int32), j=jnp.asarray([8], jnp.int32),
        R_rel=jnp.eye(3, dtype=jnp.float32)[None],
        t_rel=jnp.zeros((1, 3), jnp.float32),
        weight=jnp.asarray([5.0], jnp.float32),
    )
    return R_gt, t_gt, R_d, t_d, odo_e, true_lc, false_lc


def test_huber_is_exact_noop_on_inlier_graphs():
    """All residuals below delta -> huber weights are exactly 1 and the
    refinement matches the quadratic one.

    The weights are asserted bit-exactly 1.0; the poses only to float32
    tolerance — multiplying by 1.0 is algebraically exact, but the extra
    reweighting ops change XLA's fusion choices downstream, reassociating
    float32 reductions (observed max diff ~6e-8)."""
    from rgbd_odometry_tpu.solvers.pose_graph import edge_robust_weights

    R_gt, t_gt, R_d, t_d, odo_e, true_lc, _ = _drifted_loop_graph()
    edges = concat_edges(odo_e, true_lc)
    args = (jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32), edges)
    R_a, t_a, n_a = refine_pose_graph(*args, iterations=8)
    w = edge_robust_weights(R_a, t_a, edges, robust="huber", delta=50.0)
    np.testing.assert_array_equal(np.asarray(w), 1.0)
    R_b, t_b, n_b = refine_pose_graph(*args, iterations=8, robust="huber",
                                      robust_delta=50.0)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(n_b), np.asarray(n_a), atol=1e-6)


def test_geman_rejects_false_loop_closure():
    """A single false closure deforms the quadratic refine; the redescending
    kernel switches it off and recovers the true-closure-only solution."""
    from rgbd_odometry_tpu.solvers.pose_graph import edge_robust_weights

    R_gt, t_gt, R_d, t_d, odo_e, true_lc, false_lc = _drifted_loop_graph()
    clean = concat_edges(odo_e, true_lc)
    poisoned = concat_edges(clean, false_lc)
    args_d = (jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32))

    _, t_ref, _ = refine_pose_graph(*args_d, clean, iterations=10)
    err_ref = np.linalg.norm(np.asarray(t_ref, np.float64) - t_gt, axis=-1).mean()
    _, t_bad, _ = refine_pose_graph(*args_d, poisoned, iterations=10)
    err_bad = np.linalg.norm(np.asarray(t_bad, np.float64) - t_gt, axis=-1).mean()
    assert err_bad > 3.0 * err_ref  # unbounded influence: the graph is wrecked

    # delta must sit between the inlier residual scale (true closure ~1.3 at
    # the drifted init) and the outlier's (~18): measured sweep shows full
    # rejection for delta <= 1, partial at 2-3, capture by the poisoned basin
    # at 5 — the CLI default (1.0) is the validated choice.
    for solver in ("dense", "cg"):
        R_rob, t_rob, _ = refine_pose_graph(
            *args_d, poisoned, iterations=10, robust="geman", robust_delta=1.0,
            solver=solver,
        )
        err_rob = np.linalg.norm(np.asarray(t_rob, np.float64) - t_gt, axis=-1).mean()
        assert err_rob < 1.5 * err_ref, (solver, err_rob, err_ref)
        w = np.asarray(edge_robust_weights(
            R_rob, t_rob, poisoned, "geman", 1.0
        ))
        assert w[-1] < 0.05      # false closure: switched off
        assert w[-2] > 0.5       # true closure: trusted
        assert w[:15].min() > 0.5  # odometry edges: untouched


def test_huber_bounds_false_closure_influence():
    """Huber bounds (does not reject) an outlier: it only helps while
    counter-pressure keeps the outlier's residual ABOVE delta at the
    optimum — here stiff odometry edges (weight 5). In a compliant graph
    the solver satisfies the false edge, every residual drops below delta,
    weights return to exactly 1, and the quadratic optimum is ALSO a huber
    IRLS fixed point (measured: identical err at odo weight 1 for any
    delta >= 1) — which is why geman, not huber, is the false-closure
    kernel. Pinned here: with stiff odometry, huber cuts the poisoning
    >2.5x while the false edge's residual stays far above delta."""
    from rgbd_odometry_tpu.solvers.pose_graph import _edge_residuals

    R_gt, t_gt, R_d, t_d, odo_e, true_lc, false_lc = _drifted_loop_graph()
    odo_stiff = odo_e._replace(weight=odo_e.weight * 5.0)
    clean = concat_edges(odo_stiff, true_lc)
    poisoned = concat_edges(clean, false_lc)
    args_d = (jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32))
    _, t_bad, _ = refine_pose_graph(*args_d, poisoned, iterations=10)
    R_hub, t_hub, _ = refine_pose_graph(
        *args_d, poisoned, iterations=10, robust="huber", robust_delta=1.0
    )
    err_bad = np.linalg.norm(np.asarray(t_bad, np.float64) - t_gt, axis=-1).mean()
    err_hub = np.linalg.norm(np.asarray(t_hub, np.float64) - t_gt, axis=-1).mean()
    assert err_hub < 0.4 * err_bad, (err_hub, err_bad)
    false_res = np.linalg.norm(
        np.asarray(_edge_residuals(R_hub, t_hub, poisoned)), axis=-1
    )[-1]
    assert false_res > 5.0  # still far above delta: stays downweighted


def test_cli_refine_robust_reports_closure_weights(tmp_path, capsys):
    import json

    from rgbd_odometry_tpu.cli import main
    from rgbd_odometry_tpu.io.tum import write_trajectory

    R_gt, t_gt = _circle_trajectory(10)
    R_d, t_d, _ = _noisy_chain(R_gt, t_gt, sigma_rot=0.02, sigma_t=0.02)
    est = str(tmp_path / "est.txt")
    out = str(tmp_path / "refined.txt")
    write_trajectory(est, R_d, t_d, np.arange(10) / 30.0)
    dR = R_gt[-1].T @ R_gt[0]
    dt = R_gt[-1].T @ (t_gt[0] - t_gt[-1])
    q = np.asarray(geo.quat_from_rotmat(jnp.asarray(dR, jnp.float32)))
    lc = str(tmp_path / "lc.txt")
    with open(lc, "w") as f:
        # true closure 9->0 plus a false identity closure 9->4
        f.write(f"9 0 {dt[0]} {dt[1]} {dt[2]} {q[0]} {q[1]} {q[2]} {q[3]} 5.0\n")
        f.write("9 4 0 0 0 0 0 0 1 5.0\n")
    main(["refine", est, "--constraints", lc, "--out", out,
          "--robust", "geman", "--robust-delta", "3.0"])
    summary = json.loads(capsys.readouterr().out)
    w = summary["closure_robust_weights"]
    assert len(w) == 2 and w[0] > 0.5 and w[1] < 0.05


# ---------------------------------------------------------------------------
# marginal covariance


def test_marginal_covariance_chain_random_walk():
    """Identity chain (coincident poses) with edge weight w: the
    anchor-relative covariance of node k is exactly (k / w^2) I —
    unweighted odometry is a random walk, information composes as 1/k.
    (With nonzero translations the lateral translation variances pick up
    lever-arm terms from upstream rotation uncertainty — measured +0.5%
    at 0.1 m spacing — so the exact-identity case is the clean pin.)"""
    from rgbd_odometry_tpu.solvers.pose_graph import marginal_covariance

    n, w = 12, 2.0
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    t = jnp.zeros((n, 3), jnp.float32)
    edges = odometry_edges(R, t, weight=w)
    cov = np.asarray(marginal_covariance(R, t, edges))
    np.testing.assert_array_equal(cov[0], 0.0)  # gauge node: exact zeros
    for k in range(1, n):
        np.testing.assert_allclose(np.diag(cov[k]), k / w**2, rtol=1e-4)
    # symmetric PSD blocks
    for k in range(n):
        np.testing.assert_allclose(cov[k], cov[k].T, atol=1e-6 * (1 + k))
        assert np.linalg.eigvalsh(cov[k]).min() > -1e-5


def test_marginal_covariance_dense_cg_agree_and_subset():
    from rgbd_odometry_tpu.solvers.pose_graph import marginal_covariance

    R_gt, t_gt, R_d, t_d, odo_e, true_lc, _ = _drifted_loop_graph()
    g = concat_edges(odo_e, true_lc)
    args = (jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32))
    R_f, t_f, _ = refine_pose_graph(*args, g, iterations=10)
    cd = np.asarray(marginal_covariance(R_f, t_f, g, solver="dense"))
    cc = np.asarray(marginal_covariance(R_f, t_f, g, solver="cg"))
    scale = np.abs(cd).max()
    np.testing.assert_allclose(cc, cd, atol=1e-4 * scale)
    sub = np.asarray(
        marginal_covariance(R_f, t_f, g, nodes=jnp.asarray([0, 8, 15]))
    )
    np.testing.assert_allclose(sub[1], cd[8], atol=1e-6 * scale)
    np.testing.assert_array_equal(sub[0], 0.0)


def test_marginal_covariance_loop_closure_collapses_uncertainty():
    """The canonical SLAM picture: chain-only covariance grows toward the
    far end; one closure back to the anchor collapses it (measured here:
    ~600x at the closing node)."""
    from rgbd_odometry_tpu.solvers.pose_graph import marginal_covariance

    R_gt, t_gt, R_d, t_d, odo_e, true_lc, _ = _drifted_loop_graph()
    g = concat_edges(odo_e, true_lc)
    args = (jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32))
    R_f, t_f, _ = refine_pose_graph(*args, g, iterations=10)
    chain_only = np.asarray(marginal_covariance(R_f, t_f, odo_e))
    closed = np.asarray(marginal_covariance(R_f, t_f, g))
    tr_chain = np.trace(chain_only, axis1=-2, axis2=-1)
    tr_closed = np.trace(closed, axis1=-2, axis2=-1)
    assert tr_chain[1:].argmax() + 1 == 15  # grows toward the far end
    assert tr_closed[15] < 0.01 * tr_chain[15]
    # middle of the loop also tightens (information flows both ways)
    assert tr_closed[8] < 0.5 * tr_chain[8]


def test_marginal_covariance_robust_removes_phantom_confidence():
    """A geman-rejected false closure must not reduce the reported
    uncertainty: the quadratic H counts the false edge as information
    (node-8 trace collapses ~40x); freezing the IRLS weights restores the
    clean-graph covariance to <1%."""
    from rgbd_odometry_tpu.solvers.pose_graph import marginal_covariance

    R_gt, t_gt, R_d, t_d, odo_e, true_lc, false_lc = _drifted_loop_graph()
    g = concat_edges(odo_e, true_lc)
    poisoned = concat_edges(g, false_lc)
    args = (jnp.asarray(R_d, jnp.float32), jnp.asarray(t_d, jnp.float32))
    R_f, t_f, _ = refine_pose_graph(*args, g, iterations=10)
    clean = np.asarray(marginal_covariance(R_f, t_f, g))
    quad = np.asarray(marginal_covariance(R_f, t_f, poisoned))
    rob = np.asarray(marginal_covariance(
        R_f, t_f, poisoned, robust="geman", robust_delta=1.0
    ))
    tr = lambda c: np.trace(c[8])
    assert tr(quad) < 0.1 * tr(clean)  # phantom confidence
    np.testing.assert_allclose(tr(rob), tr(clean), rtol=1e-2)


def test_cli_refine_covariance_out(tmp_path, capsys):
    import json

    from rgbd_odometry_tpu.cli import main
    from rgbd_odometry_tpu.io.tum import write_trajectory

    R_gt, t_gt = _circle_trajectory(10)
    R_d, t_d, _ = _noisy_chain(R_gt, t_gt, sigma_rot=0.02, sigma_t=0.02)
    est = str(tmp_path / "est.txt")
    out = str(tmp_path / "refined.txt")
    cov_out = str(tmp_path / "cov.npy")
    write_trajectory(est, R_d, t_d, np.arange(10) / 30.0)
    main(["refine", est, "--out", out, "--covariance-out", cov_out])
    summary = json.loads(capsys.readouterr().out)
    assert summary["covariance_out"] == cov_out
    cov = np.load(cov_out)
    assert cov.shape == (10, 6, 6)
    np.testing.assert_array_equal(cov[0], 0.0)
    tr = np.trace(cov, axis1=-2, axis2=-1)
    assert tr[1:].argmax() + 1 == 9  # open chain: grows to the far end
    assert abs(summary["covariance_trace_max"] - tr.max()) < 1e-4
