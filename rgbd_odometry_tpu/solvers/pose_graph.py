"""SE(3) pose-graph refinement — batched Gauss-Newton over keyframe poses.

The reference's GOP only COMPOSES relative poses into a trajectory
(/root/reference/src/GOP.cpp:138-186); every frame-to-keyframe error is
frozen forever. BASELINE.json's batch config names the workload this module
provides: "keyframe-graph refinement" — given a trajectory and a set of
relative-pose constraints (odometry edges plus any loop closures), jointly
adjust all poses to minimize the constraint residuals.

TPU-first shape: all E edge residuals evaluate in one vmapped pass. Two
solver paths share the same Gauss-Newton outer loop:

  * ``dense`` — `jax.jacfwd` of the stacked (6E,) residual w.r.t. all (N,6)
    tangent deltas, one dense factorization per step. Simplest and fastest
    for small graphs (few kernel launches), but O(N*E) Jacobian work and an
    O(N^3) solve: wrong past a couple hundred nodes.
  * ``cg`` — the block-sparse structure done properly: each edge touches
    exactly two nodes, so its Jacobian is two 6x6 blocks (A_e = dr/d(delta_i),
    B_e = dr/d(delta_j)), computed exactly by a *vmapped per-edge* jacfwd
    over 12 tangents (O(E), never materializing (6E, 6N)). The damped normal
    equations are then solved matrix-free by preconditioned conjugate
    gradients: H x is two one-hot incidence matmuls (MXU-shaped gather/
    scatter, the repo-wide pattern) plus per-edge 6x6 einsums; the
    preconditioner is the inverted block diagonal of H (batched 6x6).

``solver="auto"`` picks dense for <=64 nodes, cg beyond. Node 0 is anchored
(gauge freedom) in both paths.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.core import geometry as geo

_PREC = jax.lax.Precision.HIGHEST


class PoseGraphEdges(NamedTuple):
    """Relative-pose constraints: pose_j ~= pose_i * (R_rel, t_rel).

    ``sqrt_info`` (optional, (E, 6, 6)): per-edge whitening factor L with
    information matrix Omega = L L^T; residuals become r' = L^T (w * r), so
    the Gauss-Newton cost is the Mahalanobis norm r^T Omega r. Build it from
    solver information matrices (edge_dvo.pose_information) via
    `information_sqrt`. None = isotropic (scalar `weight` only), the
    reference-equivalent behavior."""

    i: jnp.ndarray  # (E,) int32 source node
    j: jnp.ndarray  # (E,) int32 target node
    R_rel: jnp.ndarray  # (E, 3, 3)
    t_rel: jnp.ndarray  # (E, 3)
    weight: jnp.ndarray  # (E,) confidence weight (1/sigma)
    sqrt_info: jnp.ndarray | None = None  # (E, 6, 6) lower-tri Cholesky of Omega


def information_sqrt(info: jnp.ndarray, ridge: float = 1e-9) -> jnp.ndarray:
    """(E, 6, 6) information matrices -> whitening factors L (Omega = L L^T).

    Batched Cholesky with a ridge for rank-deficient directions (degenerate
    scenes give near-singular J^T W J). Twist layout must match the residual:
    (translation, rotation) — the solver's `psi` layout, which is also what
    `geo.se3_log` returns."""
    info = jnp.asarray(info)
    eye = jnp.eye(6, dtype=info.dtype)
    return jnp.linalg.cholesky(info + ridge * eye)


def normalized_information_sqrt(
    info: jnp.ndarray,
    sigma2: jnp.ndarray | None = None,
    ridge: float = 1e-9,
    block_normalize: bool = False,
) -> jnp.ndarray:
    """`information_sqrt` with batch scale normalization, for mixing
    solver-produced information matrices with scalar-weighted edges.

    Raw J^T W J magnitudes grow with point count (~1e4-1e6), which would
    drown any scalar-weighted edge (loop closures default to weight 3) in
    the same graph. Dividing the whole batch by the mean of trace/6 pins
    the AVERAGE whitened residual scale at ~1 — the same scale as a
    weight-1 isotropic edge — while preserving both the anisotropy within
    each edge and the relative confidence between edges, which is the
    actual signal. ``sigma2`` (optional, (E,)): per-edge robust residual
    variance from `pose_information`; the true information is
    J^T W J / sigma2, so noisier solves count for less.

    ``block_normalize``: normalize the translation (m) and rotation (rad)
    3x3 blocks by SEPARATE batch scales. Required whenever the two units
    carry wildly different information magnitudes — an IMU preintegration
    with a quiet gyro has rotation information ~1e11 vs translation ~1e4,
    and a single global scale would whiten the translation rows to ~1e-7,
    silently switching the translation constraints off (measured: the
    information-weighted IMU refinement moved the trajectory by exactly
    nothing). Off-diagonal coupling blocks scale by the geometric mean."""
    info = jnp.asarray(info)
    if sigma2 is not None:
        info = info / jnp.maximum(jnp.asarray(sigma2)[:, None, None], 1e-12)
    if block_normalize:
        s_t = jnp.mean(jnp.trace(info[..., :3, :3], axis1=-2, axis2=-1)) / 3.0
        s_r = jnp.mean(jnp.trace(info[..., 3:, 3:], axis1=-2, axis2=-1)) / 3.0
        d = jnp.concatenate([jnp.full((3,), s_t, info.dtype),
                             jnp.full((3,), s_r, info.dtype)])
        D = jnp.sqrt(jnp.maximum(d[:, None] * d[None, :], 1e-30))
        return information_sqrt(info / D, ridge=ridge)
    scale = jnp.mean(jnp.trace(info, axis1=-2, axis2=-1)) / 6.0
    return information_sqrt(info / jnp.maximum(scale, 1e-30), ridge=ridge)


def odometry_edges(
    R: jnp.ndarray,
    t: jnp.ndarray,
    weight: float = 1.0,
    sqrt_info: jnp.ndarray | None = None,
) -> PoseGraphEdges:
    """Consecutive-frame constraints from an absolute trajectory (the GOP
    chain re-expressed as edges). ``sqrt_info``: optional (n-1, 6, 6)
    per-edge whitening factors (see `information_sqrt`) — e.g. built from
    the solver's per-frame `pose_information` so weakly-constrained
    directions pull less during refinement."""
    n = R.shape[0]
    i = jnp.arange(n - 1, dtype=jnp.int32)
    j = i + 1
    R_rel = jnp.einsum("nij,nik->njk", R[:-1], R[1:], precision=_PREC)  # Ri^T Rj
    t_rel = jnp.einsum("nij,ni->nj", R[:-1], t[1:] - t[:-1], precision=_PREC)
    w = jnp.full((n - 1,), weight, R.dtype)
    return PoseGraphEdges(i=i, j=j, R_rel=R_rel, t_rel=t_rel, weight=w,
                          sqrt_info=sqrt_info)


def concat_edges(a: PoseGraphEdges, b: PoseGraphEdges) -> PoseGraphEdges:
    # identity whitening for the side that lacks sqrt_info (mixing weighted
    # loop closures with isotropic odometry edges is the common case)
    si = None
    if a.sqrt_info is not None or b.sqrt_info is not None:
        def _or_eye(e: PoseGraphEdges):
            if e.sqrt_info is not None:
                return e.sqrt_info
            eye = jnp.eye(6, dtype=e.R_rel.dtype)
            return jnp.broadcast_to(eye, (e.i.shape[0], 6, 6))

        si = jnp.concatenate([_or_eye(a), _or_eye(b)])
    return PoseGraphEdges(
        i=jnp.concatenate([a.i, b.i]),
        j=jnp.concatenate([a.j, b.j]),
        R_rel=jnp.concatenate([a.R_rel, b.R_rel]),
        t_rel=jnp.concatenate([a.t_rel, b.t_rel]),
        weight=jnp.concatenate([a.weight, b.weight]),
        sqrt_info=si,
    )


def _apply_deltas(R, t, deltas):
    """Right-perturb every pose by its tangent delta: T_i <- T_i exp(d_i)."""
    dR, dt = jax.vmap(geo.se3_exp)(deltas)
    t_new = t + jnp.einsum("nij,nj->ni", R, dt, precision=_PREC)
    R_new = jnp.einsum("nij,njk->nik", R, dR, precision=_PREC)
    return R_new, t_new


def _edge_residuals(R, t, edges: PoseGraphEdges):
    """(E, 6) weighted residuals: log( (R_rel,t_rel)^-1 * (T_i^-1 T_j) )."""
    Ri = R[edges.i]
    Rj = R[edges.j]
    ti = t[edges.i]
    tj = t[edges.j]
    R_ij = jnp.einsum("eij,eik->ejk", Ri, Rj, precision=_PREC)  # Ri^T Rj
    t_ij = jnp.einsum("eij,ei->ej", Ri, tj - ti, precision=_PREC)
    # error transform: meas^-1 * actual
    R_err = jnp.einsum("eij,eik->ejk", edges.R_rel, R_ij, precision=_PREC)
    t_err = jnp.einsum("eij,ei->ej", edges.R_rel, t_ij - edges.t_rel, precision=_PREC)
    res = jax.vmap(geo.se3_log)(R_err, t_err)  # (E, 6)
    res = res * edges.weight[:, None]
    if edges.sqrt_info is not None:
        # whiten: r' = L^T r so that ||r'||^2 = r^T Omega r
        res = jnp.einsum("eba,eb->ea", edges.sqrt_info, res, precision=_PREC)
    return res


def _edge_jacobians(R, t, edges: PoseGraphEdges):
    """Exact per-edge Jacobian blocks (A_e, B_e), each (E, 6, 6).

    A_e = d r_e / d delta_i, B_e = d r_e / d delta_j for right-perturbations
    T_k <- T_k exp(delta_k). Computed by a vmapped 12-tangent jacfwd — O(E)
    work, the analytic two-block sparsity of a pose-graph row without ever
    forming the (6E, 6N) matrix the dense path uses.
    """

    def one_edge(Ri, ti, Rj, tj, Rrel, trel, w, L):
        def res(d):
            dRi, dti = geo.se3_exp(d[:6])
            dRj, dtj = geo.se3_exp(d[6:])
            Ri2 = jnp.matmul(Ri, dRi, precision=_PREC)
            ti2 = ti + jnp.einsum("ij,j->i", Ri, dti, precision=_PREC)
            Rj2 = jnp.matmul(Rj, dRj, precision=_PREC)
            tj2 = tj + jnp.einsum("ij,j->i", Rj, dtj, precision=_PREC)
            R_ij = jnp.einsum("ij,ik->jk", Ri2, Rj2, precision=_PREC)
            t_ij = jnp.einsum("ij,i->j", Ri2, tj2 - ti2, precision=_PREC)
            R_err = jnp.einsum("ij,ik->jk", Rrel, R_ij, precision=_PREC)
            t_err = jnp.einsum("ij,i->j", Rrel, t_ij - trel, precision=_PREC)
            r = w * geo.se3_log(R_err, t_err)
            if L is not None:
                r = jnp.einsum("ba,b->a", L, r, precision=_PREC)
            return r

        J = jax.jacfwd(res)(jnp.zeros((12,), R.dtype))  # (6, 12)
        return J[:, :6], J[:, 6:]

    if edges.sqrt_info is not None:
        return jax.vmap(one_edge)(
            R[edges.i], t[edges.i], R[edges.j], t[edges.j],
            edges.R_rel, edges.t_rel, edges.weight, edges.sqrt_info,
        )
    return jax.vmap(lambda Ri, ti, Rj, tj, Rrel, trel, w: one_edge(
        Ri, ti, Rj, tj, Rrel, trel, w, None
    ))(
        R[edges.i], t[edges.i], R[edges.j], t[edges.j],
        edges.R_rel, edges.t_rel, edges.weight,
    )


def _robust_sqrt_weights(r: jnp.ndarray, robust: str, delta: float) -> jnp.ndarray:
    """(E,) IRLS scale factors from the CURRENT whitened residuals r (E, 6).

    Standard iteratively-reweighted least squares: each Gauss-Newton
    iteration freezes a per-edge scalar w(||r_e||) and solves the weighted
    quadratic; sqrt(w) multiplies the residual and both Jacobian blocks.

      * ``huber``: w = min(1, delta/s) — bounded influence; inlier edges
        (s <= delta) are untouched, outliers pull with constant force.
      * ``geman``: Geman-McClure w = 1/(1 + (s/delta)^2)^2 — redescending;
        gross outliers (false loop closures) are effectively switched off,
        the same mechanism as dynamic covariance scaling in SLAM back ends.
    """
    s = jnp.linalg.norm(r, axis=-1)
    if robust == "huber":
        w = jnp.minimum(1.0, delta / jnp.maximum(s, 1e-12))
    elif robust == "geman":
        w = 1.0 / jnp.square(1.0 + jnp.square(s / delta))
    else:
        raise ValueError(f"unknown robust kernel {robust!r} (huber|geman)")
    return jnp.sqrt(w).astype(r.dtype)


def edge_robust_weights(
    R: jnp.ndarray, t: jnp.ndarray, edges: PoseGraphEdges, robust: str, delta: float
) -> jnp.ndarray:
    """(E,) effective robust weights w at the given poses — diagnosis helper
    (e.g. report which loop closures the refinement rejected)."""
    r = _edge_residuals(R, t, edges)
    return jnp.square(_robust_sqrt_weights(r, robust, delta))


def _pcg(matvec, apply_minv, b, max_iters: int, tol: float):
    """Preconditioned conjugate gradients for H x = b (pytree-free, (N,6))."""
    dtype = b.dtype
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_minv(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    b2 = jnp.maximum(jnp.sum(b * b), 1e-30)

    def cond(state):
        _, r, _, _, k = state
        return (k < max_iters) & (jnp.sum(r * r) > tol * tol * b2)

    def body(state):
        x, r, p, rz, k = state
        Hp = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-30)
        x = x + alpha * p
        r = r - alpha * Hp
        z = apply_minv(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32))
    )
    return x.astype(dtype)


def _normal_ops(R, t, edges: PoseGraphEdges, damping):
    """Matrix-free damped-normal-equation operators at linearization (R, t).

    Returns (matvec, apply_minv, gather_grad): H-apply with node-0 gauge rows
    acting as identity (node 0 fully decoupled, so gauge solutions stay
    exact), a block-Jacobi preconditioner, and the J^T r gradient assembler.
    Shared by the per-iteration CG solve and `marginal_covariance`."""
    n = R.shape[0]
    dtype = R.dtype
    A, B = _edge_jacobians(R, t, edges)  # (E, 6, 6) each
    # one-hot incidence: gather x_i / scatter-add as MXU matmuls (the same
    # pattern as ops/matmul_gather — TPU point-scatters serialize)
    Si = jax.nn.one_hot(edges.i, n, dtype=dtype)  # (E, N)
    Sj = jax.nn.one_hot(edges.j, n, dtype=dtype)
    node_mask = (jnp.arange(n) > 0).astype(dtype)[:, None]  # gauge: node 0 fixed

    def matvec(x):
        xm = x * node_mask
        xi = jnp.einsum("en,nb->eb", Si, xm, precision=_PREC)
        xj = jnp.einsum("en,nb->eb", Sj, xm, precision=_PREC)
        u = jnp.einsum("eab,eb->ea", A, xi, precision=_PREC) + jnp.einsum(
            "eab,eb->ea", B, xj, precision=_PREC
        )
        yi = jnp.einsum("eab,ea->eb", A, u, precision=_PREC)
        yj = jnp.einsum("eab,ea->eb", B, u, precision=_PREC)
        y = jnp.einsum("en,eb->nb", Si, yi, precision=_PREC) + jnp.einsum(
            "en,eb->nb", Sj, yj, precision=_PREC
        )
        # damped, gauge row acts as identity (keeps H PD, delta_0 = 0)
        return (y + damping * xm) * node_mask + x * (1.0 - node_mask)

    # block-Jacobi preconditioner: inverted 6x6 diagonal blocks of H
    AtA = jnp.einsum("eab,eac->ebc", A, A, precision=_PREC)
    BtB = jnp.einsum("eab,eac->ebc", B, B, precision=_PREC)
    D = jnp.einsum("en,ebc->nbc", Si, AtA, precision=_PREC) + jnp.einsum(
        "en,ebc->nbc", Sj, BtB, precision=_PREC
    )
    D = D + (damping + 1e-8) * jnp.eye(6, dtype=dtype)
    D = jnp.where(
        (jnp.arange(n) > 0)[:, None, None], D, jnp.eye(6, dtype=dtype)[None]
    )
    Dinv = jnp.linalg.inv(D)

    def apply_minv(v):
        return jnp.einsum("nab,nb->na", Dinv, v, precision=_PREC)

    def gather_grad(r):
        g = jnp.einsum("en,eb->nb", Si,
                       jnp.einsum("eab,ea->eb", A, r, precision=_PREC),
                       precision=_PREC)
        g = g + jnp.einsum("en,eb->nb", Sj,
                           jnp.einsum("eab,ea->eb", B, r, precision=_PREC),
                           precision=_PREC)
        return g * node_mask

    return matvec, apply_minv, gather_grad


def _solve_cg(R, t, edges: PoseGraphEdges, r, damping, cg_iters, cg_tol):
    """One GN delta via matrix-free PCG on the damped normal equations."""
    matvec, apply_minv, gather_grad = _normal_ops(R, t, edges, damping)
    return _pcg(matvec, apply_minv, -gather_grad(r), cg_iters, cg_tol)


def refine_pose_graph(
    R0: jnp.ndarray,  # (N, 3, 3) initial absolute poses
    t0: jnp.ndarray,  # (N, 3)
    edges: PoseGraphEdges,
    iterations: int = 10,
    damping: float = 1e-6,
    solver: str = "auto",
    cg_iters: int | None = None,
    cg_tol: float = 1e-6,
    robust: str | None = None,
    robust_delta: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton pose-graph optimization; returns (R, t, residual_norms).

    Node 0 is held fixed (gauge). Jittable; for batches of graphs, vmap.
    ``solver``: "dense" | "cg" | "auto" (dense for N<=64; see module
    docstring). ``cg_iters`` defaults to 2N (chain graphs need ~diameter
    iterations to propagate a correction end to end); the tolerance exit
    fires much earlier on easy graphs.

    ``robust``: optional IRLS kernel ("huber" | "geman") applied per edge on
    the whitened residual norm with scale ``robust_delta`` — a false loop
    closure is a gross outlier edge, and without a robust kernel a single
    one deforms the whole graph (least squares has unbounded influence).
    ``None`` preserves exact quadratic behavior; "huber" bounds an edge's
    pull; "geman" (redescending, = dynamic covariance scaling) switches
    gross outliers off entirely. Inlier edges with residual << delta are
    essentially untouched. ``residual_norms`` reports the UNREWEIGHTED
    norms, so convergence reads the same across kernels.

    Choosing ``robust_delta``: it must sit between the inlier whitened
    residual scale and the outlier's AT THE INITIAL poses — IRLS freezes
    weights before the first solve, so a delta of the outlier's own scale
    leaves it partially trusted, and a delta far above both lets the
    solver fall into the poisoned basin where the outlier's residual is
    small and never gets rejected (measured in
    tests/test_pose_graph.py::test_geman_rejects_false_loop_closure).
    With weight ~= 1/sigma edges the whitened inlier scale is ~1, hence
    the default.
    """
    n = R0.shape[0]
    dtype = R0.dtype
    if solver == "auto":
        solver = "dense" if n <= 64 else "cg"
    if cg_iters is None:
        cg_iters = 2 * n

    def _reweighted(R, t):
        """IRLS: freeze per-edge robust scales at the current estimate and
        fold them into the scalar edge weights for this iteration's
        residuals AND Jacobians (scalar weight commutes with sqrt_info)."""
        r0 = _edge_residuals(R, t, edges)
        if robust is None:
            return edges, r0, r0
        sw = _robust_sqrt_weights(r0, robust, robust_delta)
        return edges._replace(weight=edges.weight * sw), r0 * sw[:, None], r0

    def step_dense(carry, _):
        R, t = carry
        e2, r, r_raw = _reweighted(R, t)

        def res_of(deltas):
            R2, t2 = _apply_deltas(R, t, deltas.reshape(n, 6))
            return _edge_residuals(R2, t2, e2).reshape(-1)

        zero = jnp.zeros((n * 6,), dtype)
        r = r.reshape(-1)
        J = jax.jacfwd(res_of)(zero)  # (6E, 6N)
        # gauge: zero out node-0 columns so its pose never moves
        mask = jnp.concatenate([jnp.zeros((6,), dtype), jnp.ones(((n - 1) * 6,), dtype)])
        J = J * mask[None, :]
        H = jnp.einsum("ri,rj->ij", J, J, precision=_PREC)
        g = jnp.einsum("ri,r->i", J, r, precision=_PREC)
        H = H + damping * jnp.eye(n * 6, dtype=dtype) + (1.0 - mask[:, None]) * (
            1.0 - mask[None, :]
        ) * jnp.eye(n * 6, dtype=dtype)
        delta = -jnp.linalg.solve(H, g)
        delta = delta * mask
        R2, t2 = _apply_deltas(R, t, delta.reshape(n, 6))
        R2 = jax.vmap(lambda m: geo.rotationize(m, "newton"))(R2)
        return (R2, t2), jnp.linalg.norm(r_raw.reshape(-1))

    def step_cg(carry, _):
        R, t = carry
        e2, r, r_raw = _reweighted(R, t)  # (E, 6)
        delta = _solve_cg(R, t, e2, r, damping, cg_iters, cg_tol)
        R2, t2 = _apply_deltas(R, t, delta)
        R2 = jax.vmap(lambda m: geo.rotationize(m, "newton"))(R2)
        return (R2, t2), jnp.linalg.norm(r_raw.reshape(-1))

    step = step_dense if solver == "dense" else step_cg
    (R_f, t_f), norms = jax.lax.scan(step, (R0, t0), None, length=iterations)
    return R_f, t_f, norms


def marginal_covariance(
    R: jnp.ndarray,
    t: jnp.ndarray,
    edges: PoseGraphEdges,
    nodes: jnp.ndarray | None = None,
    damping: float = 1e-8,
    solver: str = "auto",
    cg_iters: int | None = None,
    cg_tol: float = 1e-8,
    robust: str | None = None,
    robust_delta: float = 1.0,
) -> jnp.ndarray:
    """Per-node 6x6 marginal covariance blocks of the pose-graph estimate.

    Linearizes the whitened edge residuals at (R, t) — normally the
    `refine_pose_graph` solution — and extracts the diagonal blocks of
    H^-1, H = J^T J: the classic SLAM uncertainty query (how sure is the
    map about node k, relative to the gauge node 0). Twist coordinates
    (translation, rotation), same layout as the solver's psi and
    `edge_dvo.pose_covariance`; node 0 returns exact zeros. On a chain
    the blocks grow ~linearly with distance from the anchor (odometry is
    a random walk); a loop closure visibly collapses them — both pinned
    in tests/test_pose_graph.py.

    ``robust``: freeze the same IRLS weights `refine_pose_graph` used at
    its solution, so an edge the refinement rejected (false loop closure
    under "geman") contributes no phantom confidence here.

    ``nodes``: optional (K,) int array — compute only these nodes'
    blocks (returns (K, 6, 6)); None = all N (returns (N, 6, 6)). The
    dense path inverts the full 6N x 6N H (right answer for N up to a
    few hundred); the matrix-free path runs 6 PCG solves per requested
    node, so pass ``nodes`` when querying a few poses of a big graph.
    ``solver``: "dense" | "cg" | "auto" (dense for N <= 256).
    """
    n = R.shape[0]
    dtype = R.dtype
    if solver == "auto":
        solver = "dense" if n <= 256 else "cg"
    if cg_iters is None:
        cg_iters = 4 * n  # covariance columns need tighter solves than GN steps
    if robust is not None:
        r0 = _edge_residuals(R, t, edges)
        sw = _robust_sqrt_weights(r0, robust, robust_delta)
        edges = edges._replace(weight=edges.weight * sw)

    node_idx = jnp.arange(n) if nodes is None else jnp.asarray(nodes, jnp.int32)

    if solver == "dense":
        A, B = _edge_jacobians(R, t, edges)  # (E, 6, 6)
        e = edges.i.shape[0]
        Si = jax.nn.one_hot(edges.i, n, dtype=dtype)
        Sj = jax.nn.one_hot(edges.j, n, dtype=dtype)
        # dense J (6E, 6N) scattered via one-hot (no dynamic indexing)
        J = jnp.einsum("en,eab->eanb", Si, A, precision=_PREC) + jnp.einsum(
            "en,eab->eanb", Sj, B, precision=_PREC
        )
        J = J.reshape(e * 6, n * 6)
        mask = jnp.concatenate(
            [jnp.zeros((6,), dtype), jnp.ones(((n - 1) * 6,), dtype)]
        )
        J = J * mask[None, :]
        H = jnp.einsum("ri,rj->ij", J, J, precision=_PREC)
        H = H + damping * jnp.eye(n * 6, dtype=dtype) + (1.0 - mask[:, None]) * (
            1.0 - mask[None, :]
        ) * jnp.eye(n * 6, dtype=dtype)
        cov = jnp.linalg.inv(H) * mask[:, None] * mask[None, :]
        cov = cov.reshape(n, 6, n, 6)
        return jax.vmap(lambda k: cov[k, :, k, :])(node_idx)

    matvec, apply_minv, _ = _normal_ops(R, t, edges, damping)

    def one_column(k, a):
        rhs = jnp.zeros((n, 6), dtype).at[k, a].set(1.0)
        x = _pcg(matvec, apply_minv, rhs, cg_iters, cg_tol)
        return x[k]  # (6,) row a of node k's block

    def one_node(k):
        blk = jax.vmap(lambda a: one_column(k, a))(jnp.arange(6))
        return blk * (k > 0)  # gauge node: exact zeros

    return jax.vmap(one_node)(node_idx)
