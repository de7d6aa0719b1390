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
    """Relative-pose constraints: pose_j ~= pose_i * (R_rel, t_rel)."""

    i: jnp.ndarray  # (E,) int32 source node
    j: jnp.ndarray  # (E,) int32 target node
    R_rel: jnp.ndarray  # (E, 3, 3)
    t_rel: jnp.ndarray  # (E, 3)
    weight: jnp.ndarray  # (E,) confidence weight (1/sigma)


def odometry_edges(R: jnp.ndarray, t: jnp.ndarray, weight: float = 1.0) -> PoseGraphEdges:
    """Consecutive-frame constraints from an absolute trajectory (the GOP
    chain re-expressed as edges)."""
    n = R.shape[0]
    i = jnp.arange(n - 1, dtype=jnp.int32)
    j = i + 1
    R_rel = jnp.einsum("nij,nik->njk", R[:-1], R[1:], precision=_PREC)  # Ri^T Rj
    t_rel = jnp.einsum("nij,ni->nj", R[:-1], t[1:] - t[:-1], precision=_PREC)
    w = jnp.full((n - 1,), weight, R.dtype)
    return PoseGraphEdges(i=i, j=j, R_rel=R_rel, t_rel=t_rel, weight=w)


def concat_edges(a: PoseGraphEdges, b: PoseGraphEdges) -> PoseGraphEdges:
    return PoseGraphEdges(
        i=jnp.concatenate([a.i, b.i]),
        j=jnp.concatenate([a.j, b.j]),
        R_rel=jnp.concatenate([a.R_rel, b.R_rel]),
        t_rel=jnp.concatenate([a.t_rel, b.t_rel]),
        weight=jnp.concatenate([a.weight, b.weight]),
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
    return res * edges.weight[:, None]


def _edge_jacobians(R, t, edges: PoseGraphEdges):
    """Exact per-edge Jacobian blocks (A_e, B_e), each (E, 6, 6).

    A_e = d r_e / d delta_i, B_e = d r_e / d delta_j for right-perturbations
    T_k <- T_k exp(delta_k). Computed by a vmapped 12-tangent jacfwd — O(E)
    work, the analytic two-block sparsity of a pose-graph row without ever
    forming the (6E, 6N) matrix the dense path uses.
    """

    def one_edge(Ri, ti, Rj, tj, Rrel, trel, w):
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
            return w * geo.se3_log(R_err, t_err)

        J = jax.jacfwd(res)(jnp.zeros((12,), R.dtype))  # (6, 12)
        return J[:, :6], J[:, 6:]

    return jax.vmap(one_edge)(
        R[edges.i], t[edges.i], R[edges.j], t[edges.j],
        edges.R_rel, edges.t_rel, edges.weight,
    )


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


def _solve_cg(R, t, edges: PoseGraphEdges, r, damping, cg_iters, cg_tol):
    """One GN delta via matrix-free PCG on the damped normal equations."""
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

    g = jnp.einsum("en,eb->nb", Si, jnp.einsum("eab,ea->eb", A, r, precision=_PREC),
                   precision=_PREC)
    g = g + jnp.einsum("en,eb->nb", Sj, jnp.einsum("eab,ea->eb", B, r, precision=_PREC),
                       precision=_PREC)
    g = g * node_mask
    return _pcg(matvec, apply_minv, -g, cg_iters, cg_tol)


def refine_pose_graph(
    R0: jnp.ndarray,  # (N, 3, 3) initial absolute poses
    t0: jnp.ndarray,  # (N, 3)
    edges: PoseGraphEdges,
    iterations: int = 10,
    damping: float = 1e-6,
    solver: str = "auto",
    cg_iters: int | None = None,
    cg_tol: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton pose-graph optimization; returns (R, t, residual_norms).

    Node 0 is held fixed (gauge). Jittable; for batches of graphs, vmap.
    ``solver``: "dense" | "cg" | "auto" (dense for N<=64; see module
    docstring). ``cg_iters`` defaults to 2N (chain graphs need ~diameter
    iterations to propagate a correction end to end); the tolerance exit
    fires much earlier on easy graphs.
    """
    n = R0.shape[0]
    dtype = R0.dtype
    if solver == "auto":
        solver = "dense" if n <= 64 else "cg"
    if cg_iters is None:
        cg_iters = 2 * n

    def step_dense(carry, _):
        R, t = carry

        def res_of(deltas):
            R2, t2 = _apply_deltas(R, t, deltas.reshape(n, 6))
            return _edge_residuals(R2, t2, edges).reshape(-1)

        zero = jnp.zeros((n * 6,), dtype)
        r = res_of(zero)
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
        return (R2, t2), jnp.linalg.norm(r)

    def step_cg(carry, _):
        R, t = carry
        r = _edge_residuals(R, t, edges)  # (E, 6)
        delta = _solve_cg(R, t, edges, r, damping, cg_iters, cg_tol)
        R2, t2 = _apply_deltas(R, t, delta)
        R2 = jax.vmap(lambda m: geo.rotationize(m, "newton"))(R2)
        return (R2, t2), jnp.linalg.norm(r.reshape(-1))

    step = step_dense if solver == "dense" else step_cg
    (R_f, t_f), norms = jax.lax.scan(step, (R0, t0), None, length=iterations)
    return R_f, t_f, norms
