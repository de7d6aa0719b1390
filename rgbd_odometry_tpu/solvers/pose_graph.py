"""SE(3) pose-graph refinement — batched Gauss-Newton over keyframe poses.

The reference's GOP only COMPOSES relative poses into a trajectory
(/root/reference/src/GOP.cpp:138-186); every frame-to-keyframe error is
frozen forever. BASELINE.json's batch config names the workload this module
provides: "keyframe-graph refinement" — given a trajectory and a set of
relative-pose constraints (odometry edges plus any loop closures), jointly
adjust all poses to minimize the constraint residuals.

TPU-first shape: all E edge residuals evaluate in one vmapped pass; the
Jacobian of the stacked (6E,) residual w.r.t. the (N,6) tangent deltas comes
from `jax.jacfwd` (dense — keyframe graphs are hundreds of nodes, so the
(6E, 6N) matrix is tiny by MXU standards); each Gauss-Newton step solves the
damped normal equations with one dense factorization. Node 0 is anchored
(gauge freedom).
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


def refine_pose_graph(
    R0: jnp.ndarray,  # (N, 3, 3) initial absolute poses
    t0: jnp.ndarray,  # (N, 3)
    edges: PoseGraphEdges,
    iterations: int = 10,
    damping: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton pose-graph optimization; returns (R, t, residual_norms).

    Node 0 is held fixed (gauge). Jittable; for batches of graphs, vmap.
    """
    n = R0.shape[0]
    dtype = R0.dtype

    def step(carry, _):
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

    (R_f, t_f), norms = jax.lax.scan(step, (R0, t0), None, length=iterations)
    return R_f, t_f, norms
