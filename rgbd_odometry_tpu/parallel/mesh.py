"""Multi-chip scaling: batched frame-pair alignment over a device mesh.

The reference is a single-machine ROS pipeline with no distributed compute
(SURVEY.md section 2.6); its only parallelism is process-level pub/sub and
AVX vectorization. The TPU-native scaling story replaces all of that:

  * batch parallelism: `vmap` over frame-pairs (one chip aligns hundreds of
    pairs per step — the keyframe-graph refinement config of BASELINE.json),
  * data parallelism: the batch axis sharded across chips over ICI with
    `jax.sharding.NamedSharding`; XLA inserts the (trivially small)
    collectives. Per-pair state is a 6-vector, so tensor/pipeline/sequence
    parallelism have no counterpart here — documented out of scope
    (SURVEY.md section 2.6) — and cross-chip traffic is only the trajectory
    statistics reduction (`psum` via the sharded mean below).

Works identically on a real TPU pod slice and on the CPU-device test mesh
(`--xla_force_host_platform_device_count`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rgbd_odometry_tpu.config import SolverConfig
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.solvers import edge_dvo

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (DATA_AXIS,))


def batch_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for batched image pytrees: leading batch axis split over chips."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def build_sharded_aligner(
    mesh: Mesh,
    intr: Intrinsics,
    cfg: SolverConfig,
    max_points: Tuple[int, ...],
):
    """A jitted, mesh-sharded batched aligner.

    Input pytrees carry a leading batch axis sharded over `mesh`'s data axis;
    outputs (R (B,3,3), t (B,3), per-level diagnostics) come back with the
    same sharding. XLA partitions the whole per-pair pipeline (Canny, EDT,
    coarse-to-fine solve) spatially for free since pairs are independent.
    """
    shard = batch_spec(mesh)

    @partial(jax.jit, in_shardings=(shard, shard, shard), out_shardings=shard)
    def aligner(ref_gray_pyr, ref_depth_pyr, now_gray_pyr):
        return jax.vmap(
            lambda rg, rd, ng: edge_dvo.align_pair(rg, rd, ng, intr, cfg, max_points)[:2]
        )(ref_gray_pyr, ref_depth_pyr, now_gray_pyr)

    return aligner


def build_sharded_train_step(
    mesh: Mesh,
    intr: Intrinsics,
    cfg: SolverConfig,
    max_points: Tuple[int, ...],
):
    """The full 'training step' analog: batched alignment + cross-chip
    reduction of trajectory statistics (mean energy / visibility over the
    global batch — a psum over ICI once the batch spans chips)."""
    shard = batch_spec(mesh)
    repl = replicated(mesh)

    @partial(
        jax.jit,
        in_shardings=(shard, shard, shard),
        out_shardings=((shard, shard), repl),
    )
    def step(ref_gray_pyr, ref_depth_pyr, now_gray_pyr):
        R, t, diags = jax.vmap(
            lambda rg, rd, ng: edge_dvo.align_pair(rg, rd, ng, intr, cfg, max_points)
        )(ref_gray_pyr, ref_depth_pyr, now_gray_pyr)
        finest = diags[0]
        stats = {
            "mean_energy": jnp.mean(finest.best_energy),
            "mean_visible_ratio": jnp.mean(finest.visible_ratio),
            "total_points": jnp.sum(finest.num_points),
        }
        return (R, t), stats

    return step


def build_shardmap_train_step(
    mesh: Mesh,
    intr: Intrinsics,
    cfg: SolverConfig,
    max_points: Tuple[int, ...],
):
    """`shard_map` variant of the train step: per-device code with EXPLICIT
    collectives instead of compiler-inserted ones.

    Each device aligns its local batch shard, then the trajectory statistics
    are reduced across the mesh with hand-placed `lax.psum` over ICI —
    the point-count-weighted global means every chip ends up holding
    replicated. Numerically identical to `build_sharded_train_step` (whose
    psum XLA inserts); this form is the one that generalizes when a future
    step needs collectives XLA cannot infer (e.g. ring permutations of
    keyframe features)."""
    from jax import shard_map

    shard_p = P(DATA_AXIS)

    @partial(jax.jit)
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(shard_p, shard_p, shard_p),
        out_specs=((shard_p, shard_p), P()),
        # the body is purely per-shard except the explicit psums; the
        # varying-axes analysis would otherwise demand pvary() on every
        # constant the solver's scans initialize (identity poses, zero
        # residual buffers, ...)
        check_vma=False,
    )
    def step(ref_gray_pyr, ref_depth_pyr, now_gray_pyr):
        R, t, diags = jax.vmap(
            lambda rg, rd, ng: edge_dvo.align_pair(rg, rd, ng, intr, cfg, max_points)
        )(ref_gray_pyr, ref_depth_pyr, now_gray_pyr)
        finest = diags[0]
        # explicit cross-chip reductions over ICI
        local_n = jnp.asarray(finest.best_energy.shape[0], jnp.float32)
        n = jax.lax.psum(local_n, DATA_AXIS)
        stats = {
            "mean_energy": jax.lax.psum(jnp.sum(finest.best_energy), DATA_AXIS) / n,
            "mean_visible_ratio": jax.lax.psum(
                jnp.sum(finest.visible_ratio), DATA_AXIS
            )
            / n,
            "total_points": jax.lax.psum(jnp.sum(finest.num_points), DATA_AXIS),
        }
        return (R, t), stats

    return step


def shard_batch(mesh: Mesh, pytree):
    """Place a host pytree onto the mesh with the batch axis sharded."""
    shard = batch_spec(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), pytree)
