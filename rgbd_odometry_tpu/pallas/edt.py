"""Pallas TPU kernel for the distance-transform min-plus pass.

The exact-L2 EDT's second phase is D2[y, x] = min_i ( G2[y, i] + (x - i)^2 )
(see rgbd_odometry_tpu.ops.distance_transform). The jnp formulation relies on
XLA fusing a (H, W, W) broadcast into its min-reduction; this kernel makes the
dataflow explicit instead: the parabola cost matrix and a row-block of G2 are
staged in VMEM once and swept in x-chunks, so HBM traffic is exactly
one read of G2 + one write of D2 per image.

Grid: (batch, H / BLOCK_H); the (BLOCK_H, CHUNK_X, W) working set lives in
registers/VMEM. Used by `prepare_now_level` when running on TPU; the jnp
path remains for CPU and as the golden reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _edt_kernel(g2_ref, cost_ref, out_ref, *, chunk_x: int):
    """One (BLOCK_H, W) row-block: sweep x in chunks against the cost matrix."""
    g2 = g2_ref[0]  # (BLOCK_H, W)
    w = g2.shape[-1]
    num_chunks = pl.cdiv(w, chunk_x)

    def body(c, carry):
        x0 = c * chunk_x
        cost = cost_ref[pl.ds(x0, chunk_x), :]  # (CHUNK_X, W)
        # (BLOCK_H, CHUNK_X, W) fused add + min-reduce over W
        vals = g2[:, None, :] + cost[None, :, :]
        out_ref[0, :, pl.ds(x0, chunk_x)] = jnp.min(vals, axis=-1)
        return carry

    jax.lax.fori_loop(0, num_chunks, body, None)


@functools.partial(jax.jit, static_argnames=("block_h", "chunk_x", "interpret"))
def edt_minplus_pallas(
    g2: jnp.ndarray, block_h: int = 8, chunk_x: int = 128, interpret: bool = False
) -> jnp.ndarray:
    """min-plus parabola sweep: (..., H, W) squared column distances ->
    squared 2-D distances. W and H should be multiples of the tile sizes
    (true for the 320x240..40x30 pyramid)."""
    orig_shape = g2.shape
    h, w = orig_shape[-2:]
    g2b = g2.reshape((-1, h, w))
    b = g2b.shape[0]
    block_h = min(block_h, h)
    chunk_x = min(chunk_x, w)
    xs = jnp.arange(w, dtype=g2.dtype)
    cost = (xs[:, None] - xs[None, :]) ** 2  # (W, W)

    out = pl.pallas_call(
        functools.partial(_edt_kernel, chunk_x=chunk_x),
        grid=(b, pl.cdiv(h, block_h)),
        in_specs=[
            pl.BlockSpec((1, block_h, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_h, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), g2.dtype),
        interpret=interpret,
    )(g2b, cost)
    return out.reshape(orig_shape)


def edt_l2_squared_pallas(zero_mask: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Full exact squared-L2 EDT with the Pallas min-plus pass."""
    from rgbd_odometry_tpu.ops.distance_transform import _column_distance

    g = jnp.minimum(_column_distance(zero_mask), 65504.0)
    return edt_minplus_pallas(g * g, interpret=interpret)
