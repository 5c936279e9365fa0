"""Exact integer segment-sum as a Pallas TPU kernel.

The centroid update (and CCA area counting) reduces per-pixel integer values
into K bins.  TPU scatter-adds serialize (~10ns/element), and the XLA
one-hot-einsum formulation materializes the [N, K] one-hot tensor in HBM
when it does not fuse (measured ~30 GB of traffic per frame).  This kernel
builds each tile's one-hot in VMEM and feeds the MXU directly:

    out[v, k] += vals[v, tile] @ onehot(ids[tile], k)

Exactness without MXU precision games: inputs are split into high/low bytes
(both exactly representable in bf16), the two bf16 matmuls produce per-tile
partials < 2^24 (exact in the MXU's f32 accumulator), and partials are
merged into the int32 output across grid steps.  This is the TPU analog of
the reference's thread-local uint32 accumulators merged under a critical
section (context.cpp:309-354).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _segsum_kernel(vals_ref, ids_ref, out_ref, *, tile, Kp):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]                      # [8, tile] i32 (8 replicated rows)
    vals = vals_ref[:]                    # [8, tile] i32
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, Kp), 1)
    # one-hot [tile, Kp] from the first replicated id row
    ids_col = jnp.transpose(ids[0:1, :], (1, 0))   # [tile, 1]
    oh = (ids_col == k_iota).astype(jnp.bfloat16)

    hi = (vals >> 8).astype(jnp.bfloat16)          # values < 2^16 -> hi < 256
    lo = (vals & 0xFF).astype(jnp.bfloat16)

    def mm(a):
        return jax.lax.dot_general(
            a, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [8, Kp], exact < 2^24

    part = mm(hi).astype(jnp.int32) * 256 + mm(lo).astype(jnp.int32)
    out_ref[:] += part


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def segment_sum_pallas(ids, vals, num_segments: int, interpret: bool):
    """ids: int32 [N] in [0, num_segments]; vals: int32 [V, N] with
    0 <= vals < 2^16 and V <= 8.  Returns int32 [num_segments + 1, V]^T
    layout [V, num_segments + 1] cropped to [num_segments + 1, V] by caller?
    — returns int32 [V, num_segments + 1]."""
    V, N = vals.shape
    assert V <= 8
    # larger tiles amortize per-grid-step overhead; the [tile, Kp] one-hot
    # must fit VMEM (bf16): 2048 x 8320 = 34MB is too big for K=8191, so
    # scale the tile with the segment count.
    Kp_est = -(-(num_segments + 1) // 128) * 128
    tile = max(256, min(2048, (8 << 20) // max(Kp_est, 1)))
    tile = 1 << (tile.bit_length() - 1)  # power of two
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    Kp = -(-(num_segments + 1) // 128) * 128

    vals_p = jnp.zeros((8, Np), jnp.int32).at[:V, :N].set(vals)
    ids_p = jnp.full((8, Np), num_segments, jnp.int32
                     ).at[:, :N].set(jnp.broadcast_to(ids[None, :], (8, N)))

    out = pl.pallas_call(
        functools.partial(_segsum_kernel, tile=tile, Kp=Kp),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((8, tile), lambda i: (0, i)),
                  pl.BlockSpec((8, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((8, Kp), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, Kp), jnp.int32),
        interpret=interpret,
    )(vals_p, ids_p)
    return out[:V, :num_segments + 1]
