"""Fused fixed-point RGB->CIELAB as a Pallas TPU kernel.

The conversion (ops/cielab.py, mirroring reference cielab.h:308-325) is six
table lookups plus integer math.  In composed XLA programs each
pixel-granularity gather executes serially (~8 ms per 720p lookup — 48 ms
per frame just for LAB).  This kernel does the whole conversion in one pass
over flat pixel tiles:

* the 256-entry sRGB tables as unrolled compare/select chains (VPU),
* the 8193-entry lab (cube-root) table as a two-level lookup: a one-hot
  row-select matmul against the table reshaped to [65, 128] (MXU,
  Precision.HIGHEST — exact for <2^24 integers), then a one-hot lane select
  (VPU).  The [1, tile] -> [tile, 1] transposes mirror the segment-sum
  kernel's proven pattern.

Bit-identical to ops.cielab.rgb_to_lab_quantized (asserted in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import cielab as cie

_LO = 128
_N_HI = (cie.SRGB_MAX // _LO) + 1  # 65 rows of 128 cover [0, 8192]


def _srgb_chain(v, tbl):
    """256-way select chain: out[p] = tbl[v[p]] for v in [0, 256)."""
    out = jnp.zeros_like(v)
    for i in range(256):
        out = jnp.where(v == i, jnp.full_like(v, int(tbl[i])), out)
    return out


def _lab_kernel(lab2d_ref, rgb_ref, out_ref, *, srgb_tbl, cb):
    # rgb_ref: [8, tile] i32 (rows 0..2 = R, G, B); out: [8, tile] i32
    tile = rgb_ref.shape[1]
    sr = _srgb_chain(rgb_ref[0:1, :], srgb_tbl)
    sg = _srgb_chain(rgb_ref[1:2, :], srgb_tbl)
    sb = _srgb_chain(rgb_ref[2:3, :], srgb_tbl)

    def dotrow(r):
        return (int(cb[r, 0]) * sr + int(cb[r, 1]) * sg
                + int(cb[r, 2]) * sb) >> cie.LAB_SHIFT

    lab_table = lab2d_ref[:].astype(jnp.float32)         # [_N_HI, _LO]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, _LO), 1)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, _N_HI), 1)

    def lab_lookup(x):
        # x: [1, tile] in [0, 8192]
        xc = jnp.transpose(x, (1, 0))                    # [tile, 1]
        oh_hi = (xc // _LO == hi_iota).astype(jnp.float32)
        rows = jax.lax.dot(oh_hi, lab_table,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        sel = jnp.where(lane == (xc % _LO), rows, jnp.zeros_like(rows))
        val = jnp.sum(sel, axis=1, keepdims=True).astype(jnp.int32)
        return jnp.transpose(val, (1, 0))                # [1, tile]

    fx = lab_lookup(dotrow(0))
    fy = lab_lookup(dotrow(1))
    fz = lab_lookup(dotrow(2))

    ciel = 116 * fy - (16 << cie.SRGB_SHIFT)
    ciea = 500 * (fx - fy) + (128 << cie.SRGB_SHIFT)
    cieb = 200 * (fy - fz) + (128 << cie.SRGB_SHIFT)
    sh = cie.SRGB_SHIFT - cie.OUTPUT_SHIFT
    # unsigned shift-with-wrap (cielab.h:322-324): do it in int32 via mask
    def ushift(v):
        return jax.lax.shift_right_logical(v, sh)
    l8 = jnp.clip(ushift(ciel), 0, 255)
    a8 = jnp.clip(ushift(ciea) - (64 << cie.OUTPUT_SHIFT), 0, 255)
    b8 = jnp.clip(ushift(cieb) - (64 << cie.OUTPUT_SHIFT), 0, 255)
    zero = jnp.zeros_like(l8)
    out_ref[:] = jnp.concatenate(
        [l8, a8, b8, zero, zero, zero, zero, zero], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rgb_to_lab_pallas(image, interpret: bool | None = None):
    """image uint8/int [H, W, 3] -> int32 [H, W, 3] LAB (color_shift=1).

    Bit-identical to ops.cielab.rgb_to_lab_quantized, fused into one Pallas
    pass (no serial gathers).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W, _ = image.shape
    n = H * W
    tile = 2048
    n_tiles = -(-n // tile)
    Np = n_tiles * tile

    flat = image.astype(jnp.int32).reshape(n, 3)
    rows = jnp.zeros((8, Np), jnp.int32)
    rows = rows.at[0, :n].set(flat[:, 0])
    rows = rows.at[1, :n].set(flat[:, 1])
    rows = rows.at[2, :n].set(flat[:, 2])

    lab2d = np.zeros((_N_HI, _LO), np.int32)
    lab_flat = cie._LAB_TBL_NP
    lab2d.reshape(-1)[: lab_flat.shape[0]] = lab_flat

    kernel = functools.partial(
        _lab_kernel, srgb_tbl=cie._SRGB_TBL_NP, cb=cie._CB_NP)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(lab2d), rows)
    return jnp.stack([out[0, :n], out[1, :n], out[2, :n]],
                     axis=-1).reshape(H, W, 3)
