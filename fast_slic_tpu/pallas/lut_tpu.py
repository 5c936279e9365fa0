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


def _lab_kernel(srgb2d_ref, lab2d_ref, rgb_ref, out_ref):
    # rgb_ref: [8, tile] i32 (rows 0..2 = R, G, B); out: [8, tile] i32.
    # Lookups stay in row layout ([1, tile]); the two-level table select is
    # M = T^t @ onehot_hi (MXU, byte-split bf16 — exact) followed by a
    # one-hot sublane reduce.  No in-kernel transposes.
    tile = rgb_ref.shape[1]

    def lookup(x, table_ref, n_hi):
        # x: [1, tile] int32 indices into a [n_hi * _LO] table.  Contract
        # over the LANE level first (T [n_hi, _LO] @ onehot_lo [_LO, tile]
        # -> [n_hi, tile]), then select over the n_hi rows — n_hi (65 for
        # the lab table, 2 for sRGB) is smaller than _LO=128, so the
        # per-element intermediates, recombines and the select-sum are
        # ~2x smaller than the hi-first formulation.
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LO, tile), 0)
        ohl = (x % _LO == lo_iota).astype(jnp.bfloat16)    # [_LO, tile]
        t = table_ref[:].astype(jnp.float32)               # [n_hi, _LO]
        th = jnp.floor(t / 256.0)
        tl = t - th * 256.0

        def mm(tt):
            return jax.lax.dot(
                tt.astype(jnp.bfloat16), ohl,
                preferred_element_type=jnp.float32)        # [n_hi, tile]

        # recombine and row-select in f32 (table values < 2^24 are exact in
        # f32, and exactly one row is nonzero per column): the [n_hi, tile]
        # int32 converts of the int formulation are the most expensive VPU
        # ops of the lookup — one [1, tile] convert at the end instead
        M = mm(th) * 256.0 + mm(tl)
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n_hi, tile), 0)
        sel = jnp.where(hi_iota == (x // _LO), M, jnp.zeros_like(M))
        return jnp.sum(sel, axis=0, keepdims=True).astype(jnp.int32)

    sr = lookup(rgb_ref[0:1, :], srgb2d_ref, 2)
    sg = lookup(rgb_ref[1:2, :], srgb2d_ref, 2)
    sb = lookup(rgb_ref[2:3, :], srgb2d_ref, 2)

    cb = _CB

    def dotrow(r):
        return (cb[r][0] * sr + cb[r][1] * sg + cb[r][2] * sb) >> cie.LAB_SHIFT

    fx = lookup(dotrow(0), lab2d_ref, _N_HI)
    fy = lookup(dotrow(1), lab2d_ref, _N_HI)
    fz = lookup(dotrow(2), lab2d_ref, _N_HI)

    ciel = 116 * fy - (16 << cie.SRGB_SHIFT)
    ciea = 500 * (fx - fy) + (128 << cie.SRGB_SHIFT)
    cieb = 200 * (fy - fz) + (128 << cie.SRGB_SHIFT)
    sh = cie.SRGB_SHIFT - cie.OUTPUT_SHIFT

    def ushift(v):
        # (unsigned)x >> sh with wrap, as in cielab.h:322-324
        return jax.lax.shift_right_logical(v, sh)

    l8 = jnp.clip(ushift(ciel), 0, 255)
    a8 = jnp.clip(ushift(ciea) - (64 << cie.OUTPUT_SHIFT), 0, 255)
    b8 = jnp.clip(ushift(cieb) - (64 << cie.OUTPUT_SHIFT), 0, 255)
    zero = jnp.zeros_like(l8)
    out_ref[:] = jnp.concatenate(
        [l8, a8, b8, zero, zero, zero, zero, zero], axis=0)


_CB = tuple(tuple(int(v) for v in row) for row in cie._CB_NP)


def _lab_rows(image, interpret):
    """Shared kernel invocation: [H, W, 3] image -> ([8, Np] LAB rows, n)."""
    H, W, _ = image.shape
    n = H * W
    tile = 8192
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
    srgb2d = np.zeros((2, _LO), np.int32)
    srgb2d.reshape(-1)[:256] = cie._SRGB_TBL_NP

    out = pl.pallas_call(
        _lab_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(srgb2d), jnp.asarray(lab2d), rows)
    return out, n


@functools.partial(jax.jit, static_argnames=("interpret",))
def rgb_to_lab_pallas(image, interpret: bool | None = None):
    """image uint8/int [H, W, 3] -> int32 [H, W, 3] LAB (color_shift=1).

    Bit-identical to ops.cielab.rgb_to_lab_quantized, fused into one Pallas
    pass (no serial gathers).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W, _ = image.shape
    out, n = _lab_rows(image, interpret)
    return jnp.stack([out[0, :n], out[1, :n], out[2, :n]],
                     axis=-1).reshape(H, W, 3)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rgb_to_lab_planar(image, interpret: bool | None = None):
    """image uint8/int [H, W, 3] -> int32 [3, H, W] LAB, channel-planar.

    Same kernel as :func:`rgb_to_lab_pallas`; the planar layout makes the
    unpack a row-slice + reshape (no [H, W, 3] interleave pass) and matches
    the layout every downstream consumer wants (the padded [3, Hp, Wp]
    kernel planes, the update kernel's separate channel vectors)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W, _ = image.shape
    out, n = _lab_rows(image, interpret)
    return out[:3, :n].reshape(3, H, W)


def _lsc_feat_kernel(lcos_ref, lsin_ref, ccos_ref, csin_ref, rgb_ref,
                     out_ref):
    """Six 256-entry f32 LUT lookups for the LSC color features
    (lsc.cpp:66-135): rows 0..2 of rgb_ref are the quantized L, a, b
    planes; outputs rows 0..5 are L_cos[L], L_sin[L], color_cos[a],
    color_sin[a], color_cos[b], color_sin[b].  Tables are [2, 128] f32;
    the lookup contracts a HIGHEST-precision f32 matmul over the lane
    level (exact for arbitrary f32 table values) and selects over the two
    hi rows."""
    tile = rgb_ref.shape[1]
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LO, tile), 0)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (2, tile), 0)

    def lookups(x, table_refs):
        ohl = (x % _LO == lo_iota).astype(jnp.float32)
        outs = []
        for tref in table_refs:
            M = jax.lax.dot(tref[:], ohl,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)  # [2, tile]
            sel = jnp.where(hi_iota == (x // _LO), M, jnp.zeros_like(M))
            outs.append(jnp.sum(sel, axis=0, keepdims=True))
        return outs

    l1, l2 = lookups(rgb_ref[0:1, :], (lcos_ref, lsin_ref))
    a1, a2 = lookups(rgb_ref[1:2, :], (ccos_ref, csin_ref))
    b1, b2 = lookups(rgb_ref[2:3, :], (ccos_ref, csin_ref))
    zero = jnp.zeros_like(l1)
    out_ref[:] = jnp.concatenate([l1, l2, a1, a2, b1, b2, zero, zero],
                                 axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lsc_color_feats_pallas(planes, lcos, lsin, ccos, csin,
                           interpret: bool | None = None):
    """planes int32 [3, H, W] planar (quantized L, a, b) -> f32 [H, W, 6]
    LSC color features, identical to gathering the 256-entry host tables
    (ops/lsc.py features(); the XLA gather form executes serially at
    ~8 ns/element — ~100 ms for six lookups at 1080p)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, H, W = planes.shape
    n = H * W
    tile = 4096   # 8192 exceeds scoped VMEM (three [128, tile] f32 one-hots
                  # + HIGHEST-precision matmul expansions live at once)
    n_tiles = -(-n // tile)
    Np = n_tiles * tile

    flat = planes.astype(jnp.int32).reshape(3, n)
    rows = jnp.zeros((8, Np), jnp.int32)
    rows = rows.at[:3, :n].set(flat)

    def t2d(t):
        return jnp.asarray(t, jnp.float32).reshape(2, _LO)

    out = pl.pallas_call(
        _lsc_feat_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 +
                 [pl.BlockSpec((8, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        interpret=interpret,
    )(t2d(lcos), t2d(lsin), t2d(ccos), t2d(csin), rows)
    return jnp.stack([out[c, :n] for c in range(6)], axis=-1).reshape(
        H, W, 6)
