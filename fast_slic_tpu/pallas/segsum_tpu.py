"""Exact integer segment-sum as a Pallas TPU kernel.

The centroid update (and CCA area counting) reduces per-pixel integer values
into K bins.  TPU scatter-adds serialize (~10ns/element), and the XLA
one-hot-einsum formulation materializes the [N, K] one-hot tensor in HBM
when it does not fuse (measured ~30 GB of traffic per frame).  This kernel
builds one-hots in VMEM and feeds the MXU directly.

Two-level decomposition keeps the VPU compare cost at O(N * (K/128 + 128))
instead of O(N * K): segment id = hi*128 + lo; a [tile, 128] one-hot over lo
is built once per tile, and for each hi bucket the values are masked and
matmul-reduced into the bucket's 128 output columns:

    out[v, hi*128 + lo] += (vals * [id_hi == hi])[v, tile] @ onehot_lo

Exactness without MXU precision games: values are split into high/low bytes
(both exactly representable in bf16), the two bf16 matmuls produce per-tile
partials < 2^24 (exact in the MXU's f32 accumulator), and partials are
merged into the int32 output across grid steps — the TPU analog of the
reference's thread-local uint32 accumulators merged under a critical
section (context.cpp:309-354).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LO = 128


def _segsum_accumulate(ids, vals, out_ref, tile):
    """Shared band-guarded byte-split accumulation body.

    ids [1, tile] i32, vals [8, tile] i32; accumulates into out_ref rows
    grouped 8 per hi bucket.

    Band guard: ids produced by the pipeline (cluster numbers ordered by
    grid position, CCA component ranks ordered by leader raster index)
    are spatially coherent, so a 4096-pixel tile touches only a narrow
    contiguous band of hi buckets.  Looping over [min, max] of the tile's
    hi values makes the cost scale with local id density instead of the
    total bucket count — this is what lets max_components be sized for
    real images (tens of thousands of raw CCA fragments at 720p) without
    paying O(num_segments) dots per tile.  Output rows are grouped per
    bucket ([h*8, h*8+8)) so the loop's store offset is on the sublane
    dim, where Mosaic supports dynamic indexing.
    """
    hi_row = ids // _LO                   # [1, tile]
    # lane-contraction layout: no in-kernel transposes (they dominate
    # kernel time on Mosaic)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LO, tile), 0)
    oh_t = (ids % _LO == lo_iota).astype(jnp.bfloat16)    # [_LO, tile]

    v_hi = (vals >> 8).astype(jnp.bfloat16)   # byte halves: bf16-exact
    v_lo = (vals & 0xFF).astype(jnp.bfloat16)

    band_lo = jnp.min(hi_row)
    band_hi = jnp.max(hi_row)

    def body(h, carry):
        mask = (hi_row == h).astype(jnp.bfloat16)   # [1, tile]

        def mm(a):
            return jax.lax.dot_general(
                a * mask, oh_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [8, _LO]

        part = mm(v_hi).astype(jnp.int32) * 256 + mm(v_lo).astype(jnp.int32)
        out_ref[pl.ds(h * 8, 8), :] += part
        return carry

    jax.lax.fori_loop(band_lo, band_hi + 1, body, 0)


def _segsum_kernel(vals_ref, ids_ref, out_ref, *, tile):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _segsum_accumulate(ids_ref[0:1, :], vals_ref[:], out_ref, tile)


def _framed_segsum_kernel(vals_ref, ids_ref, out_ref, *, tile):
    """Per-frame-output segment sum: grid (B, tiles/frame); the out block is
    frame b's own bucket table, zeroed on the frame's first tile and kept
    VMEM-resident while b's tiles stream — so total bins can be B * MF
    without ever materializing the whole [B*MF] table in VMEM (a [B*MF]
    one-block output hits the Mosaic VMEM ceiling at video batch sizes:
    39 MB at B=32, MF=38400)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _segsum_accumulate(ids_ref[0:1, :], vals_ref[:], out_ref, tile)


def _update_kernel(scal_ref, in_ref, out_ref, *, tile, W, stride, K,
                   hmod=0):
    """SLIC centroid-update segment sum with in-kernel value construction.

    in_ref rows: 0 = cluster ids (masked pixels carry their nearest valid
    id so the hi-bucket band stays tight; their values are zeroed by row 1),
    1 = mask (0/1), 2..4 = quad color planes.  Accumulates
    [count, ii, jj, r, g, b] per cluster — the reference's update
    accumulators (context.cpp:309-354) — without materializing the [N, 6]
    value tensor in HBM.

    hmod > 0 = frame-grid batch mode (parallel/stack.py): the flat input is
    B stacked frames of hmod rows each, so the row coordinate is
    frame-local ((pix // W) % hmod).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rem = scal_ref[0]
    ids = in_ref[0:1, :]
    mask = in_ref[1:2, :]
    # pixel coordinates from the flat subsampled index (row r of the sliced
    # image is absolute row r*stride + rem)
    pix = step * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    row = (pix // W) % hmod if hmod else pix // W
    ii = row * stride + rem
    jj = pix % W
    vals = jnp.concatenate(
        [mask, ii * mask, jj * mask,
         in_ref[2:3, :] * mask, in_ref[3:4, :] * mask,
         in_ref[4:5, :] * mask,
         jnp.zeros((2, tile), jnp.int32)], axis=0)        # [8, tile]

    hi_row = ids // _LO
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LO, tile), 0)
    oh_t = (ids % _LO == lo_iota).astype(jnp.bfloat16)

    v_hi = (vals >> 8).astype(jnp.bfloat16)
    v_lo = (vals & 0xFF).astype(jnp.bfloat16)

    band_lo = jnp.min(hi_row)
    band_hi = jnp.max(hi_row)

    def body(h, carry):
        m = (hi_row == h).astype(jnp.bfloat16)

        def mm(a):
            return jax.lax.dot_general(
                a * m, oh_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        part = mm(v_hi).astype(jnp.int32) * 256 + mm(v_lo).astype(jnp.int32)
        out_ref[pl.ds(h * 8, 8), :] += part
        return carry

    jax.lax.fori_loop(band_lo, band_hi + 1, body, 0)


@functools.partial(jax.jit, static_argnames=("num_segments", "W", "stride",
                                             "interpret", "tile", "hmod"))
def slic_update_pallas(ids, mask, p0, p1, p2, rem, num_segments: int,
                       W: int, stride: int, interpret: bool, tile: int = 4096,
                       hmod: int = 0):
    """Fused SLIC update accumulation: ids int32 [N] in [0, num_segments]
    (use the nearest valid id for masked pixels), mask int32 [N] (0 zeroes
    a pixel's contribution), p0..p2 int32 [N] quad planes of the SLICED
    (subsampled) image whose row r is absolute row r*stride + rem.
    Returns int32 [6, num_segments + 1]: count, sum_i, sum_j, sums r/g/b.

    hmod > 0 = frame-grid batch mode: the flat input is B stacked frames of
    hmod rows each (row coordinates wrap per frame); pass per-frame cluster
    ids offset by b*K and num_segments = B*K.
    """
    N = ids.shape[0]
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    Kp = -(-(num_segments + 1) // _LO) * _LO
    n_hi = Kp // _LO

    pack = jnp.zeros((8, Np), jnp.int32)
    # pad ids with the final real id so the last tile's band stays tight;
    # padding mask is 0 so the values vanish
    pack = pack.at[0, :].set(jnp.broadcast_to(ids[-1], (Np,)))
    pack = pack.at[0, :N].set(ids)
    pack = pack.at[1, :N].set(mask)
    pack = pack.at[2, :N].set(p0)
    pack = pack.at[3, :N].set(p1)
    pack = pack.at[4, :N].set(p2)
    scal = jnp.stack([rem.astype(jnp.int32)])

    out = pl.pallas_call(
        functools.partial(_update_kernel, tile=tile, W=W, stride=stride,
                          K=num_segments, hmod=hmod),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((n_hi * 8, _LO), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_hi * 8, _LO), jnp.int32),
        interpret=interpret,
    )(scal, pack)
    out = out.reshape(n_hi, 8, _LO).transpose(1, 0, 2).reshape(8, Kp)
    return out[:6, :num_segments + 1]


def _update_padded_kernel(scal_ref, a_ref, p0_ref, p1_ref, p2_ref,
                          out_ref, *, tile, Wp, W_real, Hs, stride, K,
                          hmod=0):
    """SLIC update accumulation DIRECTLY from the padded kernel buffers:
    a_ref = the assign kernel's padded output ([Hsp, Wp] flat, UNASSIGNED
    in pad rows is NOT guaranteed — pad rows can receive assignments from
    in-window centers, so validity is recomputed here from the flat index),
    p0..p2 = the padded plane stacks.  No per-iteration pack/mask/where
    materialization in HBM (the old path wrote a [8, N] pack ~10 MB per
    iteration).

    Masked pixels keep the tile's min valid id (band stays tight) with a
    zero mask.  hmod > 0 = frame-grid batch mode (row coordinates wrap per
    hmod padded rows; ids already carry the b*K offset via a_ref... callers
    pass a_ref with frame-local values plus their offset merged upstream).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rem = scal_ref[0]
    off = scal_ref[1]     # per-frame id stride (hmod mode: K; else unused)
    a = a_ref[0:1, :]
    pix = step * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    prow = pix // Wp
    row = prow % hmod if hmod else prow
    jj = pix % Wp
    valid = (a != 0xFFFF) & (row < Hs) & (jj < W_real)
    mask = valid.astype(jnp.int32)
    # masked pixels carry the tile's min valid id so the hi-bucket band
    # stays tight (values are zeroed by the mask); an all-masked tile
    # parks at frame-local 0
    safe_min = jnp.min(jnp.where(valid, a, K))
    safe_min = jnp.where(safe_min == K, 0, safe_min)
    ids = jnp.where(valid, a, safe_min)
    if hmod:
        ids = ids + (prow // hmod) * off     # frame-local -> global bins
    ii = row * stride + rem
    vals = jnp.concatenate(
        [mask, ii * mask, jj * mask,
         p0_ref[0:1, :] * mask, p1_ref[0:1, :] * mask,
         p2_ref[0:1, :] * mask,
         jnp.zeros((2, tile), jnp.int32)], axis=0)        # [8, tile]
    _segsum_accumulate(ids, vals, out_ref, tile)


@functools.partial(jax.jit, static_argnames=(
    "num_segments", "Wp", "W_real", "Hs", "stride", "interpret", "tile",
    "hmod"))
def slic_update_padded_pallas(a_pad, p3_pad, rem, off, num_segments: int,
                              Wp: int, W_real: int, Hs: int, stride: int,
                              interpret: bool, tile: int = 0,
                              hmod: int = 0):
    """Update accumulation from padded buffers: a_pad int32 [Hsp, Wp] (the
    assign kernel's output), p3_pad int32 [3, Hsp, Wp] (the padded plane
    stack).  Hsp*Wp must be a multiple of ``tile`` (the 64-row strip
    padding guarantees a multiple of 8192).  tile=0 auto-selects the
    largest dividing tile (bigger tiles amortize the per-grid-step Pallas
    overhead: 4096/8192/16384 measured 1.20/1.14/1.13 ms on the chained
    720p A/B).  Returns int32 [6, num_segments + 1].
    """
    Hsp = a_pad.shape[0]
    N = Hsp * Wp
    if tile == 0:
        tile = 16384 if N % 16384 == 0 else 8192
    assert N % tile == 0, (Hsp, Wp, tile)
    n_tiles = N // tile
    Kp = -(-(num_segments + 1) // _LO) * _LO
    n_hi = Kp // _LO
    scal = jnp.stack([rem.astype(jnp.int32), off.astype(jnp.int32)])
    flat = pl.BlockSpec((1, tile), lambda i: (0, i))
    out = pl.pallas_call(
        functools.partial(_update_padded_kernel, tile=tile, Wp=Wp,
                          W_real=W_real, Hs=Hs, stride=stride,
                          K=num_segments, hmod=hmod),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  flat, flat, flat, flat],
        out_specs=pl.BlockSpec((n_hi * 8, _LO), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_hi * 8, _LO), jnp.int32),
        interpret=interpret,
    )(scal, a_pad.reshape(1, N), p3_pad[0].reshape(1, N),
      p3_pad[1].reshape(1, N), p3_pad[2].reshape(1, N))
    out = out.reshape(n_hi, 8, _LO).transpose(1, 0, 2).reshape(8, Kp)
    return out[:6, :num_segments + 1]


def _lookup_kernel(ids_ref, tab_ref, out_ref, *, tile):
    """Banded table lookup: out = table[ids] for spatially coherent ids.

    The band guard mirrors the segment-sum kernel's: a tile of coherent ids
    touches a narrow contiguous range of 128-wide table rows, so the lookup
    is a short fori over that band of one-nonzero-term matmuls — no gather
    (Mosaic has none) and cost proportional to local id density."""
    ids = ids_ref[:]                                # [8, tile]
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LO, tile), 0)
    rows = []
    for r in range(8):
        row_ids = ids[r:r + 1, :]
        hi = row_ids // _LO
        oh = (row_ids % _LO == lo_iota).astype(jnp.bfloat16)  # [_LO, tile]
        band_lo = jnp.min(hi)
        band_hi = jnp.max(hi)

        def body(h, acc):
            trow = tab_ref[pl.ds(h, 1), :].astype(jnp.float32)  # [1, _LO]
            th = jnp.floor(trow / 256.0)
            tl = trow - th * 256.0

            def mm(t):
                return jax.lax.dot(t.astype(jnp.bfloat16), oh,
                                   preferred_element_type=jnp.float32)

            v = mm(th).astype(jnp.int32) * 256 + mm(tl).astype(jnp.int32)
            return acc + jnp.where(hi == h, v, 0)

        rows.append(jax.lax.fori_loop(band_lo, band_hi + 1, body,
                                      jnp.zeros((1, tile), jnp.int32)))
    out_ref[:] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("num_entries", "interpret"))
def banded_lookup_pallas(ids, table, num_entries: int, interpret: bool):
    """out[i] = table[ids[i]] for int32 ids [N] that are spatially coherent
    in [0, num_entries) and table values in [0, 2^16).  The whole table
    lives in VMEM ([num_entries/128, 128] int32 — 2.5 MB at 640k entries);
    per tile only the ids' local band of rows is touched."""
    N = ids.shape[0]
    tile = 4096
    rows_per_block = 8
    blk = rows_per_block * tile
    n_blocks = -(-N // blk)
    Np = n_blocks * blk
    Kp = -(-num_entries // _LO) * _LO

    ids_p = jnp.zeros((Np,), jnp.int32).at[:N].set(ids)
    ids_p = ids_p.reshape(n_blocks * rows_per_block, tile)
    tab_p = jnp.zeros((Kp,), jnp.int32).at[:num_entries].set(
        table[:num_entries]).reshape(Kp // _LO, _LO)

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, tile=tile),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((rows_per_block, tile), lambda i: (i, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_per_block, tile), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * rows_per_block, tile),
                                       jnp.int32),
        interpret=interpret,
    )(ids_p, tab_p)
    return out.reshape(-1)[:N]


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def segment_sum_pallas(ids, vals, num_segments: int, interpret: bool):
    """ids: int32 [N] in [0, num_segments]; vals: int32 [V, N] with
    0 <= vals < 2^16 and V <= 8.  Returns int32 [V, num_segments + 1]."""
    V, N = vals.shape
    assert V <= 8
    tile = 4096
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    Kp = -(-(num_segments + 1) // _LO) * _LO

    n_hi = Kp // _LO
    vals_p = jnp.zeros((8, Np), jnp.int32).at[:V, :N].set(vals)
    # pad ids with the last real id (padding vals are 0, so the bin doesn't
    # matter) to keep the final tile's hi-bucket band tight
    ids_p = jnp.broadcast_to(ids[-1], (8, Np)
                             ).at[:, :N].set(jnp.broadcast_to(ids[None, :],
                                                              (8, N)))

    out = pl.pallas_call(
        functools.partial(_segsum_kernel, tile=tile),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((8, tile), lambda i: (0, i)),
                  pl.BlockSpec((8, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((n_hi * 8, _LO), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_hi * 8, _LO), jnp.int32),
        interpret=interpret,
    )(vals_p, ids_p)
    # rows are per-bucket groups of 8: [n_hi*8, 128] -> [8, Kp]
    out = out.reshape(n_hi, 8, _LO).transpose(1, 0, 2).reshape(8, Kp)
    return out[:V, :num_segments + 1]


@functools.partial(jax.jit, static_argnames=("num_segments_f", "interpret"))
def framed_segment_sum_pallas(ids, vals, num_segments_f: int,
                              interpret: bool):
    """Per-frame segment sum for frame-batched bookkeeping (stacked-batch
    CCA): ids int32 [B, Nf] FRAME-LOCAL in [0, num_segments_f); vals int32
    [V, B, Nf] with 0 <= vals < 2^16, V <= 8.  Returns int32
    [B, V, num_segments_f].  Equivalent to B independent segment_sum_pallas
    calls in ONE kernel launch; the output block is per frame, so the VMEM
    footprint is one frame's bucket table regardless of B."""
    V, B, Nf = vals.shape
    assert V <= 8
    tile = 4096
    n_tiles_f = -(-Nf // tile)
    Npf = n_tiles_f * tile
    Kp = -(-num_segments_f // _LO) * _LO
    n_hi = Kp // _LO

    vals_p = jnp.zeros((8, B * Npf), jnp.int32)
    if Npf == Nf:
        vals_p = vals_p.at[:V, :].set(vals.reshape(V, B * Nf))
        ids_p = ids.reshape(B * Nf)
    else:
        vals_p = vals_p.at[:V, :].set(
            jnp.pad(vals, ((0, 0), (0, 0), (0, Npf - Nf))
                    ).reshape(V, B * Npf))
        # pad each frame's ids with its last real id (vals are 0 there) so
        # the pad tiles' hi-bucket bands stay tight
        ids_p = jnp.concatenate(
            [ids, jnp.broadcast_to(ids[:, -1:], (B, Npf - Nf))],
            axis=1).reshape(B * Npf)
    ids_p = jnp.broadcast_to(ids_p[None, :], (8, B * Npf))

    out = pl.pallas_call(
        functools.partial(_framed_segsum_kernel, tile=tile),
        grid=(B, n_tiles_f),
        in_specs=[pl.BlockSpec((8, tile), lambda b, t: (0, b * n_tiles_f + t)),
                  pl.BlockSpec((8, tile), lambda b, t: (0, b * n_tiles_f + t))],
        out_specs=pl.BlockSpec((n_hi * 8, _LO), lambda b, t: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((B * n_hi * 8, _LO), jnp.int32),
        interpret=interpret,
    )(vals_p, ids_p)
    out = out.reshape(B, n_hi, 8, _LO).transpose(0, 2, 1, 3).reshape(B, 8, Kp)
    return out[:, :V, :num_segments_f]


def _fsegsum_kernel(ids_ref, vals_ref, out_ref, *, tile, wrow=None):
    """Band-guarded f32 segment-sum (LSC weighted feature accumulation).

    ids_ref [8, tile] i32 (row 0 = segment ids, row 1 = 0/1 mask);
    vals_ref [16, tile] f32 (rows 0..10 = weighted features + weight).
    Output rows are grouped 16 per hi bucket.  Values are split into their
    three non-overlapping bf16 mantissa chunks and accumulated by three
    full-rate bf16 matmuls against the 0/1 one-hot — every product is exact
    (0/1 x bf16 chunk), so this matches Precision.HIGHEST up to f32
    accumulation order at half the MXU passes (the reference accumulates in
    plain f32, lsc.cpp:245-297; LSC parity is >=0.999 agreement, not
    bit-exact)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[0:1, :]
    mask = ids_ref[1:2, :].astype(jnp.float32)
    vals = vals_ref[:] * mask
    if wrow is not None:
        # weighted accumulation with the multiply IN-KERNEL: rows < wrow
        # are multiplied by row wrow (the per-pixel weight) here instead of
        # materializing the weighted product in HBM (a [10, Hs, W]
        # read+write per LSC iteration).  Bit-identical: mask is 0/1, so
        # (f*mask)*(w*mask) == (f*w)*mask exactly.
        w = vals[wrow:wrow + 1, :]
        vals = jnp.concatenate([vals[:wrow] * w, vals[wrow:]], axis=0)
    v_h = vals.astype(jnp.bfloat16)
    r1 = vals - v_h.astype(jnp.float32)
    v_m = r1.astype(jnp.bfloat16)
    v_l = (r1 - v_m.astype(jnp.float32)).astype(jnp.bfloat16)
    hi_row = ids // _LO
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LO, tile), 0)
    oh_t = (ids % _LO == lo_iota).astype(jnp.float32)

    band_lo = jnp.min(hi_row)
    band_hi = jnp.max(hi_row)

    def body(h, carry):
        # band masking moves to the 0/1 side so the value chunks are
        # loop-invariant (split once per tile)
        ohm = (oh_t * (hi_row == h).astype(jnp.float32)
               ).astype(jnp.bfloat16)

        def d(chunk):
            return jax.lax.dot_general(
                chunk, ohm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [16, _LO]

        part = (d(v_h) + d(v_m)) + d(v_l)
        out_ref[pl.ds(h * 16, 16), :] += part
        return carry

    jax.lax.fori_loop(band_lo, band_hi + 1, body, 0)


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret",
                                             "wrow"))
def float_segsum_pallas(ids, mask, vals, num_segments: int, interpret: bool,
                        wrow: int | None = None):
    """ids int32 [N] in [0, num_segments] (masked pixels should carry a
    nearby valid id so the hi-bucket band stays tight), mask int32 [N],
    vals f32 [V, N] with V <= 16.  Returns f32 [V, num_segments + 1].
    wrow: if set, rows < wrow are multiplied by row wrow in-kernel (the
    weighted-accumulation fusion — see _fsegsum_kernel)."""
    V, N = vals.shape
    assert V <= 16
    tile = 4096
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    Kp = -(-(num_segments + 1) // _LO) * _LO
    n_hi = Kp // _LO

    pack = jnp.zeros((8, Np), jnp.int32)
    pack = pack.at[0, :].set(jnp.broadcast_to(ids[-1], (Np,)))
    pack = pack.at[0, :N].set(ids)
    pack = pack.at[1, :N].set(mask)
    vp = jnp.zeros((16, Np), jnp.float32).at[:V, :N].set(vals)

    out = pl.pallas_call(
        functools.partial(_fsegsum_kernel, tile=tile, wrow=wrow),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((8, tile), lambda i: (0, i)),
                  pl.BlockSpec((16, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((n_hi * 16, _LO), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_hi * 16, _LO), jnp.float32),
        interpret=interpret,
    )(pack, vp)
    out = out.reshape(n_hi, 16, _LO).transpose(1, 0, 2).reshape(16, Kp)
    return out[:V, :num_segments + 1]
