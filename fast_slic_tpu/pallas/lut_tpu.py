"""Fused fixed-point RGB->CIELAB as a Pallas TPU kernel.

The conversion (ops/cielab.py, mirroring reference cielab.h:308-325) is six
table lookups plus integer math.  In composed XLA programs each
pixel-granularity gather executes serially (~8 ms per 720p lookup — 48 ms
per frame just for LAB).  This kernel does the whole conversion in one pass
over flat pixel tiles:

* the 256-entry sRGB tables as balanced [8, 32] two-level one-hot lookups
  (byte-split bf16 matmuls, exact),
* the 8193-entry lab (cube-root) table via the Newton-base + 1-bit-residual
  decomposition (_newton_lab_tables below) — the value is COMPUTED with
  deterministic f32 arithmetic and only one residual bit is looked up.

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

# ---------------------------------------------------------------------------
# Newton-base decomposition of the 8193-entry lab (cube-root) table.
#
# The two-level one-hot lookup pays ~_LO + 4*_N_HI VPU ops per element —
# the lab table's 65 hi rows make it the most expensive part of the LAB
# kernel.  But the table is round(8192 * f(i/8192)) for the CIELAB
# nonlinearity: a cube root above the linear-branch threshold, affine
# below it.  Both branches are reproducible with deterministic f32
# mul/add-only arithmetic (FMA blocked via minimum(), mirrored bit-for-bit
# by numpy at build time), leaving a residual of exactly {0, 1} — ONE BIT
# per index, packed 32/word into a 257-entry side table that shares its
# two-level lookup with the Newton seed.  Per-element cost drops to
# ~32 + small.  Exactness is asserted over all 8193 indices at build time,
# and the kernel-vs-oracle bit-identity test covers the traced form.
# ---------------------------------------------------------------------------

_NEWTON_BIG = np.float32(3.0e38)
_NEWTON_THIRD = np.float32(1.0 / 3.0)
_NEWTON_INV = np.float32(1.0 / 8192.0)
_NEWTON_LO = 32
_NEWTON_NHI = 9  # ceil(257 / 32) -> [9, 32] covers word ids 0..256


def _nmin(x):
    """minimum(x, BIG): blocks FMA contraction of the preceding multiply
    (see pipeline._nofma) — used identically by the numpy mirror so host
    and kernel round bit-for-bit."""
    return np.minimum(x, _NEWTON_BIG).astype(np.float32)


def _newton_base_np(x_int, seed_tbl):
    """Numpy mirror of the kernel's Newton chain (f32, mul-only, FMA-free).

    x_int: int array of table indices.  Returns the rounded f32 base."""
    xf = x_int.astype(np.float32)
    t = np.maximum(xf, np.float32(1.0)) * _NEWTON_INV
    r = seed_tbl[(x_int >> 5).astype(np.int64)]
    for _ in range(4):
        r2 = _nmin(r * r)
        r3 = _nmin(r2 * r)
        p = _nmin(t * r3)
        s = np.float32(4.0) - p
        r = _nmin(r * s) * _NEWTON_THIRD
    u = _nmin(t * r)
    u2 = _nmin(u * r)
    v = u2 * np.float32(8192.0)
    return np.round(v)  # half-even, like jnp.round


@functools.lru_cache(maxsize=1)
def _newton_lab_tables():
    """Build (T [5, 9, 32] f32, c1, c2, X0) for the Newton lab lookup.

    T channels: 0..3 = the 1-bit residual words' bytes (hi..lo), 4 = the
    per-32-block reciprocal-cbrt Newton seed (bf16-exact f32, so the
    bf16 lookup matmul reproduces it bitwise).  c1/c2: the affine base of
    the CIELAB linear branch; X0: first index using the Newton base.
    Asserts residual in {0, 1} for every index."""
    import ml_dtypes

    lab = cie._LAB_TBL_NP.astype(np.int64)
    N = lab.shape[0]
    idx = np.arange(N)

    centers = (np.arange(257, dtype=np.float64) * 32 + 16) / 8192.0
    seed = (1.0 / np.cbrt(centers)).astype(ml_dtypes.bfloat16).astype(
        np.float32)

    base_n = _newton_base_np(idx, seed).astype(np.int64)
    e_n = lab - base_n
    bad = np.nonzero((e_n != 0) & (e_n != 1))[0]
    X0 = int(bad.max()) + 1 if bad.size else 0
    assert X0 < 256, f"Newton base diverges up to index {X0}"

    # affine base for the linear branch [0, X0): residuals of the true
    # affine map span < 2, so an intercept exists with residual in {0, 1}
    if X0 > 1:
        c1 = np.float32((lab[X0 - 1] - lab[0]) / float(X0 - 1))
        hf = np.arange(X0, dtype=np.float32)
        r = lab[:X0].astype(np.float64) - np.float64(c1) * hf.astype(np.float64)
        c2 = np.float32((r.max() - 1.0 + r.min()) / 2.0)
    else:
        c1 = np.float32(0.0)
        c2 = np.float32(lab[0])
    base_l = np.round(_nmin(c1 * idx.astype(np.float32))
                      + c2).astype(np.int64)
    e_l = lab - base_l
    e_all = np.where(idx < X0, e_l, e_n)
    assert ((e_all == 0) | (e_all == 1)).all(), \
        "lab residual not 1-bit; Newton decomposition invalid"

    words = np.zeros(257, np.uint32)
    for j in range(32):
        sel = e_all[j::32][: words.shape[0]]
        words[: sel.shape[0]] |= (sel.astype(np.uint32) << j)

    T = np.zeros((5, _NEWTON_NHI, _NEWTON_LO), np.float32)
    flat = T.reshape(5, -1)
    flat[0, :257] = (words >> 24) & 0xFF
    flat[1, :257] = (words >> 16) & 0xFF
    flat[2, :257] = (words >> 8) & 0xFF
    flat[3, :257] = words & 0xFF
    flat[4, :257] = seed
    return T, float(c1), float(c2), X0


def _lookup_lab_newton(x, nt_ref, c1, c2, X0):
    """Newton-base lab-table lookup (see _newton_lab_tables): exact value =
    arithmetic base + 1-bit residual.  x: [1, tile] int32 in [0, 8192]."""
    tile = x.shape[1]
    fBIG = jnp.float32(3.0e38)

    def nmin(v):
        return jnp.minimum(v, fBIG)

    # shared two-level lookup of (residual word, seed) over 257 entries
    w = x >> 5
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_NEWTON_LO, tile), 0)
    ohl = (w % _NEWTON_LO == lo_iota).astype(jnp.bfloat16)
    T = nt_ref[:]                                    # [5, 9, 32] f32

    def mm(ch):
        return jax.lax.dot(T[ch].astype(jnp.bfloat16), ohl,
                           preferred_element_type=jnp.float32)  # [9, tile]

    hi = w // _NEWTON_LO
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (_NEWTON_NHI, tile), 0)

    def sel(M):
        return jnp.sum(jnp.where(hi_iota == hi, M, jnp.zeros_like(M)),
                       axis=0, keepdims=True)       # [1, tile]

    # byte channels pair-combined in f32 (<= 65535, exact) before the row
    # select; the 32-bit word assembles in int32 after
    c01 = mm(0) * 256.0 + mm(1)
    c23 = mm(2) * 256.0 + mm(3)
    ew = (sel(c01).astype(jnp.int32) << 16) | sel(c23).astype(jnp.int32)
    seed = sel(mm(4))
    bit = (jax.lax.shift_right_logical(ew, x & 31)) & 1

    # Newton base (deterministic f32; the minimum() calls block FMA
    # contraction so rounding matches the numpy mirror bit-for-bit)
    xf = x.astype(jnp.float32)
    t = jnp.maximum(xf, jnp.float32(1.0)) * jnp.float32(1.0 / 8192.0)
    r = seed
    for _ in range(4):
        r2 = nmin(r * r)
        r3 = nmin(r2 * r)
        p = nmin(t * r3)
        s = jnp.float32(4.0) - p
        r = nmin(r * s) * jnp.float32(1.0 / 3.0)
    u = nmin(t * r)
    u2 = nmin(u * r)
    nb = jnp.round(u2 * jnp.float32(8192.0))
    lin = jnp.round(nmin(jnp.float32(c1) * xf) + jnp.float32(c2))
    base = jnp.where(x < X0, lin, nb).astype(jnp.int32)
    return base + bit


def _lab_kernel(srgb2d_ref, nt_ref, rgb_ref, out_ref, *, c1, c2, X0):
    # rgb_ref: [8, tile] i32 (rows 0..2 = R, G, B); out: [8, tile] i32.
    # sRGB lookups stay two-level one-hot ([2, 128] table); the lab
    # (cube-root) lookups use the Newton-base decomposition (nt_ref +
    # static c1/c2/X0) — see _newton_lab_tables.
    tile = rgb_ref.shape[1]

    def lookup(x, table_ref, n_hi):
        # x: [1, tile] int32 indices into a [n_hi, lo]-shaped table.
        # Contract over the LANE level first (T [n_hi, lo] @ onehot_lo
        # [lo, tile] -> [n_hi, tile]), then select over the n_hi rows.
        # Cost ~ lo + 4*n_hi per element, so the table shape should
        # balance the two levels (sRGB 256 entries -> [8, 32], half the
        # cost of the old [2, 128]).
        lo = table_ref.shape[1]
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (lo, tile), 0)
        ohl = (x % lo == lo_iota).astype(jnp.bfloat16)     # [lo, tile]
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
        sel = jnp.where(hi_iota == (x // lo), M, jnp.zeros_like(M))
        return jnp.sum(sel, axis=0, keepdims=True).astype(jnp.int32)

    sr = lookup(rgb_ref[0:1, :], srgb2d_ref, 8)
    sg = lookup(rgb_ref[1:2, :], srgb2d_ref, 8)
    sb = lookup(rgb_ref[2:3, :], srgb2d_ref, 8)

    cb = _CB

    def dotrow(r):
        return (cb[r][0] * sr + cb[r][1] * sg + cb[r][2] * sb) >> cie.LAB_SHIFT

    fx = _lookup_lab_newton(dotrow(0), nt_ref, c1, c2, X0)
    fy = _lookup_lab_newton(dotrow(1), nt_ref, c1, c2, X0)
    fz = _lookup_lab_newton(dotrow(2), nt_ref, c1, c2, X0)

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

    nt, c1, c2, X0 = _newton_lab_tables()
    srgb2d = np.zeros((8, 32), np.int32)
    srgb2d.reshape(-1)[:256] = cie._SRGB_TBL_NP

    out = pl.pallas_call(
        functools.partial(_lab_kernel, c1=c1, c2=c2, X0=X0),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(srgb2d), jnp.asarray(nt), rows)
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
    color_sin[a], color_cos[b], color_sin[b].  Tables are [8, 32] f32
    (balanced two-level split: cost ~ lo + 2*n_hi per element); the lookup
    contracts a HIGHEST-precision f32 matmul over the lane level (exact
    for arbitrary f32 table values) and selects over the hi rows."""
    tile = rgb_ref.shape[1]
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (32, tile), 0)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (8, tile), 0)

    def lookups(x, table_refs):
        ohl = (x % 32 == lo_iota).astype(jnp.float32)
        outs = []
        for tref in table_refs:
            M = jax.lax.dot(tref[:], ohl,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)  # [8, tile]
            sel = jnp.where(hi_iota == (x // 32), M, jnp.zeros_like(M))
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
    """planes int32 [3, H, W] planar (quantized L, a, b) -> f32 [6, H, W]
    PLANAR LSC color features, identical to gathering the 256-entry host
    tables (ops/lsc.py features(); the XLA gather form executes serially at
    ~8 ns/element — ~100 ms for six lookups at 1080p).  The kernel computes
    planar rows natively, and every downstream consumer (the padded
    [n_feat, Hp, Wp] kernel planes, the row-layout float segment-sum) wants
    planar — the old [H, W, 6] interleave was an 83 MB relayout at 1080p."""
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
        return jnp.asarray(t, jnp.float32).reshape(8, 32)

    out = pl.pallas_call(
        _lsc_feat_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 +
                 [pl.BlockSpec((8, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        interpret=interpret,
    )(t2d(lcos), t2d(lsin), t2d(ccos), t2d(csin), rows)
    return out[:6, :n].reshape(6, H, W)
