"""Fused SLIC assignment as a Pallas TPU kernel (standard/quantized variant).

One kernel pass computes, for a 64-row strip of the image held in VMEM, the
argmin over the per-cell candidate lists — the entire hot loop of
``BaseContext::assign`` (reference ``context.cpp:200-298``) with the
reference's visit-order tie-breaking.

The trick is the cell->pixel *expansion*: a pixel's candidates depend only on
its S-cell, so per-slot candidate fields ([GH, GW] cell grids) must be
broadcast to pixel resolution.  Gathers at pixel granularity are slow on TPU
and Mosaic has no lane-gather; instead the expansion is written as two 0/1
*selection matmuls* on the MXU:

    pixels[64, Wp] = rowsel[64, CR] @ field[CR, GW] @ colsel[GW, Wp]

with rowsel/colsel built from iota compares (rowsel[r, c] = 1 iff row r lies
in the c-th *strip-local* cell row).  Each product has exactly one nonzero
term, and field values are < 2^24, so the f32 matmul is exact.  Everything
else is VPU int math identical to the XLA oracle path, so the kernel is
bit-compatible with it.

Candidate fields are gathered per strip OUTSIDE the kernel (a cell-
granularity gather of CR = (rows-1)*stride//S + 2 cell rows per strip), so
VMEM holds only the strip's own [CR, C*GW] tables — constant in image
height.  This is what lets the same kernel serve the batched canvas
(parallel/canvas.py), whose cell grid is B times taller: VMEM per strip is
~0.3 MB regardless of batch size, and the rowsel matmul contracts over CR
(~9) instead of the full GH (hundreds on a canvas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import StaticConfig, UNASSIGNED

_U32_MAX = 0xFFFFFFFF

# Raised Mosaic scoped-VMEM limit (default 16 MB; v5e has 128 MB VMEM).
# The default forced the LSC float kernel to 32-row strips at 1080p widths
# (measured 20.7 MB at 64x1920 with 10 feature channels) and left the
# standard kernel one allocator change away from failing (see
# cca_tpu._SCOPED_VMEM_BYTES — a fresh Mosaic build rejected shapes the
# round-3 build accepted).
_SCOPED_VMEM_BYTES = 64 * 2 ** 20


def _cparams(interpret: bool):
    return (None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM_BYTES))


def _assign_kernel(scal_ref, occ_ref, *refs, S, GH, GW, C, CR,
                   rows, stride, W_real, H_real, manhattan, spf=0,
                   merged=False, yx_off=0):
    # merged=True: the y/x candidate fields arrive as ONE integer field
    # yx = trunc(y)*2048 + trunc(x) (< 2^24 — the kernel only ever uses
    # int-cast centers in this variant, so pre-truncating is exact), which
    # expands in a 3-byte split (3 matmuls) instead of two 2-byte splits
    # (4) — one fewer expansion matmul per strip AND per slot.
    if merged:
        (cyx_ref, cr_ref, cg_ref, cb_ref, cid_ref) = refs[:5]
        rest = refs[5:]
    else:
        (cy_ref, cx_ref, cr_ref, cg_ref, cb_ref, cid_ref) = refs[:6]
        rest = refs[6:]
    (p0_ref, p1_ref, p2_ref, old_ref, out_a_ref, out_d_ref, m_ref,
     a_ref) = rest

    # spf > 0: frame-grid batch mode (parallel/stack.py) — the grid covers
    # B stacked frames of spf strips each; all row/cell math is frame-local.
    gi_abs = pl.program_id(0)
    gi = gi_abs % spf if spf else gi_abs
    Wp = p0_ref.shape[1]
    coef = scal_ref[0]
    rem = scal_ref[1].astype(jnp.int32)
    # dynamic PER-STRIP slot bound: slots >= occ are empty in every cell
    # THIS STRIP can read (computed per strip by the caller from the
    # gathered candidate rows), so their bodies can never win one of its
    # pixels — skipping them is bit-exact and cuts per-slot VPU/MXU work
    # from the static capacity C (16) to the strip's actual occupancy.
    occ = occ_ref[gi_abs]

    # Rows of this strip are the subsampled rows (row index r maps to the
    # absolute image row r*stride + rem); full passes use stride=1, rem=0.
    row_abs0 = gi * rows  # first subsampled row of this strip

    # strip-local cell row base — must match _strip_gather_base exactly
    base_cell = row_abs0 * stride + rem
    base_cell = jnp.clip(base_cell // S, 0, max(GH - CR, 0))

    # selection matrices from iota compares.  All expansion matmuls run in
    # bf16 at full MXU rate; exactness holds because operands are split into
    # byte chunks (<= 255, bf16-exact) and each output has exactly one
    # nonzero term, accumulated in f32.
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, CR), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, CR), 1)
    abs_r = (row_abs0 + r_iota) * stride + rem
    rowsel = (abs_r // S - base_cell == c_iota).astype(jnp.bfloat16)

    gc_iota = jax.lax.broadcasted_iota(jnp.int32, (GW, Wp), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (GW, Wp), 1)
    colsel = (j_iota // S == gc_iota).astype(jnp.bfloat16)

    def rowx(ref, nparts):
        """Row-expand a [1, CR, C*GW] field -> byte-chunk planes
        [rows, C*GW] (nparts = 1, 2 or 3 chunks of <= 255)."""
        f = ref[0]
        if nparts == 3:
            hi = jnp.floor(f / 65536.0)
            r1 = f - hi * 65536.0
            mid = jnp.floor(r1 / 256.0)
            parts = (hi, mid, r1 - mid * 256.0)
        elif nparts == 2:
            fh = jnp.floor(f / 256.0)
            parts = (fh, f - fh * 256.0)
        else:
            parts = (f,)
        return tuple(
            jax.lax.dot(rowsel, p.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            for p in parts)

    if merged:
        eyx = rowx(cyx_ref, 3)
    else:
        ey, ex = rowx(cy_ref, 2), rowx(cx_ref, 2)
    er, eg, eb = (rowx(r, 1) for r in (cr_ref, cg_ref, cb_ref))

    ii = ((row_abs0 + jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 0))
          * stride + rem)
    jj = jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 1)

    def lanex(parts, s):
        outs = [
            jax.lax.dot(p[:, s * GW:(s + 1) * GW].astype(jnp.bfloat16),
                        colsel, preferred_element_type=jnp.float32)
            for p in parts
        ]
        if len(outs) == 3:
            return (outs[0].astype(jnp.int32) * 65536
                    + outs[1].astype(jnp.int32) * 256
                    + outs[2].astype(jnp.int32))
        if len(outs) == 2:
            return outs[0].astype(jnp.int32) * 256 + outs[1].astype(jnp.int32)
        return outs[0]

    p0 = p0_ref[:]
    p1 = p1_ref[:]
    p2 = p2_ref[:]

    # int32 packing (dist << 7 | slot): dist is < 2^16 for sane configs and
    # int32 avoids Mosaic uint32 quirks; sentinel is INT32_MAX.  The min
    # carry lives in a VMEM scratch so each slot body can be a pl.when
    # region the core skips entirely for slots >= occ.
    m_ref[:] = jnp.full((rows, Wp), 0x7FFFFFFF, jnp.int32)
    for s in range(C):
        @pl.when(s < occ)
        def _slot_body(s=s):
            if merged:
                cyx = lanex(eyx, s)
                # y is stored offset by yx_off so spatially-sharded callers
                # with slightly-negative local y still pack non-negatively
                cy = (cyx >> 11) - yx_off
                cx = cyx & 2047
            else:
                cy = lanex(ey, s)
                cx = lanex(ex, s)
            di = ii - cy
            dj = jj - cx
            inwin = (jnp.abs(di) <= S) & (jnp.abs(dj) <= S)
            if manhattan:
                sp_f = coef * (jnp.abs(di) + jnp.abs(dj)).astype(jnp.float32)
            else:
                dif = di.astype(jnp.float32)
                djf = dj.astype(jnp.float32)
                # minimum() blocks FMA contraction (see pipeline._nofma)
                sp_f = coef * jnp.sqrt(
                    jnp.minimum(dif * dif, jnp.float32(3.4e38))
                    + jnp.minimum(djf * djf, jnp.float32(3.4e38)))
            sp = jnp.trunc(sp_f).astype(jnp.int32)
            cr = lanex(er, s).astype(jnp.int32)
            cg = lanex(eg, s).astype(jnp.int32)
            cb = lanex(eb, s).astype(jnp.int32)
            cd = jnp.abs(p0 - cr) + jnp.abs(p1 - cg) + jnp.abs(p2 - cb)
            dist = sp + cd
            packed = (dist << 7) | s
            m_ref[:] = jnp.minimum(
                m_ref[:], jnp.where(inwin, packed,
                                    jnp.full_like(packed, 0x7FFFFFFF)))

    m = m_ref[:]
    got = m != 0x7FFFFFFF
    slot = m & 0x7F

    # winner slot -> cluster id (select chain over expanded id tables)
    eid = rowx(cid_ref, 2)
    a_ref[:] = jnp.full((rows, Wp), UNASSIGNED, jnp.int32)
    for s in range(C):
        @pl.when(s < occ)
        def _id_body(s=s):
            cid = lanex(eid, s)
            a_ref[:] = jnp.where(got & (slot == s) & (cid >= 0), cid,
                                 a_ref[:])
    new_assign = a_ref[:]

    write = got & (new_assign != UNASSIGNED)
    out_a_ref[:] = jnp.where(write, new_assign, old_ref[:])
    out_d_ref[:] = jnp.where(write, m >> 7, jnp.full_like(m, 0xFFFF))


# Dynamic slot-occupancy bound: measured winner on real TPU (round 3,
# 10.56 vs 10.68 ms full-iterate) and bit-exact by construction; tests flip
# this module flag to assert the A/B equivalence.
OCC_BOUND = True

# Merged-yx candidate layout for the standard kernel (see
# prepare_cell_fields): bit-exact by construction; tests flip this flag to
# assert the A/B equivalence against the classic 6-field layout.
MERGE_YX = True


def _occupancy_strips(id_strips, C):
    """PER-STRIP dynamic slot bound: for each strip, 1 + the highest
    candidate slot index holding any valid id among the cell rows that
    strip reads (empty slots carry id = -1 in the gathered
    [n_strips, CR, C*GW] id field).  Slots >= occ[strip] are empty in
    every cell the strip touches, so its kernel body skips them —
    bit-exact, and tighter than the old grid-wide bound (computed
    prefix-free so hand-built candidate lists with interior holes still
    get a sound bound)."""
    n_strips, CR, CG = id_strips.shape
    GW = CG // C
    if not OCC_BOUND:  # A/B: always run all C slots
        return jnp.full([n_strips], C, jnp.int32)
    valid = (id_strips.reshape(n_strips, CR, C, GW) >= 0).any(axis=(1, 3))
    idx = jnp.arange(1, C + 1, dtype=jnp.int32)
    return jnp.max(jnp.where(valid, idx[None, :], 0), axis=1)


def _strip_rows_cr(GH: int, S: int, stride: int, rows: int) -> int:
    """Cell rows a strip can touch: (rows-1)*stride spanned + partial ends."""
    return min(GH, (rows - 1) * stride // S + 2)


_F32_MAX = float(np.finfo(np.float32).max)


def _assign_kernel_float(scal_ref, occ_ref, *refs, S, GH, GW, C, CR, rows,
                         stride, W_real, H_real, manhattan, variant,
                         n_feat, spf=0):
    """Float-distance assign kernel: the real / real_l2 / real_noq variants
    (reference ContextRealDist* scalar loops, context.cpp:406-499) and LSC
    (lsc.cpp:197-224; SIMD analog avx2.h:193-304).

    Same strip/expansion structure as the quantized kernel, but candidate
    fields are expanded with one-nonzero-term f32 matmuls at
    Precision.HIGHEST (exact for arbitrary f32 values), distances are f32,
    and the winner is tracked as an (md, ms) carry — slots are visit-ordered
    so `dist < md` reproduces the reference's first-writer tie rule.

    refs layout: 6 + n_feat cell-field refs ([1, CR, C*GW] f32 each:
    y, x, r, g, b, id — empty slots carry y=_INVALID_Y, failing every
    window test — then LSC centroid channels), then 3 + n_feat
    pixel-plane refs ([rows, Wp]: quad planes int32, then LSC feature
    channels f32), then old assignment; outputs (assignment, min_dists f32).
    """
    nf = 6 + n_feat
    field_refs = refs[:nf]
    plane_refs = refs[nf:nf + 3 + n_feat]
    old_ref = refs[nf + 3 + n_feat]
    out_a_ref = refs[nf + 3 + n_feat + 1]
    out_d_ref = refs[nf + 3 + n_feat + 2]
    md_ref = refs[nf + 3 + n_feat + 3]
    ms_ref = refs[nf + 3 + n_feat + 4]
    (cy_ref, cx_ref, cr_ref, cg_ref, cb_ref, cid_ref) = field_refs[:6]
    feat_cent_refs = field_refs[6:]

    gi_abs = pl.program_id(0)
    gi = gi_abs % spf if spf else gi_abs
    Wp = plane_refs[0].shape[1]
    coef = scal_ref[0]
    rem = scal_ref[1].astype(jnp.int32)
    occ = occ_ref[gi_abs]     # dynamic PER-STRIP slot bound (see above)
    row_abs0 = gi * rows
    base_cell = row_abs0 * stride + rem
    base_cell = jnp.clip(base_cell // S, 0, max(GH - CR, 0))

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, CR), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, CR), 1)
    abs_r = (row_abs0 + r_iota) * stride + rem
    rowsel = (abs_r // S - base_cell == c_iota).astype(jnp.float32)

    gc_iota = jax.lax.broadcasted_iota(jnp.int32, (GW, Wp), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (GW, Wp), 1)
    colsel = (j_iota // S == gc_iota).astype(jnp.float32)

    # Exact f32 selector contractions at 1/2 the HIGHEST MXU passes: one
    # side of each expansion dot is a 0/1 selector (bf16-exact) and each
    # output accumulates exactly ONE value v, so splitting v into its three
    # non-overlapping bf16 mantissa chunks (h + m + l == v exactly, 3x8 =
    # 24 mantissa bits) and summing three full-rate bf16 dots reconstructs
    # v bit-exactly — each product is exact (0/1 x bf16 chunk) and the
    # chunk sums are exact (disjoint mantissas).  Precision.HIGHEST would
    # split BOTH operands (6 passes); Mosaic rejects HIGH ("Unsupported dot
    # precision: HIGH", measured on v5e), so the manual split is the
    # cheapest exact form.
    def _split3(v):
        h = v.astype(jnp.bfloat16)
        r1 = v - h.astype(jnp.float32)
        m = r1.astype(jnp.bfloat16)
        l = (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16)
        return h, m, l

    rowsel_b = rowsel.astype(jnp.bfloat16)
    colsel_b = colsel.astype(jnp.bfloat16)

    def rowx(ref):
        h, m, l = _split3(ref[0])

        def d(x):
            return jax.lax.dot(rowsel_b, x,
                               preferred_element_type=jnp.float32)

        return (d(h) + d(m)) + d(l)

    # fields are expanded to strip rows once (f32), then split ONCE into
    # the three bf16 chunk planes the per-slot lane expansions reuse
    expanded = [_split3(rowx(r)) for r in field_refs]

    def lanex(e3, s):
        sl = slice(s * GW, (s + 1) * GW)

        def d(x):
            return jax.lax.dot(x[:, sl], colsel_b,
                               preferred_element_type=jnp.float32)

        return (d(e3[0]) + d(e3[1])) + d(e3[2])

    ii = ((row_abs0 + jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 0))
          * stride + rem)
    jj = jax.lax.broadcasted_iota(jnp.int32, (rows, Wp), 1)
    iif = ii.astype(jnp.float32)
    jjf = jj.astype(jnp.float32)

    p0 = plane_refs[0][:]
    p1 = plane_refs[1][:]
    p2 = plane_refs[2][:]
    feats = [r[:] for r in plane_refs[3:]]

    fmax = jnp.float32(_F32_MAX)

    def nofma(x):
        # block FMA contraction so float sums round like the reference C
        # (see pipeline._nofma)
        return jnp.minimum(x, fmax)

    md_ref[:] = jnp.full((rows, Wp), fmax, jnp.float32)
    ms_ref[:] = jnp.full((rows, Wp), -1, jnp.int32)
    for s in range(C):
      @pl.when(s < occ)
      def _slot_body(s=s):
        md = md_ref[:]
        cy = lanex(expanded[0], s)
        cx = lanex(expanded[1], s)
        if variant == "lsc":
            cyi = cy.astype(jnp.int32)
            cxi = cx.astype(jnp.int32)
            inwin = ((jnp.abs(ii - cyi) <= S)
                     & (jnp.abs(jj - cxi) <= S))
            dist = jnp.zeros((rows, Wp), jnp.float32)
            for fch in range(n_feat):
                cfv = lanex(expanded[6 + fch], s)
                d = feats[fch] - cfv
                dist = dist + nofma(d * d)
        elif variant == "real_noq":
            y_lo = jnp.maximum(jnp.trunc(cy - S).astype(jnp.int32), 0)
            y_hi = jnp.minimum(jnp.trunc(cy + S + 1).astype(jnp.int32),
                               H_real)
            x_lo = jnp.maximum(jnp.trunc(cx - S).astype(jnp.int32), 0)
            x_hi = jnp.minimum(jnp.trunc(cx + S + 1).astype(jnp.int32),
                               W_real)
            inwin = ((ii >= y_lo) & (ii < y_hi) & (jj >= x_lo)
                     & (jj < x_hi))
            dr = p0.astype(jnp.float32) - lanex(expanded[2], s)
            dg = p1.astype(jnp.float32) - lanex(expanded[3], s)
            db = p2.astype(jnp.float32) - lanex(expanded[4], s)
            dy = coef * (iif - cy)
            dx = coef * (jjf - cx)
            if manhattan:
                dist = (jnp.abs(dr) + jnp.abs(dg) + jnp.abs(db)
                        + jnp.abs(dx) + jnp.abs(dy))
            else:
                dist = (nofma(dr * dr) + nofma(dg * dg) + nofma(db * db)
                        + nofma(dx * dx) + nofma(dy * dy))
        else:  # real / real_l2: int-cast centers, patch spatial
            cyi = cy.astype(jnp.int32)
            cxi = cx.astype(jnp.int32)
            di = ii - cyi
            dj = jj - cxi
            inwin = (jnp.abs(di) <= S) & (jnp.abs(dj) <= S)
            if variant == "real_l2":
                fy = coef * di.astype(jnp.float32)
                fx = coef * dj.astype(jnp.float32)
                sp = nofma(fy * fy) + nofma(fx * fx)
            elif manhattan:
                sp = coef * (jnp.abs(di) + jnp.abs(dj)).astype(jnp.float32)
            else:
                dif = di.astype(jnp.float32)
                djf = dj.astype(jnp.float32)
                sp = coef * jnp.sqrt(nofma(dif * dif) + nofma(djf * djf))
            cr = lanex(expanded[2], s).astype(jnp.int32)
            cg = lanex(expanded[3], s).astype(jnp.int32)
            cb = lanex(expanded[4], s).astype(jnp.int32)
            if variant == "real_l2":
                dr = (p0 - cr).astype(jnp.float32)
                dg = (p1 - cg).astype(jnp.float32)
                db = (p2 - cb).astype(jnp.float32)
                dist = sp + nofma(dr * dr) + nofma(dg * dg) + nofma(db * db)
            else:
                cd = (jnp.abs(p0 - cr) + jnp.abs(p1 - cg)
                      + jnp.abs(p2 - cb)).astype(jnp.float32)
                dist = nofma(sp) + cd

        dist = jnp.where(inwin, dist, fmax)
        better = inwin & (dist < md)
        md_ref[:] = jnp.where(better, dist, md)
        ms_ref[:] = jnp.where(better, s, ms_ref[:])

    ms = ms_ref[:]
    md = md_ref[:]
    got = ms >= 0
    # winner slot -> cluster id: the select chain accumulates in the (now
    # free) ms scratch so slots >= occ can be skipped like the main loop
    ms_ref[:] = jnp.full((rows, Wp), UNASSIGNED, jnp.int32)
    for s in range(C):
        @pl.when(s < occ)
        def _id_body(s=s):
            cid = lanex(expanded[5], s).astype(jnp.int32)
            ms_ref[:] = jnp.where(got & (ms == s) & (cid >= 0), cid,
                                  ms_ref[:])
    new_assign = ms_ref[:]

    write = got & (new_assign != UNASSIGNED)
    out_a_ref[:] = jnp.where(write, new_assign, old_ref[:])
    out_d_ref[:] = jnp.where(write, md, jnp.full_like(md, fmax))


def _strip_gather_idx(n_strips: int, rows: int, stride: int, rem_i,
                      S: int, GH: int, CR: int, spf: int):
    """Per-strip cell-row gather indices.  spf > 0 = frame-grid batch mode:
    strip s belongs to frame s // spf, whose cell rows live at
    [f*GH, (f+1)*GH) in the stacked field array; the base is frame-local
    (must match the kernel's base_cell computation exactly)."""
    sidx = jnp.arange(n_strips, dtype=jnp.int32)
    s_local = sidx % spf if spf else sidx
    base = s_local * (rows * stride) + rem_i
    base = jnp.clip(base // S, 0, max(GH - CR, 0))
    if spf:
        base = base + (sidx // spf) * GH
    return base[:, None] + jnp.arange(CR, dtype=jnp.int32)[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("S", "GH", "GW", "C", "H", "W", "stride", "manhattan",
                     "variant", "interpret", "frames"))
def assign_pallas_float(planes3, feat_planes, old_assign, cell_fields,
                        feat_fields, coef, rem, stride, *, S, GH, GW, C, H,
                        W, manhattan, variant, interpret, frames=1):
    """Fused float-distance assign (real / real_l2 / real_noq / lsc).

    planes3: int32 [3, Hp, Wp]; feat_planes: f32 [n_feat, Hp, Wp] or None
    (LSC feature channels); cell_fields: 6 f32 [GH, C*GW]; feat_fields:
    n_feat f32 [GH, C*GW] LSC centroid channels or None.  Returns
    (assignment int32, min_dists f32) at [Hp, Wp].

    frames > 1 enables the frame-grid batch mode (parallel/stack.py):
    planes3 holds B frames stacked vertically ([3, B*Hpf, Wp]), cell_fields
    are stacked [B*GH, C*GW], and H/W/S/GH stay the per-frame values — one
    pallas_call serves the whole batch with per-frame semantics (VMEM per
    strip is frame-height-independent).
    """
    _, Hp, Wp = planes3.shape
    n_feat_in = 0 if feat_planes is None else feat_planes.shape[0]
    # 64-row strips under the raised scoped-VMEM limit (LSC at 1080p
    # measures 20.7 MB — over the old 16 MB default, comfortably inside
    # _SCOPED_VMEM_BYTES); fall to 32 only at widths where even the raised
    # limit would be at risk (~2x the 1080p footprint)
    rows = 32 if n_feat_in * Wp >= 8 * 5120 else 64
    n_strips = Hp // rows
    CR = _strip_rows_cr(GH, S, stride, rows)
    n_feat = 0 if feat_planes is None else feat_planes.shape[0]
    spf = 0
    if frames > 1:
        assert n_strips % frames == 0
        spf = n_strips // frames

    rem_i = rem.astype(jnp.int32)
    idx = _strip_gather_idx(n_strips, rows, stride, rem_i, S, GH, CR, spf)
    all_fields = tuple(cell_fields) + (tuple(feat_fields) if feat_fields
                                       else ())
    stack = jnp.stack(all_fields, 0)
    strips = stack[:, idx, :]                 # [nf, n_strips, CR, C*GW]

    strip = pl.BlockSpec((rows, Wp), lambda i: (i, 0))
    cells = pl.BlockSpec((1, CR, C * GW), lambda i: (i, 0, 0))
    scal = jnp.stack([coef.astype(jnp.float32),
                      rem_i.astype(jnp.float32)])
    occ_s = _occupancy_strips(strips[5], C)

    nf = 6 + n_feat
    kernel = functools.partial(
        _assign_kernel_float, S=S, GH=GH, GW=GW, C=C, CR=CR, rows=rows,
        stride=stride, W_real=W, H_real=H, manhattan=manhattan,
        variant=variant, n_feat=n_feat, spf=spf)
    plane_args = [planes3[0], planes3[1], planes3[2]]
    if n_feat:
        plane_args += [feat_planes[i] for i in range(n_feat)]
    out_a, out_d = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [cells] * nf +
                 [strip] * (3 + n_feat) + [strip],
        out_specs=(strip, strip),
        out_shape=(jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((rows, Wp), jnp.float32),
                        pltpu.VMEM((rows, Wp), jnp.int32)],
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(scal, occ_s, *(strips[i] for i in range(nf)), *plane_args,
      old_assign)
    return out_a, out_d


@functools.partial(
    jax.jit,
    static_argnames=("S", "GH", "GW", "C", "H", "W", "stride", "manhattan",
                     "interpret", "rows", "frames", "yx_off"))
def assign_pallas_standard(planes3, old_assign, cell_fields, coef, rem,
                           stride, *, S, GH, GW, C, H, W, manhattan,
                           interpret, rows=64, frames=1, yx_off=0):
    """Run the fused assign pass.

    planes3: int32 [3, Hp, Wp] padded quad planes (Hp = strips*64, Wp = GW*S
    rounded up to a lane multiple); old_assign int32 [Hp, Wp];
    cell_fields: tuple of 6 f32 [GH, C*GW] arrays (y, x, r, g, b, id);
    stride: STATIC python int (row r of the input maps to absolute image
    row r*stride + rem); rem: traced int32 scalar.
    Returns (assignment int32 [Hp, Wp], min_dists int32 [Hp, Wp]).

    frames > 1 = frame-grid batch mode: see assign_pallas_float.
    """
    _, Hp, Wp = planes3.shape
    n_strips = Hp // rows
    CR = _strip_rows_cr(GH, S, stride, rows)
    spf = 0
    if frames > 1:
        assert n_strips % frames == 0
        spf = n_strips // frames

    # per-strip cell-row gather (cell granularity: n_strips * CR indexed
    # rows of C*GW, a few thousand rows — NOT a pixel-scale gather)
    rem_i = rem.astype(jnp.int32)
    idx = _strip_gather_idx(n_strips, rows, stride, rem_i, S, GH, CR, spf)
    nf = len(cell_fields)        # 6 classic (y,x,r,g,b,id) / 5 merged-yx
    merged = nf == 5
    stack = jnp.stack(cell_fields, 0)                 # [nf, B*GH, C*GW]
    strips = stack[:, idx, :]                         # [nf, n_strips, CR, C*GW]

    strip = pl.BlockSpec((rows, Wp), lambda i: (i, 0))
    cells = pl.BlockSpec((1, CR, C * GW), lambda i: (i, 0, 0))
    scal = jnp.stack([coef.astype(jnp.float32),
                      rem_i.astype(jnp.float32)])
    occ_s = _occupancy_strips(strips[nf - 1], C)

    kernel = functools.partial(
        _assign_kernel, S=S, GH=GH, GW=GW, C=C, CR=CR, rows=rows,
        stride=stride, W_real=W, H_real=H, manhattan=manhattan, spf=spf,
        merged=merged, yx_off=yx_off)
    out_a, out_d = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [cells] * nf +
                 [strip, strip, strip, strip],
        out_specs=(strip, strip),
        out_shape=(jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((rows, Wp), jnp.int32),
                        pltpu.VMEM((rows, Wp), jnp.int32)],
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(scal, occ_s, *(strips[i] for i in range(nf)),
      planes3[0], planes3[1], planes3[2], old_assign)
    return out_a, out_d


def prepare_feat_fields(cand, cent):
    """cand [GH, GW, C] int32, cent [K, F] f32 -> F f32 [GH, C*GW] arrays
    (LSC centroid feature channels, laid out like prepare_cell_fields)."""
    GH, GW, C = cand.shape
    safe = jnp.maximum(jnp.swapaxes(cand, 1, 2), 0)   # [GH, C, GW]
    cdata = cent[safe]                                # [GH, C, GW, F]

    def fold(a):
        return a.reshape(GH, C * GW).astype(jnp.float32)

    return tuple(fold(cdata[..., i]) for i in range(cent.shape[-1]))


_INVALID_Y = 65000.0  # empty-slot y: defeats every |di| <= S window test
                      # (requires H + S < 65000; byte halves 253/232 are
                      # bf16-exact, so the split expansion stays exact)


def prepare_cell_fields_batched(cand, table):
    """Frame-grid batch variant of :func:`prepare_cell_fields`:
    cand [B, GH, GW, C] int32 (frame-local ids), table [B, K, 5] f32 ->
    6 f32 [B*GH, C*GW] stacked fields (the layout assign_pallas_* expects
    with frames=B).  The id field carries FRAME-LOCAL cluster ids."""
    B, GH, GW, C = cand.shape
    K = table.shape[1]
    cand_t = jnp.swapaxes(cand, 2, 3)              # [B, GH, C, GW]
    safe = jnp.maximum(cand_t, 0)
    offs = (jnp.arange(B, dtype=jnp.int32) * K)[:, None, None, None]
    cdata = table.reshape(B * K, 5)[safe + offs]   # [B, GH, C, GW, 5]
    valid = cand_t >= 0

    def fold(a):
        return a.reshape(B * GH, C * GW).astype(jnp.float32)

    fields = [fold(jnp.where(valid, cdata[..., 0], _INVALID_Y))]
    fields += [fold(cdata[..., i]) for i in range(1, 5)]
    fields.append(fold(cand_t.astype(jnp.float32)))
    return tuple(fields)


def prepare_feat_fields_batched(cand, cent):
    """Frame-grid batch variant of :func:`prepare_feat_fields`:
    cand [B, GH, GW, C], cent [B, K, F] -> F f32 [B*GH, C*GW] arrays."""
    B, GH, GW, C = cand.shape
    K, F = cent.shape[1], cent.shape[-1]
    safe = jnp.maximum(jnp.swapaxes(cand, 2, 3), 0)
    offs = (jnp.arange(B, dtype=jnp.int32) * K)[:, None, None, None]
    cdata = cent.reshape(B * K, F)[safe + offs]

    def fold(a):
        return a.reshape(B * GH, C * GW).astype(jnp.float32)

    return tuple(fold(cdata[..., i]) for i in range(F))


def prepare_cell_fields(cand, table, yx_sentinel=None):
    """cand [GH, GW, C] int32, table [K, 5] f32 -> 6 f32 [GH, C*GW] arrays
    (y, x, r, g, b, id) — or, with ``yx_sentinel = (y_off, sentinel)``
    set, 5 arrays (yx, r, g, b, id) where
    yx = (trunc(y) + y_off)*2048 + trunc(x) (< 2^24; y_off = S+2 keeps
    slightly-negative shard-local y packable) and empty slots carry
    ``sentinel`` = (H + 2S + 2 + y_off)*2048, whose unpacked row fails the
    |di| <= S window test for every real row.  The merged
    layout serves the STANDARD kernel only (it exclusively uses int-cast
    centers, so pre-truncation is exact) and saves one expansion matmul
    per strip and per slot (3-byte split vs two 2-byte splits).

    In the classic layout empty slots carry y = _INVALID_Y, which fails
    the spatial window test in every variant — no separate validity field
    (one fewer expansion matmul + compare per candidate slot)."""
    GH, GW, C = cand.shape
    cand_t = jnp.swapaxes(cand, 1, 2)           # [GH, C, GW]
    safe = jnp.maximum(cand_t, 0)
    cdata = table[safe]                         # [GH, C, GW, 5]
    valid = cand_t >= 0

    def fold(a):
        return a.reshape(GH, C * GW).astype(jnp.float32)

    if yx_sentinel is not None:
        y_off, sent = yx_sentinel
        yx = ((jnp.trunc(cdata[..., 0]) + float(y_off)) * 2048.0
              + jnp.trunc(cdata[..., 1]))
        fields = [fold(jnp.where(valid, yx, float(sent)))]
        fields += [fold(cdata[..., i]) for i in range(2, 5)]
        fields.append(fold(cand_t.astype(jnp.float32)))
        return tuple(fields)

    fields = [fold(jnp.where(valid, cdata[..., 0], _INVALID_Y))]
    fields += [fold(cdata[..., i]) for i in range(1, 5)]
    fields.append(fold(cand_t.astype(jnp.float32)))
    return tuple(fields)

