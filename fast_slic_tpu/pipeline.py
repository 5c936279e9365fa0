"""The TPU-native SLIC pipeline: one fused XLA graph per configuration.

Design (vs the reference, ``/root/reference/src/context.cpp:109-197``):

* The reference's *scatter*-style assignment (each cluster writes its +-S
  window, with a 4-phase checkerboard to avoid write races,
  context.cpp:214-242) is inverted into a *gather*-style argmin: clusters are
  bucketed into S-sized cells, every pixel considers the <= 9*P candidate
  clusters from the 3x3 neighborhood of its cell, and takes a masked argmin.
  No write conflicts exist by construction, which is what makes the kernel
  trivially data-parallel on a TPU (and over a device mesh).
* ``update`` (thread-local K-bin histograms merged under a critical section,
  context.cpp:302-387) becomes a segment-sum.
* The whole ``iterate`` — CIELAB conversion, max_iter x (assign, update),
  full_assign, connectivity enforcement — is traced into a single jit
  program; nothing round-trips to the host between phases.

Tie-breaking reproduces the reference exactly: candidates are ordered by the
reference's 4-phase visit order (visit_order_key) and the first-visited
cluster wins equal distances, so the quantized path is bit-identical to the
reference scalar arch (validated against a build of the unmodified reference
C++ on the full-size fish image — see scripts/compare_vs_reference.py).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .cluster import Clusters
from .config import (
    StaticConfig,
    UNASSIGNED,
    VARIANT_STANDARD,
    VARIANT_REAL,
    VARIANT_REAL_L2,
    VARIANT_REAL_NOQ,
    VARIANT_LSC,
)
from .ops.cielab import rgb_to_lab_quantized
from .ops.cca import enforce_connectivity_xla_flagged
from .ops import lsc as lsc_ops

_U32_MAX = jnp.uint32(0xFFFFFFFF)
_F32_MAX = jnp.float32(np.finfo(np.float32).max)



def _nofma(x):
    """Block mul+add contraction (FMA) so float sums round exactly like the
    reference C (and the numpy oracle): a*b+c contracted to fma(a,b,c) skips
    the intermediate rounding and flips argmin winners at ties.

    lax.optimization_barrier is NOT enough: inside lowered loops LLVM still
    contracts the adjacent fmul/fadd.  Routing the product through a
    float minimum breaks the pattern structurally (fmin cannot be folded
    away without value knowledge) at the cost of one cheap VPU op, and works
    identically on CPU and TPU backends."""
    return jnp.minimum(x, _F32_MAX)

def cell_grid_shape(cfg: StaticConfig):
    S = cfg.S
    return -(-cfg.H // S), -(-cfg.W // S)


def visit_order_key(y, x, cfg: StaticConfig):
    """Per-cluster visit rank reproducing the reference's assignment order.

    The reference processes clusters in 4 checkerboard phases of
    (2S+32)-sized cells (context.cpp:214-242): phase p covers cells with
    (row%2, col%2) == (p/2, p%2), and within a cell clusters are visited in
    ascending number.  On equal distances the *first-visited* cluster keeps
    the pixel (strict > compare, context.cpp:290), so ties are decided by
    this order.  Two clusters whose +-S windows can overlap always sit in
    different phases (same-phase cells are >= 2S+64 apart), hence the order
    reduces to the lexicographic key (phase, cluster_number) — which this
    returns as a single int32 key = phase*K + k.
    """
    S, K = cfg.S, cfg.K
    T = 2 * S + 32
    yi = y.astype(jnp.int32)
    if cfg.is_canvas:
        # frame-local coordinates: each stacked frame must reproduce its
        # standalone phase pattern (cluster centroids never leave their
        # frame's rows, so y % pitch is the frame-local row)
        yi = yi % cfg.canvas_pitch
    ci = yi // T
    cj = (x.astype(jnp.int32) // T)
    phase = 2 * (ci % 2) + (cj % 2)
    return phase * K + jnp.arange(K, dtype=jnp.int32)


def build_candidates(y, x, is_active, cfg: StaticConfig, key=None):
    """Build per-cell candidate lists: for every S-cell, the clusters whose
    center lies in its 3x3 cell neighborhood, *sorted by visit order* (see
    visit_order_key) so that ties can be broken by slot index.  Any cluster
    whose center is within +-S of a pixel in cell (ci, cj) lies in that
    neighborhood — the same locality fact the reference's checkerboard
    partition exploits (context.cpp:214-221), used gather-side here.
    Returns (int32 [GH, GW, cand_slots] of cluster ids, -1 = empty slot;
    bool overflow flag).

    Scatter-side formulation: each cluster is replicated into the (up to 9)
    cells whose candidate list it belongs to, the [9K] (cell, visit-key)
    pairs are sorted lexicographically by ONE two-key sort, and the within-
    cell rank (a cand_slots-wide shifted-compare window over the now-
    contiguous same-cell runs) gives each entry its slot.  This replaces the
    earlier gather-side pipeline (bucket K into per-cell P-lists, pad,
     9-neighbor concat to [GH, GW, 9P], THEN sort the 9P slots per cell —
    the dominant candidate-build cost, and at canvas scale a B-times-taller
    sort).  The output is identical: the within-cell visit-key order is
    produced directly by the lexicographic sort, and the slot capacity is
    cand_slots with no intermediate per-cell capacity to overflow.

    Overflow (> cand_slots real candidates for some cell) is flagged so the
    caller can re-run with a larger capacity; the run's output ranks the
    first-visited cand_slots candidates, dropping the latest-visited —
    deterministic, and strictly fewer drop cases than the old two-stage
    capacity (which could drop a candidate whose own cell held > P clusters
    even when every neighborhood list had room).
    """
    GH, GW = cell_grid_shape(cfg)
    S, K = cfg.S, cfg.K
    C = cfg.cand_slots
    num_cells = GH * GW

    ci = jnp.clip(y.astype(jnp.int32) // S, 0, GH - 1)
    cj = jnp.clip(x.astype(jnp.int32) // S, 0, GW - 1)

    if key is None:
        key = visit_order_key(y, x, cfg)
    # (spatial shards pass a key computed from GLOBAL coordinates so the
    # reference's phase pattern survives the row shift)

    active = is_active != 0
    # one [9, K] broadcast per quantity instead of 9 separate [K] op chains
    # — candidate building's cost is dispatch-floor op count, not elements
    di9 = jnp.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.int32)[:, None]
    dj9 = jnp.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.int32)[:, None]
    ni = ci[None, :] + di9                             # [9, K]
    nj = cj[None, :] + dj9
    ok = (active[None, :] & (ni >= 0) & (ni < GH)
          & (nj >= 0) & (nj < GW))
    cell9 = jnp.where(ok, ni * GW + nj, num_cells).reshape(-1)   # [9K]
    key9 = jnp.broadcast_to(key[None, :], (9, K)).reshape(-1)

    # Lexicographic (cell, visit-key) sort as ONE composite-key sort: the
    # visit key is < 4K, so cell*4K + key orders identically to the 2-key
    # lex sort at half the sort-network operand traffic.  Composite keys
    # are unique for valid entries (a cluster appears at most once per
    # cell), so the order is deterministic without stability.
    span = 4 * K
    if (num_cells + 1) * span < 2 ** 31:
        comp_key = jax.lax.sort(cell9 * span + key9)
        sc = comp_key // span
        okey = comp_key % span
    else:  # pragma: no cover - needs a ~10^5-cell grid
        sc, okey = jax.lax.sort((cell9, key9), num_keys=2)
    M = int(sc.shape[0])
    # within-cell rank: same-cell entries are contiguous after the sort, so
    # rank = index - (index of the run's first entry), the latter a running
    # max over run-start indices — 3 ops instead of a C-step compare window
    iota = jnp.arange(M, dtype=jnp.int32)
    run_start = jnp.concatenate(
        [jnp.ones([1], bool), sc[1:] != sc[:-1]])
    rank = iota - jax.lax.cummax(jnp.where(run_start, iota, 0))

    valid = sc < num_cells
    kept = valid & (rank < C)
    overflow = jnp.any(valid & (rank >= C))
    target = jnp.where(kept, sc * C + rank, num_cells * C)
    # The visit key is phase*K + cluster_number, so the cluster id is
    # recoverable as key % K — scatter the key and derive ids, instead of
    # carrying ids as a second payload.
    ckey = jnp.full([num_cells * C + 1], jnp.int32(2 ** 30)
                    ).at[target].set(okey)
    ckey = ckey[:-1].reshape(GH, GW, C)
    cand = jnp.where(ckey < 2 ** 30, ckey % K, -1)
    return cand, overflow


def _expand_cells(a, cfg: StaticConfig):
    """[GH, GW, ...] -> per-pixel [H, W, ...] by repeating each cell S times."""
    S = cfg.S
    a = jnp.repeat(a, S, axis=0)[: cfg.H]
    a = jnp.repeat(a, S, axis=1)[:, : cfg.W]
    return a


class AssignResult(NamedTuple):
    assignment: jnp.ndarray  # int32 [H, W], UNASSIGNED where unset
    min_dists: jnp.ndarray   # DistType [H, W] (reset each pass, recorder only)


class IterateOut(NamedTuple):
    labels: jnp.ndarray          # int32 [H, W], -1 = unassigned
    clusters: "Clusters"         # final centroid state
    min_dists: jnp.ndarray       # last full-assign distances
    snaps: object                # debug recorder snapshots or None
    raw_assignment: jnp.ndarray  # pre-CCA assignment (int32, UNASSIGNED ok)
    cca_tie: jnp.ndarray         # bool: host CCA re-run needed for bit-parity
    cand_overflow: jnp.ndarray   # bool: candidate capacity exceeded; re-run
                                 # with a larger cand_slots


class DerivedScalars(NamedTuple):
    """Runtime scalars derived host-side with the exact float ops of the
    reference C code.  XLA backends are allowed 1-ulp-off divisions (the CPU
    backend's 1/12.2f differs from IEEE), which flips truncated distance
    LUT values at exact quantization boundaries — so anything involving a
    division or libm rounding is computed in numpy (IEEE, matching C) and
    fed into the graph as data.
    """

    coef: np.float32       # spatial coefficient (context.cpp:24-25)
    c_spatial: np.float32  # LSC C_color * compactness/100 (lsc.cpp:27-28)
    thres: np.int32        # CCA area threshold (context.cpp:16)
    l1_thres: np.float32   # preemptive movement threshold (preemptive.h:126)
    lsc_tables: object = None  # host-built trig LUTs for the LSC variant


def derive_scalars(cfg: StaticConfig, compactness, min_size_factor,
                   preemptive_thres) -> DerivedScalars:
    S = cfg.S
    color_shift = 1 if cfg.convert_to_lab else 0
    c = np.float32(compactness)
    coef = (np.float32(1.0) / (np.float32(S) / c)) * np.float32(1 << color_shift)
    c_spatial = np.float32(20.0) * (c / np.float32(100.0))
    # (int)round((double)(S*S) * (double)msf): half away from zero
    thres = np.int32(math.floor(float(S * S) * float(min_size_factor) + 0.5))
    # my_max(roundf(2*S*thres), 1.0f)
    l1 = float(np.float32(2 * S) * np.float32(preemptive_thres))
    l1_thres = np.float32(max(math.floor(l1 + 0.5), 1.0))
    tables = (lsc_ops.trig_tables(cfg, compactness)
              if cfg.variant == VARIANT_LSC else None)
    return DerivedScalars(coef, c_spatial, thres, l1_thres, tables)


def assign_xla(planes, st: Clusters, cand, cfg: StaticConfig, coef,
               old_assignment, rem, stride,
               lsc_feats=None, lsc_cent=None) -> AssignResult:
    """One assign() pass over all pixels (context.cpp:200-298 and variants).

    planes: int32 [3, H, W] planar quad image.  cand: [GH, GW, 9P]
    candidate ids.  rem/stride are static ints; rows with i % stride != rem
    keep their old assignment (context.h:89-91).
    """
    H, W, S, K = cfg.H, cfg.W, cfg.S, cfg.K
    variant = cfg.variant
    nslots = cand.shape[-1]

    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    # Candidate data is gathered ONCE at cell granularity ([GH, GW, 9P]
    # indices — a few tens of KB) and then expanded to pixels with
    # jnp.repeat, which is a broadcast, not a gather.  Pixel-granularity
    # gathers ([H, W] indices) inside the fused slot loop are catastrophic
    # on TPU (~2.5ms each; the whole assign pass was 90-1200ms depending on
    # the table layout).
    table = jnp.stack([st.y, st.x, st.r, st.g, st.b], axis=1)  # [K, 5] f32
    safe_cand = jnp.maximum(cand, 0)
    cdata = table[safe_cand]                     # [GH, GW, 9P, 5]
    if lsc_cent is not None:
        lsc_cdata = lsc_cent[safe_cand]          # [GH, GW, 9P, 10]

    quantized = variant == VARIANT_STANDARD

    def slot_data(s):
        ids = _expand_cells(cand[:, :, s], cfg)          # [H, W] int32
        valid = ids >= 0
        c = _expand_cells(cdata[:, :, s, :], cfg)        # [H, W, 5]
        lc = (_expand_cells(lsc_cdata[:, :, s, :], cfg)
              if lsc_cent is not None else None)         # [H, W, 10]
        return ids, valid, lc, c

    def window_and_spatial(c, valid):
        """Window mask + spatial distance for patch-LUT variants
        (set_spatial_patch, context.cpp:23-40 / 435-445)."""
        cy = c[..., 0].astype(jnp.int32)   # int16 casts, context.cpp:266
        cx = c[..., 1].astype(jnp.int32)
        di = ii - cy
        dj = jj - cx
        inwin = valid & (jnp.abs(di) <= S) & (jnp.abs(dj) <= S)
        if variant == VARIANT_REAL_L2:
            fy = coef * di.astype(jnp.float32)
            fx = coef * dj.astype(jnp.float32)
            sp = _nofma(fy * fy) + _nofma(fx * fx)
        elif cfg.manhattan_spatial_dist:
            sp = coef * (jnp.abs(di) + jnp.abs(dj)).astype(jnp.float32)
        else:
            dif = di.astype(jnp.float32)
            djf = dj.astype(jnp.float32)
            sp = coef * jnp.sqrt(_nofma(dif * dif) + _nofma(djf * djf))
        return inwin, sp

    p0 = planes[0]
    p1 = planes[1]
    p2 = planes[2]
    if lsc_feats is not None:
        # oracle path works in interleaved [H, W, 10] (features are planar
        # [10, H, W] everywhere else; this is the slow reference arch)
        lsc_feats = jnp.moveaxis(lsc_feats, 0, -1)

    # Ties break by candidate slot index == reference visit order
    # (build_candidates sorts slots by visit_order_key).
    assert nslots < 128, "slot index must fit in 7 bits"

    def slot_to_cluster(slot, got):
        """Map winning slot back to a cluster id — as a select chain over the
        (cell-expanded) candidate lists, never a pixel-granularity gather."""
        out = jnp.full((H, W), UNASSIGNED, jnp.int32)
        for s in range(nslots):
            ids = _expand_cells(cand[:, :, s], cfg)
            out = jnp.where(got & (slot == s) & (ids >= 0), ids, out)
        return out

    if quantized:
        def body(s, m):
            ids, valid, _, c = slot_data(s)
            inwin, sp = window_and_spatial(c, valid)
            sp_q = jnp.trunc(sp).astype(jnp.int32)  # (uint16) cast of the LUT
            cd = (jnp.abs(p0 - c[..., 2].astype(jnp.int32))
                  + jnp.abs(p1 - c[..., 3].astype(jnp.int32))
                  + jnp.abs(p2 - c[..., 4].astype(jnp.int32)))
            dist = (sp_q + cd).astype(jnp.uint32)
            packed = (dist << 7) | jnp.uint32(s)
            return jnp.minimum(m, jnp.where(inwin, packed, _U32_MAX))

        m = jnp.full([H, W], _U32_MAX, jnp.uint32)
        # unrolled: all slot bodies fuse into one (or few) XLA loops, reading
        # the pixel planes once instead of once per slot
        for s_i in range(nslots):
            m = body(s_i, m)
        got = m != _U32_MAX
        new_assign = slot_to_cluster((m & 0x7F).astype(jnp.int32), got)
        new_dist = (m >> 7).astype(jnp.int32)
        min_dists_reset = jnp.int32(0xFFFF)
    else:
        def body(s, carry):
            md, ms = carry
            ids, valid, lc, c = slot_data(s)
            if variant == VARIANT_LSC:
                cy = c[..., 0].astype(jnp.int32)
                cx = c[..., 1].astype(jnp.int32)
                inwin = valid & (jnp.abs(ii - cy) <= S) & (jnp.abs(jj - cx) <= S)
                diff = lsc_feats - lc
                dist = jnp.sum(_nofma(diff * diff), axis=-1)
            elif variant == VARIANT_REAL_NOQ:
                cy = c[..., 0]
                cx = c[..., 1]
                # trunc-toward-zero bounds (context.cpp:471-472)
                y_lo = jnp.maximum(jnp.trunc(cy - S).astype(jnp.int32), 0)
                y_hi = jnp.minimum(jnp.trunc(cy + S + 1).astype(jnp.int32), H)
                x_lo = jnp.maximum(jnp.trunc(cx - S).astype(jnp.int32), 0)
                x_hi = jnp.minimum(jnp.trunc(cx + S + 1).astype(jnp.int32), W)
                inwin = valid & (ii >= y_lo) & (ii < y_hi) & (jj >= x_lo) & (jj < x_hi)
                dr = p0.astype(jnp.float32) - c[..., 2]
                dg = p1.astype(jnp.float32) - c[..., 3]
                db = p2.astype(jnp.float32) - c[..., 4]
                dy = coef * (ii.astype(jnp.float32) - cy)
                dx = coef * (jj.astype(jnp.float32) - cx)
                if cfg.manhattan_spatial_dist:
                    dist = (jnp.abs(dr) + jnp.abs(dg) + jnp.abs(db)
                            + jnp.abs(dx) + jnp.abs(dy))
                else:
                    dist = (_nofma(dr * dr) + _nofma(dg * dg)
                            + _nofma(db * db) + _nofma(dx * dx)
                            + _nofma(dy * dy))
            else:  # real / real_l2: int-cast centers, patch spatial
                inwin, sp = window_and_spatial(c, valid)
                cr = c[..., 2].astype(jnp.int32)
                cg = c[..., 3].astype(jnp.int32)
                cb = c[..., 4].astype(jnp.int32)
                if variant == VARIANT_REAL_L2:
                    dr = (p0 - cr).astype(jnp.float32)
                    dg = (p1 - cg).astype(jnp.float32)
                    db = (p2 - cb).astype(jnp.float32)
                    dist = (sp + _nofma(dr * dr)
                            + _nofma(dg * dg) + _nofma(db * db))
                else:
                    cd = (jnp.abs(p0 - cr) + jnp.abs(p1 - cg)
                          + jnp.abs(p2 - cb)).astype(jnp.float32)
                    dist = _nofma(sp) + cd

            dist = jnp.where(inwin, dist, _F32_MAX)
            # slots are visit-ordered: the first slot to reach a value wins
            # ties, matching the reference's strict '>' compare.
            better = inwin & (dist < md)
            return (jnp.where(better, dist, md), jnp.where(better, s, ms))

        md = jnp.full([H, W], _F32_MAX, jnp.float32)
        ms = jnp.full([H, W], -1, jnp.int32)
        carry = (md, ms)
        for s_i in range(nslots):
            carry = body(s_i, carry)
        md, ms = carry
        got = ms >= 0
        new_assign = slot_to_cluster(ms, got)
        new_dist = md
        min_dists_reset = _F32_MAX

    rowmask = (ii % stride) == rem
    write = rowmask & got
    assignment = jnp.where(write, new_assign, old_assignment)
    min_dists = jnp.where(write, new_dist, min_dists_reset)
    return AssignResult(assignment, min_dists)


def segment_sum_matmul(ids, vals, num_segments: int, max_val: int):
    """Exact integer segment-sum: ids int32 [N] in [0, num_segments], vals
    int32 [N, V] with 0 <= vals <= max_val < 2^16.  Returns int32
    [num_segments + 1, V].

    Implemented as a Pallas kernel (pallas/segsum_tpu.py): TPU scatter-adds
    serialize, and the XLA one-hot einsum materializes the [N, K] one-hot in
    HBM when unfused (~30 GB/frame measured).  The kernel builds each tile's
    one-hot in VMEM and runs exact bf16 hi/lo matmuls on the MXU — the TPU
    analog of the reference's thread-local accumulators + critical merge
    (context.cpp:309-354).
    """
    if max_val >= (1 << 16):
        raise ValueError(
            "segment_sum_matmul requires values < 2**16 (byte-split bf16 "
            "matmuls stay exact); got max_val=%d. For pixel ids, split into "
            "more sub-16-bit parts (see ops/cca.py leader packing)."
            % max_val)
    if jax.default_backend() != "tpu":
        # CPU/GPU: native scatter-add is fast and exact; interpret-mode
        # Pallas would crawl
        N, V = vals.shape
        return jnp.zeros([num_segments + 1, V], jnp.int32).at[ids].add(vals)
    from .pallas.segsum_tpu import segment_sum_pallas
    out = segment_sum_pallas(ids, jnp.transpose(vals), num_segments, False)
    return jnp.transpose(out)


def _pad_planes_for_pallas(planes, cfg: StaticConfig, dtype=jnp.int32,
                           planar: bool = True):
    """[ch, H, W] (planar=True) or [H, W, ch] -> [ch, Hp, Wp] padded for
    the 64-row strip kernels."""
    H, W = cfg.H, cfg.W
    if not planar:
        planes = jnp.moveaxis(planes, -1, 0)
    ch = planes.shape[0]
    Hp = -(-H // 64) * 64
    Wp = -(-W // 128) * 128
    p = jnp.zeros((ch, Hp, Wp), dtype)
    return p.at[:, :H, :W].set(planes.astype(dtype))


def _use_pallas_assign(cfg: StaticConfig) -> bool:
    from .config import ARCH_PALLAS
    return (cfg.arch == ARCH_PALLAS and cfg.variant == VARIANT_STANDARD)


def _use_pallas_assign_float(cfg: StaticConfig) -> bool:
    from .config import ARCH_PALLAS
    return (cfg.arch == ARCH_PALLAS and cfg.variant in (
        VARIANT_REAL, VARIANT_REAL_L2, VARIANT_REAL_NOQ, VARIANT_LSC))


def _use_pallas_any(cfg: StaticConfig) -> bool:
    return _use_pallas_assign(cfg) or _use_pallas_assign_float(cfg)


def _subsample_stack(stack, Hp_units, H, stride, rem, zero):
    """[ch, Hp, Wp] -> [ch, Hsp, Wp] holding only rows r*stride+rem, padded
    to a 64-row multiple (the strip kernels' subsampled-row layout)."""
    ch, Hp, Wp = stack.shape
    Hs = -(-H // stride)
    Hv = Hs * stride
    if Hv > Hp:
        stack = jnp.concatenate(
            [stack, jnp.full((ch, Hv - Hp, Wp), zero, stack.dtype)], 1)
    else:
        stack = stack[:, :Hv, :]
    sub = jax.lax.dynamic_index_in_dim(
        stack.reshape(ch, Hs, stride, Wp), rem, axis=2, keepdims=False)
    Hsp = -(-Hs // 64) * 64
    return jnp.concatenate(
        [sub, jnp.full((ch, Hsp - Hs, Wp), zero, sub.dtype)], axis=1), Hs


def run_assign_kernel(p3, fp3, old_p, st, cand, cfg, coef, rem, stride,
                      lsc_cent=None):
    """Invoke the Pallas assign kernel on (already padded/sliced) planes.

    p3 int32 [3, Hp', Wp] (full or subsampled-row layout), fp3 LSC feature
    planes or None, old_p int32 [Hp', Wp].  Returns (assignment, min_dists)
    at [Hp', Wp]."""
    from .pallas.assign_tpu import (MERGE_YX, assign_pallas_standard,
                                    assign_pallas_float,
                                    prepare_cell_fields,
                                    prepare_feat_fields)
    GH, GW = cell_grid_shape(cfg)
    table = jnp.stack([st.y, st.x, st.r, st.g, st.b], axis=1)
    # merged-yx candidate layout (standard variant only — it exclusively
    # uses int-cast centers): one field yx = (trunc(y)+S+2)*2048 + trunc(x)
    # expands in a 3-byte split instead of two 2-byte splits.  The +S+2
    # offset keeps spatially-sharded callers' slightly-negative local y
    # packable; guards keep the packed value < 2^24 and x in 11 bits.
    y_off = cfg.S + 2
    merge_ok = (MERGE_YX and _use_pallas_assign(cfg) and not cfg.is_canvas
                and (cfg.H + 2 * cfg.S + 2 + y_off) < 2048
                and cfg.W < 2048)
    if merge_ok:
        sentinel = (cfg.H + 2 * cfg.S + 2 + y_off) * 2048
        fields = prepare_cell_fields(cand, table, (y_off, sentinel))
    else:
        fields = prepare_cell_fields(cand, table)
    interp = jax.default_backend() != "tpu"
    common = dict(S=cfg.S, GH=GH, GW=GW, C=cand.shape[-1], H=cfg.H, W=cfg.W,
                  manhattan=cfg.manhattan_spatial_dist, interpret=interp)
    if _use_pallas_assign(cfg):
        return assign_pallas_standard(
            p3, old_p, fields, jnp.asarray(coef, jnp.float32),
            jnp.asarray(rem, jnp.int32), stride,
            yx_off=(y_off if merge_ok else 0), **common)
    feat_fields = (prepare_feat_fields(cand, lsc_cent)
                   if cfg.variant == VARIANT_LSC else None)
    return assign_pallas_float(
        p3, fp3, old_p, fields, feat_fields,
        jnp.asarray(coef, jnp.float32), jnp.asarray(rem, jnp.int32),
        stride, variant=cfg.variant, **common)


def assign_dispatch(planes, planes3_padded, st, cand, cfg, coef,
                    old_assignment, rem, stride, lsc_feats=None,
                    lsc_cent=None, feats_padded=None) -> AssignResult:
    """Route one assign pass to the Pallas kernels (fast arch) or the XLA
    oracle path.  All paths are bit-compatible per variant."""
    if _use_pallas_any(cfg) and planes3_padded is not None:
        H, W = cfg.H, cfg.W
        Hp, Wp = planes3_padded.shape[1], planes3_padded.shape[2]
        quantized = _use_pallas_assign(cfg)
        dist_fill = 0xFFFF if quantized else _F32_MAX
        dist_dtype = jnp.int32 if quantized else jnp.float32

        def run(p3, fp3, old_p, stride_i):
            return run_assign_kernel(p3, fp3, old_p, st, cand, cfg, coef,
                                     rem, stride_i, lsc_cent)

        if isinstance(stride, int) and stride > 1:
            # compute only the subsampled rows (3x less kernel work for the
            # default stride); scatter the strip back afterwards
            p3_sub, Hs = _subsample_stack(planes3_padded, Hp, H, stride,
                                          rem, 0)
            fp3_sub = None
            if feats_padded is not None:
                fp3_sub, _ = _subsample_stack(feats_padded, Hp, H, stride,
                                              rem, 0.0)
            Hv = Hs * stride
            Hsp = p3_sub.shape[1]
            old_v = jnp.concatenate(
                [old_assignment,
                 jnp.full((Hv - H, W), UNASSIGNED, old_assignment.dtype)], 0)
            old3 = old_v.reshape(Hs, stride, W)
            old_sub = jax.lax.dynamic_index_in_dim(old3, rem, axis=1,
                                                   keepdims=False)
            old_sub_p = jnp.full((Hsp, Wp), UNASSIGNED, jnp.int32
                                 ).at[:Hs, :W].set(old_sub)
            a, d = run(p3_sub, fp3_sub, old_sub_p, stride)
            new3 = old3.at[:, rem, :].set(a[:Hs, :W])
            assignment = new3.reshape(Hv, W)[:H]
            if cfg.debug_mode:
                dist_full = jnp.full((Hs, stride, W), dist_fill, dist_dtype
                                     ).at[:, rem, :].set(d[:Hs, :W])
                min_dists = dist_full.reshape(Hv, W)[:H]
            else:
                # stride-pass distances are recorder-only (the reference
                # resets them every pass); skip the full-size scatter-back
                min_dists = jnp.full((H, W), dist_fill, dist_dtype)
            return AssignResult(assignment, min_dists)

        old_p = jnp.full((Hp, Wp), UNASSIGNED, jnp.int32
                         ).at[:H, :W].set(old_assignment)
        a, d = run(planes3_padded, feats_padded, old_p, int(stride))
        return AssignResult(a[:H, :W], d[:H, :W])
    return assign_xla(planes, st, cand, cfg, coef, old_assignment, rem,
                      stride, lsc_feats, lsc_cent)


def update_xla(planes, assignment, st: Clusters, cfg: StaticConfig,
               rem, stride, pixel_mask=None) -> Clusters:
    """update(): masked segment-sum of [1, i, j, r, g, b] per cluster, then
    (round_int-)means for updatable clusters (context.cpp:302-387)."""
    acc = update_accumulate(planes, assignment, cfg, rem, stride, pixel_mask)
    return update_apply_means(acc, st, cfg)


def update_accumulate(planes, assignment, cfg: StaticConfig, rem, stride,
                      pixel_mask=None):
    """The reduction half of update(): int32 [K, 6] per-cluster sums of
    (count, i, j, r, g, b) over this array's pixels.  Spatial shards sum
    their locals and psum (parallel/spatial_shardmap.py) — the TPU analog
    of the reference's thread-local accumulators + critical merge
    (context.cpp:309-354)."""
    H, W, K = cfg.H, cfg.W, cfg.K
    on_tpu = jax.default_backend() == "tpu"

    if isinstance(stride, int) and stride > 1:
        # only rows with i % stride == rem contribute: slice them out instead
        # of masking (3x less segment-sum work for the default stride)
        Hs = -(-H // stride)
        pad = Hs * stride - H
        a3 = jnp.concatenate(
            [assignment, jnp.full((pad, W), UNASSIGNED, assignment.dtype)], 0
        ).reshape(Hs, stride, W)
        a_sub = jax.lax.dynamic_index_in_dim(a3, rem, axis=1, keepdims=False)
        p3 = jnp.concatenate(
            [planes, jnp.zeros((3, pad, W), planes.dtype)], 1
        ).reshape(3, Hs, stride, W)
        p_sub = jax.lax.dynamic_index_in_dim(p3, rem, axis=2, keepdims=False)
        mask = a_sub != UNASSIGNED
        if pixel_mask is not None:
            m3 = jnp.concatenate(
                [pixel_mask, jnp.zeros((pad, W), pixel_mask.dtype)], 0
            ).reshape(Hs, stride, W)
            mask = mask & jax.lax.dynamic_index_in_dim(
                m3, rem, axis=1, keepdims=False)
        a_eff, p_eff, eff_stride = a_sub, p_sub, stride
    else:
        ii0 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        mask = ((ii0 % stride) == rem) & (assignment != UNASSIGNED)
        if pixel_mask is not None:
            mask = mask & pixel_mask
        a_eff, p_eff, eff_stride = assignment, planes, 1

    if on_tpu and isinstance(eff_stride, int):
        # fused kernel: builds [count, i, j, r, g, b] per pixel in VMEM
        # (pallas/segsum_tpu.slic_update_pallas) — no [N, 6] value tensor in
        # HBM.  Masked pixels keep their (valid) cluster id with a zero mask
        # so the hi-bucket band guard stays tight even under preemptive
        # masking; never-assigned pixels go to the dropped bin K.
        from .pallas.segsum_tpu import slic_update_pallas
        ids2 = jnp.where(a_eff != UNASSIGNED, a_eff, K).ravel()
        rem_i = (jnp.asarray(rem, jnp.int32) if eff_stride > 1
                 else jnp.zeros((), jnp.int32))
        acc6 = slic_update_pallas(
            ids2, mask.astype(jnp.int32).ravel(),
            p_eff[0].ravel(), p_eff[1].ravel(),
            p_eff[2].ravel(), rem_i, K, W, eff_stride, False)
        acc = jnp.transpose(acc6)[:K]
    else:
        Hv = a_eff.shape[0]
        ii = (jax.lax.broadcasted_iota(jnp.int32, (Hv, W), 0) * eff_stride
              + (rem if eff_stride > 1 else 0))
        jj = jax.lax.broadcasted_iota(jnp.int32, (Hv, W), 1)
        ids = jnp.where(mask, a_eff, K).ravel()
        vals = jnp.stack(
            [mask.astype(jnp.int32), ii, jj,
             p_eff[0], p_eff[1], p_eff[2]], axis=-1,
        ).reshape(-1, 6)
        acc = segment_sum_matmul(ids, vals, K, max(H, W, 256))[:K]
    return acc


def update_accumulate_presliced(p_sub, a_sub, cfg: StaticConfig, rem,
                                stride: int, mask_sub=None):
    """update_accumulate for pre-sliced subsampled inputs (the resident-
    subsampled loop): p_sub int32 [3, Hs, W] (pad rows zero), a_sub int32
    [Hs, W] with pad/spacer rows already UNASSIGNED.  Row r is absolute
    image row r*stride + rem.

    Returns (counts [K] i32, sums [5, K] i32) in the segsum kernel's
    native row layout (no [K, 6] transpose on the hot path)."""
    K, W = cfg.K, cfg.W
    mask = a_sub != UNASSIGNED
    if mask_sub is not None:
        mask = mask & mask_sub
    if jax.default_backend() == "tpu":
        from .pallas.segsum_tpu import slic_update_pallas
        ids2 = jnp.where(a_sub != UNASSIGNED, a_sub, K).ravel()
        acc6 = slic_update_pallas(
            ids2, mask.astype(jnp.int32).ravel(),
            p_sub[0].ravel(), p_sub[1].ravel(),
            p_sub[2].ravel(), jnp.asarray(rem, jnp.int32), K, W,
            stride, False)
        return acc6[0, :K], acc6[1:6, :K]
    Hs = a_sub.shape[0]
    ii = (jax.lax.broadcasted_iota(jnp.int32, (Hs, W), 0) * stride + rem)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Hs, W), 1)
    ids = jnp.where(mask, a_sub, K).ravel()
    vals = jnp.stack(
        [mask.astype(jnp.int32), ii, jj,
         p_sub[0], p_sub[1], p_sub[2]], axis=-1,
    ).reshape(-1, 6)
    acc = segment_sum_matmul(ids, vals, K, max(cfg.H, W, 256))[:K]
    return acc[:, 0], jnp.transpose(acc[:, 1:])


def update_apply_means(acc, st: Clusters, cfg: StaticConfig) -> Clusters:
    """The means half of update(): centroid (round_int-)means for updatable
    clusters from the [K, 6] accumulators (context.cpp:356-387)."""
    return update_apply_means_rows(acc[:, 0], jnp.transpose(acc[:, 1:]),
                                   st, cfg)


def update_apply_means_rows(counts, sums, st: Clusters,
                            cfg: StaticConfig) -> Clusters:
    """update_apply_means on row-layout accumulators: counts [K] i32,
    sums [5, K] i32 ordered (i, j, r, g, b)."""
    quantized = cfg.variant != VARIANT_REAL_NOQ

    upd = st.is_updatable != 0
    num_members = jnp.where(upd, counts.astype(jnp.uint32), st.num_members)
    safe = jnp.maximum(counts, 1)
    if quantized:
        means = ((sums + (safe // 2)[None, :]) // safe[None, :]).astype(jnp.float32)
    else:
        means = sums.astype(jnp.float32) / safe[None, :].astype(jnp.float32)
    sel = upd & (counts > 0)
    return Clusters(
        y=jnp.where(sel, means[0], st.y),
        x=jnp.where(sel, means[1], st.x),
        r=jnp.where(sel, means[2], st.r),
        g=jnp.where(sel, means[3], st.g),
        b=jnp.where(sel, means[4], st.b),
        num_members=num_members,
        is_active=st.is_active,
        is_updatable=st.is_updatable,
    )


def _clamp_centers(st: Clusters, cfg: StaticConfig) -> Clusters:
    """Safeguard clamp at the top of assign() (context.cpp:209-212)."""
    return Clusters(
        y=jnp.clip(st.y, 0.0, cfg.H - 1),
        x=jnp.clip(st.x, 0.0, cfg.W - 1),
        r=st.r, g=st.g, b=st.b,
        num_members=st.num_members,
        is_active=st.is_active,
        is_updatable=st.is_updatable,
    )


_PREEMPTIVE_COOLDOWN = 2  # preemptive.h:32


def _preemptive_step(st: Clusters, old_y, old_x, cfg: StaticConfig,
                     l1_thres):
    """PreemptiveGrid::set_new_clusters (preemptive.h:114-178).

    Decrements the per-cluster cooldown when the center moved less than
    max(round(2*S*thres), 1) in L1, re-activates every cluster within L-inf
    2S of a still-updatable cluster, and returns the active-pixel mask (the
    2S-cell grid of preemptive.h expanded to pixels).

    Uses a K x K pairwise test instead of the reference's cell buckets —
    exact same predicate (the 3x3 cell walk is just a pruning of the
    |dy|<=2S && |dx|<=2S check, preemptive.h:150-164).  O(K^2) but K is a
    few thousand in practice.
    """
    S = cfg.S
    upd = st.is_updatable > 0
    moved = jnp.abs(old_x - st.x) + jnp.abs(old_y - st.y)
    new_updatable = jnp.where(
        upd,
        jnp.where(moved < l1_thres, st.is_updatable - 1, _PREEMPTIVE_COOLDOWN),
        st.is_updatable,
    )
    upd2 = new_updatable > 0
    # int-cast centers before the nearness test: the reference reads
    # `int y = cluster->y` (preemptive.h:150-164), so non-integer centroids
    # (real-dist variants) truncate before the |dy| <= 2S compare.
    yi = jnp.trunc(st.y)
    xi = jnp.trunc(st.x)
    B = cfg.canvas_frames
    if cfg.is_canvas:
        # canvas mode: nearness is block-diagonal per frame (clusters of
        # different frames can be < 2S apart across the spacer but must not
        # re-activate each other); pitch % 2S == 0 keeps the cell grid
        # frame-aligned (enforced by make_canvas_config)
        Kf = cfg.frame_K
        yb = yi.reshape(B, Kf)
        xb = xi.reshape(B, Kf)
        ub = upd2.reshape(B, Kf)
        near = ((jnp.abs(yb[:, :, None] - yb[:, None, :]) <= 2 * S)
                & (jnp.abs(xb[:, :, None] - xb[:, None, :]) <= 2 * S))
        is_active = jnp.any(near & ub[:, :, None], axis=1).astype(jnp.int32)
        all_active_f = jnp.all(is_active == 1, axis=1)      # [B]
        is_active = is_active.reshape(-1)
        # per-frame all_active expanded to pitch rows of the canvas
        all_active_rows = jnp.repeat(all_active_f, cfg.canvas_pitch,
                                     total_repeat_length=cfg.H)[:, None]
    else:
        dy = jnp.abs(yi[:, None] - yi[None, :])
        dx = jnp.abs(xi[:, None] - xi[None, :])
        near = (dy <= 2 * S) & (dx <= 2 * S)          # [k, n]
        is_active = jnp.any(near & upd2[:, None], axis=0).astype(jnp.int32)
        all_active_rows = jnp.all(is_active == 1)

    # active 2S-cell grid -> pixel mask
    CH = -(-cfg.H // (2 * S))
    CW = -(-cfg.W // (2 * S))
    cy = jnp.clip(st.y.astype(jnp.int32) // (2 * S), 0, CH - 1)
    cx = jnp.clip(st.x.astype(jnp.int32) // (2 * S), 0, CW - 1)
    cell = cy * CW + cx
    grid = jnp.zeros([CH * CW], jnp.int32).at[cell].max(is_active)
    grid = grid.reshape(CH, CW) > 0
    px = jnp.repeat(jnp.repeat(grid, 2 * S, 0)[: cfg.H], 2 * S, 1)[:, : cfg.W]
    px = px | all_active_rows

    st = Clusters(
        y=st.y, x=st.x, r=st.r, g=st.g, b=st.b,
        num_members=st.num_members,
        is_active=is_active,
        is_updatable=new_updatable,
    )
    return st, px


def _mask_spacer(assignment, cfg: StaticConfig):
    """Canvas mode: spacer rows must never hold assignments (cluster windows
    of the frame above/below can cover them, and a spacer assignment would
    leak into the centroid update — see parallel/canvas.py)."""
    if not cfg.is_canvas:
        return assignment
    frame_row = (jax.lax.broadcasted_iota(jnp.int32, (cfg.H, 1), 0)
                 % cfg.canvas_pitch)
    return jnp.where(frame_row < cfg.canvas_frame_h, assignment, UNASSIGNED)


def stage_setup(image, st: Clusters, cfg: StaticConfig,
                scalars: DerivedScalars):
    """cielab conversion + cluster color re-seed + LSC feature build +
    preemptive-grid init (context.cpp:114-157)."""
    H, W, K = cfg.H, cfg.W, cfg.K
    # planes are CHANNEL-PLANAR int32 [3, H, W] throughout the pipeline:
    # that is the layout the padded kernel planes, the update kernel's
    # channel vectors and the oracle path all want, and it lets the LAB
    # kernel's output unpack be a reshape instead of an interleave pass.
    if cfg.convert_to_lab:
        if jax.default_backend() == "tpu":
            # fused Pallas conversion: the XLA gather form executes its six
            # table lookups serially in composed programs (~48ms/720p frame)
            from .pallas.lut_tpu import rgb_to_lab_planar
            planes = rgb_to_lab_planar(image)
        else:
            planes = jnp.moveaxis(rgb_to_lab_quantized(image), -1, 0)
    else:
        planes = jnp.moveaxis(image.astype(jnp.int32), -1, 0)

    # re-seed cluster colors from the quad image (context.cpp:128-135).
    # Flat 1-D indexing: the 2-D advanced-index form (planes[c, cy, cx])
    # lowers to a serial ~0.65 us/element gather on TPU (~25 ms at canvas
    # scale); the flat row gather runs at the ~8 ns/element serial rate.
    cyi = jnp.clip(st.y.astype(jnp.int32), 0, H - 1)
    cxi = jnp.clip(st.x.astype(jnp.int32), 0, W - 1)
    seed_cols = planes.reshape(3, -1)[:, cyi * W + cxi]
    # preemptive_grid.initialize (preemptive.h:59-67): runs regardless of the
    # `preemptive` flag — is_updatable is reset to the cooldown for everyone.
    st = Clusters(
        y=st.y, x=st.x,
        r=seed_cols[0, :].astype(jnp.float32),
        g=seed_cols[1, :].astype(jnp.float32),
        b=seed_cols[2, :].astype(jnp.float32),
        num_members=st.num_members,
        is_active=st.is_active,
        is_updatable=jnp.full([K], _PREEMPTIVE_COOLDOWN, jnp.int32),
    )

    lsc_feats = lsc_cent = lsc_w = None
    if cfg.variant == VARIANT_LSC:
        lsc_feats, lsc_w = lsc_ops.features(planes, cfg, scalars.lsc_tables)
        lsc_cent = lsc_ops.seed_centroids(lsc_feats, st, cfg)
    return planes, st, (lsc_feats, lsc_w, lsc_cent)


# Force the unrolled (static-rem) loop off-TPU — used by tests to exercise
# the resident-subsampled loop in interpret mode.
_FORCE_UNROLL = False
# A/B switch for profiling: fall back to the plain full-resolution loop.
_DISABLE_SUBRESIDENT = False


def _stage_loop_subresident(planes, st: Clusters, lsc_state,
                            cfg: StaticConfig, scalars: DerivedScalars,
                            max_iter: int, stride: int, planes3_padded,
                            feats_padded):
    """The iteration loop with loop state kept in SUBSAMPLED row space.

    The reference's subsampling means iteration i only reads and writes
    rows r*stride + rem (context.h:89-91, context.cpp:271,316).  The plain
    loop nevertheless kept a full [H, W] assignment: every iteration sliced
    the planes and old assignment down to the rem rows, ran the kernel, and
    scattered the strip back — ~1 ms/frame of pure data movement at 720p.
    Here the carry is one resident [Hsp, Wp] assignment plane PER REMAINDER
    (plus per-rem loop-invariant plane slices hoisted out of the loop), so
    an iteration is exactly: candidates -> assign kernel -> update segsum.
    The full-resolution assignment is interleaved ONCE after the loop.
    Bit-identical to the plain loop (same kernels, same masks; asserted by
    tests/test_pipeline.py::test_subresident_loop_matches_scan).

    Only used when the loop is unrolled (static rem) and the Pallas arch is
    active; debug_mode (per-iteration recorder snapshots) uses the plain
    loop.
    """
    H, W = cfg.H, cfg.W
    coef = jnp.asarray(scalars.coef, jnp.float32)
    lsc_feats, lsc_w, lsc_cent = lsc_state
    Hp, Wp = planes3_padded.shape[1], planes3_padded.shape[2]
    Hs = -(-H // stride)
    pad = Hs * stride - H

    # per-rem loop-invariant slices (computed once, reused every iteration)
    p3_subs, fp3_subs, p_subs, mask3 = [], [], [], None
    pv = jnp.concatenate([planes, jnp.zeros((3, pad, W), planes.dtype)], 1
                         ).reshape(3, Hs, stride, W)
    for rem in range(stride):
        p3s, _ = _subsample_stack(planes3_padded, Hp, H, stride, rem, 0)
        p3_subs.append(p3s)
        if feats_padded is not None:
            fp3s, _ = _subsample_stack(feats_padded, Hp, H, stride, rem, 0.0)
            fp3_subs.append(fp3s)
        else:
            fp3_subs.append(None)
        p_subs.append(pv[:, :, rem])
    Hsp = p3_subs[0].shape[1]

    # static row-validity masks: pad rows (absolute >= H) and canvas spacer
    # rows must never contribute to the update
    valid_rows, n_reals = [], []
    for rem in range(stride):
        abs_r = np.arange(Hs) * stride + rem
        ok = abs_r < H
        if cfg.is_canvas:
            ok = ok & ((abs_r % cfg.canvas_pitch) < cfg.canvas_frame_h)
        valid_rows.append(jnp.asarray(ok[:, None]))
        n_reals.append(int(-(-(H - rem) // stride)))

    a_subs = [jnp.full((Hsp, Wp), UNASSIGNED, jnp.int32)
              for _ in range(stride)]
    pixel_mask = jnp.ones([H, W], bool)
    cov_acc = jnp.bool_(False)

    # padded-direct update: the segsum kernel consumes the assign kernel's
    # PADDED output and the padded plane stacks directly (validity/ids/ii
    # derived in-kernel) — the old path materialized a masked a_upd plane
    # plus a [8, N] value pack (~10 MB of HBM writes) per iteration
    use_padded_update = (jax.default_backend() == "tpu"
                         and not cfg.preemptive and not cfg.is_canvas
                         and cfg.variant != VARIANT_LSC)

    for i in range(max_iter):
        rem = i % stride
        st = _clamp_centers(st, cfg)
        cand, cov = build_candidates(st.y, st.x, st.is_active, cfg)
        cov_acc = cov_acc | cov
        a_new, _ = run_assign_kernel(p3_subs[rem], fp3_subs[rem],
                                     a_subs[rem], st, cand, cfg, coef, rem,
                                     stride, lsc_cent)
        a_subs[rem] = a_new
        old_y, old_x = st.y, st.x  # set_old_clusters (context.cpp:303)
        if use_padded_update:
            from .pallas.segsum_tpu import slic_update_padded_pallas
            acc6 = slic_update_padded_pallas(
                a_new, p3_subs[rem], jnp.asarray(rem, jnp.int32),
                jnp.zeros((), jnp.int32), cfg.K, Wp, W, n_reals[rem],
                stride, False)
            counts, sums = acc6[0, :cfg.K], acc6[1:6, :cfg.K]
        else:
            a_upd = jnp.where(valid_rows[rem], a_new[:Hs, :W], UNASSIGNED)
            mask_sub = None
            if cfg.preemptive:
                pm = jnp.concatenate(
                    [pixel_mask, jnp.zeros((pad, W), bool)], 0
                ).reshape(Hs, stride, W)
                mask_sub = pm[:, rem]
            counts, sums = update_accumulate_presliced(
                p_subs[rem], a_upd, cfg, rem, stride, mask_sub)
        st = update_apply_means_rows(counts, sums, st, cfg)
        if cfg.variant == VARIANT_LSC:
            lsc_cent = lsc_ops.after_update(
                lsc_feats, lsc_w, st, lsc_cent, cfg, rem, stride, None,
                None, assignment_sub=a_upd[:n_reals[rem]],
                pixel_mask_sub=(mask_sub[:n_reals[rem]]
                                if mask_sub is not None else None))
        if cfg.preemptive:
            st, pixel_mask = _preemptive_step(
                st, old_y, old_x, cfg,
                jnp.asarray(scalars.l1_thres, jnp.float32))

    # interleave the per-rem planes back to full resolution (once)
    full = jnp.stack([a_subs[r][:Hs, :W] for r in range(stride)], axis=1)
    assignment = full.reshape(Hs * stride, W)[:H]
    assignment = _mask_spacer(assignment, cfg)
    return st, assignment, lsc_cent, cov_acc, None


def stage_loop(planes, st: Clusters, lsc_state, cfg: StaticConfig,
               scalars: DerivedScalars, max_iter: int, stride: int):
    """max_iter x (assign, update) with row subsampling + rotating remainder
    (context.cpp:158-175), as one lax.scan."""
    H, W = cfg.H, cfg.W
    coef = jnp.asarray(scalars.coef, jnp.float32)
    lsc_feats, lsc_w, lsc_cent = lsc_state
    planes3_padded = (_pad_planes_for_pallas(planes, cfg)
                      if _use_pallas_any(cfg) else None)
    feats_padded = (_pad_planes_for_pallas(lsc_feats, cfg, jnp.float32)
                    if _use_pallas_any(cfg) and cfg.variant == VARIANT_LSC
                    else None)

    unroll_early = jax.default_backend() == "tpu" or _FORCE_UNROLL
    if (unroll_early and not _DISABLE_SUBRESIDENT and _use_pallas_any(cfg)
            and isinstance(stride, int)
            and stride > 1 and not cfg.debug_mode):
        return _stage_loop_subresident(planes, st, lsc_state, cfg, scalars,
                                       max_iter, stride, planes3_padded,
                                       feats_padded)

    pixel_mask = jnp.ones([H, W], bool)
    assignment = jnp.full([H, W], UNASSIGNED, jnp.int32)
    dist_reset = 0xFFFF if cfg.variant == VARIANT_STANDARD else _F32_MAX
    dist_dtype = jnp.int32 if cfg.variant == VARIANT_STANDARD else jnp.float32
    min_dists = jnp.full([H, W], dist_reset, dist_dtype)

    snap0 = (assignment, min_dists, st) if cfg.debug_mode else None

    # Main loop: on TPU the iterations are UNROLLED so each one sees its
    # remainder as a python int — subsample row slicing and the rem masks
    # become static strided slices instead of per-iteration dynamic-index
    # ops (measured 21% off the whole 10-iteration loop at canvas scale).
    # On CPU (the test backend) a lax.scan keeps compile times sane; the
    # traced body computes identical values from a traced rem.
    unroll = jax.default_backend() == "tpu"
    rems = jnp.array([i % stride for i in range(max_iter)], jnp.int32)

    def loop_body(carry, rem):
        st, assignment, pixel_mask, lsc_cent_c, cov_acc = carry
        st = _clamp_centers(st, cfg)
        cand, cov = build_candidates(st.y, st.x, st.is_active, cfg)
        cov_acc = cov_acc | cov
        res = assign_dispatch(planes, planes3_padded, st, cand, cfg, coef,
                              assignment, rem, stride, lsc_feats, lsc_cent_c,
                              feats_padded)
        assignment, min_dists = res
        assignment = _mask_spacer(assignment, cfg)
        old_y, old_x = st.y, st.x  # set_old_clusters (context.cpp:303)
        st = update_xla(planes, assignment, st, cfg, rem, stride,
                        pixel_mask if cfg.preemptive else None)
        if cfg.variant == VARIANT_LSC:
            lsc_cent_c = lsc_ops.after_update(
                lsc_feats, lsc_w, st, lsc_cent_c, cfg, rem, stride,
                assignment, pixel_mask if cfg.preemptive else None)
        if cfg.preemptive:
            st, pixel_mask = _preemptive_step(
                st, old_y, old_x, cfg,
                jnp.asarray(scalars.l1_thres, jnp.float32))
        out = (assignment, min_dists, st) if cfg.debug_mode else None
        return (st, assignment, pixel_mask, lsc_cent_c, cov_acc), out

    carry = (st, assignment, pixel_mask, lsc_cent, jnp.bool_(False))
    if unroll:
        snap_list = []
        for i in range(max_iter):
            carry, out = loop_body(carry, i % stride)
            if cfg.debug_mode:
                snap_list.append(out)
        scan_snaps = (jax.tree.map(lambda *xs: jnp.stack(xs), *snap_list)
                      if cfg.debug_mode and snap_list else None)
    else:
        carry, scan_snaps = jax.lax.scan(loop_body, carry, rems)
    (st, assignment, pixel_mask, lsc_cent, cand_overflow) = carry

    snaps = None
    if cfg.debug_mode:
        a0, d0, st0 = snap0
        sa, sd, sst = scan_snaps
        snaps = (
            tuple(range(-1, max_iter)),
            jnp.concatenate([a0[None], sa]),
            jnp.concatenate([d0[None], sd]),
            jax.tree.map(lambda x0, xs: jnp.concatenate([x0[None], xs]),
                         st0, sst),
        )
    return st, assignment, lsc_cent, cand_overflow, snaps


def stage_full_assign(planes, st: Clusters, lsc_state, lsc_cent, assignment,
                      cfg: StaticConfig, scalars: DerivedScalars):
    """preemptive finalize + full_assign at stride 1 (context.cpp:176-181)."""
    coef = jnp.asarray(scalars.coef, jnp.float32)
    lsc_feats, lsc_w, _ = lsc_state
    planes3_padded = (_pad_planes_for_pallas(planes, cfg)
                      if _use_pallas_any(cfg) else None)
    feats_padded = (_pad_planes_for_pallas(lsc_feats, cfg, jnp.float32)
                    if _use_pallas_any(cfg) and cfg.variant == VARIANT_LSC
                    else None)
    # preemptive_grid.finalize (preemptive.h:69-74): everyone active again
    st = Clusters(
        y=st.y, x=st.x, r=st.r, g=st.g, b=st.b,
        num_members=st.num_members,
        is_active=jnp.ones([cfg.K], jnp.int32),
        is_updatable=st.is_updatable,
    )
    st = _clamp_centers(st, cfg)
    cand, cov = build_candidates(st.y, st.x, st.is_active, cfg)
    res = assign_dispatch(planes, planes3_padded, st, cand, cfg, coef,
                          assignment, 0, 1, lsc_feats, lsc_cent,
                          feats_padded)
    assignment, min_dists = res
    assignment = _mask_spacer(assignment, cfg)
    return st, assignment, min_dists, cov


def stage_cca(assignment, cfg: StaticConfig, scalars: DerivedScalars):
    """enforce_connectivity (context.cpp:15-20, cca.cpp:178-265)."""
    if cfg.is_canvas:
        from .ops.cca import enforce_connectivity_canvas_flagged
        labels, cca_tie = enforce_connectivity_canvas_flagged(
            assignment, cfg.frame_K, cfg.canvas_frames, cfg.canvas_pitch,
            cfg.canvas_frame_h, jnp.asarray(scalars.thres, jnp.int32),
            cfg.frame_max_components, cfg.S)
    else:
        labels, cca_tie = enforce_connectivity_xla_flagged(
            assignment, cfg.K, jnp.asarray(scalars.thres, jnp.int32),
            cfg.effective_max_components, S=cfg.S)
    return jnp.where(labels == UNASSIGNED, -1, labels), cca_tie


def _check_canvas_stride(cfg: StaticConfig, stride: int):
    if cfg.is_canvas and cfg.canvas_pitch % stride:
        raise ValueError(
            "canvas pitch %d must be a multiple of subsample_stride %d "
            "(build the config with make_canvas_config(stride=...))"
            % (cfg.canvas_pitch, stride))


def iterate_graph(image, st: Clusters, cfg: StaticConfig,
                  scalars: DerivedScalars, max_iter: int, stride: int):
    """The full iterate() pipeline as one traceable function.

    image: uint8 [H, W, 3].  Returns (labels int32 [H, W] with -1 for
    unassigned, final Clusters, min_dists of the last full assign, and — when
    cfg.debug_mode — stacked per-iteration recorder snapshots).

    The body is composed from the stage_* functions above so the runner can
    alternatively compile each phase separately and report real per-phase
    device timings (utils/timing.py; reference src/context.cpp:112-194).
    """
    _check_canvas_stride(cfg, stride)
    planes, st, lsc_state = stage_setup(image, st, cfg, scalars)
    st, assignment, lsc_cent, cand_overflow, snaps = stage_loop(
        planes, st, lsc_state, cfg, scalars, max_iter, stride)
    st, assignment, min_dists, cov = stage_full_assign(
        planes, st, lsc_state, lsc_cent, assignment, cfg, scalars)
    cand_overflow = cand_overflow | cov
    labels, cca_tie = stage_cca(assignment, cfg, scalars)
    return IterateOut(labels, st, min_dists, snaps, assignment, cca_tie,
                      cand_overflow)


@functools.lru_cache(maxsize=128)
def compiled_iterate(cfg: StaticConfig, max_iter: int, stride: int):
    """jit-compiled iterate for a given static configuration."""

    def fn(image, clusters, scalars):
        return iterate_graph(image, clusters, cfg, scalars, max_iter, stride)

    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def compiled_phases(cfg: StaticConfig, max_iter: int, stride: int):
    """Phase-split compilation: one jit per pipeline phase, so the runner
    can block between phases and report real per-phase device durations
    under the reference's timing schema (src/context.cpp:112-194;
    src/timer.h:66-74).  Slower than the fused program (host sync per
    phase) — used when debug/profiling is requested."""
    _check_canvas_stride(cfg, stride)

    def f_setup(image, st, scalars):
        return stage_setup(image, st, cfg, scalars)

    def f_loop(planes, st, lsc_state, scalars):
        return stage_loop(planes, st, lsc_state, cfg, scalars, max_iter,
                          stride)

    def f_full(planes, st, lsc_state, lsc_cent, assignment, scalars):
        return stage_full_assign(planes, st, lsc_state, lsc_cent,
                                 assignment, cfg, scalars)

    def f_cca(assignment, scalars):
        return stage_cca(assignment, cfg, scalars)

    return (jax.jit(f_setup), jax.jit(f_loop), jax.jit(f_full),
            jax.jit(f_cca))


@functools.lru_cache(maxsize=16)
def compiled_profile_phases(cfg: StaticConfig, stride: int):
    """Per-iteration phase compilation for profile mode: separate jits for
    setup, buffer prep, one assign pass, one update, LSC after_update, the
    preemptive step, full_assign and CCA — so the runner can block between
    them and report REAL per-iteration ``assign``/``update`` device
    durations under the reference's section names
    (src/context.cpp:112-194, src/timer.h:66-74).  ``rem`` is a traced
    scalar, so all iterations share one executable per phase.  Outputs are
    bit-identical to the fused program (same ops, split at phase
    boundaries)."""

    def f_setup(image, st, scalars):
        return stage_setup(image, st, cfg, scalars)

    def f_prep(planes, lsc_feats):
        p3 = (_pad_planes_for_pallas(planes, cfg)
              if _use_pallas_any(cfg) else None)
        fp3 = (_pad_planes_for_pallas(lsc_feats, cfg, jnp.float32)
               if _use_pallas_any(cfg) and cfg.variant == VARIANT_LSC
               else None)
        assignment = jnp.full([cfg.H, cfg.W], UNASSIGNED, jnp.int32)
        return p3, fp3, assignment

    def f_assign(planes, p3, fp3, st, lsc_feats, lsc_cent, assignment,
                 scalars, rem):
        coef = jnp.asarray(scalars.coef, jnp.float32)
        st = _clamp_centers(st, cfg)
        cand, cov = build_candidates(st.y, st.x, st.is_active, cfg)
        res = assign_dispatch(planes, p3, st, cand, cfg, coef, assignment,
                              rem, stride, lsc_feats, lsc_cent, fp3)
        return st, _mask_spacer(res.assignment, cfg), cov

    def f_update(planes, assignment, st, scalars, rem, pixel_mask):
        return update_xla(planes, assignment, st, cfg, rem, stride,
                          pixel_mask if cfg.preemptive else None)

    def f_after(lsc_feats, lsc_w, st, lsc_cent, rem, assignment,
                pixel_mask):
        return lsc_ops.after_update(
            lsc_feats, lsc_w, st, lsc_cent, cfg, rem, stride, assignment,
            pixel_mask if cfg.preemptive else None)

    def f_preempt(st, old_y, old_x, scalars):
        return _preemptive_step(st, old_y, old_x, cfg,
                                jnp.asarray(scalars.l1_thres, jnp.float32))

    def f_full(planes, p3, fp3, st, lsc_feats, lsc_w, lsc_cent, assignment,
               scalars):
        return stage_full_assign(planes, st, (lsc_feats, lsc_w, None),
                                 lsc_cent, assignment, cfg, scalars)

    def f_cca(assignment, scalars):
        return stage_cca(assignment, cfg, scalars)

    return dict(setup=jax.jit(f_setup), prep=jax.jit(f_prep),
                assign=jax.jit(f_assign), update=jax.jit(f_update),
                after=jax.jit(f_after), preempt=jax.jit(f_preempt),
                full=jax.jit(f_full), cca=jax.jit(f_cca))


def run_iterate_profiled(cfg: StaticConfig, image, st: Clusters,
                         scalars: DerivedScalars, max_iter: int,
                         stride: int, timer):
    """Execute iterate() with PER-ITERATION ``assign``/``update`` (and
    ``after_update``) timer sections mirroring the reference's fstimer
    scopes (context.cpp:158-175) — decoupled from debug_mode (no recorder
    snapshots, no phase-blind default report).  Bit-identical outputs to
    iterate_graph.  Durations are host-observed around block_until_ready;
    on a locally attached TPU they are device phase durations (on the dev
    tunnel each sync adds the tunnel round-trip)."""
    fns = compiled_profile_phases(cfg, int(stride))
    block = jax.block_until_ready
    with timer.scope("cielab_conversion"):
        planes, st, lsc_state = block(fns["setup"](image, st, scalars))
    lsc_feats, lsc_w, lsc_cent = lsc_state
    with timer.scope("write_to_buffer"):
        p3, fp3, assignment = block(fns["prep"](planes, lsc_feats))
    pixel_mask = jnp.ones([cfg.H, cfg.W], bool)
    cov_np = False
    for i in range(max_iter):
        rem = jnp.int32(i % stride)
        with timer.scope("assign"):
            st, assignment, cov = block(fns["assign"](
                planes, p3, fp3, st, lsc_feats, lsc_cent, assignment,
                scalars, rem))
        cov_np = cov_np or bool(np.asarray(cov))
        old_y, old_x = st.y, st.x
        with timer.scope("update"):
            st = block(fns["update"](planes, assignment, st, scalars, rem,
                                     pixel_mask))
        if cfg.variant == VARIANT_LSC:
            with timer.scope("after_update"):
                lsc_cent = block(fns["after"](
                    lsc_feats, lsc_w, st, lsc_cent, rem, assignment,
                    pixel_mask))
        if cfg.preemptive:
            st, pixel_mask = block(fns["preempt"](st, old_y, old_x,
                                                  scalars))
    with timer.scope("full_assign"):
        st, assignment, min_dists, cov = block(fns["full"](
            planes, p3, fp3, st, lsc_feats, lsc_w, lsc_cent, assignment,
            scalars))
    cov_np = cov_np or bool(np.asarray(cov))
    with timer.scope("enforce_connectivity"):
        labels, cca_tie = block(fns["cca"](assignment, scalars))
    return IterateOut(labels, st, min_dists, None, assignment, cca_tie,
                      jnp.bool_(cov_np))


def run_iterate_phased(cfg: StaticConfig, image, st: Clusters,
                       scalars: DerivedScalars, max_iter: int, stride: int,
                       timer):
    """Execute iterate() phase by phase, timing each with
    block_until_ready.  Bit-identical outputs to iterate_graph (the phases
    ARE its body); phase names mirror the reference's fstimer sections
    (context.cpp:112-194)."""
    fns = compiled_phases(cfg, max_iter, stride)
    with timer.scope("cielab_conversion"):
        planes, st, lsc_state = jax.block_until_ready(
            fns[0](image, st, scalars))
    with timer.scope("iteration_loop"):
        st, assignment, lsc_cent, cand_overflow, snaps = (
            jax.block_until_ready(fns[1](planes, st, lsc_state, scalars)))
    with timer.scope("full_assign"):
        st, assignment, min_dists, cov = jax.block_until_ready(
            fns[2](planes, st, lsc_state, lsc_cent, assignment, scalars))
    with timer.scope("enforce_connectivity"):
        labels, cca_tie = jax.block_until_ready(
            fns[3](assignment, scalars))
    return IterateOut(labels, st, min_dists, snaps, assignment, cca_tie,
                      cand_overflow | cov)
