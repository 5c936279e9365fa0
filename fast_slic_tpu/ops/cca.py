"""Connectivity enforcement (CCA) as an iterative on-TPU label propagation.

The reference enforces that every output label is a single 4-connected blob
of area >= threshold using a sequential union-find with row-parallel seams
(``/root/reference/src/cca.cpp``).  Union-find is inherently sequential, so
the TPU version re-derives the same *result* with data-parallel primitives,
shaped by two measured TPU facts: gathers are fast only while the table
fits on-chip (<= ~64K entries), and scatter-adds serialize (~10ns/element).

1. components: every pixel starts as its own component (label = linear pixel
   index) and repeatedly takes the min over equal-SLIC-label 4-neighbors.
   Small images additionally use pointer jumping (``L <- L[L]``, a gather —
   cheap below the table-size cliff); large images instead use *segmented
   min scans* along rows and columns (associative_scan, gather-free), which
   propagate across an entire straight run per sweep so convergence is
   O(number of bends), not O(diameter).  At fixpoint each component is
   labeled by its minimum pixel index — exactly the "leader" the reference's
   min-parent union-find produces (cca.h:36-57).
2. components are renumbered compactly by leader order into [0, MAXC):
   ``nonzero(size=MAXC)`` + ``searchsorted`` — no big-table gathers.  Areas
   come from the one-hot-matmul segment sum (pipeline.segment_sum_matmul).
3. area thresholding, top-K-by-area selection, renumbering kept components
   sequentially in leader order (cca.cpp:212-238).
4. orphan adoption: a dropped component takes the substitute label of its
   leader's left (or up) neighbor (cca.cpp:240-254), resolved by pointer
   jumping over the [MAXC] component DAG.

Two rare cases are *flagged* for a bit-exact host re-run
(native.enforce_connectivity_native): component-area ties exactly at the
top-K boundary (where std::partial_sort's heap layout picks survivors), and
more than MAXC components (pathologically fragmented label maps).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UNASSIGNED

_BIG = jnp.int32(0x7FFFFFFF)

# Pointer-jump gathers stay fast while the [n] table is on-chip.
_JUMP_TABLE_LIMIT = 1 << 16


def _shifted(a, di, dj, fill):
    """Shift with edge fill via concat (jnp.pad lowers poorly on TPU)."""
    H, W = a.shape
    if di == -1:
        a = jnp.concatenate([jnp.full([1, W], fill, a.dtype), a[:-1]], 0)
    elif di == 1:
        a = jnp.concatenate([a[1:], jnp.full([1, W], fill, a.dtype)], 0)
    if dj == -1:
        a = jnp.concatenate([jnp.full([H, 1], fill, a.dtype), a[:, :-1]], 1)
    elif dj == 1:
        a = jnp.concatenate([a[:, 1:], jnp.full([H, 1], fill, a.dtype)], 1)
    return a


def _neighbor_min(L, labels):
    """Min over self + 4-neighbors with equal SLIC label."""
    out = L
    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nl = _shifted(labels, di, dj, -2)
        nL = _shifted(L, di, dj, _BIG)
        out = jnp.minimum(out, jnp.where(nl == labels, nL, _BIG))
    return out


def connected_components(labels, S=None, bounded_h=None,
                         content_bounded=None):
    """[H, W] SLIC labels -> [H, W] component ids = min linear pixel index.

    Small images: neighbor-min sweeps + pointer jumping (the [n] gather
    table stays on-chip).  Large images: the Pallas strip kernel with
    segmented doubling (pallas/cca_tpu.py) — big-table gathers and
    associative scans are both slow on TPU.  Pass the SLIC sampling
    interval S to cap the kernel's horizontal doubling reach at the
    component diameter (longer runs fall to extra fixpoint passes).
    bounded_h/content_bounded enable the provably-2-pass mode (see
    pallas/cca_tpu.propagate_min_pallas).
    """
    H, W = labels.shape
    n = H * W
    if n > _JUMP_TABLE_LIMIT and jax.default_backend() == "tpu":
        from ..pallas.cca_tpu import connected_components_pallas
        return connected_components_pallas(
            labels, reach=_slic_reach((H, W), S) if S else None,
            bounded_h=bounded_h, content_bounded=content_bounded)

    L0 = jnp.arange(n, dtype=jnp.int32).reshape(H, W)

    def sweep(L):
        L = _neighbor_min(L, labels)
        f = L.reshape(-1)
        f = f[f]
        f = f[f]
        return f.reshape(H, W)

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        L, _ = carry
        L2 = sweep(L)
        return (L2, jnp.any(L2 != L))

    L, _ = jax.lax.while_loop(cond, body, (L0, jnp.bool_(True)))
    return L


def enforce_connectivity_xla(assignment, K: int, min_threshold,
                             max_components: int | None = None,
                             S: int | None = None):
    """ConnectivityEnforcer::execute (cca.cpp:178-265), dense TPU version.

    assignment: int32 [H, W] (UNASSIGNED treated as a label of its own,
    matching the reference which runs CCA on raw uint16 labels).
    min_threshold: traced int32 scalar.
    Returns int32 [H, W] relabeled map.
    """
    labels, _ = enforce_connectivity_xla_flagged(
        assignment, K, min_threshold, max_components, S)
    return labels


def _cca_core(assignment, max_components: int | None, S: int | None):
    """The propagation + aggregation half of connectivity enforcement:
    [H, W] labels -> (comp_flat [n] per-pixel component ids, areas [maxc],
    orphan-adoption target [maxc], num_components, overflow flag, small,
    on_tpu).  Shared by the fused path (enforce_connectivity_xla_flagged)
    and the selection-only re-run path (cca_parts / cca_relabel)."""
    from ..pipeline import segment_sum_matmul
    from ..pallas.cca_tpu import propagate_min_pallas

    H, W = assignment.shape
    n = H * W
    maxc = min(n, max_components) if max_components else n
    small = n <= _JUMP_TABLE_LIMIT

    # Provably-2-pass propagation guard: every region of an ASSIGNED label
    # spans <= 2S+1 rows (the +-S window test bounds every pixel of label k
    # to k's window), so if no UNASSIGNED pixels exist, both propagations
    # below may skip their confirm sweep (propagate_min_pallas docstring).
    bounded_h = (2 * S + 1) if S else None
    content_bounded = (jnp.logical_not(jnp.any(assignment == UNASSIGNED))
                       if bounded_h is not None else None)

    L2 = connected_components(assignment, S, bounded_h, content_bounded)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    iota2 = ii * W + jj
    is_leader = L2 == iota2
    il = is_leader.astype(jnp.int32)

    # component number = rank of leader in row-major order (2-D prefix count)
    row_counts = jnp.sum(il, axis=1)
    row_offsets = jnp.cumsum(row_counts) - row_counts
    in_row = jnp.cumsum(il, axis=1) - il
    rank2 = row_offsets[:, None] + in_row               # exclusive prefix
    num_components = row_offsets[-1] + row_counts[-1]
    overflow = num_components > maxc

    # per-pixel component id: propagate the leader's rank over its component
    on_tpu = jax.default_backend() == "tpu"
    comp_seed = jnp.where(is_leader, jnp.minimum(rank2, maxc - 1), _BIG)
    if small or not on_tpu:
        comp2 = rank2.reshape(-1)[L2.reshape(-1)].reshape(H, W)
        comp2 = jnp.minimum(comp2, maxc - 1)
    else:
        comp2 = propagate_min_pallas(assignment, comp_seed,
                                     reach=_slic_reach(assignment.shape, S),
                                     bounded_h=bounded_h,
                                     content_bounded=content_bounded)
    comp_flat = comp2.reshape(-1)

    # areas + orphan-adoption target per component in ONE segment-sum.  The
    # target (component of the leader's left/up neighbor, cca.cpp:240-254)
    # is aggregated pixel-side: every pixel knows its left (or, at column 0,
    # up) neighbor's component id via two shifts, and the leader pixel
    # contributes that id to its own component's bin — this avoids the
    # [maxc]-sized gather from the pixel map, which executes serially
    # (~8 ns/element).  Values are split into sub-16-bit parts so the
    # byte-split bf16 matmuls stay exact.
    donor_comp = jnp.where(jj > 0, _shifted(comp2, 0, -1, 0),
                           _shifted(comp2, -1, 0, 0))
    vals = jnp.stack(
        [jnp.ones_like(il),
         jnp.where(is_leader, donor_comp >> 14, 0),
         jnp.where(is_leader, donor_comp & 16383, 0)], axis=-1).reshape(-1, 3)
    acc = segment_sum_matmul(comp_flat, vals, maxc,
                             max_val=max(n >> 16, 16383))[:maxc]
    areas = acc[:, 0]
    target = acc[:, 1] * 16384 + acc[:, 2]
    return (comp_flat, areas, target, num_components, overflow, small,
            on_tpu)


def cca_parts(assignment, max_components: int, S: int | None):
    """Device half of the selection-only tie re-run: [H, W] raw labels ->
    (comp_flat [n] int32 — keep ON DEVICE for cca_relabel — and the small
    arrays the host selection needs: areas [maxc], target [maxc],
    num_components).  See runner/batch tie escalation: when the top-K
    boundary-area tie flag fires, the EXACT survivor set is a sequential
    libstdc++ heap simulation (no closed form — NOTES.md round 5), so the
    host runs the selection on these ~KB-sized arrays and the relabel goes
    back through the device — instead of shipping the whole label map to a
    host CCA re-run."""
    comp_flat, areas, target, num_components, _, _, _ = _cca_core(
        assignment, max_components, S)
    return comp_flat, areas, target, num_components


def cca_relabel(comp_flat, substitute, shape):
    """labels = substitute[comp_flat], via the banded-lookup kernel on TPU
    (substitute is the host-computed exact table; UNASSIGNED maps through
    as provided)."""
    maxc = substitute.shape[0]
    if (comp_flat.shape[0] <= _JUMP_TABLE_LIMIT
            or jax.default_backend() != "tpu"):
        return substitute[comp_flat].reshape(shape)
    from ..pallas.segsum_tpu import banded_lookup_pallas
    return banded_lookup_pallas(comp_flat, substitute, maxc,
                                False).reshape(shape)


@functools.lru_cache(maxsize=32)
def _compiled_parts(H: int, W: int, maxc: int, S):
    def fn(raw):
        comp_flat, areas, target, ncomp = cca_parts(raw, maxc, S)
        small = jnp.concatenate([areas, target, ncomp.reshape(1)])
        return comp_flat, small          # ONE host fetch for the selection
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _compiled_relabel(H: int, W: int, maxc: int):
    def fn(comp_flat, substitute):
        return cca_relabel(comp_flat, substitute, (H, W))
    return jax.jit(fn)


def selection_rerun_device(raw_f, K: int, maxc: int, S, thres: int):
    """Exact tie-flag escalation WITHOUT a host CCA re-run: the device
    recomputes components/areas/targets from the raw assignment (labels
    stay on device), the host runs only the sequential selection
    (substitutes_np — the part with no data-parallel form) on two [maxc]
    arrays, and the corrected substitute table relabels on device.

    Returns device labels int32 [H, W] — or None when the frame has more
    than ``maxc`` components (the clamped ranks would corrupt areas; the
    caller falls back to the full native host CCA).

    Data moved per flagged frame: ~2 small device fetches (the [2*maxc+1]
    selection arrays) + one [maxc] upload, vs the old path's full [H, W]
    label-map download + 12.8 ms host union-find + full upload.
    """
    H, W = raw_f.shape
    comp_flat, small = _compiled_parts(H, W, maxc, S)(raw_f)
    small_np = np.asarray(small)
    ncomp = int(small_np[-1])
    if ncomp > maxc:
        return None
    sub = substitutes_np(small_np[:maxc], small_np[maxc:2 * maxc], ncomp,
                         K, thres)
    sub_full = np.zeros([maxc], np.int32)
    sub_full[:ncomp] = sub
    return _compiled_relabel(H, W, maxc)(comp_flat, jnp.asarray(sub_full))


def substitutes_np(areas, target, num_components: int, K: int,
                   min_threshold: int):
    """EXACT host selection half of ConnectivityEnforcer::execute
    (cca.cpp:212-264) from per-component arrays: area thresholding, the
    libstdc++ partial_sort survivor set (heap simulation — its tie behavior
    has no closed form), leader-order renumbering, the component-0 rule and
    orphan adoption through the target DAG.  Mirrors
    oracle.numpy_ref.enforce_connectivity_np's selection, which is pinned
    against the reference binary."""
    from ..oracle.numpy_ref import heap_select_topk

    nc = int(num_components)
    areas = np.asarray(areas)[:nc]
    target = np.asarray(target)[:nc]
    substitute = np.full([nc], UNASSIGNED, np.int64)
    comps = np.nonzero(areas >= min_threshold)[0]
    if comps.size > K:
        comps = np.sort(heap_select_topk(comps.tolist(), areas, K))
    substitute[comps] = np.arange(comps.size)
    if nc > 0 and substitute[0] == UNASSIGNED:
        substitute[0] = 0
    # ascending resolution: a donor's leader pixel precedes this leader, so
    # its component id is smaller and already resolved (cca.cpp:240-254)
    for c in range(nc):
        if substitute[c] != UNASSIGNED:
            continue
        subs = substitute[target[c]]
        substitute[c] = 0 if subs == UNASSIGNED else subs
    return substitute.astype(np.int32)


def enforce_connectivity_xla_flagged(assignment, K: int, min_threshold,
                                     max_components: int | None = None,
                                     S: int | None = None):
    """Like :func:`enforce_connectivity_xla` but also returns a bool scalar
    flagging the cases where this implementation can deviate from the
    reference (see module docstring): top-K boundary-area ties, or more than
    max_components components.  Callers wanting bit-parity re-run the host
    CCA (native.enforce_connectivity_native) when the flag fires.

    Implementation notes (all shaped by measured TPU behavior): NO
    pixel-granularity gathers/scatters, NO searchsorted/nonzero/top_k —
    those execute serially (~7 ns/element) inside composed programs.
    Components are numbered by a 2-D prefix count of leaders; per-pixel
    component ids and the final relabeling are *value propagations* over the
    same Pallas kernel that finds the components; areas/leaders come from
    the one-hot-matmul segment sum; and the top-K area cutoff is an
    elementwise binary search over the area value range.
    """
    comp_flat, areas, target, num_components, overflow, small, on_tpu = (
        _cca_core(assignment, max_components, S))
    H, W = assignment.shape
    n = H * W
    maxc = min(n, max_components) if max_components else n

    citoa = jnp.arange(maxc, dtype=jnp.int32)
    valid_comp = citoa < num_components
    kept_pre = valid_comp & (areas >= min_threshold)
    count_pre = jnp.sum(kept_pre.astype(jnp.int32))
    k = min(K, maxc)

    # K-th-largest-area threshold via elementwise binary search on the value
    # range: find minimal T with |{areas > T}| < k  (top_k lowers to a slow
    # serial sort at this scale)
    def cnt_gt(T):
        return jnp.sum((kept_pre & (areas > T)).astype(jnp.int32))

    def bs_body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        p = cnt_gt(mid) < k
        return jnp.where(p, lo, mid + 1), jnp.where(p, mid, hi)

    steps = max(1, math.ceil(math.log2(max(n + 1, 2))))
    lo, hi = jax.lax.fori_loop(
        0, steps, bs_body, (jnp.int32(0), jnp.int32(n)))
    T = lo
    n_gt = cnt_gt(T)
    fill = k - n_gt
    eq = kept_pre & (areas == T)
    eq_rank = jnp.cumsum(eq.astype(jnp.int32))          # inclusive
    kept = (kept_pre & (areas > T)) | (eq & (eq_rank <= fill))
    boundary_tie = (count_pre > k) & (fill < jnp.sum(eq.astype(jnp.int32)))

    substitute = jnp.where(
        kept, jnp.cumsum(kept.astype(jnp.int32)) - 1, UNASSIGNED
    ).astype(jnp.int32)
    # component 0 always gets a label (cca.cpp:238)
    substitute = substitute.at[0].set(jnp.where(kept[0], substitute[0], 0))
    # pad entries beyond num_components can never resolve through the
    # orphan DAG; park them at 0 so the jump loop's early exit can fire
    # (otherwise `any(sub == UNASSIGNED)` stays true for the whole log2
    # schedule — ~19 iterations of two [maxc] gathers each)
    substitute = jnp.where(valid_comp, substitute, 0)

    # orphan adoption: chains resolve through the target DAG (targets
    # strictly decrease in leader raster index; component 0 is always
    # labeled, so every chain terminates).  Real images resolve in 1-3
    # linear hops.  Pad entries' targets (empty segsum bins read 0) are
    # parked at SELF: a 0 target inside a block of high component ids
    # widens the banded-lookup chase band to [0, id] (the chase kernel's
    # cost is the band height, not the element count).
    target = jnp.where(citoa == 0, 0, target)
    target = jnp.where(valid_comp, target, citoa)
    substitute, unresolved = _resolve_orphans(substitute, target, maxc,
                                              small or not on_tpu)

    # final relabel: banded table lookup over the (coherent) component ids
    # — substitutes are < 2^16, the whole table fits VMEM, and no third
    # propagation or scatter is needed
    if small or not on_tpu:
        out = substitute[comp_flat].reshape(H, W)
    else:
        from ..pallas.segsum_tpu import banded_lookup_pallas
        out = banded_lookup_pallas(comp_flat, substitute, maxc,
                                   False).reshape(H, W)
    return out, boundary_tie | overflow | unresolved


_CHASE_LIMIT = 32


def _resolve_orphans(substitute, target, maxc: int, use_gathers: bool):
    """Resolve the orphan-adoption DAG: each UNASSIGNED entry takes the
    substitute of its target, iterated to fixpoint (cca.cpp:240-254).

    On TPU each [maxc] gather executes serially (~8 ns/element), so the
    chase steps run through the banded-lookup matmul kernel instead
    (targets are rank-local: the left/up neighbor of a leader has a nearby
    leader).  Chains are followed linearly — real images need 1-3 hops —
    bounded by _CHASE_LIMIT; a deeper chain (pathological orphan nesting)
    is flagged for the bit-exact host re-run instead of silently mislabeled.
    On CPU (and for small images) plain gathers with pointer doubling cover
    any chain length exactly.
    """
    if use_gathers:
        jump_steps = max(1, math.ceil(math.log2(max(maxc, 2))))

        def jump_cond(carry):
            sub, _, step = carry
            return (step < jump_steps) & jnp.any(sub == UNASSIGNED)

        def jump(carry):
            sub, t, step = carry
            sub = jnp.where(sub == UNASSIGNED, sub[t], sub)
            return sub, t[t], step + 1

        substitute, _, _ = jax.lax.while_loop(
            jump_cond, jump, (substitute, target, jnp.int32(0)))
        unresolved = jnp.bool_(False)  # doubling covers maxc-length chains
    else:
        from ..pallas.segsum_tpu import banded_lookup_pallas

        def chase_cond(carry):
            sub, step = carry
            return (step < _CHASE_LIMIT) & jnp.any(sub == UNASSIGNED)

        def chase(carry):
            sub, step = carry
            lk = banded_lookup_pallas(target, sub, maxc, False)
            return jnp.where(sub == UNASSIGNED, lk, sub), step + 1

        substitute, _ = jax.lax.while_loop(
            chase_cond, chase, (substitute, jnp.int32(0)))
        unresolved = jnp.any(substitute == UNASSIGNED)
    return jnp.where(substitute == UNASSIGNED, 0, substitute), unresolved


def enforce_connectivity_canvas_flagged(assignment, K_frame: int, B: int,
                                        pitch: int, frame_h: int,
                                        min_threshold,
                                        max_components: int, S: int):
    """Frame-aware CCA over a batched canvas (parallel/canvas.py) or a
    spacer-less frame stack (parallel/stack.py, pitch == frame_h).

    assignment: int32 [B*pitch, W]; frame f occupies rows
    [f*pitch, f*pitch + frame_h), labels in [f*K_frame, (f+1)*K_frame);
    spacer rows (if any) are UNASSIGNED.  With pitch == frame_h the frames
    abut: offset labels still never merge across frames, and the one
    cross-frame hazard — UNASSIGNED regions touching across the boundary —
    only affects frames that are flagged (unassigned_f) for host re-run
    anyway (frame-local segment ids are clipped so the kernel stays in
    range).  ``max_components`` is the PER-FRAME component cap (what a
    standalone frame would use).  Reproduces the
    per-frame semantics of ``enforce_connectivity_xla_flagged`` exactly:
    every frame is thresholded, top-K-selected and renumbered from 0
    independently, as if each had been processed standalone (reference
    cca.cpp:178-265 per frame).

    Components are numbered PER FRAME from the start: component id =
    f*MF + (leader rank within frame f), computable because the canvas row
    structure is static (frame id = row // pitch).  Every selection step
    (area threshold, per-frame top-K binary search, substitute numbering,
    first-component rule) then runs on [B, MF]-shaped arrays with axis-1
    reduces/cumsums — the single-frame math, vmapped — so the op count is
    independent of B (the previous formulation used O(B) select chains per
    step, which made canvas CCA bookkeeping scale with batch depth).

    Other structural facts (unchanged):

    * components never cross frames (labels differ; spacer rows carry
      chunked sentinel labels), so one connected-components pass over the
      whole canvas is exact;
    * a frame's first real component is the component of its pixel (0,0)
      (that pixel is the frame's smallest raster index), which receives the
      reference's "component 0 always gets a label" rule (cca.cpp:238);
    * orphan adoption targets (leader's left/up neighbor) stay within the
      frame, and chains terminate at the always-labeled first component.

    Returns (labels int32 [B*pitch, W] — values are per-frame substitute
    numbers; spacer rows garbage, callers crop — and flags bool [B]: frame
    needs a bit-exact host re-run: top-K boundary-area tie, unassigned
    pixels inside the frame, or per-frame component overflow).
    """
    from ..pipeline import segment_sum_matmul
    from ..pallas.cca_tpu import propagate_min_pallas

    CH, W = assignment.shape
    assert CH == B * pitch
    n = CH * W
    MF = min(pitch * W, max_components)
    maxc = B * MF
    small = n <= _JUMP_TABLE_LIMIT
    on_tpu = jax.default_backend() == "tpu"

    ii = jax.lax.broadcasted_iota(jnp.int32, (CH, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (CH, W), 1)
    # Chunk the spacer rows' labels into blocks no wider than the
    # propagation kernel's horizontal reach: a full-width uniform spacer
    # band would otherwise need ~W/reach fixpoint passes just to agree on
    # its own leader, inflating EVERY propagation (cc, component ids,
    # relabel) ~3x.  Chunk labels start above any real label (frame labels
    # < B*K_frame <= 65534, UNASSIGNED = 65535) so spacer chunks never
    # 4-connect to frame pixels; the extra ~W/reach components per band are
    # filtered by leader position (is_spacer) like before.
    chunk = max(1, _slic_reach((CH, W), S) - 2)
    spacer_row = (ii % pitch) >= frame_h
    cca_labels = jnp.where(spacer_row, 0x10000 + jj // chunk, assignment)

    # 2-pass propagation guard (see enforce_connectivity_xla_flagged):
    # assigned-label regions span <= 2S+1 rows; spacer chunk regions span
    # pitch - frame_h rows (one band — the next band's identical label is
    # separated by the frame rows between them).
    bounded_h = max(2 * S + 1, pitch - frame_h) if S else None
    content_bounded = (jnp.logical_not(jnp.any(cca_labels == UNASSIGNED))
                       if bounded_h is not None else None)

    L2 = connected_components(cca_labels, S, bounded_h, content_bounded)
    iota2 = ii * W + jj
    is_leader = L2 == iota2
    il = is_leader.astype(jnp.int32)

    # per-frame leader rank: 2-D prefix count with a reset at every frame
    # boundary (static row structure: frame f owns rows [f*pitch, ...))
    row_counts = jnp.sum(il, axis=1)                    # [CH]
    rc_f = row_counts.reshape(B, pitch)
    ro_f = jnp.cumsum(rc_f, axis=1) - rc_f              # excl. within frame
    ncomp_f = jnp.sum(rc_f, axis=1)                     # [B]
    overflow = ncomp_f > MF                             # per-frame flag
    in_row = jnp.cumsum(il, axis=1) - il
    rank2 = ro_f.reshape(CH)[:, None] + in_row          # per-frame rank
    fid = ii // pitch
    seed_vals = fid * MF + jnp.minimum(rank2, MF - 1)

    comp_seed = jnp.where(is_leader, seed_vals, _BIG)
    if small or not on_tpu:
        comp2 = seed_vals.reshape(-1)[L2.reshape(-1)].reshape(CH, W)
    else:
        comp2 = propagate_min_pallas(cca_labels, comp_seed,
                                     reach=_slic_reach((CH, W), S),
                                     bounded_h=bounded_h,
                                     content_bounded=content_bounded)
    comp_flat = comp2.reshape(-1)

    # One segment-sum aggregates, per component: area, leader IN-FRAME row
    # (for the spacer classification — split into two sub-16-bit parts),
    # and the orphan-adoption target, aggregated pixel-side like the
    # single-image path (each leader pixel contributes its left/up
    # neighbor's component id — two shifts, no [maxc]-sized gather from the
    # pixel map).
    lrow_in = ii % pitch
    donor_comp = jnp.where(jj > 0, _shifted(comp2, 0, -1, 0),
                           _shifted(comp2, -1, 0, 0))
    val_list = [jnp.ones_like(il),
                jnp.where(is_leader, lrow_in >> 8, 0),
                jnp.where(is_leader, lrow_in & 0xFF, 0),
                jnp.where(is_leader, donor_comp >> 14, 0),
                jnp.where(is_leader, donor_comp & 16383, 0)]
    if on_tpu and not small:
        # per-frame-output segment sum: ONE kernel launch, VMEM footprint =
        # one frame's [MF] bucket table (a global [maxc = B*MF] one-block
        # output OOMs Mosaic VMEM at video batch sizes — 39 MB at B=32)
        from ..pallas.segsum_tpu import framed_segment_sum_pallas
        # clip: in spacer-less stacks (pitch == frame_h) an UNASSIGNED
        # region can 4-connect across a frame boundary, giving pixels a
        # comp id from the PREVIOUS frame's band (local id < 0).  Both
        # frames are flagged for host re-run in that case (they contain
        # UNASSIGNED), so the clipped bin contents don't matter — the clip
        # only keeps the kernel's store offsets in range.
        ids_local = jnp.clip(comp2 - fid * MF, 0, MF - 1
                             ).reshape(B, pitch * W)
        vals5 = jnp.stack([v.reshape(B, pitch * W) for v in val_list], 0)
        accf = framed_segment_sum_pallas(ids_local, vals5, MF, False)
        A = accf[:, 0]                                  # [B, MF] areas
        LR = accf[:, 1] * 256 + accf[:, 2]              # leader in-frame row
        target = (accf[:, 3] * 16384 + accf[:, 4]).reshape(maxc)
    else:
        vals = jnp.stack(val_list, axis=-1).reshape(-1, 5)
        acc = segment_sum_matmul(comp_flat, vals, maxc,
                                 max_val=max(n >> 16, 16383,
                                             pitch >> 8))[:maxc]
        A = acc[:, 0].reshape(B, MF)                    # areas
        LR = (acc[:, 1] * 256 + acc[:, 2]).reshape(B, MF)
        target = acc[:, 3] * 16384 + acc[:, 4]          # [maxc]

    ridx = jnp.arange(MF, dtype=jnp.int32)[None, :]
    valid_comp = ridx < ncomp_f[:, None]                # [B, MF]
    is_spacer = LR >= frame_h
    real = valid_comp & ~is_spacer
    kept_pre = real & (A >= min_threshold)

    k = min(K_frame, MF)
    kp_i = kept_pre.astype(jnp.int32)
    count_pre = jnp.sum(kp_i, axis=1)                   # [B]

    def cnt_gt(T_b):
        return jnp.sum((kept_pre & (A > T_b[:, None])).astype(jnp.int32),
                       axis=1)

    def bs_body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        p = cnt_gt(mid) < k
        return jnp.where(p, lo, mid + 1), jnp.where(p, mid, hi)

    steps = max(1, math.ceil(math.log2(max(pitch * W + 1, 2))))
    lo, hi = jax.lax.fori_loop(
        0, steps, bs_body,
        (jnp.zeros([B], jnp.int32), jnp.full([B], pitch * W, jnp.int32)))
    T = lo                                              # [B]
    n_gt = cnt_gt(T)
    fill = k - n_gt                                     # [B]
    eq = kept_pre & (A == T[:, None])
    eq_i = eq.astype(jnp.int32)
    eq_rank = jnp.cumsum(eq_i, axis=1)                  # per-frame inclusive
    kept = (kept_pre & (A > T[:, None])) | (eq & (eq_rank <= fill[:, None]))
    boundary_tie = (count_pre > k) & (fill < jnp.sum(eq_i, axis=1))   # [B]

    kept_i = kept.astype(jnp.int32)
    substitute = jnp.where(kept, jnp.cumsum(kept_i, axis=1) - 1, UNASSIGNED
                           ).astype(jnp.int32)
    # first real component of each frame always gets a label (cca.cpp:238)
    real_rank = jnp.cumsum(real.astype(jnp.int32), axis=1)
    is_first_real = real & (real_rank == 1)
    substitute = jnp.where(is_first_real & (substitute == UNASSIGNED), 0,
                           substitute)
    # spacer components are cropped away by the caller, and pad entries
    # beyond ncomp_f can never resolve through the orphan DAG: park both at
    # 0 so they cost no pointer-jump iterations and the jump loop's early
    # exit can fire
    substitute = jnp.where(valid_comp & is_spacer, 0, substitute)
    substitute = jnp.where(valid_comp, substitute, 0)
    substitute = substitute.reshape(maxc)

    # every frame's component 0 is its always-labeled first real component
    # (frame pixel (0,0) has the frame-min raster index), so orphan chains
    # terminate within their frame; the global guard below only covers the
    # degenerate empty-frame padding.  Pad entries' targets are parked at
    # SELF, not 0: a 0 target inside frame f's id block widens the chase
    # kernel's band to [0, f*MF] — O(B^2) band rows across the batch (THE
    # super-linear stacked/canvas CCA term; the chase kernel's cost is band
    # height, not element count).
    citoa = jnp.arange(maxc, dtype=jnp.int32)
    target = jnp.where(citoa % MF == 0, citoa, target)
    target = jnp.where(valid_comp.reshape(maxc), target, citoa)
    substitute, unresolved = _resolve_orphans(substitute, target, maxc,
                                              small or not on_tpu)

    if small or not on_tpu:
        out = substitute[comp_flat].reshape(CH, W)
    else:
        from ..pallas.segsum_tpu import banded_lookup_pallas
        out = banded_lookup_pallas(comp_flat, substitute, maxc,
                                   False).reshape(CH, W)

    # per-frame host-re-run flags: boundary tie, unassigned in-frame pixels
    # (canvas assignment can differ from standalone there), per-frame
    # component overflow
    a3 = assignment.reshape(B, pitch, W)
    unassigned_f = jnp.any(a3[:, :frame_h, :] == UNASSIGNED, axis=(1, 2))
    return out, boundary_tie | unassigned_f | overflow | unresolved


def _slic_reach(shape, S=None):
    """Horizontal doubling reach for the propagation kernel: SLIC runs are
    bounded by the component diameter 2S+1 (every pixel of a label lies in
    the +-S window of its center), so 2S+4 covers any run with slack; longer
    adversarial runs (pathological UNASSIGNED spans — flagged content) just
    take extra fixpoint passes.  Callers that know the actual sampling
    interval pass it; the fallback guesses from K>=64 (conservative: an
    overestimate only costs doubling steps, an underestimate costs fixpoint
    passes)."""
    H, W = shape
    if S is None:
        import math as _m
        S = max(1, int(_m.sqrt((H * W) / 64)))  # conservative: K >= 64
    return min(W, 2 * S + 4)
