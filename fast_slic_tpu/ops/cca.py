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

import math

import jax
import jax.numpy as jnp

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


def connected_components(labels):
    """[H, W] SLIC labels -> [H, W] component ids = min linear pixel index.

    Small images: neighbor-min sweeps + pointer jumping (the [n] gather
    table stays on-chip).  Large images: the Pallas strip kernel with
    segmented doubling (pallas/cca_tpu.py) — big-table gathers and
    associative scans are both slow on TPU.
    """
    H, W = labels.shape
    n = H * W
    if n > _JUMP_TABLE_LIMIT and jax.default_backend() == "tpu":
        from ..pallas.cca_tpu import connected_components_pallas
        return connected_components_pallas(labels)

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
                             max_components: int | None = None):
    """ConnectivityEnforcer::execute (cca.cpp:178-265), dense TPU version.

    assignment: int32 [H, W] (UNASSIGNED treated as a label of its own,
    matching the reference which runs CCA on raw uint16 labels).
    min_threshold: traced int32 scalar.
    Returns int32 [H, W] relabeled map.
    """
    labels, _ = enforce_connectivity_xla_flagged(
        assignment, K, min_threshold, max_components)
    return labels


def enforce_connectivity_xla_flagged(assignment, K: int, min_threshold,
                                     max_components: int | None = None):
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
    from ..pipeline import segment_sum_matmul
    from ..pallas.cca_tpu import propagate_min_pallas

    H, W = assignment.shape
    n = H * W
    maxc = min(n, max_components) if max_components else n
    small = n <= _JUMP_TABLE_LIMIT

    L2 = connected_components(assignment)              # [H, W] leader ids
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
                                     reach=_slic_reach(assignment.shape))
    comp_flat = comp2.reshape(-1)

    # areas + leader index per component in ONE segment-sum (leader pixel id
    # split into <2^16 halves so the matmul stays exact)
    pid_hi = iota2 >> 8
    pid_lo = iota2 & 0xFF
    vals = jnp.stack(
        [jnp.ones_like(il), jnp.where(is_leader, pid_hi, 0),
         jnp.where(is_leader, pid_lo, 0)], axis=-1).reshape(-1, 3)
    acc = segment_sum_matmul(comp_flat, vals, maxc,
                             max_val=max(n >> 8, 255))[:maxc]
    areas = acc[:, 0]
    leader_of_comp = acc[:, 1] * 256 + acc[:, 2]

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

    # orphan adoption targets: component of the leader's left/up neighbor
    leader = jnp.clip(leader_of_comp, 0, n - 1)
    has_left = (leader % W) > 0
    nb = jnp.where(has_left, leader - 1, jnp.maximum(leader - W, 0))
    target = comp_flat[nb]                 # [maxc] indices: small gather
    target = jnp.where(citoa == 0, 0, target)

    # Orphan chains resolve by pointer jumping.  Adoption targets strictly
    # decrease in leader raster index (the left/up neighbor precedes the
    # leader) and component 0 is always labeled, so every chain terminates;
    # real images resolve in 2-3 doubling steps.  A [maxc] gather executes
    # serially (~8 ns/element — NOTES.md fact #1), so iterate only until
    # converged instead of the full log2(maxc) schedule, with the full
    # schedule as the loop bound.
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
    substitute = jnp.where(substitute == UNASSIGNED, 0, substitute)

    # final relabel: propagate each leader's substitute over its component
    if small or not on_tpu:
        out = substitute[comp_flat].reshape(H, W)
    else:
        seed_ids = jnp.where(valid_comp, leader, n)
        sub_seed = jnp.full([n + 1], _BIG, jnp.int32
                            ).at[seed_ids].set(substitute)[:n].reshape(H, W)
        m0 = jnp.where(is_leader, sub_seed, _BIG)
        out = propagate_min_pallas(assignment, m0,
                                   reach=_slic_reach(assignment.shape))
    return out, boundary_tie | overflow


def _slic_reach(shape):
    """Horizontal doubling reach for the propagation kernel: SLIC runs are
    bounded by the component diameter ~2S+1; cap a bit above it (longer
    adversarial runs just take extra fixpoint passes)."""
    H, W = shape
    import math as _m
    S = max(1, int(_m.sqrt((H * W) / 64)))  # conservative: K >= 64
    return min(W, 4 * S + 2)
