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
    if n > _JUMP_TABLE_LIMIT:
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
    """
    from ..pipeline import segment_sum_matmul  # local import (no cycle at call time)

    H, W = assignment.shape
    n = H * W
    maxc = min(n, max_components) if max_components else n

    L = connected_components(assignment).reshape(-1)
    iota = jnp.arange(n, dtype=jnp.int32)
    is_leader = L == iota
    num_components = jnp.sum(is_leader.astype(jnp.int32))
    overflow = num_components > maxc

    # compact renumbering in leader order
    leader_list = jnp.nonzero(is_leader, size=maxc, fill_value=n)[0].astype(jnp.int32)
    comp = jnp.searchsorted(leader_list, L, side="left").astype(jnp.int32)
    comp = jnp.minimum(comp, maxc - 1)

    citoa = jnp.arange(maxc, dtype=jnp.int32)
    areas = segment_sum_matmul(
        comp, jnp.ones([n, 1], jnp.int32), maxc, max_val=1)[:maxc, 0]

    valid_comp = citoa < num_components
    kept_pre = valid_comp & (areas >= min_threshold)
    num_above = jnp.sum(kept_pre.astype(jnp.int32))

    # top-K by area among kept; ties -> smaller component number
    k = min(K, maxc)
    masked_areas = jnp.where(kept_pre, areas, -1)
    _, top_idx = jax.lax.top_k(masked_areas, k)
    in_topk = jnp.zeros([maxc], bool).at[top_idx].set(True)
    kept = kept_pre & in_topk

    kept_min = jnp.min(jnp.where(kept, areas, _BIG))
    dropped_max = jnp.max(jnp.where(kept_pre & ~kept, areas, -1))
    boundary_tie = (num_above > k) & (dropped_max == kept_min)

    substitute = jnp.where(
        kept, jnp.cumsum(kept.astype(jnp.int32)) - 1, UNASSIGNED
    ).astype(jnp.int32)
    # component 0 always gets a label (cca.cpp:238)
    substitute = substitute.at[0].set(jnp.where(kept[0], substitute[0], 0))

    # orphan adoption targets: component of the leader's left/up neighbor
    leader = jnp.minimum(leader_list, n - 1)
    has_left = (leader % W) > 0
    nb = jnp.where(has_left, leader - 1, jnp.maximum(leader - W, 0))
    target = comp[nb]                       # [maxc] gathered from pixel comps
    target = jnp.where(citoa == 0, 0, target)

    # resolve chains (target strictly decreases) by pointer jumping
    steps = max(1, math.ceil(math.log2(max(maxc, 2))))

    def jump(_, carry):
        sub, t = carry
        sub = jnp.where(sub == UNASSIGNED, sub[t], sub)
        return sub, t[t]

    substitute, _ = jax.lax.fori_loop(0, steps, jump, (substitute, target))
    substitute = jnp.where(substitute == UNASSIGNED, 0, substitute)

    return substitute[comp].reshape(H, W), boundary_tie | overflow
