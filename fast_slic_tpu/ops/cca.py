"""Connectivity enforcement (CCA) as an iterative on-TPU label propagation.

The reference enforces that every output label is a single 4-connected blob
of area >= threshold using a sequential union-find with row-parallel seams
(``/root/reference/src/cca.cpp``).  Union-find is inherently sequential, so
the TPU version re-derives the same *result* with data-parallel primitives:

1. components: every pixel starts as its own component (label = linear pixel
   index) and repeatedly takes the min over equal-SLIC-label 4-neighbors,
   interleaved with pointer-jumping (``L <- L[L]``) which doubles the
   distance information travels per sweep.  At fixpoint, each component is
   labeled by its minimum pixel index — exactly the "leader" the reference's
   min-parent union-find produces (cca.h:36-57).
2. components are numbered by leader order (cca.cpp:103-173's flatten),
   areas via segment-sum.
3. area thresholding, top-K-by-area selection (ties to the smaller
   component, matching partial_sort with a deterministic rule;
   cca.cpp:212-230), renumbering kept components sequentially in leader
   order (cca.cpp:235-238).
4. orphan adoption: a dropped component takes the substitute label of its
   leader's left (or up) neighbor (cca.cpp:240-254).  The sequential loop
   resolves in increasing component order; since the adoption target always
   has a strictly smaller component number, it is a DAG that pointer-jumping
   resolves in O(log) gathers.

The numpy oracle (oracle/numpy_ref.py:enforce_connectivity_np) implements
the same semantics with an actual union-find; equality is asserted in
tests/test_cca.py including adversarial spiral patterns.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import UNASSIGNED

_BIG = jnp.int32(0x7FFFFFFF)


def _neighbor_min(L, labels):
    """Min over self + 4-neighbors with equal SLIC label."""
    H, W = L.shape

    # Explicit padded shifts (jnp.roll would wrap labels across edges).
    def shifted(a, di, dj, fill):
        padded = jnp.pad(a, ((1, 1), (1, 1)), constant_values=fill)
        return padded[1 + di : 1 + di + H, 1 + dj : 1 + dj + W]

    out = L
    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nl = shifted(labels, di, dj, -2)
        nL = shifted(L, di, dj, _BIG)
        out = jnp.minimum(out, jnp.where(nl == labels, nL, _BIG))
    return out


def connected_components(labels):
    """[H, W] SLIC labels -> [H, W] component ids = min linear pixel index.

    Runs propagate + double pointer-jump sweeps to fixpoint.
    """
    H, W = labels.shape
    n = H * W
    L0 = jnp.arange(n, dtype=jnp.int32).reshape(H, W)

    def sweep(L):
        L = _neighbor_min(L, labels)
        f = L.reshape(-1)
        f = f[f]
        f = f[f]
        return f.reshape(H, W)

    def cond(carry):
        L, changed = carry
        return changed

    def body(carry):
        L, _ = carry
        L2 = sweep(L)
        return (L2, jnp.any(L2 != L))

    L, _ = jax.lax.while_loop(cond, body, (L0, jnp.bool_(True)))
    return L


def enforce_connectivity_xla(assignment, K: int, min_threshold):
    """ConnectivityEnforcer::execute (cca.cpp:178-265), dense TPU version.

    assignment: int32 [H, W] (UNASSIGNED treated as a label of its own,
    matching the reference which runs CCA on raw uint16 labels).
    min_threshold: traced int32 scalar.
    Returns int32 [H, W] relabeled map.
    """
    labels, _ = enforce_connectivity_xla_flagged(assignment, K, min_threshold)
    return labels


def enforce_connectivity_xla_flagged(assignment, K: int, min_threshold):
    """Like :func:`enforce_connectivity_xla` but also returns a bool scalar
    flagging the one case where this implementation can deviate from the
    reference: more than K components pass the area threshold AND several
    components *tie in area exactly at the K-th boundary*.  The reference's
    std::partial_sort then keeps a heap-layout-dependent subset
    (cca.cpp:226), while this path keeps the tied components with the
    smallest numbers.  Callers wanting bit-parity re-run the host CCA
    (native.enforce_connectivity_native) when the flag fires — it is rare,
    and either choice is equally valid segmentation-wise (equal areas).
    """
    H, W = assignment.shape
    n = H * W

    leaders_px = connected_components(assignment).reshape(-1)  # [n] leader pixel idx
    iota = jnp.arange(n, dtype=jnp.int32)
    is_leader = leaders_px == iota
    # component number = rank of leader among leaders (leader order)
    comp_of_leaderpos = jnp.cumsum(is_leader.astype(jnp.int32)) - 1
    comp = comp_of_leaderpos[leaders_px]                       # [n]
    num_components = comp_of_leaderpos[-1] + 1

    areas = jnp.zeros([n], jnp.int32).at[comp].add(1)
    # leader pixel index per component
    leader_of_comp = jnp.zeros([n], jnp.int32).at[
        jnp.where(is_leader, comp, n - 1)
    ].max(jnp.where(is_leader, iota, 0))

    valid_comp = iota < num_components
    kept_pre = valid_comp & (areas >= min_threshold)
    num_above = jnp.sum(kept_pre.astype(jnp.int32))

    # top-K by area among kept; ties -> smaller component number.
    # jax.lax.top_k is stable (ties resolved to lower index).
    k = min(K, n)
    masked_areas = jnp.where(kept_pre, areas, -1)
    _, top_idx = jax.lax.top_k(masked_areas, k)
    in_topk = jnp.zeros([n], bool).at[top_idx].set(True)
    kept = kept_pre & in_topk

    # boundary-tie detection (see enforce_connectivity_xla_flagged doc)
    kept_min = jnp.min(jnp.where(kept, areas, jnp.int32(0x7FFFFFFF)))
    dropped_max = jnp.max(jnp.where(kept_pre & ~kept, areas, -1))
    boundary_tie = (num_above > k) & (dropped_max == kept_min)

    substitute = jnp.where(
        kept, jnp.cumsum(kept.astype(jnp.int32)) - 1, UNASSIGNED
    ).astype(jnp.int32)
    # component 0 always gets a label (cca.cpp:238)
    substitute = substitute.at[0].set(
        jnp.where(kept[0], substitute[0], 0)
    )

    # orphan adoption targets: component of leader's left/up neighbor
    leader = leader_of_comp
    has_left = (leader % W) > 0
    nb = jnp.where(has_left, leader - 1, jnp.maximum(leader - W, 0))
    target = comp[nb]
    # comp 0's leader is pixel 0 (no neighbor) but it is always substituted.
    target = jnp.where(iota == 0, 0, target)

    # resolve chains by pointer jumping: target comp number strictly
    # decreases along a chain, so ceil(log2(n)) doublings suffice.
    steps = max(1, math.ceil(math.log2(max(n, 2))))
    def jump(_, carry):
        sub, t = carry
        sub = jnp.where(sub == UNASSIGNED, sub[t], sub)
        return sub, t[t]
    substitute, _ = jax.lax.fori_loop(0, steps, jump, (substitute, target))
    substitute = jnp.where(substitute == UNASSIGNED, 0, substitute)

    return substitute[comp].reshape(H, W), boundary_tie
