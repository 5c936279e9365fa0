"""Slow, exact numpy oracle for the SLIC pipeline.

This module encodes the *semantics* of the reference C++ core
(``/root/reference/src/context.cpp``, ``src/cca.cpp``, ``src/lsc.cpp``) in
plain numpy, written gather/slice style.  It is the ground truth that the
XLA and Pallas paths are tested against (tests use small images; the oracle
is O(K * S^2) python-looped over clusters).

Assignment ties reproduce the reference *exactly*: the reference processes
clusters in 4-phase checkerboard cell order and keeps the *first* writer on
equal distances (context.cpp:223-242, 290).  That order is deterministic
(same-phase cells are >= 2S+64 apart, so it reduces to the lexicographic key
(phase, cluster_number) — see ``pipeline.visit_order_key``), and the oracle's
``_assign_pass`` visits clusters in that key order with a strict ``<``
replace, making the quantized/real/l2/noq paths **bit-identical** to a build
of the unmodified reference binary (tests/test_golden.py, pinned fixtures in
tests/data/golden_ref.npz).  LSC matches to >= 0.999 agreement only —
transcendental LUTs and einsum accumulation order differ in float rounding.
"""

from __future__ import annotations

import math

import numpy as np

from ..cluster import Clusters
from ..config import (
    StaticConfig,
    RuntimeParams,
    UNASSIGNED,
    VARIANT_STANDARD,
    VARIANT_REAL,
    VARIANT_REAL_L2,
    VARIANT_REAL_NOQ,
    VARIANT_LSC,
)
from ..ops.cielab import rgb_to_lab_quantized_np


def _round_int(numer, denom):
    """round_int(n, d) = (n + d/2) / d in integer math (fast-slic-common.h:62-65)."""
    return (numer + denom // 2) // denom


def quad_planes(image: np.ndarray, convert_to_lab: bool):
    """Returns (planes int32 [H, W, 3], color_shift) — the quad_image fill
    of context.cpp:114-127."""
    if convert_to_lab:
        return rgb_to_lab_quantized_np(image).astype(np.int32), 1
    return image.astype(np.int32), 0


def spatial_patch(S: int, compactness: float, color_shift: int,
                  manhattan: bool, squared_l2: bool, dtype) -> np.ndarray:
    """The (2S+1)^2 spatial distance LUT (context.cpp:23-40, 435-445)."""
    coef = np.float32(1.0) / (np.float32(S) / np.float32(compactness))
    coef = coef * np.float32(1 << color_shift)
    di = np.arange(2 * S + 1, dtype=np.float32) - S
    if squared_l2:
        dy = (coef * di)[:, None]
        dx = (coef * di)[None, :]
        patch = dy * dy + dx * dx
    elif manhattan:
        patch = coef * (np.abs(di)[:, None] + np.abs(di)[None, :])
    else:
        # C uses hypotf (context.cpp:36); we standardize on sqrt(di^2+dj^2)
        # in f32 across oracle and XLA paths (<=1 ulp from hypotf).
        d2 = di[:, None] * di[:, None] + di[None, :] * di[None, :]
        patch = coef * np.sqrt(d2, dtype=np.float32)
    if np.issubdtype(dtype, np.integer):
        return np.trunc(patch).astype(np.int64)  # C cast float->uint16 truncates
    return patch.astype(np.float32)


def _assign_pass(planes, st: Clusters, cfg: StaticConfig, compactness,
                 stride, rem, assignment, color_shift,
                 lsc_feats=None, lsc_cent=None):
    """One assign() pass: per-cluster +-S window argmin scatter
    (context.cpp:200-298, 394-499; lsc.cpp:197-224).

    Iterates clusters in the reference's visit order — 4-phase checkerboard
    of (2S+32)-cells, ascending cluster number within a phase
    (context.cpp:214-242) — with strict '<' replacement, so distance ties
    resolve exactly like the reference scalar arch.  Mutates `assignment`
    in place; returns min_dists.
    """
    H, W, S = cfg.H, cfg.W, cfg.S
    variant = cfg.variant
    quantized = variant == VARIANT_STANDARD
    dtype = np.int64 if quantized else np.float32
    min_dists = np.full(
        [H, W], 65535 if quantized else np.finfo(np.float32).max, dtype=dtype
    )

    # safeguard clamp (context.cpp:209-212)
    st.x = np.clip(st.x, 0, W - 1)
    st.y = np.clip(st.y, 0, H - 1)

    row_valid = (np.arange(H) % stride) == rem

    if variant in (VARIANT_STANDARD, VARIANT_REAL, VARIANT_REAL_L2):
        patch = spatial_patch(
            S, compactness, color_shift, cfg.manhattan_spatial_dist,
            squared_l2=(variant == VARIANT_REAL_L2), dtype=dtype,
        )
    coef = np.float32(1 << color_shift) / (np.float32(S) / np.float32(compactness))

    # visit order: (phase, k) with phase from the (2S+32)-cell checkerboard
    T = 2 * S + 32
    phases = (2 * ((st.y.astype(np.int64) // T) % 2)
              + (st.x.astype(np.int64) // T) % 2)
    visit = sorted(range(st.K), key=lambda k: (phases[k], k))

    for k in visit:
        if not st.is_active[k]:
            continue
        if variant == VARIANT_REAL_NOQ:
            cy, cx = np.float32(st.y[k]), np.float32(st.x[k])
            y_lo, y_hi = max(int(cy - S), 0), min(int(cy + S + 1), H)
            x_lo, x_hi = max(int(cx - S), 0), min(int(cx + S + 1), W)
        else:
            cy, cx = int(st.y[k]), int(st.x[k])  # int16 casts, context.cpp:266
            y_lo, y_hi = max(cy - S, 0), min(cy + S + 1, H)
            x_lo, x_hi = max(cx - S, 0), min(cx + S + 1, W)
        ii = np.arange(y_lo, y_hi)
        ii = ii[row_valid[ii]]
        if ii.size == 0 or x_hi <= x_lo:
            continue
        jj = np.arange(x_lo, x_hi)
        win = planes[ii[:, None], jj[None, :], :]  # [rows, cols, 3]

        if variant == VARIANT_LSC:
            f = lsc_feats[ii[:, None], jj[None, :], :]  # [rows, cols, 10]
            diff = f - lsc_cent[k][None, None, :]
            dist = np.sum(diff * diff, axis=-1, dtype=np.float32)
        elif variant == VARIANT_REAL_NOQ:
            dr = win[..., 0].astype(np.float32) - np.float32(st.r[k])
            dg = win[..., 1].astype(np.float32) - np.float32(st.g[k])
            db = win[..., 2].astype(np.float32) - np.float32(st.b[k])
            dy = coef * (ii[:, None].astype(np.float32) - cy)
            dx = coef * (jj[None, :].astype(np.float32) - cx)
            if cfg.manhattan_spatial_dist:
                dist = np.abs(dr) + np.abs(dg) + np.abs(db) + np.abs(dx) + np.abs(dy)
            else:
                dist = dr * dr + dg * dg + db * db + dx * dx + dy * dy
        else:
            # patch-indexed variants; int16 casts of cluster color
            cr, cg, cb = int(st.r[k]), int(st.g[k]), int(st.b[k])
            p = patch[ii[:, None] - (cy - S), jj[None, :] - (cx - S)]
            if variant == VARIANT_REAL_L2:
                dr = win[..., 0].astype(np.float32) - cr
                dg = win[..., 1].astype(np.float32) - cg
                db = win[..., 2].astype(np.float32) - cb
                dist = p + dr * dr + dg * dg + db * db
            else:
                cd = (
                    np.abs(win[..., 0] - cr)
                    + np.abs(win[..., 1] - cg)
                    + np.abs(win[..., 2] - cb)
                )
                if variant == VARIANT_REAL:
                    # float DistType: patch + float(color), all f32
                    # (context.cpp:285 with DistType=float)
                    dist = p + cd.astype(np.float32)
                else:
                    dist = p + cd

        sub_md = min_dists[ii[:, None], jj[None, :]]
        better = dist < sub_md
        min_dists[ii[:, None], jj[None, :]] = np.where(better, dist, sub_md)
        sub_a = assignment[ii[:, None], jj[None, :]]
        assignment[ii[:, None], jj[None, :]] = np.where(better, k, sub_a)
    return min_dists


def _update_pass(planes, st: Clusters, cfg: StaticConfig, stride, rem,
                 assignment, active_cell_mask=None):
    """update(): masked 5-channel histogram + mean (context.cpp:302-387)."""
    H, W, K = cfg.H, cfg.W, st.K
    quantized = cfg.variant != VARIANT_REAL_NOQ  # centroid_quantization_enabled
    row_valid = (np.arange(H) % stride) == rem
    mask = row_valid[:, None] & (assignment != UNASSIGNED)
    if active_cell_mask is not None:
        mask = mask & active_cell_mask
    ids = np.where(mask, assignment, K).ravel()
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    acc = np.zeros([K + 1, 5], np.int64)
    vals = np.stack(
        [yy.ravel(), xx.ravel(),
         planes[..., 0].ravel(), planes[..., 1].ravel(), planes[..., 2].ravel()],
        axis=1,
    )
    np.add.at(acc, ids, vals)
    counts = np.bincount(ids, minlength=K + 1)[:K]
    acc = acc[:K]

    upd = st.is_updatable != 0
    st.num_members = np.where(upd, counts, st.num_members).astype(np.uint32)
    nonzero = counts > 0
    sel = upd & nonzero
    safe = np.maximum(counts, 1)
    if quantized:
        means = _round_int(acc, safe[:, None]).astype(np.float32)
    else:
        means = acc.astype(np.float32) / safe[:, None].astype(np.float32)
    st.y = np.where(sel, means[:, 0], st.y).astype(np.float32)
    st.x = np.where(sel, means[:, 1], st.x).astype(np.float32)
    st.r = np.where(sel, means[:, 2], st.r).astype(np.float32)
    st.g = np.where(sel, means[:, 3], st.g).astype(np.float32)
    st.b = np.where(sel, means[:, 4], st.b).astype(np.float32)
    return counts


# ---------------------------------------------------------------------------
# LSC feature space (lsc.cpp:22-195)
# ---------------------------------------------------------------------------

def lsc_features(planes, cfg: StaticConfig, compactness):
    """10-D per-pixel features + weights (lsc.cpp:66-162).

    Returns (feats [H, W, 10] float32, weights [H, W] float32).
    Feature order: l1, l2, a1, a2, b1, b2, x1, x2, y1, y2.
    """
    H, W, S = cfg.H, cfg.W, cfg.S
    C_color = np.float32(20.0)
    ratio = np.float32(compactness) / np.float32(100.0)
    C_spatial = C_color * ratio
    halfPI = np.float32(math.pi / 2)

    Lp = planes[..., 0].astype(np.int64)
    Ap = planes[..., 1].astype(np.int64)
    Bp = planes[..., 2].astype(np.int64)

    xs = np.arange(256, dtype=np.float32)
    theta_c = halfPI * (xs / np.float32(255.0))
    color_cos = (C_color * np.cos(theta_c) * np.float32(2.55)).astype(np.float32)
    color_sin = (C_color * np.sin(theta_c) * np.float32(2.55)).astype(np.float32)
    L_cos = (C_color * np.cos(theta_c)).astype(np.float32)
    L_sin = (C_color * np.sin(theta_c)).astype(np.float32)

    ti = (np.arange(H, dtype=np.float32) * (halfPI / np.float32(S)))
    tj = (np.arange(W, dtype=np.float32) * (halfPI / np.float32(S)))
    hcos, hsin = C_spatial * np.cos(ti), C_spatial * np.sin(ti)
    wcos, wsin = C_spatial * np.cos(tj), C_spatial * np.sin(tj)

    feats = np.empty([H, W, 10], np.float32)
    feats[..., 0] = L_cos[Lp]
    feats[..., 1] = L_sin[Lp]
    feats[..., 2] = color_cos[Ap]
    feats[..., 3] = color_sin[Ap]
    feats[..., 4] = color_cos[Bp]
    feats[..., 5] = color_sin[Bp]
    feats[..., 6] = np.broadcast_to(wcos[None, :], (H, W))
    feats[..., 7] = np.broadcast_to(wsin[None, :], (H, W))
    feats[..., 8] = np.broadcast_to(hcos[:, None], (H, W))
    feats[..., 9] = np.broadcast_to(hsin[:, None], (H, W))

    mean_f = feats.reshape(-1, 10).mean(axis=0, dtype=np.float64).astype(np.float32)
    weights = (feats * mean_f[None, None, :]).sum(axis=-1, dtype=np.float32)
    feats = feats / weights[..., None]
    return feats, weights


def lsc_seed_centroids(feats, st: Clusters, cfg: StaticConfig):
    """Centroid features = mean over the S/4 window (lsc.cpp:165-195)."""
    H, W, S = cfg.H, cfg.W, cfg.S
    cent = np.zeros([st.K, 10], np.float32)
    for k in range(st.K):
        cy, cx = int(st.y[k]), int(st.x[k])
        y_lo, y_hi = max(cy - S // 4, 0), min(cy + S // 4 + 1, H)
        x_lo, x_hi = max(cx - S // 4, 0), min(cx + S // 4 + 1, W)
        win = feats[y_lo:y_hi, x_lo:x_hi].reshape(-1, 10)
        if win.shape[0]:
            cent[k] = win.sum(axis=0) / np.float32(win.shape[0])
    return cent


def lsc_after_update(feats, weights, st: Clusters, cent, cfg: StaticConfig,
                     stride, rem, assignment, active_px=None):
    """Weighted feature re-centroid (lsc.cpp:226-307)."""
    H, W, K = cfg.H, cfg.W, st.K
    row_valid = (np.arange(H) % stride) == rem
    mask = row_valid[:, None] & (assignment != UNASSIGNED)
    if active_px is not None:
        mask = mask & active_px
    ids = np.where(mask, assignment, K).ravel()
    w = weights.ravel()
    acc = np.zeros([K + 1, 10], np.float64)
    np.add.at(acc, ids, (feats.reshape(-1, 10) * w[:, None]).astype(np.float64))
    wsum = np.zeros([K + 1], np.float64)
    np.add.at(wsum, ids, w)
    upd = st.is_updatable != 0
    new_wsum = np.where(upd, wsum[:K], 1.0)
    base = np.where(upd[:, None], acc[:K], cent.astype(np.float64))
    return (base / new_wsum[:, None]).astype(np.float32)


# ---------------------------------------------------------------------------
# Connectivity enforcement (src/cca.cpp)
# ---------------------------------------------------------------------------

def heap_select_topk(seq, areas, K):
    """The exact element set std::partial_sort keeps (libstdc++ heap_select).

    The reference keeps the K largest-area components via
    ``std::partial_sort(comps.begin(), comps.begin()+K, comps.end(), areacmp)``
    (cca.cpp:226).  When several components share the area at the K-th
    boundary, *which* of them survive depends on libstdc++'s heap layout —
    so we reproduce the algorithm: build a heap over the first K elements
    (std::__make_heap) and replace the top whenever a later element compares
    strictly better (std::__heap_select).  ``comp(a, b)`` is areacmp:
    ``areas[a] > areas[b]``.
    """

    def comp(a, b):
        return areas[a] > areas[b]

    def push_heap(h, hole, top, value):
        parent = (hole - 1) // 2
        while hole > top and comp(h[parent], value):
            h[hole] = h[parent]
            hole = parent
            parent = (hole - 1) // 2
        h[hole] = value

    def adjust_heap(h, hole, length, value):
        top = hole
        second = hole
        while second < (length - 1) // 2:
            second = 2 * (second + 1)
            if comp(h[second], h[second - 1]):
                second -= 1
            h[hole] = h[second]
            hole = second
        if (length & 1) == 0 and second == (length - 2) // 2:
            second = 2 * (second + 1)
            h[hole] = h[second - 1]
            hole = second - 1
        push_heap(h, hole, top, value)

    h = list(seq[:K])
    if K >= 2:
        parent = (K - 2) // 2
        while True:
            value = h[parent]
            adjust_heap(h, parent, K, value)
            if parent == 0:
                break
            parent -= 1
    for x in seq[K:]:
        if comp(x, h[0]):
            adjust_heap(h, 0, K, x)
    return h

def enforce_connectivity_np(labels: np.ndarray, K: int, min_threshold: int) -> np.ndarray:
    """Exact ConnectivityEnforcer::execute semantics (cca.cpp:178-265).

    labels: uint16-valued [H, W] (0xFFFF allowed).  Returns new labels.
    Components are 4-connected equal-label regions; the component "leader" is
    its minimum linear pixel index, and components are numbered by leader
    order (a property of the reference's min-parent union-find + flatten,
    cca.h:36-57, cca.cpp:103-173).
    """
    H, W = labels.shape
    flat = labels.ravel()
    n = H * W
    parent = np.arange(n, dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb

    for i in range(H):
        for j in range(W):
            idx = i * W + j
            if j > 0 and flat[idx - 1] == flat[idx]:
                union(idx - 1, idx)
            if i > 0 and flat[idx - W] == flat[idx]:
                union(idx - W, idx)

    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    leaders = np.unique(roots)                        # sorted -> leader order
    comp_of_leader = {int(l): c for c, l in enumerate(leaders)}
    comp = np.array([comp_of_leader[int(r)] for r in roots], dtype=np.int64)
    num_components = leaders.size
    areas = np.bincount(comp, minlength=num_components)

    substitute = np.full([num_components], UNASSIGNED, np.int64)
    comps = np.nonzero(areas >= min_threshold)[0]
    if comps.size > K:
        comps = np.sort(heap_select_topk(comps.tolist(), areas, K))
    for next_label, c in enumerate(comps):
        substitute[c] = next_label
    if num_components > 0 and substitute[0] == UNASSIGNED:
        substitute[0] = 0

    for c in range(num_components):
        if substitute[c] != UNASSIGNED:
            continue
        leader = int(leaders[c])
        if leader % W > 0:
            subs = substitute[comp[leader - 1]]
        else:
            subs = substitute[comp[leader - W]]
        if subs == UNASSIGNED:
            subs = 0
        substitute[c] = subs

    return substitute[comp].reshape(H, W).astype(labels.dtype)


# ---------------------------------------------------------------------------
# Full iterate
# ---------------------------------------------------------------------------

_COOLDOWN = 2  # preemptive.h:32


def _preemptive_set_new(st: Clusters, old_y, old_x, cfg: StaticConfig,
                        thres: float):
    """PreemptiveGrid::set_new_clusters (preemptive.h:114-178)."""
    S = cfg.S
    # roundf (half away from zero) of the f32 product, as in preemptive.h:126
    l1_thres = max(
        math.floor(float(np.float32(2 * S) * np.float32(thres)) + 0.5), 1.0)
    upd = st.is_updatable > 0
    moved = np.abs(old_x - st.x) + np.abs(old_y - st.y)
    st.is_updatable = np.where(
        upd, np.where(moved < l1_thres, st.is_updatable - 1, _COOLDOWN),
        st.is_updatable).astype(np.int32)
    upd2 = st.is_updatable > 0
    near = (np.abs(st.y[:, None] - st.y[None, :]) <= 2 * S) & \
           (np.abs(st.x[:, None] - st.x[None, :]) <= 2 * S)
    st.is_active = np.any(near & upd2[:, None], axis=0).astype(np.int32)
    all_active = bool((st.is_active == 1).all())

    CH, CW = -(-cfg.H // (2 * S)), -(-cfg.W // (2 * S))
    grid = np.zeros([CH, CW], bool)
    cy = np.clip(st.y.astype(np.int64) // (2 * S), 0, CH - 1)
    cx = np.clip(st.x.astype(np.int64) // (2 * S), 0, CW - 1)
    for k in range(st.K):
        if st.is_active[k]:
            grid[cy[k], cx[k]] = True
    px = np.repeat(np.repeat(grid, 2 * S, 0)[:cfg.H], 2 * S, 1)[:, :cfg.W]
    return st, px | all_active


def iterate_oracle(image: np.ndarray, st: Clusters, cfg: StaticConfig,
                   params: RuntimeParams):
    """Full BaseContext::iterate pipeline (context.cpp:109-197) in numpy.

    Returns (labels int16 [H, W], final Clusters).  `st` is not mutated.
    """
    st = st.copy()
    H, W, S = cfg.H, cfg.W, cfg.S
    planes, color_shift = quad_planes(image, cfg.convert_to_lab)

    # re-seed cluster colors from quad image (context.cpp:128-135)
    cy = np.clip(st.y.astype(np.int64), 0, H - 1)
    cx = np.clip(st.x.astype(np.int64), 0, W - 1)
    st.r = planes[cy, cx, 0].astype(np.float32)
    st.g = planes[cy, cx, 1].astype(np.float32)
    st.b = planes[cy, cx, 2].astype(np.float32)

    assignment = np.full([H, W], UNASSIGNED, np.int64)

    lsc_feats = lsc_cent = lsc_w = None
    if cfg.variant == VARIANT_LSC:
        lsc_feats, lsc_w = lsc_features(planes, cfg, params.compactness)
        lsc_cent = lsc_seed_centroids(lsc_feats, st, cfg)

    # preemptive_grid.initialize (runs regardless of the flag)
    st.is_updatable = np.full([st.K], _COOLDOWN, np.int32)
    active_px = np.ones([H, W], bool)

    stride = int(params.subsample_stride)
    rem = 0
    for _ in range(int(params.max_iter)):
        _assign_pass(planes, st, cfg, params.compactness, stride, rem,
                     assignment, color_shift, lsc_feats, lsc_cent)
        old_y, old_x = st.y.copy(), st.x.copy()
        _update_pass(planes, st, cfg, stride, rem, assignment,
                     active_px if cfg.preemptive else None)
        if cfg.variant == VARIANT_LSC:
            lsc_cent = lsc_after_update(
                lsc_feats, lsc_w, st, lsc_cent, cfg, stride, rem, assignment,
                active_px if cfg.preemptive else None)
        if cfg.preemptive:
            st, active_px = _preemptive_set_new(
                st, old_y, old_x, cfg, params.preemptive_thres)
        rem = (rem + 1) % stride

    # preemptive_grid.finalize + full_assign with stride 1
    st.is_active = np.ones([st.K], np.int32)
    _assign_pass(planes, st, cfg, params.compactness, 1, 0, assignment,
                 color_shift, lsc_feats, lsc_cent)

    thres = int(math.floor((S * S) * float(params.min_size_factor) + 0.5))
    labels = enforce_connectivity_np(
        assignment.astype(np.uint16), st.K, thres)
    out = labels.astype(np.int16)
    out[labels == UNASSIGNED] = -1
    return out, st
