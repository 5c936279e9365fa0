"""Superpixel graph + density utilities.

Re-implements the C-ABI helpers of ``/root/reference/src/fast-slic.cpp``:

* :func:`adjacency` — superpixel adjacency from a 2x2 neighborhood scan with
  first-come order and a 12-neighbor cap (fast-slic.cpp:16-78),
* :func:`knn` — grid-bucketed K-nearest-neighbor search over cluster centers
  (fast-slic.cpp:80-130), including the reference's early-skip quirk,
* :func:`mask_density` / :func:`density_to_mask` — mask -> cluster density
  pooling and broadcast (fast-slic.cpp:141-168).

These operate on K-node graphs (K <= 65534) so they run host-side in
vectorized numpy; the CRF consumes their output as dense [K, D] tensors that
stay on device (see models/crf.py).
"""

from __future__ import annotations

import math

import numpy as np

from ..cluster import Clusters

MAX_ADJ_NEIGHBORS = 12  # fast-slic.cpp:17


class NodeConnectivity:
    """API-parity wrapper over a neighbor-list graph (cfast_slic.pyx:330-351)."""

    def __init__(self, neighbor_lists):
        self._lists = [list(map(int, l)) for l in neighbor_lists]

    @property
    def num_nodes(self):
        return len(self._lists)

    def tolist(self):
        return [list(l) for l in self._lists]


def adjacency(assignment: np.ndarray, K: int):
    """Neighbor lists from the label map (fast_slic_get_connectivity).

    For every pixel (i, j) with i < H-1, j < W-1, the reference examines the
    pairs (right, down, down-right) in row-major scan order and records each
    distinct label pair once, in both directions, skipping a pair if either
    endpoint already has 12 neighbors.  First-occurrence order is preserved
    so the cap drops exactly the same edges.
    """
    a = np.asarray(assignment).astype(np.int64)
    a = np.where((a < 0) | (a >= K), K, a)  # out-of-range labels ignored
    H, W = a.shape
    lists = [[] for _ in range(K)]
    if H < 2 or W < 2:
        return lists

    base = a[:-1, :-1]
    cands = np.stack(
        [
            np.broadcast_to(base, base.shape),
            a[:-1, 1:],   # +1
            np.broadcast_to(base, base.shape),
            a[1:, :-1],   # +W
            np.broadcast_to(base, base.shape),
            a[1:, 1:],    # +W+1
        ],
        axis=-1,
    ).reshape(-1, 3, 2)          # [(H-1)(W-1), 3 dirs, (source, target)]
    pairs = cands.reshape(-1, 2)  # scan order: pixel-major, then direction
    valid = (pairs[:, 0] < K) & (pairs[:, 1] < K) & (pairs[:, 0] != pairs[:, 1])
    pairs = pairs[valid]
    # canonical undirected key; first-occurrence order via unique
    lo = np.minimum(pairs[:, 0], pairs[:, 1])
    hi = np.maximum(pairs[:, 0], pairs[:, 1])
    key = lo * (K + 1) + hi
    _, first_idx = np.unique(key, return_index=True)
    order = np.sort(first_idx)
    for idx in order:
        s, t = int(pairs[idx, 0]), int(pairs[idx, 1])
        if len(lists[s]) >= MAX_ADJ_NEIGHBORS or len(lists[t]) >= MAX_ADJ_NEIGHBORS:
            continue
        lists[t].append(s)  # target first, then source (fast-slic.cpp:65-66)
        lists[s].append(t)
    return lists


def knn(clusters: Clusters, num_neighbors: int, shape):
    """Grid-bucketed nearest-neighbor lists (fast_slic_knn_connectivity).

    Reproduces the reference's candidate visit order (cells in ascending
    (cy, cx) over the *half-open* window [c-3, c+3), fast-slic.cpp:103-104,
    clusters in ascending number within a cell) and its heap early-skip:
    a candidate is rejected whenever its distance is >= the current heap
    maximum even if the heap is not yet full (fast-slic.cpp:108).

    The hot path is the native helper (compiled C, like the reference's);
    the python loop below is the executable spec and the no-compiler
    fallback (tests assert both agree).
    """
    H, W = int(shape[0]), int(shape[1])
    st = clusters.as_numpy()
    K = st.K
    from .. import native
    if native.available():
        return native.knn_native(st.y, st.x, H, W, int(num_neighbors))
    return knn_python(clusters, num_neighbors, shape)


def knn_python(clusters: Clusters, num_neighbors: int, shape):
    """Pure-python reference implementation of :func:`knn` (executable
    spec; see knn docstring)."""
    H, W = int(shape[0]), int(shape[1])
    st = clusters.as_numpy()
    K = st.K
    S = max(int(math.sqrt(H * W // K)), 1)
    nh, nw = -(-H // S), -(-W // S)

    cells = [[] for _ in range(nh * nw)]
    for k in range(K):
        cy, cx = int(st.y[k]) // S, int(st.x[k]) // S
        cells[cy * nw + cx].append(k)

    lists = []
    for k in range(K):
        cy, cx = int(st.y[k]) // S, int(st.x[k]) // S
        heap = []  # max-heap of (distance, index); list[0] is the max
        for gy in range(max(cy - 3, 0), min(nh, cy + 3)):
            for gx in range(max(cx - 3, 0), min(nw, cx + 3)):
                for n in cells[gy * nw + gx]:
                    if n == k:
                        continue
                    # int distance = |dx| + |dy| (float math, then C int
                    # truncation; fast-slic.cpp:107)
                    d = int(abs(st.x[n] - st.x[k]) + abs(st.y[n] - st.y[k]))
                    if heap and heap[0][0] <= d:
                        continue
                    _heap_push(heap, (d, n))
                    while len(heap) > num_neighbors:
                        _heap_pop(heap)
        lists.append([n for _, n in heap])
    return lists


def _heap_push(heap, item):
    heap.append(item)
    i = len(heap) - 1
    while i > 0:
        parent = (i - 1) // 2
        if heap[parent] < heap[i]:
            heap[parent], heap[i] = heap[i], heap[parent]
            i = parent
        else:
            break


def _heap_pop(heap):
    heap[0] = heap[-1]
    heap.pop()
    n, i = len(heap), 0
    while True:
        l, r = 2 * i + 1, 2 * i + 2
        big = i
        if l < n and heap[big] < heap[l]:
            big = l
        if r < n and heap[big] < heap[r]:
            big = r
        if big == i:
            break
        heap[i], heap[big] = heap[big], heap[i]
        i = big


def mask_density(mask: np.ndarray, assignment: np.ndarray,
                 clusters: Clusters) -> np.ndarray:
    """Per-cluster mean mask value, clamped to u8
    (fast_slic_get_mask_density, fast-slic.cpp:141-156)."""
    st = clusters.as_numpy()
    K = st.K
    a = assignment.astype(np.int64)
    valid = (a >= 0) & (a < K)
    sums = np.bincount(a[valid].ravel(),
                       weights=mask[valid].ravel().astype(np.float64),
                       minlength=K).astype(np.int64)
    denom = np.maximum(st.num_members.astype(np.int64), 1)
    return np.minimum(255, sums // denom).astype(np.uint8)


def density_to_mask(densities: np.ndarray, assignment: np.ndarray,
                    K: int) -> np.ndarray:
    """Broadcast per-cluster densities back to pixels
    (fast_slic_cluster_density_to_mask, fast-slic.cpp:158-168)."""
    a = assignment.astype(np.int64)
    valid = (a >= 0) & (a < K)
    out = np.zeros(a.shape, np.uint8)
    out[valid] = densities[a[valid]]
    return out
