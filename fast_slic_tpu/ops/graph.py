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
    """API-parity wrapper over a neighbor-list graph (cfast_slic.pyx:330-351).

    Internally stores either python lists or a padded [K, D] matrix
    (matrix form avoids per-edge python work on the CRF staging path —
    ``models/crf.py`` consumes ``matrix()`` directly)."""

    def __init__(self, neighbor_lists=None, matrix=None, lens=None):
        if matrix is not None:
            self._matrix = (np.asarray(matrix, np.int32),
                            np.asarray(lens, np.int64))
            self._lists = None
        else:
            self._lists = [list(map(int, l)) for l in neighbor_lists]
            self._matrix = None

    @property
    def num_nodes(self):
        if self._lists is not None:
            return len(self._lists)
        return self._matrix[0].shape[0]

    def tolist(self):
        if self._lists is None:
            nbr, lens = self._matrix
            self._lists = [nbr[i, :lens[i]].tolist()
                           for i in range(nbr.shape[0])]
        return [list(l) for l in self._lists]

    def matrix(self):
        """(nbr [K, D] int32 padded with -1, lens [K]) — insertion order."""
        if self._matrix is None:
            lists = self._lists
            K = len(lists)
            lens = np.fromiter(map(len, lists), np.int64, count=K)
            D = max(1, int(lens.max()) if K else 1)
            nbr = np.full((K, D), -1, np.int32)
            flat = np.fromiter((v for l in lists for v in l), np.int32,
                               count=int(lens.sum()))
            cols = np.arange(D)[None, :] < lens[:, None]
            nbr[cols] = flat
            self._matrix = (nbr, lens)
        return self._matrix


def adjacency(assignment: np.ndarray, K: int):
    """Neighbor lists from the label map (fast_slic_get_connectivity).
    List-of-lists view of :func:`adjacency_matrix`."""
    nbr, lens = adjacency_matrix(assignment, K)
    return [nbr[i, :lens[i]].tolist() for i in range(K)]


def adjacency_matrix(assignment: np.ndarray, K: int):
    """Adjacency from the label map as (nbr [K, D] int32 padded -1,
    lens [K]) in the reference's insertion order (fast_slic_get_connectivity,
    fast-slic.cpp:16-78).

    For every pixel (i, j) with i < H-1, j < W-1, the reference examines the
    pairs (right, down, down-right) in row-major scan order and records each
    distinct label pair once, in both directions, skipping a pair if either
    endpoint already has 12 neighbors.  First-occurrence order is preserved
    so the cap drops exactly the same edges.

    Fully vectorized except the cap resolution: an edge both of whose
    endpoints have TOTAL first-occurrence degree <= 12 can never be dropped
    (rejections elsewhere only lower degrees), so only edges touching a
    "hot" node (> 12 candidate edges — rare on SLIC graphs) walk the
    sequential cap simulation.
    """
    a = np.asarray(assignment)
    if a.dtype != np.int32:
        a = a.astype(np.int64)
    H, W = a.shape
    if H < 2 or W < 2:
        return np.full((K, 1), -1, np.int32), np.zeros(K, np.int64)
    bad = (a < 0) | (a >= K)
    if bad.any():
        a = np.where(bad, K, a)  # out-of-range labels ignored

    # boundary pairs per direction (right, down, down-right), then restore
    # the reference's scan order — pixel-major, then direction — via a
    # per-pair order key.  Only ~2% of pixel pairs cross a boundary, so
    # compressing (int32, contiguous, flatnonzero) BEFORE any big
    # materialization keeps this ~100x cheaper than stacking the full
    # [(H-1)(W-1), 3, 2] candidate tensor.
    base = np.ascontiguousarray(a[:-1, :-1])
    base_flat = base.reshape(-1)
    okbase = base < K
    srcs, dsts, order_keys = [], [], []
    for d, nb in enumerate((a[:-1, 1:], a[1:, :-1], a[1:, 1:])):
        nbc = np.ascontiguousarray(nb)
        idx = np.flatnonzero((base != nbc) & okbase & (nbc < K))
        srcs.append(base_flat[idx])
        dsts.append(nbc.reshape(-1)[idx])
        order_keys.append(idx * np.int64(3) + d)
    s = np.concatenate(srcs).astype(np.int64)
    t = np.concatenate(dsts).astype(np.int64)
    okey = np.concatenate(order_keys)
    perm = np.argsort(okey, kind="stable")
    s, t = s[perm], t[perm]
    # canonical undirected key; first-occurrence order via unique
    key = np.minimum(s, t) * (K + 1) + np.maximum(s, t)
    _, first_idx = np.unique(key, return_index=True)
    order = np.sort(first_idx)
    s = s[order]
    t = t[order]

    occ = np.bincount(np.concatenate([s, t]), minlength=K)
    hot = occ > MAX_ADJ_NEIGHBORS
    accept = ~(hot[s] | hot[t])
    if not accept.all():
        # sequential cap simulation for the hot edges only.  A cold
        # endpoint (total degree <= 12) can never be at the cap when
        # checked, so only hot-node degrees are tracked — and every edge
        # that can change a hot degree is in this set.
        hd = {int(i): 0 for i in np.nonzero(hot)[0]}
        for idx in np.nonzero(~accept)[0]:
            ss, tt = int(s[idx]), int(t[idx])
            ds = hd.get(ss)
            dt = hd.get(tt)
            if ((ds is not None and ds >= MAX_ADJ_NEIGHBORS)
                    or (dt is not None and dt >= MAX_ADJ_NEIGHBORS)):
                continue
            accept[idx] = True
            if ds is not None:
                hd[ss] = ds + 1
            if dt is not None:
                hd[tt] = dt + 1

    sa = s[accept]
    ta = t[accept]
    # directed insertion stream: target first, then source per edge
    # (fast-slic.cpp:65-66)
    owners = np.empty(2 * sa.shape[0], np.int64)
    partners = np.empty_like(owners)
    owners[0::2] = ta
    partners[0::2] = sa
    owners[1::2] = sa
    partners[1::2] = ta
    counts = np.bincount(owners, minlength=K)
    D = max(1, int(counts.max()) if owners.size else 1)
    perm = np.argsort(owners, kind="stable")
    starts = np.zeros(K, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    rank_sorted = np.arange(owners.shape[0]) - np.repeat(starts, counts)
    ranks = np.empty(owners.shape[0], np.int64)
    ranks[perm] = rank_sorted
    nbr = np.full((K, D), -1, np.int32)
    nbr[owners, ranks] = partners
    return nbr, counts.astype(np.int64)


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
