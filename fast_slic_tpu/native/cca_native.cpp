// Host-side connectivity enforcement for fast_slic_tpu.
//
// Semantics match /root/reference/src/cca.cpp (ConnectivityEnforcer::execute)
// but the implementation is a fresh single-pass design: a min-index
// union-find with path halving, component numbering in leader order by a
// single ascending scan (the root of any component is its minimum pixel
// index, so roots are always visited before members), then area
// thresholding, top-K selection via std::partial_sort (identical tie
// behavior to the reference by construction, since both call libstdc++),
// sequential relabeling and orphan adoption.
//
// Used by the Python package through ctypes as the fast exact path for
// enforce_connectivity on host arrays; the on-device XLA path
// (ops/cca.py) is the default inside fused pipelines.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <utility>
#include <vector>

namespace {

inline int find_root(std::vector<int32_t>& parent, int i) {
    while (parent[i] != i) {
        parent[i] = parent[parent[i]];  // path halving
        i = parent[i];
    }
    return i;
}

inline void unite(std::vector<int32_t>& parent, int a, int b) {
    int ra = find_root(parent, a);
    int rb = find_root(parent, b);
    if (ra == rb) return;
    if (ra < rb)
        parent[rb] = ra;
    else
        parent[ra] = rb;
}

}  // namespace

extern "C" {

// Relabels `labels` (uint16 [H*W], 0xFFFF allowed) in place so every label
// is one 4-connected blob; blobs below `thres` pixels or beyond the K
// largest are absorbed. Returns the number of surviving components.
int fstpu_enforce_connectivity(uint16_t* labels, int H, int W, int K,
                               int thres) {
    const int n = H * W;
    if (n <= 0 || K <= 0) return 0;

    std::vector<int32_t> parent(n);
    for (int i = 0; i < n; i++) parent[i] = i;

    for (int i = 0; i < H; i++) {
        const uint16_t* row = labels + (size_t)i * W;
        for (int j = 0; j < W; j++) {
            int idx = i * W + j;
            if (j > 0 && row[j - 1] == row[j]) unite(parent, idx - 1, idx);
            if (i > 0 && labels[idx - W] == row[j]) unite(parent, idx - W, idx);
        }
    }

    // Component numbering in leader (min pixel index) order.
    std::vector<int32_t> comp_of(n);
    std::vector<int32_t> areas;
    std::vector<int32_t> leaders;
    for (int i = 0; i < n; i++) {
        int root = find_root(parent, i);
        if (root == i) {
            comp_of[i] = (int32_t)leaders.size();
            leaders.push_back(i);
            areas.push_back(0);
        } else {
            comp_of[i] = comp_of[root];
        }
        areas[comp_of[i]]++;
    }
    const int num_components = (int)leaders.size();

    std::vector<int32_t> comps;
    comps.reserve(K);
    for (int c = 0; c < num_components; c++)
        if (areas[c] >= thres) comps.push_back(c);

    if ((int)comps.size() > K) {
        std::partial_sort(
            comps.begin(), comps.begin() + K, comps.end(),
            [&](int32_t a, int32_t b) { return areas[a] > areas[b]; });
        comps.resize(K);
        // leader order == component-number order, so the leader re-sort of
        // the reference is a plain ascending sort here.
        std::sort(comps.begin(), comps.end());
    }

    std::vector<int32_t> substitute(num_components, 0xFFFF);
    int32_t next_label = 0;
    for (int32_t c : comps) substitute[c] = next_label++;
    if (num_components > 0 && substitute[0] == 0xFFFF) substitute[0] = 0;

    for (int c = 0; c < num_components; c++) {
        if (substitute[c] != 0xFFFF) continue;
        int leader = leaders[c];
        int nb = (leader % W > 0) ? leader - 1 : leader - W;
        int32_t s = substitute[comp_of[nb]];
        if (s == 0xFFFF) s = 0;
        substitute[c] = s;
    }

    for (int i = 0; i < n; i++)
        labels[i] = (uint16_t)substitute[comp_of[i]];
    return (int)comps.size();
}


// K-nearest-neighbor lists over cluster centers with the reference's
// grid-bucket walk and bounded-heap semantics (/root/reference/
// src/fast-slic.cpp:80-130), including its early-skip quirk: a candidate is
// rejected whenever its distance reaches the current heap MAXIMUM even if
// the heap is not yet full, and the output order is the heap's ARRAY
// layout (both pinned by tests/test_api.py KNN quirk tests).
// ys/xs: [K] centers; out: [K*m] neighbor ids (-1 pad); out_counts: [K].
int fstpu_knn(const float* ys, const float* xs, int K, int H, int W, int m,
              int32_t* out, int32_t* out_counts) {
    if (K <= 0 || m <= 0) return 0;
    int S = (int)std::sqrt((double)((long long)H * W / K));
    if (S < 1) S = 1;
    int nh = (H + S - 1) / S, nw = (W + S - 1) / S;
    std::vector<std::vector<int>> cells((size_t)nh * nw);
    for (int k = 0; k < K; k++) {
        int cy = (int)ys[k] / S, cx = (int)xs[k] / S;
        if (cy < 0) cy = 0; if (cy >= nh) cy = nh - 1;
        if (cx < 0) cx = 0; if (cx >= nw) cx = nw - 1;
        cells[(size_t)cy * nw + cx].push_back(k);
    }
    typedef std::pair<int, int> Item;  // (distance, index), tuple order
    std::vector<Item> heap;
    heap.reserve(m + 1);
    for (int k = 0; k < K; k++) {
        heap.clear();
        int cy = (int)ys[k] / S, cx = (int)xs[k] / S;
        int gy0 = cy - 3 > 0 ? cy - 3 : 0;
        int gy1 = cy + 3 < nh ? cy + 3 : nh;   // half-open [c-3, c+3)
        int gx0 = cx - 3 > 0 ? cx - 3 : 0;
        int gx1 = cx + 3 < nw ? cx + 3 : nw;
        for (int gy = gy0; gy < gy1; gy++)
            for (int gx = gx0; gx < gx1; gx++)
                for (int n : cells[(size_t)gy * nw + gx]) {
                    if (n == k) continue;
                    int d = (int)(std::fabs(xs[n] - xs[k])
                                  + std::fabs(ys[n] - ys[k]));
                    if (!heap.empty() && heap[0].first <= d) continue;
                    // push with sift-up (max-heap, pair ordering)
                    heap.push_back(Item(d, n));
                    int i = (int)heap.size() - 1;
                    while (i > 0) {
                        int parent = (i - 1) / 2;
                        if (heap[parent] < heap[i]) {
                            std::swap(heap[parent], heap[i]);
                            i = parent;
                        } else break;
                    }
                    while ((int)heap.size() > m) {
                        // pop max with sift-down
                        heap[0] = heap.back();
                        heap.pop_back();
                        int j = 0, hn = (int)heap.size();
                        for (;;) {
                            int l = 2 * j + 1, r = 2 * j + 2, big = j;
                            if (l < hn && heap[big] < heap[l]) big = l;
                            if (r < hn && heap[big] < heap[r]) big = r;
                            if (big == j) break;
                            std::swap(heap[j], heap[big]);
                            j = big;
                        }
                    }
                }
        out_counts[k] = (int32_t)heap.size();
        for (int i = 0; i < m; i++)
            out[(size_t)k * m + i] =
                i < (int)heap.size() ? heap[i].second : -1;
    }
    return 0;
}

}  // extern "C"\n