// Fast 8-connectivity connected-components labeling + component stats +
// small-component flip refinement for binary masks.
//
// Native host-side runtime for the framework's mask post-processing hot
// paths (LookTwice component analysis at every eval image, pseudo-label
// cleanup over whole datasets).  Exposed through ctypes; Python falls back
// to scipy.ndimage when the shared object is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcclabel.so cc_label.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[b] = a;
  }
};

}  // namespace

extern "C" {

// Label 8-connected components of a binary (0/nonzero) mask.
// labels_out: h*w int32, 0 = background, components numbered 1..n in
// first-encounter (row-major) order. Returns the component count.
int32_t cc_label_u8(const uint8_t* mask, int32_t h, int32_t w,
                    int32_t* labels_out) {
  const size_t n = static_cast<size_t>(h) * w;
  std::vector<int32_t> provisional(n, 0);
  UnionFind uf(n / 2 + 2);  // at most ceil(n/2) provisional labels + sentinel
  int32_t next = 1;

  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const size_t idx = static_cast<size_t>(y) * w + x;
      if (!mask[idx]) continue;
      // neighbours already visited in raster order: W, NW, N, NE
      int32_t neigh[4];
      int nn = 0;
      if (x > 0 && provisional[idx - 1]) neigh[nn++] = provisional[idx - 1];
      if (y > 0) {
        const size_t up = idx - w;
        if (x > 0 && provisional[up - 1]) neigh[nn++] = provisional[up - 1];
        if (provisional[up]) neigh[nn++] = provisional[up];
        if (x + 1 < w && provisional[up + 1]) neigh[nn++] = provisional[up + 1];
      }
      if (nn == 0) {
        provisional[idx] = next++;
      } else {
        int32_t m = neigh[0];
        for (int i = 1; i < nn; ++i)
          if (neigh[i] < m) m = neigh[i];
        provisional[idx] = m;
        for (int i = 0; i < nn; ++i) uf.unite(m, neigh[i]);
      }
    }
  }

  // resolve every provisional label's root once, then compress to
  // consecutive final labels in first-encounter (row-major) order
  std::vector<int32_t> final_of(next, 0);
  int32_t count = 0;
  for (size_t idx = 0; idx < n; ++idx) {
    const int32_t p = provisional[idx];
    if (!p) {
      labels_out[idx] = 0;
      continue;
    }
    int32_t f = final_of[p];
    if (!f) {
      const int32_t root = uf.find(p);
      f = final_of[root];
      if (!f) f = final_of[root] = ++count;
      final_of[p] = f;
    }
    labels_out[idx] = f;
  }
  return count;
}

// Per-component stats over a labeled image: for each label 1..n writes
// [area, x0, y0, x1, y1] into stats_out (n*5 int32).
void cc_stats(const int32_t* labels, int32_t h, int32_t w, int32_t n,
              int32_t* stats_out) {
  for (int32_t i = 0; i < n; ++i) {
    stats_out[i * 5 + 0] = 0;
    stats_out[i * 5 + 1] = w;
    stats_out[i * 5 + 2] = h;
    stats_out[i * 5 + 3] = -1;
    stats_out[i * 5 + 4] = -1;
  }
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int32_t lab = labels[static_cast<size_t>(y) * w + x];
      if (!lab) continue;
      int32_t* s = stats_out + static_cast<size_t>(lab - 1) * 5;
      s[0] += 1;
      if (x < s[1]) s[1] = x;
      if (y < s[2]) s[2] = y;
      if (x > s[3]) s[3] = x;
      if (y > s[4]) s[4] = y;
    }
  }
}

}  // extern "C"
