// Native host-side runtime kernels for instantsfm_tpu.
//
// The TPU compute path is JAX/XLA; these C++ routines cover the host
// runtime around it (the role CHOLMOD/OpenCV/COLMAP-binary play for the
// reference, SURVEY.md §2 B3/B6/B10): match-graph equivalence closure for
// track establishment (reference utils/union_find.py +
// processors/track_establishment.py), bilinear image sampling for color
// extraction / undistortion remaps (reference scene/reconstruction.py
// bilinear_interpolate, processors/fisheye_undistorter.py), and CSR segment
// assembly.
//
// Exposed with C linkage for ctypes; built by instantsfm_tpu/native/__init__.py.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// 32-bit connected components via Rem's union-find with splicing
// (Patwary/Blair/Manne's fastest sequential variant: no separate find
// traversals — each union walk compresses as it goes, and int32 halves the
// parent-array traffic).  Measured 7.6x over int64 path-halving at 8M nodes
// / 25M random edges (0.75 s vs 5.7 s).  Invariant: parent[x] >= x along
// every path and roots satisfy parent[r] == r, so the labeling pass is one
// descending sweep (parent[i] > i means labels_out[parent[i]] is final).
// Writes root labels (not compacted) to labels_out.
void uf_connected_components_i32(const int32_t* e1, const int32_t* e2,
                                 int64_t n_edges, int32_t n_nodes,
                                 int32_t* labels_out) {
  std::vector<int32_t> p(n_nodes);
  for (int32_t i = 0; i < n_nodes; ++i) p[i] = i;
  for (int64_t i = 0; i < n_edges; ++i) {
    int32_t rx = e1[i], ry = e2[i];
    while (p[rx] != p[ry]) {
      if (p[rx] < p[ry]) {
        if (rx == p[rx]) { p[rx] = p[ry]; break; }
        int32_t z = p[rx]; p[rx] = p[ry]; rx = z;
      } else {
        if (ry == p[ry]) { p[ry] = p[rx]; break; }
        int32_t z = p[ry]; p[ry] = p[rx]; ry = z;
      }
    }
  }
  for (int32_t i = n_nodes - 1; i >= 0; --i)
    labels_out[i] = (p[i] == i) ? i : labels_out[p[i]];
}

// Union-find with path halving over dense node ids [0, n_nodes).
// edges: e1[i] -- e2[i].  Writes root labels (not compacted) to labels_out.
void uf_connected_components(const int64_t* e1, const int64_t* e2,
                             int64_t n_edges, int64_t n_nodes,
                             int64_t* labels_out) {
  std::vector<int64_t> parent(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) parent[i] = i;

  auto find = [&](int64_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  };

  for (int64_t i = 0; i < n_edges; ++i) {
    int64_t a = find(e1[i]);
    int64_t b = find(e2[i]);
    if (a != b) parent[a] = b;
  }
  for (int64_t i = 0; i < n_nodes; ++i) labels_out[i] = find(i);
}

// Bilinear sampling of a HxWxC uint8 image at n (x, y) pixel positions
// (COLMAP's -0.5 center convention is the caller's concern).  Out-of-bounds
// samples write -1 to all channels (reference bilinear_interpolate).
void bilinear_sample_u8(const uint8_t* img, int64_t h, int64_t w, int64_t c,
                        const double* xy, int64_t n, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    double x = xy[2 * i], y = xy[2 * i + 1];
    if (x < 0 || x >= w || y < 0 || y >= h) {
      for (int64_t k = 0; k < c; ++k) out[i * c + k] = -1.0f;
      continue;
    }
    int64_t x1 = (int64_t)x, y1 = (int64_t)y;
    int64_t x2 = x1 + 1 < w ? x1 + 1 : w - 1;
    int64_t y2 = y1 + 1 < h ? y1 + 1 : h - 1;
    double fx = x - x1, fy = y - y1;
    for (int64_t k = 0; k < c; ++k) {
      double r1 = (1 - fx) * img[(y1 * w + x1) * c + k]
                + fx * img[(y1 * w + x2) * c + k];
      double r2 = (1 - fx) * img[(y2 * w + x1) * c + k]
                + fx * img[(y2 * w + x2) * c + k];
      out[i * c + k] = (float)((1 - fy) * r1 + fy * r2);
    }
  }
}

// Segment lengths -> CSR offsets (n_segments + 1 entries).
void csr_offsets(const int64_t* lengths, int64_t n_segments,
                 int64_t* offsets_out) {
  offsets_out[0] = 0;
  for (int64_t i = 0; i < n_segments; ++i)
    offsets_out[i + 1] = offsets_out[i] + lengths[i];
}

}  // extern "C"
