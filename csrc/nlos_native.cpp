// Native host-side runtime for the TPU NLOS engine.
//
// TPU-native equivalents of the reference's host/CUDA preprocessing
// components (the device-side rendering lives in Pallas kernels):
//   - knn_mean_dist2: grid-accelerated K-nearest-neighbor mean squared
//     distance, replacing the simple-knn CUDA extension (`distCUDA2`,
//     reference gaussian_model/gaussian_model.py:203). Used for per-Gaussian
//     scale initialization at up to cap_max=100k points.
//   - space_carving_votes: the voxel-voting loop of the space-carving
//     initializer (reference gaussian_model/gaussian_utils.py:103-114),
//     O(voxels x scan-points) distance tests.
//   - detect_first_bounces: first-rise detection per scan pixel (reference
//     gaussian_model/gaussian_utils.py:38-50).
//
// Exposed as a plain C ABI and loaded with ctypes — no pybind11 dependency.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Mean squared distance to the k nearest neighbors of each point.
// points: (n, 3) row-major; out: (n,). Returns 0 on success.
int knn_mean_dist2(const float* points, int64_t n, int k, float* out) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 1e-6f;
    return 0;
  }
  k = std::max(1, std::min<int>(k, static_cast<int>(n - 1)));

  float lo[3] = {points[0], points[1], points[2]};
  float hi[3] = {points[0], points[1], points[2]};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], points[3 * i + d]);
      hi[d] = std::max(hi[d], points[3 * i + d]);
    }
  }
  // Grid with ~1 point per cell on average (capped for memory).
  double vol = 1.0;
  for (int d = 0; d < 3; ++d) vol *= std::max(1e-9f, hi[d] - lo[d]);
  double cell = std::cbrt(vol / static_cast<double>(n));
  if (!(cell > 0)) cell = 1e-6;
  int dims[3];
  for (int d = 0; d < 3; ++d) {
    dims[d] = std::max(
        1, std::min(256, static_cast<int>((hi[d] - lo[d]) / cell) + 1));
  }
  const int64_t n_cells =
      static_cast<int64_t>(dims[0]) * dims[1] * dims[2];

  auto cell_of = [&](const float* p, int* c) {
    for (int d = 0; d < 3; ++d) {
      double t = (p[d] - lo[d]) / std::max(1e-12, (double)(hi[d] - lo[d]));
      c[d] = std::min(dims[d] - 1, std::max(0, (int)(t * dims[d])));
    }
  };
  auto cell_idx = [&](const int* c) -> int64_t {
    return ((int64_t)c[0] * dims[1] + c[1]) * dims[2] + c[2];
  };

  // Counting sort of point ids into cells.
  std::vector<int64_t> counts(n_cells + 1, 0);
  std::vector<int> cix(3 * n);
  for (int64_t i = 0; i < n; ++i) {
    int c[3];
    cell_of(points + 3 * i, c);
    std::memcpy(&cix[3 * i], c, sizeof(c));
    counts[cell_idx(c) + 1]++;
  }
  for (int64_t i = 0; i < n_cells; ++i) counts[i + 1] += counts[i];
  std::vector<int64_t> order(n);
  {
    std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
    for (int64_t i = 0; i < n; ++i) {
      order[cursor[cell_idx(&cix[3 * i])]++] = i;
    }
  }

  std::vector<float> best(k);
  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + 3 * i;
    int c[3] = {cix[3 * i], cix[3 * i + 1], cix[3 * i + 2]};
    int found = 0;
    std::fill(best.begin(), best.end(), 1e30f);
    // Expand ring by ring until the k-th best is closer than the nearest
    // unvisited ring boundary.
    for (int ring = 0; ring < std::max({dims[0], dims[1], dims[2]}); ++ring) {
      bool any_cell = false;
      for (int dx = -ring; dx <= ring; ++dx) {
        for (int dy = -ring; dy <= ring; ++dy) {
          for (int dz = -ring; dz <= ring; ++dz) {
            if (std::max({std::abs(dx), std::abs(dy), std::abs(dz)}) != ring)
              continue;  // only the shell of this ring
            int q[3] = {c[0] + dx, c[1] + dy, c[2] + dz};
            if (q[0] < 0 || q[1] < 0 || q[2] < 0 || q[0] >= dims[0] ||
                q[1] >= dims[1] || q[2] >= dims[2])
              continue;
            any_cell = true;
            const int64_t ci = cell_idx(q);
            for (int64_t s = counts[ci]; s < counts[ci + 1]; ++s) {
              const int64_t j = order[s];
              if (j == i) continue;
              const float* pj = points + 3 * j;
              const float dxp = p[0] - pj[0], dyp = p[1] - pj[1],
                          dzp = p[2] - pj[2];
              const float d2 = dxp * dxp + dyp * dyp + dzp * dzp;
              if (d2 < best[k - 1]) {
                // insertion into the small sorted top-k buffer
                int pos = k - 1;
                while (pos > 0 && best[pos - 1] > d2) {
                  best[pos] = best[pos - 1];
                  --pos;
                }
                best[pos] = d2;
                if (found < k) ++found;
              }
            }
          }
        }
      }
      if (found >= k) {
        // Conservative stop: the closest possible point in the next ring is
        // at least `ring * min_cell_edge` away.
        float min_edge = 1e30f;
        for (int d = 0; d < 3; ++d)
          min_edge = std::min(min_edge, (hi[d] - lo[d]) / dims[d]);
        const float ring_dist = ring * min_edge;
        if (ring_dist * ring_dist > best[k - 1]) break;
      }
      if (!any_cell && ring > 0) break;
    }
    float acc = 0.0f;
    int m = std::max(1, found);
    for (int t = 0; t < m; ++t) acc += best[t];
    out[i] = acc / m;
  }
  return 0;
}

// Space-carving votes: votes[v] = #scan points whose first-bounce sphere
// excludes voxel v (distance >= radius). cams: (n_cams, 3); radii: (n_cams,)
// with <= 0 meaning "no first bounce, skip".
int space_carving_votes(const float* coords, int64_t n_coords,
                        const float* cams, const float* radii, int64_t n_cams,
                        int32_t* votes) {
  std::memset(votes, 0, sizeof(int32_t) * n_coords);
  for (int64_t j = 0; j < n_cams; ++j) {
    const float r = radii[j];
    if (r <= 0.0f) continue;
    const float r2 = r * r;
    const float cx = cams[3 * j], cy = cams[3 * j + 1], cz = cams[3 * j + 2];
    for (int64_t v = 0; v < n_coords; ++v) {
      const float dx = coords[3 * v] - cx;
      const float dy = coords[3 * v + 1] - cy;
      const float dz = coords[3 * v + 2] - cz;
      votes[v] += (dx * dx + dy * dy + dz * dz >= r2) ? 1 : 0;
    }
  }
  return 0;
}

// First-bounce bin per scan pixel: first b >= 1 with
// transient[b] - transient[b-1] > threshold; 0 if the histogram is all-zero
// or never rises. transient: (L, M, N) row-major; out: (M, N).
int detect_first_bounces(const float* transient, int64_t l, int64_t m,
                         int64_t n, float threshold, float* out) {
  const int64_t mn = m * n;
  for (int64_t p = 0; p < mn; ++p) {
    float total = 0.0f;
    for (int64_t b = 0; b < l; ++b) total += transient[b * mn + p];
    float fb = 0.0f;
    if (total != 0.0f) {
      for (int64_t b = 1; b < l; ++b) {
        if (transient[b * mn + p] - transient[(b - 1) * mn + p] > threshold) {
          fb = static_cast<float>(b);
          break;
        }
      }
    }
    out[p] = fb;
  }
  return 0;
}

}  // extern "C"
