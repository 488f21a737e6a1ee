// Exact linear assignment (Hungarian algorithm with potentials /
// Jonker-Volgenant-style shortest augmenting paths), O(n^2 m).
//
// Role in the framework: host-side exact LAP for parity validation of the
// on-device auction matcher (countdetr_tpu/ops/matching.py) and for offline
// tooling — the native replacement for the reference's scipy
// linear_sum_assignment dependency (reference 2nd-stage matcher.py:243-246,
// scipy's C++ LAPJV). The training hot path never calls this; matching runs
// on-TPU.
//
// Build: make -C native   (produces liblapjv.so; loaded via ctypes by
// countdetr_tpu/ops/lapjv.py)

#include <algorithm>
#include <cstddef>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr float INF = std::numeric_limits<float>::infinity();

}  // namespace

extern "C" {

// Solve min-cost assignment of n rows to m columns (n <= m).
// cost: row-major n x m. out_col[i] = column assigned to row i.
// Returns total cost.
float lapjv_solve(int32_t n, int32_t m, const float* cost, int32_t* out_col) {
  if (n <= 0) return 0.0f;
  // 1-based arrays in the classic formulation; col 0 is the virtual start.
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
  std::vector<int32_t> p(m + 1, 0);    // p[j]: row (1-based) assigned to col j
  std::vector<int32_t> way(m + 1, 0);  // alternating-path predecessor col

  std::vector<double> minv(m + 1);
  std::vector<char> used(m + 1);

  for (int32_t i = 1; i <= n; ++i) {
    p[0] = i;
    int32_t j0 = 0;
    std::fill(minv.begin(), minv.end(), INF);
    std::fill(used.begin(), used.end(), 0);
    do {
      used[j0] = 1;
      const int32_t i0 = p[j0];
      double delta = INF;
      int32_t j1 = -1;
      const float* row = cost + static_cast<int64_t>(i0 - 1) * m;
      for (int32_t j = 1; j <= m; ++j) {
        if (used[j]) continue;
        const double cur = row[j - 1] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int32_t j = 0; j <= m; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    // augment
    do {
      const int32_t j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }

  double total = 0.0;
  for (int32_t j = 1; j <= m; ++j) {
    if (p[j] > 0) {
      out_col[p[j] - 1] = j - 1;
      total += cost[static_cast<int64_t>(p[j] - 1) * m + (j - 1)];
    }
  }
  return static_cast<float>(total);
}

// Batched variant: B independent problems with a shared (Q, T) shape,
// matching the framework's padded batches. valid[b*T + t] masks target rows.
// out[b*T + t] = query assigned to target t (0 for invalid slots).
void lapjv_solve_batch(int32_t B, int32_t Q, int32_t T, const float* cost,
                       const uint8_t* valid, int32_t* out) {
  std::vector<float> sub;
  std::vector<int32_t> rows, assign;
  for (int32_t b = 0; b < B; ++b) {
    rows.clear();
    for (int32_t t = 0; t < T; ++t) {
      out[b * T + t] = 0;
      if (valid[b * T + t]) rows.push_back(t);
    }
    const int32_t n = static_cast<int32_t>(rows.size());
    if (n == 0) continue;
    // build n x Q matrix: row = valid target, col = query
    sub.assign(static_cast<size_t>(n) * Q, 0.0f);
    const float* cb = cost + static_cast<int64_t>(b) * Q * T;
    for (int32_t r = 0; r < n; ++r)
      for (int32_t q = 0; q < Q; ++q)
        sub[static_cast<size_t>(r) * Q + q] = cb[static_cast<int64_t>(q) * T + rows[r]];
    assign.assign(n, 0);
    lapjv_solve(n, Q, sub.data(), assign.data());
    for (int32_t r = 0; r < n; ++r) out[b * T + rows[r]] = assign[r];
  }
}

}  // extern "C"
