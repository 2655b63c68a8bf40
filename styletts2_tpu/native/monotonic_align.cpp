// Monotonic alignment (Viterbi) DP — native CPU kernel.
//
// The reference delegates this to the Cython extension
// `monotonic_align.core.maximum_path_c` (reference utils.py:14-27,
// pyproject.toml:41). This is an independent C++ implementation of the same
// dynamic program, used as (a) the host-side golden oracle for the on-device
// lax.scan implementation in ops/align.py and (b) a CPU fallback.
//
// Semantics: given value[b, x, y] (x: text tokens, y: mel frames) and valid
// extents (t_x[b], t_y[b]), find the monotonic hard path maximizing the sum
// of values, where each step advances y by 1 and x by 0 or 1.
//
// Build: g++ -O3 -shared -fPIC -o libmonotonic_align.so monotonic_align.cpp

#include <cstdint>
#include <algorithm>
#include <limits>
#include <vector>

extern "C" {

// path: int32[b, max_x, max_y] (output, zero-initialized by the caller)
// value: float32[b, max_x, max_y] (input; scratch-copied internally)
// t_x, t_y: int32[b] valid extents
void maximum_path(int32_t* path, const float* value, const int32_t* t_x,
                  const int32_t* t_y, int64_t b, int64_t max_x,
                  int64_t max_y) {
  const float NEG = -1e9f;
  std::vector<float> v;
  for (int64_t ib = 0; ib < b; ++ib) {
    const int64_t tx = t_x[ib];
    const int64_t ty = t_y[ib];
    const float* val = value + ib * max_x * max_y;
    int32_t* pth = path + ib * max_x * max_y;
    if (tx <= 0 || ty <= 0) continue;

    v.assign(val, val + max_x * max_y);
    // forward pass: v[x, y] += max(v[x, y-1], v[x-1, y-1]) within the band
    for (int64_t y = 0; y < ty; ++y) {
      const int64_t x_lo = std::max<int64_t>(0, tx + y - ty);
      const int64_t x_hi = std::min<int64_t>(y + 1, tx);
      for (int64_t x = x_lo; x < x_hi; ++x) {
        float v_cur = (x == y) ? NEG : v[x * max_y + (y - 1)];
        float v_prev;
        if (x == 0) {
          v_prev = (y == 0) ? 0.0f : NEG;
        } else {
          v_prev = v[(x - 1) * max_y + (y - 1)];
        }
        v[x * max_y + y] += std::max(v_cur, v_prev);
      }
    }
    // backtrack
    int64_t index = tx - 1;
    for (int64_t y = ty - 1; y >= 0; --y) {
      pth[index * max_y + y] = 1;
      if (index != 0 &&
          (index == y ||
           v[index * max_y + (y - 1)] < v[(index - 1) * max_y + (y - 1)])) {
        --index;
      }
    }
  }
}

}  // extern "C"
