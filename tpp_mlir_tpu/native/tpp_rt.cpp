// Native runtime helpers (C ABI), the counterpart of the reference's
// runtime/ C++ layer (runtime/Xsmm/XsmmRunnerUtils.cpp, PerfRunnerUtils.cpp,
// tools/fpcmp/fpcmp.c). On TPU the kernel JIT lives in Mosaic, so the native
// layer carries the host-side pieces that are hot or must be exact:
//   - fpcmp core: tolerance comparison over large printed-tensor dumps
//     (reference fpcmp.c:197-213, 405-460)
//   - deterministic tensor initializers (reference TensorInit.h families)
//   - monotonic timer (reference PerfRunnerUtils.cpp:23-35)
// Built as a shared library (see Makefile) and loaded via ctypes
// (tpp_mlir_tpu/runtime/native.py) with Python fallbacks when not built.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>

extern "C" {

// --- fpcmp core -------------------------------------------------------------
// Compare n float64 values under absolute/relative tolerances.
// Returns 0 on match; otherwise 1 and *fail_index holds the first offender.
int tpp_fpcmp(const double* a, const double* b, int64_t n, double abs_tol,
              double rel_tol, int64_t* fail_index) {
  for (int64_t i = 0; i < n; ++i) {
    double x = a[i], y = b[i];
    if (x == y) continue;  // exact match incl. equal infinities
    if (std::isnan(x) && std::isnan(y)) continue;
    double d = std::fabs(x - y);
    if (d <= abs_tol) continue;
    double denom = std::fmax(std::fabs(x), std::fabs(y));
    if (denom > 0.0 && d / denom <= rel_tol) continue;
    if (fail_index) *fail_index = i;
    return 1;
  }
  return 0;
}

// --- deterministic tensor initializers --------------------------------------
// kinds: 0=zero 1=const 2=simple 3=cont 4=rand 5=normal
int tpp_tensor_init(float* out, int64_t n, int kind, uint64_t seed,
                    float value) {
  switch (kind) {
    case 0:
      std::memset(out, 0, n * sizeof(float));
      return 0;
    case 1:
      for (int64_t i = 0; i < n; ++i) out[i] = value;
      return 0;
    case 2:
      for (int64_t i = 0; i < n; ++i) out[i] = 0.3f * float(i % 3 + 1);
      return 0;
    case 3: {
      float inv = n > 0 ? 1.0f / float(n) : 0.0f;
      for (int64_t i = 0; i < n; ++i) out[i] = float(i) * inv;
      return 0;
    }
    case 4: {
      std::mt19937_64 gen(seed);
      std::uniform_real_distribution<float> dist(0.0f, 1.0f);
      for (int64_t i = 0; i < n; ++i) out[i] = dist(gen);
      return 0;
    }
    case 5: {
      std::mt19937_64 gen(seed);
      std::normal_distribution<float> dist(0.0f, 1.0f);
      for (int64_t i = 0; i < n; ++i) out[i] = dist(gen);
      return 0;
    }
    default:
      return -1;
  }
}

// --- perf timer (reference perf_start_timer/perf_stop_timer) ----------------
int64_t tpp_perf_start_timer() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

double tpp_perf_stop_timer(int64_t start_ns) {
  int64_t now = tpp_perf_start_timer();
  return double(now - start_ns) * 1e-9;
}

}  // extern "C"
