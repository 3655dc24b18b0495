// Native float64 kernel-product oracle (OpenMP-threaded, cache-blocked).
//
// The C++ "runtime" half of the framework: a streaming dense kernel
// product a_i = sum_j k(x_i, y_j) b_j used for (a) fast float64
// ground-truth generation at scales where the NumPy oracle is slow and
// (b) a `native-product` benchmark algorithm entry.  Matches the
// semantics of kmb_tpu/algorithms/bruteforce_numpy.py exactly:
//
//   kernel 0: gaussian              k = exp(-|x-y|^2)
//   kernel 1: absolute-exponential  k = exp(-|x-y|)
//   kernel 2: inverse-distance      k = 1/|x-y|, k[i,i] = 0 (global diag)
//   kernel 3: exponential           k = exp(<x,y>)  (attention kernel)
//
// normalize != 0 divides each output row by its kernel row sum
// (attention).  Row-major inputs: x (n,d), y (m,d), b (m,e), out (n,e).
//
// Build: make -C native   (produces libkmb_native.so; loaded via ctypes
// by kmb_tpu/native.py — no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr int64_t kSrcBlock = 256;  // source tile: fits L2 alongside b

inline double sq(double v) { return v * v; }

// Kernel value from the squared distance (kernels 0-2).
template <int KERNEL>
inline double kernel_from_sqdist(double sqd) {
  if (KERNEL == 0) return std::exp(-sqd);
  if (KERNEL == 1) return std::exp(-std::sqrt(sqd > 0 ? sqd : 0.0));
  // inverse-distance; caller masks the diagonal.
  return 1.0 / std::sqrt(sqd > 0 ? sqd : 0.0);
}

template <int KERNEL>
void product_rows(const double* x, const double* y, const double* b,
                  double* out, double* rowsums, int64_t n, int64_t m,
                  int64_t d, int64_t e, int mask_diag, int64_t row_offset) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double* xi = x + i * d;
    double* oi = out + i * e;
    std::memset(oi, 0, sizeof(double) * e);
    double rowsum = 0.0;
    const int64_t gi = row_offset + i;  // global row (diagonal masking)

    for (int64_t j0 = 0; j0 < m; j0 += kSrcBlock) {
      const int64_t j1 = (j0 + kSrcBlock < m) ? j0 + kSrcBlock : m;
      for (int64_t j = j0; j < j1; ++j) {
        const double* yj = y + j * d;
        double form = 0.0;
        if (KERNEL == 3) {
          for (int64_t k = 0; k < d; ++k) form += xi[k] * yj[k];
        } else {
          for (int64_t k = 0; k < d; ++k) form += sq(xi[k] - yj[k]);
        }
        double kv = (KERNEL == 3) ? std::exp(form)
                                  : kernel_from_sqdist<KERNEL>(form);
        if (KERNEL == 2 && mask_diag && gi == j) kv = 0.0;
        rowsum += kv;
        const double* bj = b + j * e;
        for (int64_t k = 0; k < e; ++k) oi[k] += kv * bj[k];
      }
    }
    if (rowsums) rowsums[i] = rowsum;
  }
}

}  // namespace

extern "C" {

// Returns 0 on success, -1 on unknown kernel id.
int kmb_kernel_product(const double* x, const double* y, const double* b,
                       double* out, double* rowsums, int64_t n, int64_t m,
                       int64_t d, int64_t e, int kernel_id, int normalize,
                       int mask_diag, int64_t row_offset) {
  switch (kernel_id) {
    case 0:
      product_rows<0>(x, y, b, out, rowsums, n, m, d, e, mask_diag,
                      row_offset);
      break;
    case 1:
      product_rows<1>(x, y, b, out, rowsums, n, m, d, e, mask_diag,
                      row_offset);
      break;
    case 2:
      product_rows<2>(x, y, b, out, rowsums, n, m, d, e, /*mask_diag=*/1,
                      row_offset);
      break;
    case 3:
      product_rows<3>(x, y, b, out, rowsums, n, m, d, e, mask_diag,
                      row_offset);
      break;
    default:
      return -1;
  }
  if (normalize && rowsums) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      const double inv = 1.0 / rowsums[i];
      double* oi = out + i * e;
      for (int64_t k = 0; k < e; ++k) oi[k] *= inv;
    }
  }
  return 0;
}

int kmb_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
