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

constexpr int64_t kSrcBlock = 512;  // source tile: fits L2 alongside b

inline double sq(double v) { return v * v; }

// The hot loops are split into three vectorizable passes over a source
// block — (1) bilinear/sq-dist form, (2) transcendental kernel map,
// (3) signal accumulation — so the compiler can lower pass (2) to
// libmvec's AVX-512 vector exp (_ZGVeN8v_exp) under -ffast-math instead
// of one scalar exp per pair.  ~6x over the fused scalar loop on 2 cores.
template <int KERNEL>
void product_rows(const double* x, const double* y, const double* b,
                  double* out, double* rowsums, int64_t n, int64_t m,
                  int64_t d, int64_t e, int mask_diag, int64_t row_offset) {
#pragma omp parallel
  {
    std::vector<double> form(kSrcBlock);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      const double* xi = x + i * d;
      double* oi = out + i * e;
      std::memset(oi, 0, sizeof(double) * e);
      double rowsum = 0.0;
      const int64_t gi = row_offset + i;  // global row (diagonal masking)

      for (int64_t j0 = 0; j0 < m; j0 += kSrcBlock) {
        const int64_t bl = (j0 + kSrcBlock < m) ? kSrcBlock : m - j0;
        const double* yb = y + j0 * d;

        // Pass 1: the bilinear form (dot product or squared distance).
        if (d == 3) {  // benchmark-dominant case: unrolled, vector over j
          const double x0 = xi[0], x1 = xi[1], x2 = xi[2];
          if (KERNEL == 3) {
            for (int64_t j = 0; j < bl; ++j)
              form[j] = x0 * yb[j * 3] + x1 * yb[j * 3 + 1] +
                        x2 * yb[j * 3 + 2];
          } else {
            for (int64_t j = 0; j < bl; ++j)
              form[j] = sq(x0 - yb[j * 3]) + sq(x1 - yb[j * 3 + 1]) +
                        sq(x2 - yb[j * 3 + 2]);
          }
        } else {
          for (int64_t j = 0; j < bl; ++j) {
            const double* yj = yb + j * d;
            double f = 0.0;
            if (KERNEL == 3) {
              for (int64_t k = 0; k < d; ++k) f += xi[k] * yj[k];
            } else {
              for (int64_t k = 0; k < d; ++k) f += sq(xi[k] - yj[k]);
            }
            form[j] = f;
          }
        }

        // Pass 2: kernel map, in place (vectorized exp/rsqrt).
        if (KERNEL == 0) {
          for (int64_t j = 0; j < bl; ++j) form[j] = std::exp(-form[j]);
        } else if (KERNEL == 1) {
          for (int64_t j = 0; j < bl; ++j)
            form[j] = std::exp(-std::sqrt(form[j] > 0 ? form[j] : 0.0));
        } else if (KERNEL == 2) {
          // Clamp BEFORE the map: the masked global diagonal has
          // form == 0, and 1/sqrt(0) = inf would be formally undefined
          // under -ffast-math's -ffinite-math-only (the flag that buys
          // the libmvec vector math below).  The clamp keeps the pass
          // finite (1e150); the diagonal is then overwritten with the
          // exact 0 the reference semantics require (bruteforce.py:8-15).
          // Generators never produce off-diagonal coincident points.
          constexpr double kMinSq = 1e-300;
          for (int64_t j = 0; j < bl; ++j)
            form[j] = 1.0 / std::sqrt(form[j] > kMinSq ? form[j] : kMinSq);
          if (mask_diag && gi >= j0 && gi < j0 + bl) form[gi - j0] = 0.0;
        } else {
          for (int64_t j = 0; j < bl; ++j) form[j] = std::exp(form[j]);
        }

        // Pass 3: rowsum + signal accumulation.
        if (e == 1) {
          const double* bj = b + j0;
          double acc = 0.0;
          for (int64_t j = 0; j < bl; ++j) {
            rowsum += form[j];
            acc += form[j] * bj[j];
          }
          oi[0] += acc;
        } else {
          for (int64_t j = 0; j < bl; ++j) {
            const double kv = form[j];
            rowsum += kv;
            const double* bj = b + (j0 + j) * e;
            for (int64_t k = 0; k < e; ++k) oi[k] += kv * bj[k];
          }
        }
      }
      if (rowsums) rowsums[i] = rowsum;
    }
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
