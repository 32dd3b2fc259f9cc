// CPU wavefront solver + masked convolution (float64 oracle / host fallback).
//
// TPU-native replacement for the reference's Cython OpenMP solver
// (inf/utils/fastflow_inverse/solve_parallel_mc.pyx:77-126) and the
// pure-python oracles (inf/utils/solve_mc.py). The device path is the XLA
// row-blocked triangular solve (inverse_flow_tpu/ops/inv_conv.py); this
// library provides an independent C++ implementation used as a numerics
// oracle in tests and as the host-side fallback for environments without
// an accelerator. Parallelism: OpenMP over (batch, group) when available.
//
// Conventions match ops/inv_conv.py: canonical TL orientation,
//   z[b,co,h,w] = sum_{dh,dw,ci} K[co,ci,KH-1-dh,KW-1-dw] * y[b,ci,h-dh,w-dw]
// with the kernel's center tap (KH-1, KW-1) holding the same-pixel
// channel-coupling matrix. The solver performs the raster-order
// back-substitution; the center-tap matrix must be lower triangular
// (diagonal may be non-unit; it is divided out, supporting emerging-style
// AR convs).

#include <cstdint>
#include <cstring>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// z = T y  (masked conv with TL zero padding)
void ift_masked_conv_f64(const double* y, const double* k, double* z,
                         int64_t B, int64_t C, int64_t H, int64_t W,
                         int64_t KH, int64_t KW, int64_t groups) {
  const int64_t cg = C / groups;
#ifdef _OPENMP
#pragma omp parallel for collapse(2)
#endif
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t co = 0; co < C; ++co) {
      const int64_t g = co / cg;
      for (int64_t h = 0; h < H; ++h) {
        for (int64_t w = 0; w < W; ++w) {
          double acc = 0.0;
          for (int64_t dh = 0; dh < KH && dh <= h; ++dh) {
            for (int64_t dw = 0; dw < KW && dw <= w; ++dw) {
              const double* kk =
                  k + ((co * cg) * KH + (KH - 1 - dh)) * KW + (KW - 1 - dw);
              for (int64_t ci = 0; ci < cg; ++ci) {
                const double yv =
                    y[((b * C + g * cg + ci) * H + (h - dh)) * W + (w - dw)];
                acc += kk[ci * KH * KW] * yv;
              }
            }
          }
          z[((b * C + co) * H + h) * W + w] = acc;
        }
      }
    }
  }
}

// y = T^{-1} x  (raster back-substitution; in-pixel channels solved in
// increasing order against the lower-triangular center tap)
void ift_inv_conv_solve_f64(const double* x, const double* k, double* y,
                            int64_t B, int64_t C, int64_t H, int64_t W,
                            int64_t KH, int64_t KW, int64_t groups) {
  const int64_t cg = C / groups;
#ifdef _OPENMP
#pragma omp parallel for collapse(2)
#endif
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t g = 0; g < groups; ++g) {
      for (int64_t h = 0; h < H; ++h) {
        for (int64_t w = 0; w < W; ++w) {
          for (int64_t cl = 0; cl < cg; ++cl) {  // local out channel
            const int64_t co = g * cg + cl;
            double acc = x[((b * C + co) * H + h) * W + w];
            for (int64_t dh = 0; dh < KH && dh <= h; ++dh) {
              for (int64_t dw = 0; dw < KW && dw <= w; ++dw) {
                const bool center = (dh == 0 && dw == 0);
                const double* kk =
                    k + ((co * cg) * KH + (KH - 1 - dh)) * KW + (KW - 1 - dw);
                const int64_t ci_max = center ? cl : cg;  // strict lower
                for (int64_t ci = 0; ci < ci_max; ++ci) {
                  acc -= kk[ci * KH * KW] *
                         y[((b * C + g * cg + ci) * H + (h - dh)) * W +
                           (w - dw)];
                }
              }
            }
            // divide by the diagonal tap (1.0 for unit-triangular layers)
            const double diag =
                k[((co * cg + cl) * KH + (KH - 1)) * KW + (KW - 1)];
            y[((b * C + co) * H + h) * W + w] = acc / diag;
          }
        }
      }
    }
  }
}

int ift_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
