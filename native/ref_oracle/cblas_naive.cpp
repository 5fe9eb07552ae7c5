// Naive row-major CBLAS implementations for the parity oracle (no BLAS
// library in this image).  The (NoTrans, NoTrans) sgemm — conv's
// weights x im2col product, the oracle's hot path — uses an ikj loop for
// cache-friendly streaming; everything else is straightforward.
#include "cblas.h"

#include <cassert>
#include <cstring>

namespace {

template <typename T>
void gemm(CBLAS_ORDER order, CBLAS_TRANSPOSE ta, CBLAS_TRANSPOSE tb, int M,
          int N, int K, T alpha, const T* A, int lda, const T* B, int ldb,
          T beta, T* C, int ldc) {
  assert(order == CblasRowMajor);
  for (int i = 0; i < M; ++i) {
    T* c = C + i * ldc;
    if (beta == T(0)) {
      std::memset(c, 0, sizeof(T) * N);
    } else if (beta != T(1)) {
      for (int j = 0; j < N; ++j) c[j] *= beta;
    }
  }
  if (ta == CblasNoTrans && tb == CblasNoTrans) {
    for (int i = 0; i < M; ++i) {
      const T* a = A + i * lda;
      T* c = C + i * ldc;
      for (int k = 0; k < K; ++k) {
        const T av = alpha * a[k];
        if (av == T(0)) continue;
        const T* b = B + k * ldb;
        for (int j = 0; j < N; ++j) c[j] += av * b[j];
      }
    }
    return;
  }
  auto at = [&](int i, int k) { return ta == CblasNoTrans ? A[i * lda + k] : A[k * lda + i]; };
  auto bt = [&](int k, int j) { return tb == CblasNoTrans ? B[k * ldb + j] : B[j * ldb + k]; };
  for (int i = 0; i < M; ++i)
    for (int j = 0; j < N; ++j) {
      T acc = 0;
      for (int k = 0; k < K; ++k) acc += at(i, k) * bt(k, j);
      C[i * ldc + j] += alpha * acc;
    }
}

template <typename T>
void gemv(CBLAS_ORDER order, CBLAS_TRANSPOSE ta, int M, int N, T alpha,
          const T* A, int lda, const T* x, int incx, T beta, T* y, int incy) {
  assert(order == CblasRowMajor);
  const int ylen = (ta == CblasNoTrans) ? M : N;
  const int xlen = (ta == CblasNoTrans) ? N : M;
  for (int i = 0; i < ylen; ++i) {
    T acc = 0;
    for (int k = 0; k < xlen; ++k) {
      const T a = (ta == CblasNoTrans) ? A[i * lda + k] : A[k * lda + i];
      acc += a * x[k * incx];
    }
    y[i * incy] = alpha * acc + beta * y[i * incy];
  }
}

}  // namespace

extern "C" {

void cblas_sgemm(CBLAS_ORDER o, CBLAS_TRANSPOSE ta, CBLAS_TRANSPOSE tb, int M,
                 int N, int K, float alpha, const float* A, int lda,
                 const float* B, int ldb, float beta, float* C, int ldc) {
  gemm(o, ta, tb, M, N, K, alpha, A, lda, B, ldb, beta, C, ldc);
}
void cblas_dgemm(CBLAS_ORDER o, CBLAS_TRANSPOSE ta, CBLAS_TRANSPOSE tb, int M,
                 int N, int K, double alpha, const double* A, int lda,
                 const double* B, int ldb, double beta, double* C, int ldc) {
  gemm(o, ta, tb, M, N, K, alpha, A, lda, B, ldb, beta, C, ldc);
}
void cblas_sgemv(CBLAS_ORDER o, CBLAS_TRANSPOSE ta, int M, int N, float alpha,
                 const float* A, int lda, const float* x, int incx, float beta,
                 float* y, int incy) {
  gemv(o, ta, M, N, alpha, A, lda, x, incx, beta, y, incy);
}
void cblas_dgemv(CBLAS_ORDER o, CBLAS_TRANSPOSE ta, int M, int N, double alpha,
                 const double* A, int lda, const double* x, int incx,
                 double beta, double* y, int incy) {
  gemv(o, ta, M, N, alpha, A, lda, x, incx, beta, y, incy);
}
void cblas_saxpy(int n, float a, const float* x, int incx, float* y, int incy) {
  for (int i = 0; i < n; ++i) y[i * incy] += a * x[i * incx];
}
void cblas_daxpy(int n, double a, const double* x, int incx, double* y, int incy) {
  for (int i = 0; i < n; ++i) y[i * incy] += a * x[i * incx];
}
void cblas_scopy(int n, const float* x, int incx, float* y, int incy) {
  for (int i = 0; i < n; ++i) y[i * incy] = x[i * incx];
}
void cblas_dcopy(int n, const double* x, int incx, double* y, int incy) {
  for (int i = 0; i < n; ++i) y[i * incy] = x[i * incx];
}
void cblas_sscal(int n, float a, float* x, int incx) {
  for (int i = 0; i < n; ++i) x[i * incx] *= a;
}
void cblas_dscal(int n, double a, double* x, int incx) {
  for (int i = 0; i < n; ++i) x[i * incx] *= a;
}
float cblas_sdot(int n, const float* x, int incx, const float* y, int incy) {
  float s = 0;
  for (int i = 0; i < n; ++i) s += x[i * incx] * y[i * incy];
  return s;
}
double cblas_ddot(int n, const double* x, int incx, const double* y, int incy) {
  double s = 0;
  for (int i = 0; i < n; ++i) s += x[i * incx] * y[i * incy];
  return s;
}
float cblas_sasum(int n, const float* x, int incx) {
  float s = 0;
  for (int i = 0; i < n; ++i) s += x[i * incx] < 0 ? -x[i * incx] : x[i * incx];
  return s;
}
double cblas_dasum(int n, const double* x, int incx) {
  double s = 0;
  for (int i = 0; i < n; ++i) s += x[i * incx] < 0 ? -x[i * incx] : x[i * incx];
  return s;
}

}  // extern "C"
