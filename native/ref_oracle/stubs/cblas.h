/* Naive CBLAS subset (no BLAS library in this image).  Implementations in
 * cblas_naive.cpp; correctness over speed — the parity oracle runs one
 * small-resolution forward pass. */
#ifndef REF_ORACLE_CBLAS_H_
#define REF_ORACLE_CBLAS_H_

#include <string.h> /* caffe's math_functions.hpp relies on a transitive
                       memset declaration from the real cblas.h chain */

#ifdef __cplusplus
extern "C" {
#endif

typedef enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum CBLAS_TRANSPOSE {
  CblasNoTrans = 111,
  CblasTrans = 112,
  CblasConjTrans = 113
} CBLAS_TRANSPOSE;

void cblas_sgemm(CBLAS_ORDER order, CBLAS_TRANSPOSE ta, CBLAS_TRANSPOSE tb,
                 int M, int N, int K, float alpha, const float* A, int lda,
                 const float* B, int ldb, float beta, float* C, int ldc);
void cblas_dgemm(CBLAS_ORDER order, CBLAS_TRANSPOSE ta, CBLAS_TRANSPOSE tb,
                 int M, int N, int K, double alpha, const double* A, int lda,
                 const double* B, int ldb, double beta, double* C, int ldc);
void cblas_sgemv(CBLAS_ORDER order, CBLAS_TRANSPOSE ta, int M, int N,
                 float alpha, const float* A, int lda, const float* x,
                 int incx, float beta, float* y, int incy);
void cblas_dgemv(CBLAS_ORDER order, CBLAS_TRANSPOSE ta, int M, int N,
                 double alpha, const double* A, int lda, const double* x,
                 int incx, double beta, double* y, int incy);
void cblas_saxpy(int n, float a, const float* x, int incx, float* y, int incy);
void cblas_daxpy(int n, double a, const double* x, int incx, double* y, int incy);
void cblas_scopy(int n, const float* x, int incx, float* y, int incy);
void cblas_dcopy(int n, const double* x, int incx, double* y, int incy);
void cblas_sscal(int n, float a, float* x, int incx);
void cblas_dscal(int n, double a, double* x, int incx);
float cblas_sdot(int n, const float* x, int incx, const float* y, int incy);
double cblas_ddot(int n, const double* x, int incx, const double* y, int incy);
float cblas_sasum(int n, const float* x, int incx);
double cblas_dasum(int n, const double* x, int incx);

#ifdef __cplusplus
}
#endif
#endif
